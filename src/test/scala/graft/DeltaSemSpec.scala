package graft

import graft.dedup.Dedup
import graft.similarity.SemDedup
import org.apache.spark.sql.functions._

/** Incremental (delta) text dedup and semantic (embedding-cluster)
  * dedup.
  */
class DeltaSemSpec extends SparkSpec {

  test("dedupDelta equals the full recompute restricted to batch-incident pairs") {
    val full = Dedup.jaccardPrefix(spark, sfDir)
    val isBatch = (c: org.apache.spark.sql.Column) =>
      pmod(c, lit(Dedup.DeltaBatchMod)) === Dedup.DeltaBatchRem
    val expected = full.filter(isBatch(col("a")) || isBatch(col("b")))
    val delta = Dedup.dedupDelta(spark, sfDir)
    assert(delta.count() > 0, "batch slice found no near-dup pairs at this SF")
    assert(delta.exceptAll(expected).count() == 0, "delta invented a pair")
    assert(expected.exceptAll(delta).count() == 0, "delta lost a batch-incident pair (prefix restriction not lossless)")
    // and it never reports settled corpus-corpus pairs
    assert(delta.filter(!isBatch(col("a")) && !isBatch(col("b"))).count() == 0)
  }

  test("semDedup pairs are exact-cosine-correct and a within-cell subset of the all-pairs result") {
    val sem = SemDedup.semDedupPairs(spark, sfDir)
    val exact = Dedup.embedNeardup(spark, sfDir)
    assert(sem.count() > 0)
    // every semantic pair exists in the exact all-pairs set with the
    // identical cosine — within-cell scoring is exact, never approximate
    assert(sem.exceptAll(exact).count() == 0, "semdedup pair absent from (or mis-scored vs) exact all-pairs")
    // the cluster trade: recall floor against the exact pair set
    val recall = sem.count().toDouble / exact.count().toDouble
    assert(recall >= 0.3, f"within-cell recall $recall%.2f collapsed (cells too fine or assignment broken)")
  }

  test("semDedup plans exactly one embeddings scan across index build and scoring") {
    spark.catalog.clearCache()
    val sem = SemDedup.semDedupPairs(spark, sfDir)
    val n = embeddingsScanCount(sem)
    assert(n == 1, s"semDedupPairs plans $n embeddings scans; the staged IVF frame must be the only corpus read")
    spark.catalog.clearCache()
  }

  /** Parquet scans of the embeddings table reachable from `df`,
    * including those hidden INSIDE cached (staged) plans — a plain
    * plan-string scan count stops at InMemoryTableScan nodes and would
    * miss exactly the duplicate read this guards against. Shared cached
    * plans are counted once (the self-join references one stage twice).
    */
  private def embeddingsScanCount(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val seen = scala.collection.mutable.Set.empty[Int]
    def hit(paths: Seq[org.apache.hadoop.fs.Path]): Boolean =
      paths.exists(_.toString.contains("embeddings.parquet"))
    def phys(p: SparkPlan): Int = p.collect {
      case f: FileSourceScanExec => if (hit(f.relation.location.rootPaths)) 1 else 0
      case im: InMemoryTableScanExec =>
        if (seen.add(System.identityHashCode(im.relation.cachedPlan))) phys(im.relation.cachedPlan) else 0
      // AQE wraps cached subplans that contain joins (the balanced
      // quantizer's broadcast sign-test joins, r15); the captured plan
      // is a FIELD, not a child, so collect() alone stops here.
      case aqe: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        phys(aqe.inputPlan)
    }.sum
    def logi(p: LogicalPlan): Int = p.collect {
      case im: InMemoryRelation =>
        if (seen.add(System.identityHashCode(im.cachedPlan))) phys(im.cachedPlan) else 0
      case lr: LogicalRelation =>
        lr.relation match {
          case h: HadoopFsRelation if hit(h.location.rootPaths) => 1
          case _ => 0
        }
    }.sum
    logi(df.queryExecution.withCachedData)
  }
}
