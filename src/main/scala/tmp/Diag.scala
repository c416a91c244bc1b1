package graft.similarity
import org.apache.spark.sql.functions._
object DiagX {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val dir = "target/testdata/g50k"
    def t[A](n: String)(f: => A): A = { val t0 = System.nanoTime; val r = f; println(s"DIAG $n: ${(System.nanoTime-t0)/1e9}%.2f s".replace("%.2f","")); r }
    val v = t("stagedUnit+count"){ val x = IvfAnn.stagedUnit(Knn.vectors(spark, dir)); x.count(); x }
    val pts = t("collectSample"){ IvfAnn.collectSample(v, 4544) }
    println(s"DIAG sample n=${pts.length}")
    val base = t("KMeansFit.fit"){ KMeansFit.fit(pts, 142, 20) }
    val q = t("balancedQuantizerOf"){ IvfAnn.balancedQuantizerOf(spark, v) }
    println(s"DIAG leaves=${q.k} rounds=${q.rounds.map(_.size).mkString(",")}")
    val asg = t("assign+sizes"){ q.assign(spark, v).groupBy("cell").count().collect() }
    val sizes = asg.map(_.getLong(1)).sorted.reverse
    println(s"DIAG cells=${sizes.length} max=${sizes.head} top5=${sizes.take(5).mkString(",")} mean=${sizes.sum/sizes.length}")
    // candidate volume: per query nprobe cells -> sum of probed cell sizes
    val nprobe = IvfAnn.numProbesFor(q.k)
    println(s"DIAG nprobe=$nprobe sumSq=${sizes.map(s => s*s).sum}")
    spark.stop()
  }
}
