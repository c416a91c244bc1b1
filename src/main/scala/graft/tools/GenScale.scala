package graft.tools

import org.apache.spark.sql.SparkSession

/** Deterministic sf1 test-corpus generator for the SCALE-TRAJECTORY
  * measurements in SURVEY §6.
  *
  * The driver ships sf0.001/0.01/0.1 fixtures only; one decade of
  * measured sf0.1 → sf1 scaling grounds the 100 TB argument that
  * otherwise rests on plan-shape reasoning alone. This generator
  * reproduces the OBSERVED statistical shape of the driver's
  * `documents` and `embeddings` tables at 10× sf0.1 row counts — same
  * 31-word vocabulary, uniform 10..100-token lengths, `src{id%20}`
  * sources, ~41% `en` language mix, ~5%-of-docs planted near-dup
  * involvement (perturbed copies at 1-2 token substitutions, plus a
  * small exact-dup tail), and 64-dim unit-norm embeddings drawn around
  * 10 labeled centers. Absolute pair/cluster densities differ slightly
  * from the driver's plants; scaling EXPONENTS (the thing being
  * measured) only need the per-doc densities to stay constant across
  * the decade, which this construction guarantees by planting at a
  * fixed rate. Seeded; output goes under target/ (never committed,
  * regenerate on demand).
  *
  * Usage: `sbt "runMain graft.tools.GenScale target/testdata/sf1 50000 20000"`.
  * A fourth arg `adversarial` switches on the hot-key plants (fixed
  * boilerplate 8-gram in ~30% of docs, one viral near-dup cluster) that
  * force the engine's bound mechanisms — `SubstrDedup.SubstrOccCap`,
  * `Dedup.ContainmentDfCap`, the LSH bucket caps — to ENGAGE rather
  * than sit inert; `tools.ScaleBench` then measures the per-task
  * shuffle ceilings under that shape.
  */
object GenScale {

  val Vocab: Array[String] = Array(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order", "part",
    "query", "row", "scan", "slow", "small", "sort", "spark", "stream",
    "table", "the", "value", "vector", "window")

  /** Corpus-size-scaled vocabulary (r15): |V| grows as nDocs^(1/3),
    * anchored so corpora up to 50k docs keep the original 31 words
    * bit-identically. Rationale — the measurement contract of the §6
    * scale table is CONSTANT per-doc density, and with 3-gram shingles
    * the distinct-shingle space is |V|³: a fixed vocab makes shingle
    * df grow linearly with the corpus, so prefix-filter selectivity
    * collapses (no shingle is rare) and candidate volume grows
    * ~quadratically — an adversarial density regime, not algorithmic
    * scaling. |V| ∝ n^(1/3) holds |V|³ ∝ n, i.e. constant df and
    * constant per-doc collision density across decades. (The fixed-
    * vocab regime remains reachable on purpose — generate a big corpus
    * with the 50k anchor — and is documented in SURVEY §5/§6 as the
    * AllPairs degeneracy boundary.)
    */
  def vocabFor(nDocs: Int): Array[String] = {
    val target = math.max(
      Vocab.length,
      math.round(Vocab.length * math.cbrt(nDocs / 50000.0)).toInt)
    Vocab ++ (0 until target - Vocab.length).map(i =>
      Vocab(i % Vocab.length) + ((i / Vocab.length) + 1).toString)
  }

  val Langs: Array[(String, Double)] =
    Array("en" -> 0.41, "fr" -> 0.15, "es" -> 0.15, "de" -> 0.14, "zh" -> 0.15)

  /** Adversarial-mode boilerplate: a fixed 8-token legal-disclaimer
    * stand-in appended to ~30% of docs, so ONE window hash accumulates
    * 0.3·nDocs occurrences — far past `SubstrDedup.SubstrOccCap` (1000)
    * and every containment df bound. This is the corpus shape the caps
    * exist for; clean-shape runs never engage them.
    */
  val Boilerplate: Array[String] = Array(
    "the", "small", "table", "value", "window", "merge", "sort", "scan")

  /** Adversarial-mode viral cluster: docs with id % `ViralEvery` == 0
    * are 1-token perturbations of one fixed template — a single giant
    * near-dup cluster (0.1% of the corpus) that concentrates one LSH
    * band bucket and one CC component.
    */
  val ViralEvery = 1000
  val ViralTemplate: Array[String] =
    Array.tabulate(40)(i => Vocab(i % Vocab.length))

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("target/testdata/sf1")
    val nDocs = args.lift(1).map(_.toInt).getOrElse(50000)
    val nVecs = args.lift(2).map(_.toInt).getOrElse(20000)
    val adversarial = args.lift(3).contains("adversarial")
    val spark = graft.GraftSession.local()
    generate(spark, outDir, nDocs, nVecs, adversarial)
    println(s"GENSCALE wrote $nDocs docs + $nVecs vecs to $outDir")
    spark.stop()
  }

  /** Session-borrowing body (specs call this; main owns its session). */
  def generate(spark: SparkSession, outDir: String, nDocs: Int, nVecs: Int,
               adversarial: Boolean = false): Unit = {
    import spark.implicits._

    // Documents: generated per-partition from a partition-seeded PRNG
    // (deterministic and parallel; no driver-side row building). Plants
    // reference docs from the SAME partition so no shuffle is needed to
    // resolve the source text; pair density per doc is what matters.
    val parts = 32
    val perPart = (nDocs + parts - 1) / parts
    // Density-held vocabulary (see vocabFor): identical to Vocab at the
    // 50k anchor and below, so existing corpora regenerate bit-for-bit.
    val vocab = vocabFor(nDocs)
    val docs = spark.sparkContext.parallelize(0 until parts, parts).flatMap { p =>
      val rnd = new scala.util.Random(42L * 1000003 + p)
      val base = p * perPart
      val texts = new Array[Array[String]](perPart)
      (0 until perPart).flatMap { i =>
        val id = base + i
        if (id >= nDocs) None
        else {
          val plantNear = i > 10 && rnd.nextDouble() < 0.025
          val plantExact = i > 10 && !plantNear && rnd.nextDouble() < 0.002
          val viral = adversarial && id % ViralEvery == 0
          val boiler = adversarial && !viral && rnd.nextDouble() < 0.30
          val w: Array[String] =
            if (viral) {
              // One shared template, one substituted token — a single
              // corpus-wide near-dup cluster / viral LSH bucket.
              val c = ViralTemplate.clone()
              c((id / ViralEvery) % c.length) = vocab(rnd.nextInt(vocab.length))
              c
            } else if (plantExact) texts(rnd.nextInt(i)).clone()
            else if (plantNear) {
              val src = texts(rnd.nextInt(i))
              val c = src.clone()
              val subs = 1 + rnd.nextInt(2)
              (0 until subs).foreach { _ =>
                c(rnd.nextInt(c.length)) = vocab(rnd.nextInt(vocab.length))
              }
              c
            } else {
              val base = Array.fill(10 + rnd.nextInt(91))(vocab(rnd.nextInt(vocab.length)))
              if (boiler) base ++ Boilerplate else base
            }
          texts(i) = w
          val text = w.mkString(" ")
          val u = rnd.nextDouble()
          val lang = {
            var acc = 0.0; var k = 0
            while (k < Langs.length - 1 && { acc += Langs(k)._2; acc < u }) k += 1
            Langs(k)._1
          }
          Some((id.toLong, text, lang, s"src${id % 20}", text.length.toLong))
        }
      }
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.repartition(8).write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    // Embeddings: 10 gaussian centers, unit-norm 64-dim vectors.
    val centers = {
      val r = new scala.util.Random(7)
      Array.fill(10)(Array.fill(64)(r.nextGaussian()))
    }
    val vecs = spark.sparkContext.parallelize(0 until parts, parts).flatMap { p =>
      val rnd = new scala.util.Random(99L * 1000003 + p)
      val per = (nVecs + parts - 1) / parts
      val base = p * per
      (0 until per).flatMap { i =>
        val id = base + i
        if (id >= nVecs) None
        else {
          val label = rnd.nextInt(10)
          val raw = centers(label).map(c => c + 0.6 * rnd.nextGaussian())
          val n = math.sqrt(raw.map(x => x * x).sum)
          Some((id.toLong, raw.map(x => (x / n).toFloat), label))
        }
      }
    }.toDF("vec_id", "embedding", "label")
    vecs.repartition(8).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }
}
