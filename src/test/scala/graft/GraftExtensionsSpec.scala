package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the `spark.sql.extensions` deployment contract: Spark
  * instantiates the named class reflectively and requires a concrete
  * `Function1[SparkSessionExtensions, Unit]` with a zero-arg
  * constructor — a signature change (renamed class, added ctor param,
  * changed supertype) would break every cluster config that names
  * `graft.GraftExtensions` while the test suite, which reaches the
  * registrations through GraftSession.local, stayed green.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions is reflectively constructible and applies cleanly (the spark.sql.extensions contract)") {
    // Exactly what Spark's applyExtensions does: load by name, zero-arg
    // ctor, cast to SparkSessionExtensions => Unit, apply.
    val cls = Class.forName("graft.GraftExtensions")
    val inst = cls.getConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    inst(ext)  // must register every function/rule without throwing
  }

  test("a session built through the extension class resolves every graft function") {
    val spark = SparkSpec.session
    import spark.implicits._
    // One expression per registered function family — analysis alone
    // proves registration; values prove the wiring end-to-end.
    val row = Seq((Seq(1.0d, 2.0d), Seq(3.0d, 4.0d), Seq(5L, 6L), Seq("a", "b"), "a b a"))
      .toDF("x", "y", "sh", "toks", "text")
      .selectExpr(
        "graft_dot(x, y) AS dot",
        "graft_minhash(sh, 2) AS mh",
        "graft_simhash(toks) AS sim",
        "graft_fingerprint(text) AS fp",
        "size(graft_bpe(text)) AS nbpe")
      .head()
    assert(row.getDouble(0) == 11.0d)
    assert(row.getSeq[Long](1).size == 2)
    // graft_lsh_sig needs a 64-dim vector
    val sig = Seq(Tuple1(Array.fill(64)(1.0d))).toDF("e")
      .selectExpr("graft_lsh_sig(e) AS sig").head().getLong(0)
    val comp = {
      val planes = graft.functions.LshSigExpr.planes
      var s = 0L
      for (i <- 0 until 64) if (planes(i).sum > 0d) s |= 1L << i
      s
    }
    assert(sig == comp, "extension-registered signature must match the plane table")
  }
}
