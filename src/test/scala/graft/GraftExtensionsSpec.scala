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

  test("registered graft_* functions equal the set the SparkEntry query plans reference") {
    // Registry parity (r14): a custom Expression must never ship
    // registered-but-unused (dead registration) or used-but-registered-
    // only-in-a-test-session. Both directions are checked against the
    // ONE registration list (GraftExtensions, which GraftSession.local
    // routes through): every graft_* call in an ANALYZED SparkEntry
    // plan must resolve from the session registry, and every registered
    // name must be referenced by at least one declared query.
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    val spark = SparkSpec.session
    val sfDir = "/root/testdata/sf0.001"
    // name -> implementation class, straight from the live registry.
    // Matching is by CLASS, not prettyName: two of the registrations
    // (graft_bloom_agg / graft_might_contain) reuse Spark's own bloom
    // Expressions, whose prettyNames are not graft_-prefixed.
    val registry = spark.sessionState.functionRegistry
    val registered: Map[String, String] = registry.listFunction()
      .map(_.funcName).filter(_.startsWith("graft_"))
      .map(n => n -> registry.lookupFunction(FunctionIdentifier(n)).get.getClassName)
      .toMap
    assert(registered.nonEmpty, "registry must carry the graft functions")

    def classesIn(plan: LogicalPlan): Set[String] = {
      val exprs = plan.flatMap(_.expressions)
      val direct = exprs.flatMap(_.collect { case e => e.getClass.getName })
      val sub = exprs
        .flatMap(_.collect { case s: SubqueryExpression => s })
        .flatMap(s => classesIn(s.plan))
      (direct ++ sub).toSet
    }

    // Building each frame analyzes its plan through THIS session's
    // registry (and runs any eager stages), so a graft_* call that was
    // not registered by GraftExtensions would throw right here — that
    // is the used-but-unregistered direction of the parity check.
    val usedClasses = SparkEntry.queries.toSeq.flatMap { case (_, fn) =>
      try classesIn(fn(spark, sfDir).queryExecution.analyzed)
      finally spark.catalog.clearCache()
    }.toSet

    // Functions invoked only while BUILDING a driver-side sketch whose
    // bytes enter the final plan as a literal: the call resolves through
    // the registry at query-build time (the queries above just exercised
    // it), but by construction its class cannot appear in a final
    // analyzed plan. This exception list is deliberately explicit — a
    // new Expression that is registered but referenced nowhere must
    // extend a query or this list, visibly, to get the suite green.
    val eagerBuilders = Set("graft_bloom_agg")
    val dead = registered.collect {
      case (name, cls) if !usedClasses.contains(cls) && !eagerBuilders.contains(name) => name
    }
    assert(dead.isEmpty, s"registered but unreferenced by any query plan: $dead")
    val staleExceptions = eagerBuilders.filter(n =>
      registered.get(n).forall(usedClasses.contains))
    assert(staleExceptions.isEmpty,
      s"eager-builder exceptions that now appear in plans (tighten the list): $staleExceptions")
  }
}
