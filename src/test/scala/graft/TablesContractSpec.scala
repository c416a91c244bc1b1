package graft

import org.apache.spark.sql.types._

/** Schema contract for the driver-generated testdata: loads every
  * `Tables.*` entry and asserts column names + dtypes AS SEEN BY THE
  * ENGINE (i.e. after any loader normalization, so `events.ts` must be
  * a TimestampType regardless of the physical parquet generation).
  *
  * Purpose: when the driver regenerates testdata with a different
  * physical schema, this suite fails in ONE place with a message naming
  * the table and column, instead of dozens of scattered downstream
  * failures (r11 lost 24 queries and 33 tests to exactly that).
  */
class TablesContractSpec extends SparkSpec {

  private def assertSchema(table: String, expected: Seq[(String, DataType)]): Unit = {
    val df = table match {
      case "region"     => Tables.region(spark, sfDir)
      case "nation"     => Tables.nation(spark, sfDir)
      case "customer"   => Tables.customer(spark, sfDir)
      case "supplier"   => Tables.supplier(spark, sfDir)
      case "part"       => Tables.part(spark, sfDir)
      case "orders"     => Tables.orders(spark, sfDir)
      case "lineitem"   => Tables.lineitem(spark, sfDir)
      case "events"     => Tables.events(spark, sfDir)
      case "documents"  => Tables.documents(spark, sfDir)
      case "embeddings" => Tables.embeddings(spark, sfDir)
    }
    val actual = df.schema.map(f => f.name -> f.dataType)
    val actualByName = actual.toMap
    expected.foreach { case (col, dt) =>
      assert(
        actualByName.contains(col),
        s"table `$table`: column `$col` missing (loaded columns: ${actual.map(_._1).mkString(", ")})")
      assert(
        actualByName(col) == dt,
        s"table `$table`, column `$col`: expected $dt, loaded ${actualByName(col)} — " +
          "the driver likely regenerated testdata with a new physical schema; " +
          "adapt the loader in Tables.scala")
    }
    assert(
      actual.map(_._1) == expected.map(_._1),
      s"table `$table`: column order/name drift — expected ${expected.map(_._1).mkString(", ")}, " +
        s"loaded ${actual.map(_._1).mkString(", ")}")
  }

  // Timestamps: physical parquet is timestamp[us] (isAdjustedToUTC=false →
  // Spark TIMESTAMP_NTZ). Dims/facts pass NTZ through; events normalizes to
  // session-TZ TimestampType (UTC session, value-preserving) because the
  // event-time operator family (windows, sessionize, range joins) is written
  // against TimestampType.
  private val tsLike: Seq[DataType] = Seq(TimestampType, TimestampNTZType)

  private def assertTsLike(table: String, col: String, dt: DataType): Unit =
    assert(
      tsLike.contains(dt),
      s"table `$table`, column `$col`: expected a timestamp type, loaded $dt")

  test("region/nation/customer/supplier/part contract") {
    assertSchema("region", Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
    assertSchema("nation", Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType))
    assertSchema("customer", Seq(
      "c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType))
    assertSchema("supplier", Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType))
    assertSchema("part", Seq(
      "p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
  }

  test("orders/lineitem contract") {
    val orders = Tables.orders(spark, sfDir)
    assertTsLike("orders", "o_orderdate", orders.schema("o_orderdate").dataType)
    assert(orders.schema.fieldNames.toSeq == Seq(
      "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
      "o_orderpriority"),
      s"orders columns drifted: ${orders.schema.fieldNames.mkString(", ")}")

    val li = Tables.lineitem(spark, sfDir)
    assertTsLike("lineitem", "l_shipdate", li.schema("l_shipdate").dataType)
    assert(li.schema.fieldNames.toSeq == Seq(
      "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
      "l_shipdate"),
      s"lineitem columns drifted: ${li.schema.fieldNames.mkString(", ")}")
  }

  test("events contract — ts normalized to TimestampType by the loader") {
    assertSchema("events", Seq(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType))
    // and the values are sane (non-null, within the generated era)
    val ev = Tables.events(spark, sfDir)
    val nullTs = ev.filter(ev("ts").isNull).count()
    assert(nullTs == 0L, s"events.ts: $nullTs null timestamps after loader normalization")
    // events.value sits exactly on the 2-decimal grid — the as-of
    // lookback's engine-exact average (Windows.scala) quantizes via
    // floor(value*100+0.5) on BOTH engines, which is only the true
    // average under this data property. Pinned here so a driver
    // regeneration with finer precision fails loudly in one place
    // instead of silently shifting avg_7d on both engines at once.
    import org.apache.spark.sql.functions.{abs => sqlAbs, col, floor, lit}
    val offGrid = ev.filter(
      sqlAbs(col("value") - floor(col("value") * 100 + lit(0.5)) / 100.0) > lit(1e-9)).count()
    assert(offGrid == 0L,
      s"events.value: $offGrid values off the 2-decimal grid — driver regenerated with finer " +
        "precision; the as-of lookback's scaled-int quantization is now lossy on real data")
  }

  test("events ts normalization: all three generations land on the same instant") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 2020-01-01T00:00:00Z in nanos / micros.
    val micros = 1577836800000000L
    val legacyNanos = Seq((1L, micros * 1000L)).toDF("event_id", "ts")
    val ntz = Seq((1L, java.time.LocalDateTime.ofEpochSecond(micros / 1000000L, 0, java.time.ZoneOffset.UTC)))
      .toDF("event_id", "ts")
      .select(col("event_id"), col("ts").cast(TimestampNTZType).as("ts"))
    val tz = Seq((1L, new java.sql.Timestamp(micros / 1000L))).toDF("event_id", "ts")
    Seq("legacy-nanos" -> legacyNanos, "ntz" -> ntz, "tz-passthrough" -> tz).foreach {
      case (gen, df) =>
        val out = Tables.normalizeEventsTs(df)
        assert(out.schema("ts").dataType == TimestampType,
          s"generation `$gen`: loader must normalize to TimestampType, got ${out.schema("ts").dataType}")
        val got = out.select(unix_micros(col("ts"))).collect()(0).getLong(0)
        assert(got == micros,
          s"generation `$gen`: expected $micros micros since epoch, got $got (UTC session pinned)")
    }
  }

  test("documents/embeddings contract") {
    assertSchema("documents", Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    val emb = Tables.embeddings(spark, sfDir)
    assert(emb.schema.fieldNames.toSeq == Seq("vec_id", "embedding", "label"),
      s"embeddings columns drifted: ${emb.schema.fieldNames.mkString(", ")}")
    emb.schema("embedding").dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => ()
      case other => fail(s"embeddings.embedding: expected array<float|double>, loaded $other")
    }
    assert(emb.schema("vec_id").dataType == LongType)
  }
}
