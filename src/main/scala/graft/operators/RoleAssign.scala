package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequential argmax-with-elimination role assignment.
  *
  * Reference: create_champion_lane_mapping (utils.py:419-483) assigns
  * roles per team by a fixed priority of argmax/argmin picks over a
  * SHRINKING candidate set: jungle ← argmax jungle-minions, then support
  * ← argmin cs among the rest, then top/bottom/mid from what remains.
  * The elimination order matters — one row can win several criteria but
  * takes only the highest-priority role.
  *
  * Re-expressed as a cascade of ranking windows over the per-group
  * remainder: each stage is one window pass partitioned by the group key
  * (order), so the whole cascade is k linear passes, not the reference's
  * per-group Python loop. Groups here are orders; "roles" pick lineitems
  * by quantity-max, price-min, discount-max in that priority.
  */
object RoleAssign {

  private val tiebreak = Seq(col("l_linenumber").asc, col("l_partkey").asc,
    col("l_extendedprice").asc, col("l_quantity").asc, col("l_discount").asc)

  def roles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice", "l_discount")

    def pick(df: DataFrame, ordering: org.apache.spark.sql.Column, role: String): (DataFrame, DataFrame) = {
      val w = Window.partitionBy("l_orderkey").orderBy(ordering +: tiebreak: _*)
      val ranked = df.withColumn("rn", row_number().over(w))
      val picked = ranked.filter(col("rn") === 1).drop("rn").withColumn("role", lit(role))
      val rest = ranked.filter(col("rn") > 1).drop("rn")
      (picked, rest)
    }

    val (bulk, rest1)     = pick(li, col("l_quantity").desc, "bulk")
    val (budget, rest2)   = pick(rest1, col("l_extendedprice").asc, "budget")
    val (discount, rest3) = pick(rest2, col("l_discount").desc, "discount")
    val other             = rest3.withColumn("role", lit("other"))

    bulk
      .unionByName(budget)
      .unionByName(discount)
      .unionByName(other)
      .select("l_orderkey", "l_linenumber", "l_partkey", "role")
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "role")
  }
}
