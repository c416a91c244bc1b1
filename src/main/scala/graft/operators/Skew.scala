package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation.
  *
  * A hot grouping key (one region, one patch version — the reference's
  * region-partitioned gathering makes these routine) funnels its entire
  * partition through one reducer. Salting splits each key into
  * `saltBuckets` sub-keys for the first (heavy) aggregation, then merges
  * the partials in a second, tiny aggregation — the classic two-phase
  * combine. AQE's skew handling covers joins; aggregation skew needs
  * this explicit form when partial aggregation alone can't absorb it
  * (e.g. high-cardinality DISTINCT under a hot key).
  *
  * Works for any algebraic aggregate expressed as (partial, merge)
  * pairs; sums/counts here.
  */
object Skew {

  /** count + sum(valueCol) per key, salted. Result is identical to the
    * direct groupBy (asserted in the spec); only the shuffle layout
    * differs: phase 1 spreads each key over saltBuckets reducers.
    */
  def saltedSumCount(
      df: DataFrame,
      key: Column,
      valueCol: Column,
      saltBuckets: Int = 16
  ): DataFrame = {
    // The salt must be DETERMINISTIC per row: partition-id or
    // monotonic-id salts change when a failed map task recomputes, and
    // rows then shuffle to different reducers than the ones that already
    // merged the original output (the repartition-by-rand correctness
    // trap). Hashing row content keeps retries stable; identical rows
    // sharing a bucket only narrows the spread, never the correctness.
    val salted = df
      .withColumn("__salt", pmod(xxhash64(key, valueCol), lit(saltBuckets.toLong)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(count(lit(1)).as("pc"), sum(valueCol).as("ps"))
    salted
      .groupBy(col("k"))
      .agg(sum("pc").as("n"), sum("ps").as("total"))
  }
}
