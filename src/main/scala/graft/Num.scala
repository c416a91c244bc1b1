package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric helpers shared by operators and their oracle SQL.
  *
  * `round4` exists because Spark's `round(x, 4)` on DOUBLE converts to
  * BigDecimal and rounds HALF_UP on the exact decimal expansion, while
  * DuckDB rounds via float-scaled arithmetic — the two disagree on
  * half-way doubles. `floor(x * 1e4 + 0.5) / 1e4` performs the identical
  * IEEE-754 op sequence in both engines, so a DuckDB oracle using the
  * same formula hash-matches bit-for-bit.
  */
object Num {
  def round4(c: Column): Column = floor(c * lit(10000d) + lit(0.5)) / lit(10000d)

  /** The same formula as DuckDB SQL, for oracle strings. */
  def round4Sql(expr: String): String = s"floor(($expr) * 10000 + 0.5) / 10000"
}
