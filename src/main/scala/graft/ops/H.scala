package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Spark-side parity helpers, twins of graft.OracleSql (see Q.scala). */
object H {

  /** Exact decimal-routed sum of a double column, returned as DOUBLE —
    * order-independent, so it hash-matches DuckDB regardless of partitioning. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(25, 6))).cast("double")

  /** Same with higher fractional precision (for values ~1e-3..10). */
  def dsum12(c: Column): Column = sum(c.cast(DecimalType(25, 12))).cast("double")

  /** Exact mean: decimal sum cast to double, divided by count. */
  def dmean(c: Column): Column = dsum12(c) / count(lit(1))

  /** Long-typed count/sum shims (Spark already yields LongType; kept for
    * symmetry with the oracle's CAST(... AS BIGINT)). */
  def lcount(): Column = count(lit(1))
}
