package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine operator exposed through the driver contract:
  * a Spark implementation plus (when SQL-expressible) a DuckDB oracle twin
  * that must hash-match it bit-for-bit on the same parquet inputs.
  *
  * Parity rules used throughout (see SURVEY.md §7 "hard parts"):
  *  - row-level float math: cast to DOUBLE with identical operation order on
  *    both sides => bitwise-equal doubles;
  *  - aggregate sums over doubles: route through DECIMAL(25,6) (exact,
  *    order-independent) then cast the final value back to DOUBLE;
  *  - integer aggregates: CAST(... AS BIGINT) in DuckDB (its sum(int) is
  *    HUGEINT) to match Spark's LongType;
  *  - every query ends in a deterministic ORDER BY with a unique tie-break.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

object Tables {
  def read(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = read(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = read(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = read(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = read(s, d, "region")
  /** The ONLY sanctioned read path for the events table: the fixture's `ts`
    * has shipped in multiple physical vintages (see normalizeEventTs), so a
    * raw read must never flow into a timestamp query. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(read(s, d, "events"))

  /** Normalize the events `ts` column to TimestampType (UTC micros),
    * branching on how the fixture was read:
    *  - LongType: parquet TIMESTAMP(NANOS) under nanosAsLong=true → integer
    *    division to micros (floor for positive epochs — the truncation DuckDB
    *    applies reading nanos into its micros TIMESTAMP);
    *  - TimestampNTZType: parquet timestamp[us] without isAdjustedToUTC; the
    *    session timezone is pinned UTC (Sessions.scala) so the cast is an
    *    exact reinterpretation.
    * Every consumer (batch queries, streaming twins) goes through this, so
    * downstream epoch conversions (unix_micros, window()) see ONE type
    * regardless of which physical representation the fixture carries. */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}

/** Shared DuckDB oracle SQL fragments. */
object OracleSql {

  /** CTEs `base` (embedding + double L2 norm, left-fold) and `qv`
    * (int8-quantized INTEGER list) over the `embeddings` table. Mirrors
    * graft.functions.VectorKernels.quantize exactly. */
  val quantizeCte: String =
    """base AS (
      |  SELECT vec_id, label, embedding,
      |    sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))), (a,b) -> a+b)) AS nrm
      |  FROM embeddings
      |),
      |qv AS (
      |  SELECT vec_id, label,
      |    CASE WHEN nrm < 1e-10 THEN list_transform(embedding, x -> 0)
      |         ELSE list_transform(embedding, x -> CAST(LEAST(127.0, GREATEST(-128.0, trunc(CAST(x AS DOUBLE)/nrm*127.0))) AS INTEGER))
      |    END AS q
      |  FROM base
      |)""".stripMargin

  /** Quantized-cosine score between two INTEGER-list columns; integer dot
    * products are exact so the double result matches VectorKernels.cosineInt8
    * bitwise. */
  def int8Cos(a: String, b: String): String =
    s"""CASE WHEN list_dot_product($a,$a) = 0 OR list_dot_product($b,$b) = 0 THEN 0.0
       |     ELSE list_dot_product($a,$b)/(sqrt(list_dot_product($a,$a))*sqrt(list_dot_product($b,$b)))
       |END""".stripMargin

  /** Double left-fold sum over a list expression (mirrors a sequential Scala
    * while-loop accumulation). */
  def foldSum(listExpr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), $listExpr), (acc,x) -> acc+x)"

  /** Float-cosine between two FLOAT-list columns with double left-fold
    * accumulation — mirrors VectorKernels.cosineFloat bitwise. */
  def floatCos(a: String, b: String): String = {
    val dot = foldSum(s"list_transform(list_zip($a,$b), p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE))")
    val na = foldSum(s"list_transform($a, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))")
    val nb = foldSum(s"list_transform($b, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))")
    s"""CASE WHEN $na = 0 OR $nb = 0 THEN 0.0
       |     ELSE $dot/(sqrt($na)*sqrt($nb))
       |END""".stripMargin
  }

  /** `digits` hex chars of a hex-string SQL expression starting at 1-based
    * `start`, as a BIGINT — DuckDB lacks base conversion, so positional
    * strpos arithmetic (mirrors Spark's conv(substr(h, start, digits), 16, 10)). */
  def hexToLong(hexExpr: String, start: Int, digits: Int): String = {
    val terms = (0 until digits).map { p =>
      val scale = math.pow(16, digits - 1 - p).toLong
      s"CAST((strpos('0123456789abcdef', substr($hexExpr, ${start + p}, 1)) - 1) * $scale AS BIGINT)"
    }
    terms.mkString("(", " + ", ")")
  }

  /** Exact decimal-routed sum of a double expression, returned as DOUBLE. */
  def dsum(expr: String): String =
    s"CAST(sum(CAST($expr AS DECIMAL(25,6))) AS DOUBLE)"
}
