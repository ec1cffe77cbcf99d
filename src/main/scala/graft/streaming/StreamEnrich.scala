package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-static enrichment join: the events stream joined per micro-batch
  * against a static dimension (customer segment). The static side is
  * broadcast into every micro-batch — no state store is involved at all
  * (unlike stream-stream joins), which is what makes this the preferred
  * shape for slowly-changing dimensions at scale: state cost zero, and the
  * dimension can be refreshed by restarting the query (or reading a Delta/
  * parquet path that is atomically replaced).
  */
object StreamEnrich {

  /** Static dimension: customer key -> market segment + nation. */
  def dim(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"),
        col("c_nationkey"))

  /** Shared transform (streaming or batch events): enrich each purchase
    * with the buyer's market segment, then count purchases per segment.
    * The aggregate keeps the output bounded (#segments rows) so the memory
    * sink in tests stays tiny; `complete` mode re-emits totals. */
  def purchasesBySegment(events: DataFrame, dim: DataFrame): DataFrame =
    EventsStream.normalize(events)
      .filter(col("event_type") === "purchase")
      .join(broadcast(dim), Seq("user_id"), "left")
      .groupBy(coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
      .agg(count(lit(1)).as("n_purchases"))

  /** Run the streaming enrichment to completion over the static file. */
  def runOnce(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val stream = EventsStream.readStream(spark, dir)
    val q = purchasesBySegment(stream, dim(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  def batch(spark: SparkSession, dir: String): DataFrame =
    purchasesBySegment(
      spark.read.parquet(s"$dir/events.parquet"), dim(spark, dir))
}
