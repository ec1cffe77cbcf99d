package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the streaming twin of
  * q_interval_join: each purchase joined to the same user's clicks from the
  * preceding 30 minutes. Both sides carry event-time watermarks so the
  * join state is bounded (clicks older than the purchase watermark minus
  * the interval are evicted) — the state-bounding pattern that makes
  * stream-stream joins viable at scale. */
object StreamJoin {

  /** Shared transform (works on streaming or batch inputs). */
  def purchaseClickJoin(events: DataFrame): DataFrame = {
    val base = EventsStream.normalize(events)
    val clicks = base.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    purchases.join(clicks,
      col("c_user") === col("p_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") < col("p_ts"),
      "inner")
      .select(col("event_id"), col("p_user").as("user_id"),
        unix_micros(col("c_ts")).as("click_us"))
  }

  /** Run the streaming join to completion on the static events file. */
  def runOnce(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val stream = EventsStream.readStream(spark, dir)
    val q = purchaseClickJoin(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  def batch(spark: SparkSession, dir: String): DataFrame =
    purchaseClickJoin(spark.read.parquet(s"$dir/events.parquet"))
}
