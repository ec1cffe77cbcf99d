package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming ingestion path (SURVEY.md §2.4 "streaming" — an
  * extension beyond the reference, which is batch-only): the events table
  * consumed as a file stream with event-time watermarking and windowed
  * aggregation. The same transform compiles against a batch DataFrame,
  * so correctness is checked against the batch result.
  */
object EventsStream {

  /** Raw parquet schema of the events table (ts read as nanos-long under
    * spark.sql.legacy.parquet.nanosAsLong=true, converted to micros here). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def normalize(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** The shared (stream-or-batch) transform: hourly tumbling-window counts
    * and value sums per event type, watermarked 30 minutes. */
  def windowedAgg(events: DataFrame): DataFrame =
    normalize(events)
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming read of the events parquet. The file source wants a
    * directory, so stream the sf dir with a glob pinned to the events file. */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)

  /** Run the streaming aggregation to completion against the (static) file
    * source via the memory sink; returns the materialized result. */
  def runOnce(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val q = windowedAgg(readStream(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Batch twin of runOnce for equivalence checks. */
  def batch(spark: SparkSession, dir: String): DataFrame =
    windowedAgg(spark.read.schema(rawSchema).parquet(s"$dir/events.parquet"))
}
