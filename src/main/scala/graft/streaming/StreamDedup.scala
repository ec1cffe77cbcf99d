package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming exact dedup — the ingestion-side twin of q_dedup_exact: keeps
  * only the first document per content hash across micro-batches, with the
  * seen-set held in keyed state (KeyValueGroupedDataset.flatMapGroupsWithState,
  * SURVEY.md §2.4 streaming extension).
  *
  * Scale: state is partitioned by content hash (one boolean per distinct
  * document), so the seen-set shards horizontally; in production the state
  * store is RocksDB-backed and the key could be truncated to 64/128 bits.
  */
object StreamDedup {

  final case class DocIn(doc_id: Long, h: String)
  final case class DocKept(doc_id: Long, h: String)

  val rawSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** First-seen filter over a (possibly streaming) document frame. */
  def dedup(docs: DataFrame): Dataset[DocKept] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), md5(col("text")).as("h")).as[DocIn]
      .groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (h: String, rows: Iterator[DocIn], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // deterministic pick: smallest doc_id in this batch for the key
            val first = rows.minBy(_.doc_id)
            Iterator.single(DocKept(first.doc_id, h))
          }
      }
  }

  /** Built-in bounded-state dedup: `dropDuplicatesWithinWatermark` on
    * event_id. Unlike the unbounded seen-set above, state for an id is
    * DROPPED once the watermark passes it — the production shape for
    * at-least-once sources where duplicates arrive close together
    * (retransmits), trading unbounded exactness for bounded state. */
  def dedupEventsWithinWatermark(events: DataFrame): DataFrame =
    EventsStream.normalize(events)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Run the streaming dedup to completion against the static documents
    * parquet via the memory sink; returns kept docs. */
  def runOnce(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val stream = spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    val q = dedup(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
