package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming exact dedup on the Spark 4 state-v2 API with NATIVE STATE
  * TTL — the bounded-state production variant of StreamDedup.
  *
  * StreamDedup's flatMapGroupsWithState seen-set grows forever (one entry
  * per distinct document ever seen); `dropDuplicatesWithinWatermark`
  * bounds state by EVENT time but needs a watermarkable timestamp. This
  * operator is the third point in that design space: `transformWithState`
  * with a `TTLConfig`'d ValueState — the state store itself expires a
  * content hash TTL after its last SIGHTING (processing time; duplicate
  * hits refresh the entry, so suppression is a sliding window over the
  * retransmit train, not a fixed window from the first sighting), so
  * state is
  * bounded by the arrival-rate x TTL product with no timestamp column
  * required. That is the right contract for at-least-once ingestion where
  * duplicates are RETRANSMITS (arrive close together): suppression within
  * the TTL is exact, and a re-appearance after the TTL re-emits — by then
  * the at-rest dedup tier (q_dedup_exact / keepers) owns the decision.
  *
  * Scale shape: state is one boolean per distinct hash seen within the
  * TTL window, sharded by content hash across the state store's
  * partitions, RocksDB-backed (state-v2 requirement) so it lives off
  * heap. The only shuffle is the groupByKey exchange per micro-batch.
  */
object StreamDedupTtl {

  final case class DocIn(doc_id: Long, h: String)
  final case class DocKept(doc_id: Long, h: String)

  /** First-seen-within-TTL filter; `ttl=None` = never expire (then the
    * emitted set is exactly StreamDedup's). */
  class DedupProcessor(ttlMs: Option[Long])
      extends StatefulProcessor[String, DocIn, DocKept] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean,
        ttlMs.map(ms => TTLConfig(java.time.Duration.ofMillis(ms)))
          .getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: String, rows: Iterator[DocIn],
        timerValues: TimerValues): Iterator[DocKept] = {
      // an expired "seen" reads as absent — that IS the TTL semantics.
      // Duplicates REFRESH the entry (sliding-window suppression, "TTL
      // after its LAST sighting"): a retransmit train spaced < TTL stays
      // suppressed for as long as it keeps arriving, instead of re-
      // emitting once the FIRST sighting's TTL lapses mid-train.
      if (seen.exists()) { seen.update(true); Iterator.empty }
      else {
        seen.update(true)
        Iterator.single(DocKept(rows.minBy(_.doc_id).doc_id, key))
      }
    }
  }

  /** First-seen filter over a (possibly streaming) document frame. */
  def dedup(docs: DataFrame, ttlMs: Option[Long]): Dataset[DocKept] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), md5(col("text")).as("h")).as[DocIn]
      .groupByKey(_.h)
      .transformWithState(new DedupProcessor(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
