package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming heavy hitters on the Spark 4 state-v2 API with MAPSTATE —
  * the per-entry-state twin of StreamHeavyHitters (same space-saving
  * semantics, different state layout).
  *
  * The fmgws version holds each shard's whole m-entry summary in ONE
  * state value, so every trigger deserializes and rewrites the full
  * map even if only a handful of tokens arrived. This processor keeps
  * each token's (count, error) slot as its OWN `MapState` entry on
  * RocksDB: a trigger does point reads/writes for exactly the tokens
  * that arrived (plus an O(m) scan only when a slot must be evicted).
  * At production m (thousands of slots x hundreds of shards) that is
  * the difference between rewriting megabytes of state per trigger and
  * touching the bytes that changed — the reason MapState exists.
  *
  * Semantics are identical to StreamHeavyHitters.sketch (same
  * deterministic (count, token) eviction, same Update-mode re-emission
  * stamped with n_seen); the guarantees asserted in StreamingSpec hold
  * for both. TimeMode is None — no timers, no TTL — so unlike the
  * processing-time TTL operator this query quiesces normally under
  * processAllAvailable.
  */
object StreamHeavyHittersV2 {

  import StreamHeavyHitters.{HHRow, TokRow}

  final case class Slot(cnt: Long, err: Long)

  class MGMapProcessor(m: Int) extends StatefulProcessor[Int, TokRow, HHRow] {
    @transient private var slots: MapState[String, Slot] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      slots = getHandle.getMapState[String, Slot]("slots",
        Encoders.STRING, Encoders.product[Slot], TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("n",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Int, rows: Iterator[TokRow],
        timerValues: TimerValues): Iterator[HHRow] = {
      // size is tracked locally per trigger (MapState has no O(1) size);
      // the map is bounded at m so the initial count scan is bounded too
      var size = 0
      val it0 = slots.iterator()
      while (it0.hasNext) { it0.next(); size += 1 }
      var n = if (seen.exists()) seen.get() else 0L
      rows.foreach { r =>
        n += 1
        if (slots.containsKey(r.tok)) {
          val s = slots.getValue(r.tok)
          slots.updateValue(r.tok, Slot(s.cnt + 1, s.err))
        } else if (size < m) {
          slots.updateValue(r.tok, Slot(1L, 0L))
          size += 1
        } else {
          // eviction: O(m) scan for the (count, token) minimum — the
          // only non-point state access, and only on overflow
          var evTok: String = null
          var evCnt = Long.MaxValue
          val it = slots.iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e._2.cnt < evCnt ||
                (e._2.cnt == evCnt && e._1 < evTok)) {
              evTok = e._1; evCnt = e._2.cnt
            }
          }
          slots.removeKey(evTok)
          slots.updateValue(r.tok, Slot(evCnt + 1, evCnt))
        }
      }
      seen.update(n)
      val out = scala.collection.mutable.ArrayBuffer.empty[HHRow]
      val it2 = slots.iterator()
      while (it2.hasNext) {
        val e = it2.next()
        out += HHRow(key, e._1, e._2.cnt, e._2.err, n)
      }
      out.iterator
    }
  }

  /** Same contract as StreamHeavyHitters.sketch, MapState-backed. */
  def sketch(docs: DataFrame, numShards: Int = 8, m: Int = 64): Dataset[HHRow] = {
    import docs.sparkSession.implicits._
    StreamHeavyHitters.tokens(docs, numShards)
      .groupByKey(_.shard)
      .transformWithState(new MGMapProcessor(m),
        TimeMode.None(), OutputMode.Update())
  }

  /** Two-micro-batch driver mirroring StreamHeavyHitters.runOnce,
    * RocksDB-backed (the state-v2 requirement). */
  def runOnce(spark: SparkSession, dir: String, queryName: String,
      numShards: Int = 8, m: Int = 64): DataFrame = {
    val inPath = java.nio.file.Files.createTempDirectory("hh2-in")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docs = spark.read.schema(StreamDedup.rawSchema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
      Staged.appendOrdered(inPath.toString,
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1))
      val stream = spark.readStream.schema(StreamDedup.rawSchema)
        .option("maxFilesPerTrigger", 1).parquet(inPath.toString)
      val q = sketch(stream, numShards, m)
        .writeStream.outputMode("update")
        .format("memory").queryName(queryName)
        .start()
      q.processAllAvailable()
      q.stop()
      spark.table(queryName)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      Files.walk(inPath).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }
}
