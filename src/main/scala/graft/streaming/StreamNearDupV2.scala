package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming._

/** Streaming near-dup candidates on the Spark 4 state-v2 API with
  * LISTSTATE — the append-only-state twin of StreamNearDup.
  *
  * A bucket's membership is an append-only log: a new member never
  * mutates earlier entries. The fmgws version still rewrites the whole
  * member Seq into its single state value on every trigger that touches
  * the bucket; `ListState.appendValue` turns that into a POINT APPEND on
  * RocksDB (earlier members are never re-serialized), which is the right
  * write amplification for exactly this access pattern — and the reason
  * ListState exists. Reads still scan the list (needed anyway to emit
  * pairs against every earlier member).
  *
  * Semantics are identical to StreamNearDup.candidates (same bands, same
  * deterministic intra-batch order, same maxBucket cap); TimeMode.None —
  * no timers, no TTL — so the query quiesces normally.
  *
  * With this operator the state-v2 tier demonstrates all four primitives
  * in production use: ValueState + event-time timers (StreamSessions),
  * TTL'd ValueState (StreamDedupTtl), MapState (StreamHeavyHittersV2),
  * ListState (here).
  */
object StreamNearDupV2 {

  import StreamNearDup.{BandRow, CandPair}

  class BucketProcessor(maxBucket: Int)
      extends StatefulProcessor[(Int, String), BandRow, CandPair] {
    @transient private var members: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[Long]("members",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: (Int, String), rows: Iterator[BandRow],
        timerValues: TimerValues): Iterator[CandPair] = {
      var cur = members.get().toSeq
      val out = Seq.newBuilder[CandPair]
      // deterministic intra-batch order; replays stay idempotent
      rows.map(_.doc_id).toSeq.distinct.sorted.foreach { d =>
        if (!cur.contains(d) && cur.size < maxBucket) {
          cur.foreach(o => out += CandPair(math.min(o, d), math.max(o, d)))
          members.appendValue(d) // point append — earlier members untouched
          cur = cur :+ d
        }
      }
      out.result().iterator
    }
  }

  /** Same contract as StreamNearDup.candidates, ListState-backed. */
  def candidates(docs: DataFrame, maxBucket: Int = 1024): Dataset[CandPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    StreamNearDup.bandCols(docs)
      .select(col("doc_id"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
          .as(Seq("band", "key")))
      .as[BandRow]
      .groupByKey(r => (r.band, r.key))
      .transformWithState(new BucketProcessor(maxBucket),
        TimeMode.None(), OutputMode.Append())
  }

  /** Two-micro-batch driver (doc_id split), RocksDB-backed. */
  def runOnce(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val inPath = java.nio.file.Files.createTempDirectory("neardup2-in")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docs = spark.read.schema(StreamDedup.rawSchema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
      Staged.appendOrdered(inPath.toString,
        docs.filter(col("doc_id") < 250),
        docs.filter(col("doc_id") >= 250))
      val stream = spark.readStream.schema(StreamDedup.rawSchema)
        .option("maxFilesPerTrigger", 1).parquet(inPath.toString)
      val q = candidates(stream)
        .writeStream.outputMode("append")
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
