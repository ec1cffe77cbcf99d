package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters — the ingestion-side twin of the batch
  * q_heavy_hitters (count-min sketch): a SPACE-SAVING (Misra-Gries
  * family) summary per token shard, maintained in keyed state. Where
  * the CMS answers point queries over an unbounded key domain, the
  * space-saving sketch maintains the candidate top set itself — the
  * thing a streaming "trending tokens" consumer actually reads.
  *
  * Scale shape: tokens shard by hash (`pmod(xxhash64(tok), shards)`),
  * so (a) a token's counts live in exactly ONE shard's state (per-token
  * counts are exact until its slot is evicted), (b) state is bounded at
  * shards x m entries TOTAL regardless of vocabulary size — the knob a
  * 100 TB deployment turns is shards (parallelism) x m (accuracy), not
  * memory-per-vocab, and (c) shard summaries merge at read time (the
  * standard mergeable-summary contract).
  *
  * Space-saving guarantees (per shard, n items seen, capacity m),
  * asserted against exact batch counts in StreamingSpec:
  *  - every sketched count OVERestimates: true <= cnt, and
  *    cnt - err <= true (err = the evicted predecessor's count);
  *  - any token with true count > n/m is IN the sketch;
  *  - with m >= the shard's distinct tokens nothing evicts: err = 0 and
  *    counts equal the batch groupBy EXACTLY, across any micro-batch
  *    split (state carries counts between triggers).
  *
  * Each trigger re-emits the shard's current summary stamped with
  * `n_seen` (items processed so far) in Update mode; readers take the
  * max-`n_seen` snapshot per shard — the same convention a compacted
  * changelog topic gives downstream consumers.
  */
object StreamHeavyHitters {

  final case class TokRow(shard: Int, tok: String)
  final case class MGState(toks: Map[String, (Long, Long)], n: Long)
  final case class HHRow(shard: Int, tok: String, cnt: Long, err: Long,
      n_seen: Long)

  /** Narrow tokenization (append-mode safe: no aggregation), mirroring
    * the batch q_heavy_hitters token stream. */
  def tokens(docs: DataFrame, numShards: Int): Dataset[TokRow] = {
    import docs.sparkSession.implicits._
    docs.select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .select(pmod(xxhash64(col("tok")), lit(numShards)).cast("int")
        .as("shard"), col("tok"))
      .as[TokRow]
  }

  /** The per-shard space-saving update. Eviction picks the (count, token)
    * minimum — the lexicographic tie-break keeps eviction deterministic
    * for a given arrival order. */
  def sketch(docs: DataFrame, numShards: Int = 8, m: Int = 64): Dataset[HHRow] = {
    import docs.sparkSession.implicits._
    tokens(docs, numShards)
      .groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (shard: Int, it: Iterator[TokRow], state: GroupState[MGState]) =>
          val st = state.getOption.getOrElse(MGState(Map.empty, 0L))
          var mg = st.toks
          var n = st.n
          it.foreach { r =>
            n += 1
            mg.get(r.tok) match {
              case Some((c, e)) => mg = mg.updated(r.tok, (c + 1, e))
              case None if mg.size < m => mg = mg.updated(r.tok, (1L, 0L))
              case None =>
                val (evTok, (evCnt, _)) =
                  mg.minBy { case (t, (c, _)) => (c, t) }
                mg = (mg - evTok).updated(r.tok, (evCnt + 1, evCnt))
            }
          }
          state.update(MGState(mg, n))
          mg.iterator.map { case (t, (c, e)) => HHRow(shard, t, c, e, n) }
      }
  }

  /** Test/demo driver: ingests the corpus in TWO micro-batches (even
    * doc_ids then odd) so the equivalence checks exercise state
    * carry-over between triggers; returns the raw Update-mode output
    * (readers take the max-n_seen snapshot per shard). */
  def runOnce(spark: org.apache.spark.sql.SparkSession, dir: String,
      queryName: String, numShards: Int = 8, m: Int = 64): DataFrame = {
    val inPath = java.nio.file.Files.createTempDirectory("hh-in")
    val inDir = inPath.toString
    try {
      val docs = spark.read.schema(StreamDedup.rawSchema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
      Staged.appendOrdered(inDir,
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1))
      val stream = spark.readStream.schema(StreamDedup.rawSchema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      val q = sketch(stream, numShards, m)
        .writeStream.outputMode("update")
        .format("memory").queryName(queryName)
        .start()
      q.processAllAvailable()
      q.stop()
      // the memory sink holds the full result; the staged corpus copy
      // is dead weight from here
      spark.table(queryName)
    } finally {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      Files.walk(inPath).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }
}
