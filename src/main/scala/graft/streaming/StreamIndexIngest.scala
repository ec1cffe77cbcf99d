package graft.streaming

import graft.store.IvfPqIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Structured-Streaming maintenance of the at-rest IVF-PQ index: each
  * micro-batch flows through the SAME IvfPqIndex.append used for batch
  * maintenance (frozen codebook + frozen centroids, cell partitions only
  * grow), via foreachBatch. This is the production shape for a vector
  * index that must absorb a continuous embedding feed without rebuilds:
  * the stream encodes against the build-time quantizers; a periodic
  * batch `build` refreshes them when drift accumulates.
  *
  * The index must already exist (built from a seed corpus) — appending
  * against frozen sidecars is only meaningful relative to a build.
  */
object StreamIndexIngest {

  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Drain `stream` (vec_id, embedding[, ...]) into the index at `path`;
    * one IvfPqIndex.append per micro-batch. Returns the query handle's
    * batch count for the caller to assert on. */
  def ingestOnce(stream: DataFrame, path: String): Long = {
    var batches = 0L
    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        IvfPqIndex.append(batch.select("vec_id", "embedding"), path)
        batches += 1
      }
      .start()
    q.processAllAvailable()
    q.stop()
    batches
  }

  /** Convenience: stream the embeddings fixture at `dir` into `path`. */
  def ingestFixture(spark: SparkSession, dir: String, path: String): Long = {
    val stream = spark.readStream.schema(embSchema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)
    ingestOnce(stream, path)
  }
}
