package graft.streaming

import graft.store.VectorStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-Streaming ingestion into the vector store (the SURVEY.md
  * §1.3 extension: the reference mutates in-process; here the ingest path
  * is a stream whose micro-batches flow through the SAME validated
  * addVectors bulk-insert, via foreachBatch). */
object StreamIngest {

  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Stream the embeddings fixture into `store`; returns rows ingested. */
  def ingestOnce(spark: SparkSession, dir: String, store: VectorStore): Long = {
    val stream = spark.readStream.schema(embSchema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)
    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        store.addVectors(batch.select(
          concat(lit("vec_"), col("vec_id")).as("id"),
          col("embedding"),
          map(lit("label"), col("label").cast("string")).as("meta")))
      }
      .start()
    q.processAllAvailable()
    q.stop()
    store.count
  }
}
