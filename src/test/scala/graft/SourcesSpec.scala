package graft

import graft.streaming.StreamDedup
import org.apache.spark.sql.functions._

/** Source/sink surface beyond parquet (CSV, JSON round-trips) and the
  * streaming stateful dedup. */
class SourcesSpec extends SparkSpec {

  test("CSV round-trip preserves the documents table") {
    val docs = Tables.documents(spark, sf001)
    val dir = java.nio.file.Files.createTempDirectory("csv_rt").toString
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val re = spark.read.option("header", "true")
      .schema(docs.schema).csv(dir)
    assert(re.count() == docs.count())
    val a = docs.orderBy("doc_id").collect().map(_.getString(1)).toSeq
    val b = re.orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(a == b)
  }

  test("JSON round-trip preserves embeddings exactly") {
    val emb = Tables.embeddings(spark, sf001)
    val dir = java.nio.file.Files.createTempDirectory("json_rt").toString
    emb.write.mode("overwrite").json(dir)
    val re = spark.read.schema(emb.schema).json(dir)
    assert(re.count() == emb.count())
    val a = emb.orderBy("vec_id").collect().map(_.getSeq[Float](1)).toSeq
    val b = re.orderBy("vec_id").collect().map(_.getSeq[Float](1)).toSeq
    assert(a == b)
  }

  test("streaming stateful dedup keeps exactly one doc per content hash") {
    val kept = StreamDedup.runOnce(spark, sf001, "dedup_test")
    val docs = Tables.documents(spark, sf001)
    val distinctTexts = docs.select(md5(col("text"))).distinct().count()
    assert(kept.count() == distinctTexts)
    // kept hashes are unique
    assert(kept.select("h").distinct().count() == kept.count())
  }
}
