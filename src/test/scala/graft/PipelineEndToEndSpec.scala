package graft

import org.apache.spark.sql.functions._

/** End-to-end corpus-assembly pipeline: the operators compose the way a
  * real training-data build uses them — dedup -> quality filter -> split —
  * in ONE lazy DataFrame chain, with exact accounting at each gate.
  * (Individual operator correctness is the oracle's job; this asserts the
  * stages compose and the row accounting closes.) */
class PipelineEndToEndSpec extends SparkSpec {

  test("dedup -> quality -> split pipeline closes its accounting") {
    val docs = Tables.documents(spark, sf001)
    val total = docs.count()

    // 1. exact dedup: keep the min doc_id per content hash
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("th")).orderBy(col("doc_id"))
    val deduped = docs.withColumn("th", md5(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn", "th")

    // 2. quality gate: token-level stats as a narrow projection
    val scored: org.apache.spark.sql.DataFrame = deduped
      .withColumn("toks", filter(split(col("text"), " "), t => t =!= ""))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("uniq_ratio",
        size(array_distinct(col("toks"))).cast("double") / col("n_tokens"))
      .drop("toks")
    val kept = scored.filter(col("n_tokens") >= 5 && col("uniq_ratio") > 0.1)

    // 3. reproducible split on the survivors
    val splitDf = kept.withColumn("b",
        graft.functions.TextOps.md5Prefix60(
          concat(lit("split:"), col("doc_id").cast("string"))) % 100)
      .withColumn("split",
        when(col("b") < 80, "train").when(col("b") < 90, "val").otherwise("test"))

    val nDeduped = deduped.count()
    val nKept = kept.count()
    val bySplit = splitDf.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // accounting closes at every gate
    val nDupDropped = total - nDeduped
    assert(nDupDropped >= 0 && nDeduped <= total)
    assert(nKept <= nDeduped)
    assert(bySplit.values.sum == nKept, "split must cover survivors exactly")
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))

    // dedup idempotence: a second dedup pass is a no-op
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("th2")).orderBy(col("doc_id"))
    val twice = deduped.withColumn("th2", md5(col("text")))
      .withColumn("rn", row_number().over(w2)).filter(col("rn") === 1)
    assert(twice.count() == nDeduped)

    // determinism: same pipeline, same assignment
    val again = splitDf.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == bySplit)

    // the whole chain stays one lazy plan (no intermediate actions needed)
    assert(splitDf.queryExecution.logical != null)
  }
}
