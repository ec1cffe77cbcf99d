package graft

import org.apache.spark.sql.functions._

/** The 100 TB join-layout claim from SCALE.md, proven locally: bucketing
  * both fact tables on the join key removes the shuffle entirely — the
  * joined plan contains no ShuffleExchange. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val li = Tables.lineitem(spark, sf001)
    val ord = Tables.orders(spark, sf001)
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
    ord.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(plan.contains("Bucketed: true"))
      // no exchange on the JOIN keys (the agg's group-key exchange is fine)
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"unexpected join-key shuffle:\n$plan")

      // same join over the raw (unbucketed) parquet DOES shuffle
      val unbucketed = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      unbucketed.collect()
      val uplan = unbucketed.queryExecution.executedPlan.toString
      assert(uplan.contains("Exchange hashpartitioning(l_orderkey") ||
        uplan.contains("Exchange hashpartitioning(o_orderkey"),
        "control: unbucketed join should shuffle on the join key")

      // results identical
      val a = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val b = unbucketed.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(a == b)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("AQE splits a skewed join partition (the runtime half of SCALE.md)") {
    import spark.implicits._
    // one hot key carrying ~all rows on the left, joined to a small-but-
    // not-broadcastable right side
    val left = (0 until 120000).map(i => (if (i % 100 == 0) i.toLong else 7L, i))
      .toDF("k", "v")
    val right = (0L until 5000L).map(k => (k, s"r$k")).toDF("k", "name")
    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // thresholds low enough that the hot partition qualifies at this size
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      val joined = left.join(right, "k")
      // collect() drives joined's OWN QueryExecution, so AQE finalizes the
      // plan we inspect (count()/write wrap it in a new execution)
      // hot key 7: 118800 rows; distinct keys i%100==0 under 5000: 50 rows
      assert(joined.collect().length == 118850)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(2000)}")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
