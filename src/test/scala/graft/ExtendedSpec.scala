package graft

import org.apache.spark.sql.SparkSession

/** Tests for the extended operator set + SQL function registration. */
case class Li(l_returnflag: String, l_quantity: Double)

class ExtendedSpec extends SparkSpec {

  test("q_approx_distinct exact companions match directly computed countDistinct") {
    val row = SparkEntry.queries("q_approx_distinct")(spark, sf001).collect().head
    val exact = Tables.lineitem(spark, sf001)
      .selectExpr("count(distinct l_orderkey)", "count(distinct l_partkey)",
        "count(distinct l_suppkey)")
      .collect().head
    assert(row.getAs[Long]("exact_orders") == exact.getLong(0))
    assert(row.getAs[Long]("exact_parts") == exact.getLong(1))
    assert(row.getAs[Long]("exact_supps") == exact.getLong(2))
  }

  test("as-of join: every matched click precedes its purchase") {
    val rows = SparkEntry.queries("q_asof_join")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(r.getAs[Long]("click_ts_us") <= r.getAs[Long]("ts_us"))
    }
  }

  test("rollup contains nation-level, region-level and grand total rows") {
    val rows = SparkEntry.queries("q_rollup")(spark, sf001).collect()
    val regions = rows.map(_.getAs[String]("region")).toSet
    assert(regions.contains("ALL"))
    val granular = rows.filter(r =>
      r.getAs[String]("region") != "ALL" && r.getAs[String]("nation") != "ALL")
    val grand = rows.filter(r =>
      r.getAs[String]("region") == "ALL" && r.getAs[String]("nation") == "ALL")
    assert(grand.length == 1)
    val sumGranular = granular.map(_.getAs[Long]("n_items")).sum
    assert(sumGranular == grand.head.getAs[Long]("n_items"))
  }

  test("centroids: one row per (label, pos), dim 64") {
    val rows = SparkEntry.queries("q_centroids")(spark, sf001).collect()
    val labels = rows.map(_.getAs[Int]("label")).distinct
    assert(rows.length == labels.length * 64)
  }

  test("SQL functions registered via GraftExtensions") {
    val base = spark // force shared session init
    // getOrCreate returns the existing session (ignoring extensions), so
    // clear the defaults to build a sibling session on the same context.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql(
        """SELECT cosine_int8(quantize_int8(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))),
          |                   quantize_int8(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))) AS s,
          |       l2_norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n,
          |       dequantize_int8(quantize_int8(array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))))[1] AS d
          |""".stripMargin).collect().head
      assert(r.getDouble(0) == 1.0)
      assert(r.getDouble(1) == 5.0)
      assert(r.getDouble(2) == 1.0)
    } finally {
      // do NOT stop s2 (shared SparkContext); restore the default session
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("typed Dataset API agrees with the untyped DataFrame path") {
    import spark.implicits._
    // Dataset[T] surface (SURVEY.md §1.3): case-class rows, groupByKey,
    // typed mapGroups — same results as the declarative groupBy.
    val ds = Tables.lineitem(spark, sf001)
      .select(org.apache.spark.sql.functions.col("l_returnflag"),
        org.apache.spark.sql.functions.col("l_quantity")).as[Li]
    val typed = ds.groupByKey(_.l_returnflag)
      .mapGroups((k, rows) => (k, rows.map(_.l_quantity).sum.round))
      .collect().toMap
    val untyped = Tables.lineitem(spark, sf001)
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.sum("l_quantity"))
      .collect().map(r => r.getString(0) -> r.getDouble(1).round).toMap
    assert(typed == untyped)
  }

  test("approx distinct counts within 3*rsd of exact for all three keys") {
    // the within_tol booleans ARE the 3-sigma (0.03 at rsd=0.01) accuracy
    // gate, now also stated by the DuckDB oracle as constant 1
    val r = SparkEntry.queries("q_approx_distinct")(spark, sf001).collect().head
    assert(r.getAs[Long]("orders_within_tol") == 1L)
    assert(r.getAs[Long]("parts_within_tol") == 1L)
    assert(r.getAs[Long]("supps_within_tol") == 1L)
  }
}
