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

  test("q_mann_kendall: S and Var(S) replay driver-side, z matches the definition") {
    import org.apache.spark.sql.functions.{col, date_format, floor, lit, sum}
    val rows = SparkEntry.queries("q_mann_kendall")(spark, sf001).collect()
    assert(rows.nonEmpty)
    // independent replay: per-nation monthly cents series from the raw tables
    val series = Tables.orders(spark, sf001)
      .join(Tables.customer(spark, sf001), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nk"),
        date_format(col("o_orderdate"), "yyyy-MM").as("m"))
      .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long")).as("r"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
      .groupBy(_._1).map { case (nk, g) =>
        nk -> g.sortBy(_._2).map(_._3).toIndexedSeq
      }
    rows.foreach { r =>
      val (nk, n, s, varNum, zE9) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val xs = series(nk)
      assert(n === xs.length)
      val sRef = (for { i <- xs.indices; j <- i + 1 until xs.length }
        yield math.signum(xs(j).compare(xs(i))).toLong).sum
      assert(s === sRef, s"nation $nk S")
      val tie = xs.groupBy(identity).values
        .map(g => g.size.toLong).map(t => t * (t - 1) * (2 * t + 5)).sum
      assert(varNum === n * (n - 1) * (2 * n + 5) - tie, s"nation $nk Var")
      val zRef =
        if (varNum <= 0 || s == 0) 0.0
        else (s - math.signum(s.toDouble)) / math.sqrt(varNum / 18.0)
      assert(zE9 === math.floor(zRef * 1e9).toLong, s"nation $nk z")
    }
  }

  test("q_cmsketch: estimates are one-sided and exact in collision-free cells") {
    val rows = SparkEntry.queries("q_cmsketch")(spark, sf001).collect()
    assert(rows.length === graft.ops.ExtendedQueries.CmProbes.length)
    rows.foreach { r =>
      val (tok, exact, est, over, ok) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ok === 1L, s"$tok estimate below exact — impossible for CM")
      assert(over === est - exact)
      assert(est >= exact)
    }
    val absent = rows.find(_.getString(0) == "quux_absent").get
    assert(absent.getLong(1) === 0L, "absent probe must have exact 0")
    // a 31-token vocabulary in 4x64 cells: at least one probe should
    // land collision-free in some row and estimate EXACTLY
    assert(rows.exists(r => r.getLong(3) === 0L),
      "no probe estimated exactly — hash spread degenerate?")
  }
}
