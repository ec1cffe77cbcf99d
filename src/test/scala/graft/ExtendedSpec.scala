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

  test("q_kruskal_wallis: H replays driver-side from real-valued average ranks") {
    import org.apache.spark.sql.functions.{col, floor, lit}
    val r = SparkEntry.queries("q_kruskal_wallis")(spark, sf001).collect().head
    val ev = Tables.events(spark, sf001)
      .filter(col("event_type")
        .isin("click", "error", "purchase", "signup", "view"))
      .select(col("event_type"),
        floor(col("value") * lit(100.0)).cast("long").as("x"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val n = ev.length.toLong
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("k") === 5L)
    // independent replay with REAL-VALUED average ranks (no doubling, no
    // integral-division floors): the engine's per-group floor loses < 1
    // per group, i.e. < 12*k/(N(N+1)) ~ 6e-7 on H at this SF
    val sorted = ev.map(_._2).sorted
    val rankOf: Map[Long, Double] = sorted.zipWithIndex.toSeq.groupBy(_._1)
      .map { case (v, g) => v -> (g.map(_._2 + 1L).sum.toDouble / g.size) }
    val sumRsqOverN = ev.groupBy(_._1).values.map { g =>
      val rs = g.map(p => rankOf(p._2)).sum
      rs * rs / g.size
    }.sum
    val hRaw = 12.0 * sumRsqOverN / (n.toDouble * (n + 1)) - 3.0 * (n + 1)
    val tie = sorted.groupBy(identity).values
      .map { g => val t = g.size.toLong; t * t * t - t }.sum
    val hRef = hRaw / (1.0 - tie.toDouble / (n * n * n - n))
    assert(math.abs(r.getAs[Double]("h") - hRef) < 1e-4,
      s"engine h=${r.getAs[Double]("h")} replay h=$hRef")
    // doubled rank sums must cover the full rank total: sum_g 2R_g = N(N+1)
    // is implied by bins partitioning — cross-check via the raw identity
    val totalRankSum = ev.map(p => rankOf(p._2)).sum
    assert(math.abs(totalRankSum - n.toDouble * (n + 1) / 2.0) < 1e-6)
  }

  test("q_cochran_armitage: trend z replays from the bucket table in exact arithmetic") {
    // sf0.001 exercises the degenerate all-converted branch (every
    // customer has an order there); sf0.01 exercises the live z path
    for (d <- Seq(sf001, "/root/testdata/sf0.01"))
      cochranReplay(d)
  }

  private def cochranReplay(d: String): Unit = {
    import org.apache.spark.sql.functions.{array, broadcast, coalesce, col,
      count => scount, floor, lit, percentile, sum => ssum}
    val r = SparkEntry.queries("q_cochran_armitage")(spark, d)
      .collect().head
    // rebuild the bucket table with the SAME DataFrame expressions (the
    // breakpoints are oracle-verified; the replay targets the scalar
    // trend algebra), then replay A, V, z exactly
    val cust = Tables.customer(spark, d)
      .select(col("c_custkey"),
        floor(col("c_acctbal") * lit(100.0)).cast("long").as("x"))
    val buyers = Tables.orders(spark, d).select(col("o_custkey")).distinct()
    val outcome = cust.join(buyers.withColumn("pos", lit(1L)),
        col("c_custkey") === col("o_custkey"), "left")
      .select(col("x"), coalesce(col("pos"), lit(0L)).as("pos"))
    val bounds = outcome.agg(
      percentile(col("x"), array(lit(0.2), lit(0.4), lit(0.6), lit(0.8)))
        .as("bx"))
    val bucket = (0 to 3).map(i =>
      (col("x").cast("double") > col("bx")(i)).cast("long"))
      .reduce(_ + _) + lit(1L)
    val byB = outcome.crossJoin(broadcast(bounds))
      .select(bucket.as("w"), col("pos"))
      .groupBy(col("w"))
      .agg(scount(lit(1)).as("n_i"), ssum(col("pos")).as("r_i"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(byB.map(_._1).sorted.toSeq === (1L to 5L), "five quintile buckets")
    val n = byB.map(_._2).sum
    val rTot = byB.map(_._3).sum
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("r_total") === rTot)
    val swr = byB.map(b => b._1 * b._3).sum
    val swn = byB.map(b => b._1 * b._2).sum
    val sw2n = byB.map(b => b._1 * b._1 * b._2).sum
    val a = BigInt(n) * swr - BigInt(rTot) * swn
    val v = BigInt(rTot) * (n - rTot) *
      (BigInt(n) * sw2n - BigInt(swn) * swn)
    if (v == 0) {
      // degenerate corpus (all or none converted — true at sf0.001,
      // where every customer has an order): both engines state NULL
      assert(r.isNullAt(r.fieldIndex("z_e9")), "expected NULL z on V=0")
    } else {
      val z = a.toDouble / math.sqrt(v.toDouble / n.toDouble)
      assert(r.getAs[Long]("z_e9") === math.floor(z * 1e9).toLong)
    }
    // quintiles of a near-uniform balance should have near-equal sizes
    val sizes = byB.map(_._2)
    assert(sizes.max - sizes.min <= n / 5, s"degenerate buckets: $sizes")
  }

  test("q_bh_fdr: step-up rule replays driver-side from the MK z-scores") {
    val mk = SparkEntry.queries("q_mann_kendall")(spark, sf001).collect()
      .map(r => r.getAs[Long]("nationkey") -> r.getAs[Long]("z_e9")).toMap
    val rows = SparkEntry.queries("q_bh_fdr")(spark, sf001).collect()
    assert(rows.length === mk.size)
    val m = rows.head.getAs[Long]("m")
    assert(m === mk.size.toLong)
    // p replay: same A&S 7.1.26 polynomial on the same snapped z — the
    // JVM Math.exp is the same libm Spark's codegen calls, so p_e9 is
    // reproduced exactly
    def pE9(zE9: Long): Long = {
      val az = math.abs(zE9 / 1e9)
      val t = 1.0 / (1.0 + 0.2316419 * az)
      val phi = math.exp(-(az * az) / 2.0) * 0.3989422804014327
      val poly = t * (0.319381530 + t * (-0.356563782 +
        t * (1.781477937 + t * (-1.821255978 + t * 1.330274429))))
      math.floor(math.min(2.0 * (phi * poly), 1.0) * 1e9).toLong
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("p_e9") === pE9(mk(r.getAs[Long]("nationkey"))),
        s"nation ${r.getAs[Long]("nationkey")} p")
    }
    // BH step-up replay: kmax = max rank with p_(i) <= i*0.05/m, reject
    // ALL ranks <= kmax
    val byRank = rows.sortBy(_.getAs[Long]("p_rank"))
    val kmax = byRank.filter(r =>
      r.getAs[Long]("p_e9") * m * 20 <= r.getAs[Long]("p_rank") *
        1000000000L).map(_.getAs[Long]("p_rank")).lastOption.getOrElse(0L)
    byRank.foreach { r =>
      assert(r.getAs[Long]("discovery") ===
        (if (r.getAs[Long]("p_rank") <= kmax) 1L else 0L))
    }
    // monotone property of step-up rejection: discoveries are a prefix
    // of the rank order
    val flags = byRank.map(_.getAs[Long]("discovery"))
    assert(flags === flags.sorted.reverse)
    // ranks are a permutation of 1..m ordered by p
    assert(byRank.map(_.getAs[Long]("p_rank")).toSeq === (1L to m))
    assert(byRank.map(_.getAs[Long]("p_e9")).toSeq ===
      byRank.map(_.getAs[Long]("p_e9")).sorted.toSeq)
  }

  test("q_anova: exact BigInt sum-of-squares replay matches f_e9 bitwise") {
    import org.apache.spark.sql.functions.{col, floor, lit}
    val r = SparkEntry.queries("q_anova")(spark, sf001).collect().head
    val xs = Tables.customer(spark, sf001)
      .select(col("c_mktsegment"),
        floor(col("c_acctbal") * lit(100.0)).cast("long").as("x"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val n = xs.length.toLong
    val k = xs.map(_._1).distinct.length.toLong
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("k") === k)
    // replicate the engine's EXACT arithmetic: BigInt squares, integral
    // (floor) division per group — then the identical double op order,
    // so f_e9 must match bit for bit
    val groups = xs.groupBy(_._1)
    val a = groups.values.map { g =>
      val s = g.map(p => BigInt(p._2)).sum
      (s * s) / g.size
    }.sum
    val s = xs.map(p => BigInt(p._2)).sum
    val q2 = xs.map(p => BigInt(p._2) * BigInt(p._2)).sum
    val cf = (s * s) / BigInt(n)
    val ssb = (a - cf).toDouble
    val ssw = (q2 - a).toDouble
    assert(r.getAs[Double]("ssb") === ssb)
    assert(r.getAs[Double]("ssw") === ssw)
    val f = (ssb / (k.toDouble - 1.0)) / (ssw / (n.toDouble - k.toDouble))
    assert(r.getAs[Long]("f_e9") === math.floor(f * 1e9).toLong)
    val eta2 = ssb / (ssb + ssw)
    assert(math.abs(r.getAs[Double]("eta2") - eta2) < 2e-9)
  }

  test("q_ccf: lag-0 equals Pearson numerator replay; symmetry of the lag axis") {
    import org.apache.spark.sql.functions.{col, floor, lit, sum, to_date, when}
    val rows = SparkEntry.queries("q_ccf")(spark, sf001).collect()
    assert(rows.map(_.getAs[Long]("lag")).toSeq ===
      (-7L to 7L), "one row per lag, ordered")
    val cents = floor(col("value") * lit(100.0)).cast("long")
    val daily = Tables.events(spark, sf001)
      .filter(col("event_type").isin("purchase", "view"))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "purchase", cents)
          .otherwise(0L)).as("a"),
        sum(when(col("event_type") === "view", cents).otherwise(0L)).as("b"))
      .orderBy(col("day"))
      .collect().map(x => (x.getLong(1), x.getLong(2)))
    val nd = daily.length
    val abar = daily.map(p => BigInt(p._1)).sum / nd
    val bbar = daily.map(p => BigInt(p._2)).sum / nd
    val devA = daily.map(p => BigInt(p._1) - abar)
    val devB = daily.map(p => BigInt(p._2) - bbar)
    val da = devA.map(v => v * v).sum
    val db = devB.map(v => v * v).sum
    val den = math.sqrt(da.toDouble * db.toDouble)
    for (lag <- Seq(-3L, 0L, 3L)) {
      val num = (0 until nd).flatMap { i =>
        val j = i + lag.toInt
        if (j >= 0 && j < nd) Some(devA(i) * devB(j)) else None
      }.sum
      val expected = math.floor(num.toDouble / den * 1e9).toLong
      val got = rows.find(_.getAs[Long]("lag") == lag).get
      assert(got.getAs[Long]("ccf_e9") === expected, s"lag $lag")
      assert(got.getAs[Long]("n_pairs") === (nd - math.abs(lag)))
    }
    // every ccf is a correlation: |r| <= 1 (snapped)
    rows.foreach(r0 =>
      assert(math.abs(r0.getAs[Double]("ccf")) <= 1.0 + 1e-9))
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
