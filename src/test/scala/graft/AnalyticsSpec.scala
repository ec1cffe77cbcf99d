package graft

import org.apache.spark.sql.functions._

/** Independent driver-side replays and invariants for the round-11
  * analytics/mining additions. The oracle gate proves Spark == DuckDB;
  * these pins prove both equal the DEFINITION (a third, hand-rolled
  * evaluation of the recursion/statistic on the collected calendar-sized
  * series — bounded by construction). */
class AnalyticsSpec extends SparkSpec {

  private def monthlyCents(): Array[(String, Long)] =
    Tables.orders(spark, sf001)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("m"))
      .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long")).as("c"))
      .orderBy(col("m"))
      .collect().map(r => (r.getString(0), r.getLong(1)))

  test("q_holt_forecast equals the hand-rolled Holt recursion, forecasts are l+h*b") {
    val series = monthlyCents()
    var l = series.head._2.toDouble
    var b = 0.0
    val expected = scala.collection.mutable.Map(series.head._1 -> (l, b))
    series.tail.foreach { case (m, x) =>
      val lp = (x.toDouble + l + b) * 0.5
      b = ((lp - l) + b) * 0.5
      l = lp
      expected(m) = (l, b)
    }
    val rows = SparkEntry.queries("q_holt_forecast")(spark, sf001).collect()
    val fitted = rows.filter(_.getAs[Long]("is_forecast") == 0L)
    assert(fitted.length == series.length)
    fitted.foreach { r =>
      val (el, eb) = expected(r.getAs[String]("month"))
      assert(r.getAs[Double]("level") == el, s"level ${r.getAs[String]("month")}")
      assert(r.getAs[Double]("trend") == eb, s"trend ${r.getAs[String]("month")}")
    }
    val fc = rows.filter(_.getAs[Long]("is_forecast") == 1L)
    assert(fc.length == 6)
    fc.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[String]("month") == s"F${i + 1}")
      assert(r.getAs[Double]("level") == l + (i + 1).toDouble * b)
      assert(r.getAs[Double]("trend") == b)
    }
  }

  test("q_changepoint cusum columns equal the classic max(0, s+d) recursion") {
    val series = monthlyCents()
    val sum = series.map(_._2).sum
    val mu0 = sum / series.length // floored integer mean, same as the query
    var sUp = 0L
    var sDn = 0L
    val expected = series.map { case (m, c) =>
      sUp = math.max(0L, sUp + (c - mu0))
      sDn = math.max(0L, sDn - (c - mu0))
      m -> (sUp, sDn)
    }.toMap
    val rows = SparkEntry.queries("q_changepoint")(spark, sf001).collect()
    assert(rows.length == series.length)
    rows.foreach { r =>
      val (eu, ed) = expected(r.getAs[String]("month"))
      assert(r.getAs[Long]("cusum_up") == eu, s"up ${r.getAs[String]("month")}")
      assert(r.getAs[Long]("cusum_dn") == ed, s"dn ${r.getAs[String]("month")}")
    }
  }

  test("q_benford: chi2 is the sum of per-digit terms; counts cover all orders") {
    val rows = SparkEntry.queries("q_benford")(spark, sf001).collect()
    assert(rows.map(_.getAs[Long]("digit")).toSeq == (1L to 9L))
    val chi2 = rows.head.getAs[Long]("chi2_scaled")
    assert(rows.forall(_.getAs[Long]("chi2_scaled") == chi2))
    assert(rows.map(_.getAs[Long]("dev_scaled")).sum == chi2)
    val nOrders = Tables.orders(spark, sf001).count()
    assert(rows.map(_.getAs[Long]("n_obs")).sum == nOrders)
    // the synthetic fixture FAILS Benford loudly (chi2 >> the 0.001
    // critical value 26.12 at 8 dof) — the audit detects what it should
    assert(chi2 > 26L * 1000000000L)
  }

  test("q_acf: bounded in [-1, 1], pair counts shrink by lag, lag-0 identity") {
    val rows = SparkEntry.queries("q_acf")(spark, sf001).collect()
    assert(rows.map(_.getAs[Long]("lag")).toSeq == (1L to 12L))
    val n = monthlyCents().length
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("acf")) <= 1.0)
      assert(r.getAs[Long]("n_pairs") == n - r.getAs[Long]("lag"))
    }
  }

  test("q_rfm: segments partition the customer base, codes are valid RFM cells") {
    val rows = SparkEntry.queries("q_rfm")(spark, sf001).collect()
    val nCust = Tables.orders(spark, sf001)
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCust)
    rows.foreach { r =>
      val seg = r.getAs[Long]("segment")
      val (a, b, c) = (seg / 100, (seg / 10) % 10, seg % 10)
      assert(a >= 1 && a <= 5 && b >= 1 && b <= 5 && c >= 1 && c <= 5, s"seg $seg")
    }
  }

  test("q_hits: 15 hubs + 15 authorities, scores positive and role-sorted") {
    val rows = SparkEntry.queries("q_hits")(spark, sf001).collect()
    val byRole = rows.groupBy(_.getAs[String]("role"))
    assert(byRole.keySet == Set("hub", "authority"))
    byRole.foreach { case (_, rs) =>
      assert(rs.length == 15)
      val scores = rs.map(_.getAs[Double]("score"))
      assert(scores.forall(_ > 0.0))
      assert(scores.sameElements(scores.sortBy(-_)))
    }
  }

  test("q_table_diff classes partition both snapshots with the derived rates") {
    val rows = SparkEntry.queries("q_table_diff")(spark, sf001).collect()
      .map(r => r.getAs[String]("diff_class") -> r.getAs[Long]("n")).toMap
    val nOrders = Tables.orders(spark, sf001).count()
    assert(rows("inserted") == rows("deleted")) // inserts are re-keyed deletes
    assert(rows.values.sum - rows("inserted") == nOrders) // old side partition
    assert(rows("updated") > 0 && rows("unchanged") > 0)
  }

  test("theta sketch: merge-shape independent bytes, exact below nominal entries") {
    import graft.functions.ThetaSketchAgg.thetaSketch
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.theta.Sketches
    val pc = Tables.orders(spark, sf001)
      .select(col("o_orderpriority").as("prio"), col("o_custkey").as("cust"))
      .distinct()
    def sketchBytes(parts: Int): Map[String, Array[Byte]] =
      pc.repartition(parts).groupBy(col("prio"))
        .agg(thetaSketch(col("cust")).as("sk")).collect()
        .map(r => r.getAs[String]("prio") -> r.getAs[Array[Byte]]("sk")).toMap
    val one = sketchBytes(1)
    val many = sketchBytes(16)
    assert(one.keySet == many.keySet)
    // the compact sketch is a pure function of the input SET: identical
    // bytes regardless of how partial aggregation sliced the data
    one.foreach { case (p, bytes) =>
      assert(java.util.Arrays.equals(bytes, many(p)), s"bytes differ for $p")
    }
    // below 4096 nominal entries the sketch is EXACT: estimate == true count
    val exact = pc.groupBy(col("prio")).count().collect()
      .map(r => r.getAs[String]("prio") -> r.getAs[Long]("count")).toMap
    one.foreach { case (p, bytes) =>
      val sk = Sketches.heapifyCompactSketch(Memory.wrap(bytes))
      assert(!sk.isEstimationMode && sk.getEstimate == exact(p).toDouble,
        s"$p: est ${sk.getEstimate} vs exact ${exact(p)}")
    }
  }

  test("q_impute: fill is the floored present-mean, imputed sum is consistent") {
    SparkEntry.queries("q_impute")(spark, sf001).collect().foreach { r =>
      val fill = r.getAs[Long]("fill_cents")
      val sumPresent = r.getAs[Long]("sum_imputed") -
        r.getAs[Long]("n_missing") * fill
      // fill must be exactly floor(sum_present / n_present)
      assert(fill == sumPresent / r.getAs[Long]("n_present"))
      assert(r.getAs[Long]("n_missing") > 0) // the 5% mask genuinely hit
    }
  }

  test("q_winsorize_approx: thresholds within one bin of the exact percentiles, " +
      "clip bounds hold, clipped mass consistent") {
    val rows = SparkEntry.queries("q_winsorize_approx")(spark, sf001).collect()
    assert(rows.nonEmpty)
    // the rank-walk bound booleans must hold (they tie approx to exact
    // clip counts: rows below the p01 bin < ceil(n/100), mirror above)
    rows.foreach { r =>
      assert(r.getAs[Long]("clip_lo_bounded") == 1L)
      assert(r.getAs[Long]("clip_hi_bounded") == 1L)
      // winsorizing can only move mass INWARD from the raw tails' spread:
      // sums stay within the raw sum +- total clipped rows * grid range
      assert(r.getAs[Long]("n_rows") > 0)
    }
    // third evaluation: the approx thresholds sit within one bin width of
    // the EXACT p01/p99 (the fixed-grid sketch's value-space guarantee)
    val vals = Tables.lineitem(spark, sf001)
      .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
    val n = vals.length
    def exactCeilRank(a: Long, b: Long): Double =
      vals(((n * a + b - 1) / b - 1).toInt) // value at rank ceil(n*a/b)
    val lo = vals.head
    val width = (vals.last - lo) / 4096.0
    val loT = rows.head.getAs[Double]("lo_t9")
    val hiT = rows.head.getAs[Double]("hi_t9")
    val p01 = exactCeilRank(1, 100)
    val p99 = exactCeilRank(99, 100)
    assert(math.abs(loT - p01) <= width + 1e-9,
      s"|lo_t $loT - exact p01 $p01| > bin width $width")
    assert(math.abs(hiT - p99) <= width + 1e-9,
      s"|hi_t $hiT - exact p99 $p99| > bin width $width")
    // and some mass was actually clipped on this fixture
    assert(rows.map(_.getAs[Long]("n_clipped_lo")).sum > 0)
    assert(rows.map(_.getAs[Long]("n_clipped_hi")).sum > 0)
  }

  test("q_ks_test: D equals a hand-rolled sup over the merged empirical CDFs") {
    val rows = Tables.events(spark, sf001)
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("event_type"), floor(col("value") * lit(100.0)).cast("long"))
      .collect()
    val s1 = rows.filter(_.getString(0) == "purchase").map(_.getLong(1)).sorted
    val s2 = rows.filter(_.getString(0) == "view").map(_.getLong(1)).sorted
    val grid = (s1 ++ s2).distinct.sorted
    def cdfCount(s: Array[Long], v: Long): Long = s.count(_ <= v).toLong
    val dNum = grid.map(v =>
      math.abs(cdfCount(s1, v) * s2.length - cdfCount(s2, v) * s1.length)).max
    val r = SparkEntry.queries("q_ks_test")(spark, sf001).collect().head
    assert(r.getAs[Long]("n1") == s1.length && r.getAs[Long]("n2") == s2.length)
    val expectedD = (dNum * 1000000000L / (s1.length.toLong * s2.length)).toDouble / 1e9
    assert(r.getAs[Double]("d_stat") == expectedD,
      s"d_stat ${r.getAs[Double]("d_stat")} vs replay $expectedD")
    // critical value is positive and the reject flag is consistent
    assert(r.getAs[Double]("d_crit_05") > 0.0)
    assert((r.getAs[Long]("reject_05") == 1L) ==
      (r.getAs[Double]("d_stat") > r.getAs[Double]("d_crit_05")))
  }

  test("q_wasserstein: W1 equals a hand-rolled CDF-gap integral, and bounds KS") {
    val rows = Tables.events(spark, sf001)
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("event_type"), floor(col("value") * lit(100.0)).cast("long"))
      .collect()
    val s1 = rows.filter(_.getString(0) == "purchase").map(_.getLong(1)).sorted
    val s2 = rows.filter(_.getString(0) == "view").map(_.getLong(1)).sorted
    val grid = (s1 ++ s2).distinct.sorted
    def cdf(s: Array[Long], v: Long): Long = s.count(_ <= v).toLong
    val wNum = grid.zip(grid.tail).map { case (x, xn) =>
      BigInt(math.abs(cdf(s1, x) * s2.length - cdf(s2, x) * s1.length)) *
        BigInt(xn - x)
    }.sum
    val nn = BigInt(s1.length.toLong * s2.length)
    val expected = ((wNum * BigInt(1000000000L)) / nn).toDouble / 1e9
    val r = SparkEntry.queries("q_wasserstein")(spark, sf001).collect().head
    assert(r.getAs[Double]("w1_cents") == expected,
      s"w1 ${r.getAs[Double]("w1_cents")} vs replay $expected")
    // W1 >= D * min-gap is not generally tight, but W1 must be positive
    // here and consistent with the KS statistic over the same grid:
    // W1 <= D * range (|F1-F2| <= D everywhere)
    val ks = SparkEntry.queries("q_ks_test")(spark, sf001).collect().head
    val range = (grid.last - grid.head).toDouble
    assert(r.getAs[Double]("w1_cents") > 0.0)
    assert(r.getAs[Double]("w1_cents") <= ks.getAs[Double]("d_stat") * range + 1e-6)
  }

  test("q_t_closeness: t_dist equals a hand-rolled total-variation replay") {
    val rows = Tables.orders(spark, sf001)
      .select(date_format(col("o_orderdate"), "yyyy-MM"),
        col("o_orderpriority"), col("o_orderstatus"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getString(2)))
    val global = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nn = rows.length.toLong
    val statuses = global.keySet
    val out = SparkEntry.queries("q_t_closeness")(spark, sf001).collect()
    assert(out.nonEmpty)
    val byClass = rows.groupBy(_._1)
    out.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val members = byClass(key).map(_._2)
      val nc = members.length.toLong
      assert(r.getAs[Long]("class_size") == nc)
      val tnum = statuses.toSeq.map { v =>
        val ncv = members.count(_ == v).toLong
        (BigInt(ncv) * BigInt(nn) - BigInt(global(v)) * BigInt(nc)).abs
      }.sum
      val expected =
        ((tnum * BigInt(1000000000L)) / (BigInt(2) * BigInt(nc) * BigInt(nn)))
          .toDouble / 1e9
      assert(r.getAs[Double]("t_dist") == expected,
        s"$key: ${r.getAs[Double]("t_dist")} vs replay $expected")
      // t9 is an exact integer on the 1e9 grid, and 1e-9 steps are far
      // coarser than double spacing near 0.2 — the flag is recomputable
      // from the double without an epsilon
      assert((r.getAs[Long]("exceeds_t") == 1L) == (expected > 0.2))
    }
    // the audit is non-vacuous BOTH ways on this fixture: some classes
    // exceed t (status is nearly a function of order date) and t_dist
    // is a genuine distance (all in [0, 1])
    assert(out.exists(_.getAs[Long]("exceeds_t") == 1L))
    assert(out.forall(r => r.getAs[Double]("t_dist") >= 0.0 &&
      r.getAs[Double]("t_dist") <= 1.0))
  }

  test("q_prefixspan: supports equal a hand-rolled subsequence containment scan") {
    // third evaluation: brute-force greedy subsequence containment over
    // the collected per-user event-type lists (bounded: sf0.001)
    val perUser = Tables.events(spark, sf001)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rs) =>
        u -> rs.sortBy(r => (r.getLong(2), r.getLong(3)))
          .map(_.getString(1)).toSeq
      }
    def contains(seq: Seq[String], pat: Seq[String]): Boolean = {
      var i = 0
      seq.foreach { t => if (i < pat.length && t == pat(i)) i += 1 }
      i == pat.length
    }
    val nu = perUser.size.toLong
    val rows = SparkEntry.queries("q_prefixspan")(spark, sf001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val pat = r.getAs[String]("seq").split('>').toSeq
      assert(pat.length == r.getAs[Long]("len"))
      val expected = perUser.valuesIterator.count(contains(_, pat)).toLong
      assert(r.getAs[Long]("support") == expected,
        s"${r.getAs[String]("seq")}: spark ${r.getAs[Long]("support")} vs replay $expected")
      assert(r.getAs[Long]("support") * 5 >= nu)
      assert(r.getAs[Long]("n_users") == nu)
    }
    // the board must not be single-level: the fixture genuinely yields
    // frequent length-2 and length-3 sequences
    assert(rows.exists(_.getAs[Long]("len") == 2L))
    assert(rows.exists(_.getAs[Long]("len") == 3L))
  }

  test("q_theil_sen equals the hand-rolled exact-rational median of pairwise slopes") {
    // third evaluation with BigInt RATIONALS sorted by true cross-
    // multiplication order — no order-key scaling, no integral division
    // until the final e6 snap — so a shared misformulation of the order
    // isomorphism or the even-median assembly in BOTH engines would
    // fail here
    val m = Tables.orders(spark, sf001)
      .join(Tables.customer(spark, sf001), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"),
        (year(col("o_orderdate")) * lit(12) + month(col("o_orderdate")))
          .cast("long").as("mi"))
      .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long")).as("rev"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val m0 = m.map(_._2).min
    val bySeg = m.groupBy(_._1).view.mapValues(
      _.map(t => (BigInt(t._2 - m0), BigInt(t._3))).sortBy(_._1)).toMap
    // rational comparator: a/b < c/d  <=>  a*d < c*b for b, d > 0
    def lt(x: (BigInt, BigInt), y: (BigInt, BigInt)): Boolean =
      x._1 * y._2 < y._1 * x._2
    def trunc(n: BigInt, d: BigInt): BigInt = n / d // BigInt / truncates toward zero
    val rows = SparkEntry.queries("q_theil_sen")(spark, sf001).collect()
    assert(rows.length == bySeg.count(_._2.length >= 2))
    rows.foreach { r =>
      val seg = r.getAs[String]("seg")
      val pts = bySeg(seg)
      val slopes = (for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield (pts(j)._2 - pts(i)._2, pts(j)._1 - pts(i)._1)) // (dy, dx)
        .sortWith(lt)
      val np = slopes.length
      assert(r.getAs[Long]("n_pairs") == np.toLong)
      assert(r.getAs[Long]("n_months") == pts.length.toLong)
      val (dyl, dxl) = slopes((np + 1) / 2 - 1)
      val (dyh, dxh) = slopes((np + 2) / 2 - 1)
      val num = dyl * dxh + dyh * dxl
      val den = 2 * dxl * dxh
      assert(r.getAs[Long]("slope_e6") == trunc(num * 1000000, den).toLong,
        s"$seg slope")
      val resid = pts.map { case (x, rev) => rev * den - num * x }.sorted
      val nm = pts.length
      val rnl = resid((nm + 1) / 2 - 1)
      val rnh = resid((nm + 2) / 2 - 1)
      assert(r.getAs[Long]("intercept_e6") ==
        trunc((rnl + rnh) * 1000000, 2 * den).toLong, s"$seg intercept")
      assert(r.getAs[Double]("slope") ==
        r.getAs[Long]("slope_e6").toDouble / 1e6)
    }
    // the estimator must genuinely differ from a single pair: every
    // segment needs a non-degenerate pair set
    assert(rows.forall(_.getAs[Long]("n_pairs") > 10L))
  }

  test("q_dbscan equals a hand-rolled union-find DBSCAN on the same cell graph") {
    // third evaluation of everything DOWNSTREAM of the frozen cell
    // assignment: neighbor degrees, the core threshold, component
    // labeling (the query uses pointer-jumping; this replay uses
    // union-find), border min-label assignment, and noise accounting
    val asg = ops.SimilarityQueries.cellAssignments(spark, sf001)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"),
        r.getAs[Seq[Float]]("embedding").toArray))
    val n = asg.length
    val nbr = Array.fill(n)(List.empty[Int])
    for (i <- 0 until n; j <- 0 until n)
      if (i != j && asg(i)._2 == asg(j)._2 &&
          graft.functions.VectorKernels.cosineFloat(asg(i)._3, asg(j)._3)
            >= ops.SimilarityQueries.DbscanTau)
        nbr(i) ::= j
    val core = (0 until n).map(i =>
      1 + nbr(i).size >= ops.SimilarityQueries.DbscanMinPts).toArray
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    for (i <- 0 until n if core(i); j <- nbr(i) if core(j)) {
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
    }
    // component label = min core VEC_ID (not index) in the component
    val lbl = scala.collection.mutable.Map.empty[Int, Long]
    for (i <- 0 until n if core(i)) {
      val r = find(i)
      lbl(r) = math.min(lbl.getOrElse(r, Long.MaxValue), asg(i)._1)
    }
    val clusterOf = scala.collection.mutable.Map.empty[Long, Long] // vec_id -> cluster
    for (i <- 0 until n if core(i)) clusterOf(asg(i)._1) = lbl(find(i))
    var nBorder = 0
    val borderCl = scala.collection.mutable.Map.empty[Long, Long]
    for (i <- 0 until n if !core(i)) {
      val coreNbrLabels = nbr(i).filter(core).map(j => lbl(find(j)))
      if (coreNbrLabels.nonEmpty) { borderCl(asg(i)._1) = coreNbrLabels.min; nBorder += 1 }
    }
    val expected = (clusterOf.groupBy(_._2).view.mapValues(_.size).toMap,
      borderCl.groupBy(_._2).view.mapValues(_.size).toMap)
    val rows = SparkEntry.queries("q_dbscan")(spark, sf001).collect()
    val clusterRows = rows.filter(_.getLong(0) >= 0)
    assert(clusterRows.map(_.getLong(0)).toSet == expected._1.keySet)
    clusterRows.foreach { r =>
      val c = r.getLong(0)
      assert(r.getLong(2) == expected._1(c).toLong, s"cluster $c n_core")
      assert(r.getLong(3) == expected._2.getOrElse(c, 0).toLong, s"cluster $c n_border")
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3), s"cluster $c n_points")
    }
    val noiseRow = rows.find(_.getLong(0) == -1L).get
    assert(noiseRow.getLong(1) == (n - clusterOf.size - nBorder).toLong)
    // non-degenerate: the fixture genuinely produces all three classes
    assert(clusterRows.length > 1 && nBorder > 0 && noiseRow.getLong(1) > 0)
  }

  test("q_isotonic equals the PAVA stack (the Barlow minimax theorem, live)") {
    // The query computes iso via max-min over subrange means; this
    // replay runs the POOL-ADJACENT-VIOLATORS stack in BigInt rationals
    // — a genuinely different algorithm. Their agreement is the classic
    // isotonic-regression theorem, so a shared misformulation of either
    // side cannot hide.
    def pavaE6(ys: Array[Long]): Array[Long] = {
      case class Block(var sum: BigInt, var cnt: Long)
      val st = scala.collection.mutable.ArrayBuffer.empty[Block]
      ys.foreach { y =>
        st += Block(BigInt(y), 1L)
        while (st.length >= 2 &&
            st(st.length - 2).sum * st.last.cnt >=
              st.last.sum * st(st.length - 2).cnt) {
          val t = st.remove(st.length - 1)
          st.last.sum += t.sum; st.last.cnt += t.cnt
        }
      }
      st.iterator.flatMap(b =>
        Iterator.fill(b.cnt.toInt)((b.sum * 1000000 / b.cnt).toLong)).toArray
    }
    // the stack must genuinely pool on a violating series
    assert(pavaE6(Array(5L, 3L, 4L, 10L)).toSeq ==
      Seq(4000000L, 4000000L, 4000000L, 10000000L))
    val m = Tables.orders(spark, sf001)
      .join(Tables.customer(spark, sf001), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"),
        (year(col("o_orderdate")) * lit(12) + month(col("o_orderdate")))
          .cast("long").as("mi"))
      .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long")).as("rev"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySeg = m.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toArray).toMap
    val rows = SparkEntry.queries("q_isotonic")(spark, sf001).collect()
    assert(rows.length == m.length)
    val expected = bySeg.view.mapValues(pavaE6).toMap
    rows.foreach { r =>
      val seg = r.getAs[String]("seg")
      val i = r.getAs[Long]("i").toInt
      assert(r.getAs[Long]("fit_e6") == expected(seg)(i - 1),
        s"$seg month $i: ${r.getAs[Long]("fit_e6")} vs PAVA ${expected(seg)(i - 1)}")
    }
    // the fit is genuinely monotone per segment and genuinely POOLS
    // somewhere (a fit equal to the raw series would be vacuous)
    rows.groupBy(_.getAs[String]("seg")).foreach { case (_, rs) =>
      val fits = rs.sortBy(_.getAs[Long]("i")).map(_.getAs[Long]("fit_e6"))
      assert(fits.zip(fits.tail).forall { case (x, y) => x <= y })
    }
    assert(rows.exists(r =>
      r.getAs[Long]("fit_e6") != r.getAs[Long]("rev") * 1000000L))
  }

  /** Hand-rolled Spearman rho_e9 via POSITIONAL tie-averaged ranks (sort
    * the multiset, average positions across each tie group — not the
    * query's grid-cum formulation) + BigInt moments; the shared final
    * double assembly num / (sqrt(ax) * sqrt(ay)), floor-snapped e9. */
  private def spearmanE9(xs: Array[Long], ys: Array[Long]): Long = {
    def ranks2(v: Array[Long]): Map[Long, BigInt] = {
      val sorted = v.sorted
      // 2-scaled average rank of each distinct value: positions are
      // 1-based; a tie group spanning positions p..p+c-1 averages to
      // (2p + c - 1) / 2
      val out = scala.collection.mutable.Map.empty[Long, BigInt]
      var i = 0
      while (i < sorted.length) {
        var j = i
        while (j < sorted.length && sorted(j) == sorted(i)) j += 1
        out(sorted(i)) = BigInt(2 * (i + 1) + (j - i) - 1)
        i = j
      }
      out.toMap
    }
    val rx = ranks2(xs)
    val ry = ranks2(ys)
    val n = BigInt(xs.length)
    var sx, sy, sxx, syy, sxy = BigInt(0)
    xs.indices.foreach { i =>
      val a = rx(xs(i)); val b = ry(ys(i))
      sx += a; sy += b; sxx += a * a; syy += b * b; sxy += a * b
    }
    val num = n * sxy - sx * sy
    val ax = n * sxx - sx * sx
    val ay = n * syy - sy * sy
    math.floor(num.toDouble /
      (math.sqrt(ax.toDouble) * math.sqrt(ay.toDouble)) * 1e9).toLong
  }

  test("q_spearman equals a positional-rank replay; monotone data scores ±1") {
    // the helper itself must detect monotone dependence the fixture
    // honestly lacks (quantity and price are drawn independently there):
    // perfect increasing => 1, decreasing => -1, both WITH tie groups
    // (>= 999999999, not == 1e9: the floor snap may land one ulp short
    // when sqrt(ax)*sqrt(ay) rounds a hair above the exact num)
    val up = Array(1L, 2L, 2L, 3L, 5L, 8L, 8L, 9L)
    val upY = Array(10L, 20L, 20L, 30L, 50L, 80L, 80L, 90L)
    assert(spearmanE9(up, upY) >= 999999999L)
    assert(spearmanE9(up, upY.map(-_)) <= -999999999L)
    val rows = Tables.lineitem(spark, sf001)
      .select(col("l_quantity").cast("long"),
        floor(col("l_extendedprice") * lit(100.0)).cast("long"))
      .collect()
    val xs = rows.map(_.getLong(0))
    val ys = rows.map(_.getLong(1))
    val r = SparkEntry.queries("q_spearman")(spark, sf001).collect().head
    assert(r.getAs[Long]("n") == xs.length.toLong)
    assert(r.getAs[Long]("rho_e9") == spearmanE9(xs, ys),
      s"rho_e9 ${r.getAs[Long]("rho_e9")} vs replay ${spearmanE9(xs, ys)}")
    assert(r.getAs[Double]("rho") == r.getAs[Long]("rho_e9").toDouble / 1e9)
  }

  /** Hand-rolled JSD in nats with the query's P43 snap: counts -> p/q/m
    * doubles in the query's op order, 0 log 0 handled on the count. */
  private def jsdP43(cs: Array[(Long, Long)]): Double = {
    val P43 = 8796093022208.0
    val na = cs.map(_._1).sum.toDouble
    val nb = cs.map(_._2).sum.toDouble
    cs.map { case (ca, cb) =>
      val p = ca.toDouble / na
      val q = cb.toDouble / nb
      val m = (p + q) / 2.0
      val t = (if (ca == 0L) 0.0 else p * math.log(p / m)) * 0.5 +
        (if (cb == 0L) 0.0 else q * math.log(q / m)) * 0.5
      BigInt(math.floor(t * P43).toLong)
    }.sum.toDouble / P43
  }

  test("q_jsd equals a hand-rolled replay; disjoint mixes score ln 2") {
    // identical mixes => 0; fully disjoint supports => ln 2 (within one
    // P43 snap unit); zero cells are finite (the reason JSD is the
    // production drift metric over raw KL)
    assert(jsdP43(Array((10L, 10L), (20L, 20L))) == 0.0)
    val disjoint = jsdP43(Array((10L, 0L), (0L, 10L)))
    assert(math.abs(disjoint - math.log(2.0)) < 1e-9)
    val rows = Tables.events(spark, sf001)
      .select(col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val mid = (rows.map(_._2).min + rows.map(_._2).max) / 2
    val byType = rows.groupBy(_._1).view.mapValues { rs =>
      (rs.count(_._2 <= mid).toLong, rs.count(_._2 > mid).toLong)
    }.toMap
    val r = SparkEntry.queries("q_jsd")(spark, sf001).collect().head
    assert(r.getAs[Long]("na") == byType.values.map(_._1).sum)
    assert(r.getAs[Long]("nb") == byType.values.map(_._2).sum)
    assert(r.getAs[Long]("n_types") == byType.size.toLong)
    val expected = jsdP43(byType.values.toArray)
    assert(r.getAs[Double]("jsd_nats") == expected,
      s"jsd ${r.getAs[Double]("jsd_nats")} vs replay $expected")
    assert(r.getAs[Double]("jsd_nats") >= 0.0 &&
      r.getAs[Double]("jsd_nats") <= math.log(2.0))
  }

  /** Hand-rolled Kendall tau_e9 over (a, b) value pairs: all C(n,2) sign
    * products, tau-b tie terms, the query's shared double assembly. */
  private def kendallE9(xs: Array[(Long, Long)]): Long = {
    var nc, nd, t1, t2, n0 = 0L
    for (i <- xs.indices; j <- (i + 1) until xs.length) {
      val sa = java.lang.Long.signum(xs(i)._1 - xs(j)._1).toLong
      val sb = java.lang.Long.signum(xs(i)._2 - xs(j)._2).toLong
      n0 += 1
      if (sa * sb == 1L) nc += 1
      if (sa * sb == -1L) nd += 1
      if (sa == 0L) t1 += 1
      if (sb == 0L) t2 += 1
    }
    math.floor((nc - nd).toDouble /
      (math.sqrt((n0 - t1).toDouble) * math.sqrt((n0 - t2).toDouble)) *
      1e9).toLong
  }

  test("q_kendall equals an all-pairs replay; planted rankings score ±1") {
    // perfect agreement => +1, full reversal => -1, each within one
    // floor-snap unit (sqrt(n0)*sqrt(n0) rounds an ulp off n0, so the
    // ratio can floor one unit past the exact ±1e9)
    val agree = Array((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
    assert(math.abs(kendallE9(agree) - 1000000000L) <= 1L)
    assert(math.abs(kendallE9(agree.map { case (a, b) => (a, -b) })
      + 1000000000L) <= 1L)
    // a tie in one list lands in t1/t2, not in nc/nd
    assert(kendallE9(Array((1L, 1L), (1L, 2L), (2L, 3L))) < 1000000000L)
    val li = Tables.lineitem(spark, sf001).select(
      col("l_suppkey").cast("long"),
      datediff(col("l_shipdate").cast("date"),
        to_date(lit("1970-01-01"))).cast("long"),
      floor(col("l_extendedprice") * lit(100.0)).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mid = (li.map(_._2).min + li.map(_._2).max) / 2
    val sup = li.groupBy(_._1).map { case (sk, rows) =>
      (sk, rows.filter(_._2 <= mid).map(_._3).sum,
        rows.filter(_._2 > mid).map(_._3).sum,
        rows.map(_._3).sum)
    }.toArray.sortBy(t => (-t._4, t._1)).take(10)
    val r = SparkEntry.queries("q_kendall")(spark, sf001).collect().head
    assert(r.getAs[Long]("n0") == sup.length.toLong * (sup.length - 1) / 2)
    assert(r.getAs[Long]("tau_e9") ==
      kendallE9(sup.map(t => (t._2, t._3))),
      s"tau_e9 ${r.getAs[Long]("tau_e9")} vs replay")
    assert(r.getAs[Double]("tau") == r.getAs[Long]("tau_e9").toDouble / 1e9)
  }

  /** Hand-rolled q_mad per-group columns from a sorted value multiset:
    * (n, med2, mad4, n_outliers, max_z_e6 or None when mad4 == 0). */
  private def madReplay(vs: Array[Long])
      : (Long, Long, Long, Option[Long], Option[Long]) = {
    val s = vs.sorted
    val n = s.length
    val med2 = s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)
    val ds = vs.map(v => math.abs(2 * v - med2)).sorted
    val mad4 = ds((n + 1) / 2 - 1) + ds((n + 2) / 2 - 1)
    if (mad4 == 0L) (n.toLong, med2, mad4, None, None)
    else {
      val out = ds.count(d => 13490L * d > 35000L * mad4).toLong
      val mz = (BigInt(13490) * ds.last * 1000000 /
        (BigInt(10000) * mad4)).toLong
      (n.toLong, med2, mad4, Some(out), Some(mz))
    }
  }

  test("q_mad equals a sorted-multiset replay; planted outliers fire the rule") {
    // the modified-z rule must fire on planted data (the fixture's
    // order totals are honestly tail-free, all groups report 0):
    // 1..101 with one gross outlier => exactly that point flagged
    val planted = (1L to 101L).toArray :+ 100000L
    val (_, _, _, Some(nOut), Some(mz)) = madReplay(planted)
    assert(nOut == 1L && mz > 3500000L)
    // and a degenerate over-half-constant group snaps to None
    val (_, _, m0, o0, _) = madReplay(Array(5L, 5L, 5L, 5L, 9L))
    assert(m0 == 0L && o0.isEmpty)
    val rows = Tables.orders(spark, sf001)
      .select(col("o_orderpriority"),
        floor(col("o_totalprice") * lit(100.0)).cast("long"))
      .collect()
    val byGrp = rows.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1))).toMap
    val got = SparkEntry.queries("q_mad")(spark, sf001).collect()
    assert(got.length == byGrp.size)
    got.foreach { r =>
      val (n, med2, mad4, out, mz6) = madReplay(byGrp(r.getAs[String]("grp")))
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Double]("median") == med2.toDouble / 2.0)
      assert(r.getAs[Double]("mad") == mad4.toDouble / 4.0)
      assert(Option(r.getAs[Any]("n_outliers")).map(_.asInstanceOf[Long]) == out)
      assert(Option(r.getAs[Any]("max_z_e6")).map(_.asInstanceOf[Long]) == mz6)
    }
  }

  test("q_closeness equals a hand-rolled driver-side BFS from the same landmarks") {
    import org.apache.spark.sql.functions.{col, count => scount, lit}
    val rows = SparkEntry.queries("q_closeness")(spark, sf001).collect()
    assert(rows.length === 5)
    // rebuild the support-2 basket graph exactly as the query family does
    val li = Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val und = li.as("x").join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .agg(scount(lit(1)).as("cnt")).filter(col("cnt") >= 2)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (und.map(e => e._1 -> e._2) ++ und.map(e => e._2 -> e._1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val deg = adj.map { case (k, v) => k -> v.size.toLong }
    val landmarks = deg.toSeq.sortBy { case (n, dg) => (-dg, n) }
      .take(5).map(_._1)
    assert(rows.map(_.getAs[Long]("lm")).sorted.toSeq ===
      landmarks.sorted)
    rows.foreach { r =>
      val lm = r.getAs[Long]("lm")
      // BFS to depth 4
      var frontier = Set(lm); var visited = Set(lm)
      var nReached = 0L; var sumDist = 0L
      for (dist <- 1 to 4) {
        frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- visited
        visited ++= frontier
        nReached += frontier.size
        sumDist += dist.toLong * frontier.size
      }
      assert(r.getAs[Long]("deg") === deg(lm))
      assert(r.getAs[Long]("n_reached") === nReached, s"lm $lm reach")
      assert(r.getAs[Long]("sum_dist") === sumDist, s"lm $lm dist")
      assert(r.getAs[Long]("closeness_e9") ===
        (BigInt(nReached) * 1000000000L / BigInt(sumDist)).toLong)
      // bounded-horizon closeness is at most 1 (every reached node is
      // at distance >= 1)
      assert(r.getAs[Double]("closeness") <= 1.0)
    }
  }

  test("q_modularity equals the Newman definition replayed over the LPA labels") {
    import org.apache.spark.sql.functions.col
    val r = SparkEntry.queries("q_modularity")(spark, sf001).collect().head
    val labels = graft.ops.ExtendedQueries.lpaLabels(spark, sf001)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val und = graft.ops.ExtendedQueries.basketEdges(spark, sf001)
      .select(col("a"), col("b")).collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val m = und.length.toLong
    assert(r.getAs[Long]("m_edges") === m)
    val eIntra = und.count { case (a, b) => labels(a) == labels(b) }.toLong
    assert(r.getAs[Long]("e_intra") === eIntra)
    val degByC = und.flatMap { case (a, b) => Seq(labels(a), labels(b)) }
      .groupBy(identity).map { case (c, g) => c -> g.length.toLong }
    assert(r.getAs[Long]("n_communities") === degByC.size.toLong)
    // exact-rational Newman modularity, truncated to the e9 grid the
    // same way the engine truncates (toward zero on both engines)
    val sumD2 = degByC.values.map(d => BigInt(d) * d).sum
    val num = (BigInt(4) * m * eIntra - sumD2) * 1000000000L
    val den = BigInt(4) * m * m
    assert(r.getAs[Long]("modularity_e9") === ((num - num % den) / den).toLong)
    // sanity: the partition's score beats the all-singletons partition
    // (whose intra-edge term is zero)
    val singleton = (-sumD2 * 1000000000L) / den
    assert(BigInt(r.getAs[Long]("modularity_e9")) >= singleton)
  }

  test("q_diversity equals hand-rolled Shannon/Simpson over the source mix") {
    val rows = SparkEntry.queries("q_diversity")(spark, sf001).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf001)
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byLang = docs.groupBy(_._1)
    assert(rows.length === byLang.size)
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val counts = byLang(lang).groupBy(_._2).map(_._2.length.toLong).toSeq
      val n = counts.sum
      assert(r.getAs[Long]("n_docs") === n)
      assert(r.getAs[Long]("n_sources") === counts.length.toLong)
      // real-valued entropy replay; the engine's 2^43 per-term snap
      // loses < n_sources * 2^-43
      val h = -counts.map { c =>
        val p = c.toDouble / n.toDouble; p * math.log(p)
      }.sum
      assert(math.abs(r.getAs[Double]("shannon_nats") - h) < 1e-9,
        s"$lang entropy")
      // Simpson exact rational replay
      val num = counts.map(c => BigInt(c) * (c - 1)).sum
      val expected =
        if (n <= 1) null
        else (num * 1000000000L / (BigInt(n) * (n - 1))).toLong
      assert(r.getAs[Long]("simpson_e9") === expected, s"$lang simpson")
      // collision probability of a mix with k sources is at least 1/k
      // of ... the uniform lower bound: simpson >= (n/k - 1)/(n - 1)
      assert(r.getAs[Double]("simpson") <= 1.0 &&
        r.getAs[Double]("simpson") >= 0.0)
    }
  }
}
