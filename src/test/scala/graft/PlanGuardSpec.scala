package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}

/** Plan-shape regression guards: the scale properties PLANS.md documents,
  * asserted structurally so an edit can't silently reintroduce a corpus
  * shuffle, drop a top-k pushdown, or lose a broadcast. Counts come from
  * the AQE-final executed plan of the inspected DataFrame itself. */
class PlanGuardSpec extends SparkSpec {

  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect() // finalize THIS QueryExecution's adaptive plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    // flatten across AQE's query-stage / reused-exchange wrappers, whose
    // materialized subtrees are NOT in `children`
    val wrapped: Seq[SparkPlan] = p match {
      case q: QueryStageExec => Seq(q.plan)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => Nil
    }
    p +: (p.children ++ p.subqueries ++ wrapped).flatMap(collectAll)
  }

  private def shuffles(p: SparkPlan): Int =
    collectAll(p).count(_.isInstanceOf[ShuffleExchangeLike])
  private def broadcasts(p: SparkPlan): Int =
    collectAll(p).count(_.isInstanceOf[BroadcastExchangeLike])

  test("q15_top_supplier: the argmax is a 1-row aggregate, never a window") {
    // Q15's max-over-view must stay a 1-row max aggregate joined back —
    // an unpartitioned window (max() OVER ()) over the per-supplier
    // revenue relation would single-partition a relation that grows
    // with SF. A refactor reintroducing the window fails here.
    import org.apache.spark.sql.execution.window.WindowExec
    val p = finalPlan(SparkEntry.queries("q15_top_supplier")(spark, sf001))
    assert(!collectAll(p).exists(_.isInstanceOf[WindowExec]),
      s"argmax must not be an unpartitioned window:\n${p.toString.take(1200)}")
  }

  test("q_triangles_sampled: the Doulion estimate lands near the exact count") {
    // p = 0.3 deterministic edge sampling; Tsourakakis et al.'s
    // concentration keeps the 1/p^3-scaled estimate close at this graph
    // size (exact 125,968 triangles at sf0.001). The band is generous —
    // the sample is FIXED (hash-based), so this is a regression pin on
    // the estimator arithmetic, not a probabilistic flake.
    val exact = SparkEntry.queries("q_triangles")(spark, sf001)
      .collect().head.getAs[Long]("n_triangles").toDouble
    val est = SparkEntry.queries("q_triangles_sampled")(spark, sf001)
      .collect().head.getAs[Double]("est_triangles")
    assert(math.abs(est / exact - 1.0) < 0.25,
      s"estimate $est vs exact $exact off by ${est / exact - 1.0}")
  }

  test("q_knn: zero shuffles; corpus flows scan->project->top-k") {
    val p = finalPlan(SparkEntry.queries("q_knn")(spark, sf001))
    assert(shuffles(p) == 0, s"corpus side must not shuffle:\n$p")
    assert(broadcasts(p) == 1, "the 1-row query vector broadcasts")
    assert(p.toString.contains("TakeOrderedAndProject"), "top-k pushdown lost")
  }

  test("q_bm25: only the 1-row stats aggregate shuffles") {
    val p = finalPlan(SparkEntry.queries("q_bm25")(spark, sf001))
    assert(shuffles(p) == 1, s"expected only the stats agg exchange:\n$p")
    assert(broadcasts(p) == 1)
    assert(p.toString.contains("TakeOrderedAndProject"))
  }

  test("q_simhash: narrow kernel pipeline, sort-only exchange") {
    val p = finalPlan(SparkEntry.queries("q_simhash")(spark, sf001))
    assert(shuffles(p) <= 1, s"simhash must stay narrow before the sort:\n$p")
    assert(p.toString.contains("simhash32"), "codegen kernel missing from plan")
  }

  test("q5_star: all dimension joins broadcast, no dim-side shuffle blowup") {
    val p = finalPlan(SparkEntry.queries("q5_star")(spark, sf001))
    assert(broadcasts(p) >= 3, s"dims must broadcast:\n${p.toString.take(1500)}")
  }

  test("q_priority_sample: every window consumes the bounded top-(N+1) relation") {
    // the rank window is correct ONLY because it runs post-limit on 51
    // rows (SelectionQueries.scala); a refactor hoisting it above the
    // limit would silently turn it into a corpus-wide single-partition
    // sort — pin the shape: each WindowExec must have the bounded
    // TakeOrderedAndProject/GlobalLimit(PrioN+1) below it
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.{GlobalLimitExec, TakeOrderedAndProjectExec}
    val n1 = graft.ops.SelectionQueries.PrioN + 1
    val p = finalPlan(SparkEntry.queries("q_priority_sample")(spark, sf001))
    val wins = collectAll(p).collect { case w: WindowExec => w }
    assert(wins.nonEmpty, s"expected the rank window in the plan:\n${p.toString.take(1200)}")
    wins.foreach { w =>
      val bounded = collectAll(w).exists {
        case t: TakeOrderedAndProjectExec => t.limit == n1
        case g: GlobalLimitExec => g.limit == n1
        case _ => false
      }
      assert(bounded,
        s"window must run on the post-limit($n1) relation, not the corpus:\n${w.toString.take(1200)}")
    }
  }

  test("q21_last_shipper: the 100 TB regime is all sort-merge, narrow keyed exchanges") {
    // at fixture scale AQE broadcasts the compact lineitem projection
    // (size-based, unhinted); at 100 TB both correlated joins fall back
    // to order-key sort-merge. Exercise that regime by disabling
    // broadcasts: the result must not change, every lineitem-side join
    // must be SortMergeJoin (no nested loop, no cartesian), and the
    // exchange count stays bounded (the pruned semi/anti probe
    // projections + the left chain + orders + the final agg — never a
    // per-row or per-order blowup).
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    val withBc = SparkEntry.queries("q21_last_shipper")(spark, sf001)
      .collect().map(_.toString).toSeq
    try {
      spark.conf.set(key, "-1")
      val df = SparkEntry.queries("q21_last_shipper")(spark, sf001)
      val noBc = df.collect().map(_.toString).toSeq
      assert(noBc == withBc, "plan regime must not change the result")
      val p = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      val all = collectAll(p)
      assert(all.exists(_.isInstanceOf[SortMergeJoinExec]),
        s"expected the sort-merge regime:\n${p.toString.take(1200)}")
      assert(!all.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]) &&
        !all.exists(_.isInstanceOf[CartesianProductExec]),
        "correlated EXISTS/NOT EXISTS must stay equi-joins")
      // fixed-count regime: left chain + semi probe + anti probe +
      // orders + final agg (5) plus the now-unhinted supplier join's
      // suppkey exchanges once broadcasts are off (supplier grows with
      // SF, so it carries no broadcast hint — only the 25-row nation
      // does, and a hinted 25-row broadcast is safe at any scale)
      val nShuf = shuffles(p)
      assert(nShuf <= 9, s"exchange count blew up: $nShuf\n${p.toString.take(1200)}")
    } finally spark.conf.set(key, prev)
  }

  test("no CartesianProduct in ANY registry plan; BNLJ broadcast sides are query-sized") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.adaptive.BroadcastQueryStageExec
    // Every registry query is executed at sf0.001 and its AQE-FINAL plan
    // inspected: no CartesianProduct anywhere, and every nested-loop
    // join's broadcast side must be query-sized — bounded probe sets
    // (literal-filtered ids), 1-row aggregates, centroid tables — never
    // the corpus. Row counts come from the materialized broadcast stage's
    // runtime statistics; corpus tables at sf0.001 are >= 500 rows, so
    // the 100-row bound separates the two regimes.
    SparkEntry.registry.foreach { q =>
      val plan = finalPlan(q.fn(spark, sf001))
      val all = collectAll(plan)
      val cart = all.collect { case c: CartesianProductExec => c }
      assert(cart.isEmpty, s"${q.name}: CartesianProduct in plan:\n${plan.toString.take(1200)}")
      all.collect { case j: BroadcastNestedLoopJoinExec => j }.foreach { j =>
        val build = j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
          case _ => j.right
        }
        // only the join's OWN broadcast stage — nested broadcast-hash-join
        // build sides deeper in the subtree are AQE's size-based choices,
        // not nested-loop fan-out
        val own = build match {
          case s: BroadcastQueryStageExec => Some(s)
          case r: ReusedExchangeExec => collectAll(r).collectFirst { case s: BroadcastQueryStageExec => s }
          case _ => None
        }
        own.foreach { s =>
          val rows = s.getRuntimeStatistics.rowCount
          assert(rows.forall(_ <= 100L),
            s"${q.name}: BNLJ broadcast side has ${rows.getOrElse(-1L)} rows (corpus-sized?):\n${build.toString.take(800)}")
        }
      }
    }
  }

  test("q_neardup_pairs: LSH equi-join + bounded top-k, no pair-level shuffle") {
    val p = finalPlan(SparkEntry.queries("q_neardup_pairs")(spark, sf001))
    val s = p.toString
    assert(s.contains("TakeOrderedAndProject"), "slot top-k pushdown lost")
    assert(!s.contains("CartesianProduct"), "cartesian reintroduced")
  }

  test("q_skew_aqe: result hash-equals the salted variant; AQE skew split fires on real skew") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.functions._
    // Part 1 — the registry query is the salted join's exact twin: same
    // join, same aggregate, skew handling delegated to AQE instead of a
    // hand salt. The two levers must be interchangeable on the same join.
    val sf01 = "/root/testdata/sf0.01"
    val salted = SparkEntry.queries("q_skew_salted_join")(spark, sf01)
      .collect().map(_.toString).toSeq
    assert(SparkEntry.queries("q_skew_aqe")(spark, sf01)
      .collect().map(_.toString).toSeq == salted,
      "q_skew_aqe must produce the salted variant's rows")

    // Part 2 — the split itself. It cannot fire on the fixture parquet:
    // skew splits are MAPPER-RANGE chunks, and a single-row-group file
    // scans as ONE real map task, so every reduce partition is one
    // indivisible block (verified via OptimizeSkewedJoin's debug log:
    // "number of skewed partitions: left 0" at any threshold). Exercise
    // the machinery on a GENUINELY skewed in-memory relation instead —
    // 50% of 200k rows on one hot key across 20 mappers (measured: hot
    // partition 865 KB vs 241 KB median, 3.6x) — with the detection
    // thresholds lowered to test scale (factor 2 < 3.6 < default 5;
    // 16 KB floor + advisory), the same shape production defaults split
    // at 100 TB where the hot partition clears 5x median and 256 MB.
    val forced = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k")
    def skewedJoin() = {
      val big = spark.range(0, 200000, 1, 20)
        .select(when(col("id") % 2 === 0, 0L).otherwise(col("id") % 1000).as("k"),
          col("id").as("v"))
      val dim = spark.range(0, 1000)
        .select(col("id").as("k2"), (col("id") * 7).as("w"))
      big.hint("shuffle_merge").join(dim, col("k") === col("k2"))
        .agg(sum(col("v") * col("w")).as("s"), count(lit(1)).as("n"))
    }
    val expect = skewedJoin().collect().map(_.toString).toSeq
    val prev = forced.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      forced.foreach { case (k, v) => spark.conf.set(k, v) }
      val df = skewedJoin()
      assert(df.collect().map(_.toString).toSeq == expect,
        "AQE skew split must not change the result")
      val p = finalPlan(df)
      val smj = collectAll(p).collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, s"expected the hinted sort-merge join:\n${p.toString.take(1200)}")
      assert(smj.exists(_.isSkewJoin),
        s"OptimizeSkewedJoin did not mark the join under forced thresholds:\n${p.toString.take(1200)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q_skew_salted_join: salted SHUFFLED join (salt in the partitioning key)") {
    val p = finalPlan(SparkEntry.queries("q_skew_salted_join")(spark, sf001))
    val s = p.toString
    assert(s.contains("ShuffledHashJoin"),
      s"salting demo must shuffle, not broadcast:\n${s.take(1200)}")
    assert(s.contains("salt"), "salt column missing from the join")
    assert(broadcasts(p) == 0, "salted side must not broadcast")
  }

  test("q9_profit: fact side streams through the dim joins, shuffling only to aggregate/sort") {
    val p = finalPlan(SparkEntry.queries("q9_profit")(spark, sf001))
    assert(shuffles(p) <= 2, s"fact side must not shuffle before the agg:\n${p.toString.take(1500)}")
    assert(broadcasts(p) >= 4, "all four dims should broadcast at this SF")
  }

  test("q_scd2: one exchange — the aggregate reuses the window's partitioning") {
    val p = finalPlan(SparkEntry.queries("q_scd2")(spark, sf001))
    assert(shuffles(p) == 1,
      s"history build must be one key shuffle (window + agg co-partitioned):\n${p.toString.take(1500)}")
    assert(p.toString.contains("TakeOrderedAndProject"), "top-k pushdown lost")
  }

  test("q_phrase_search: term filter precedes the single doc-key shuffle") {
    val p = finalPlan(SparkEntry.queries("q_phrase_search")(spark, sf001))
    assert(shuffles(p) == 1,
      s"postings consumer must shuffle once, post-filter:\n${p.toString.take(1500)}")
    val s = p.toString
    // the IN(table, scan) predicate must sit below the exchange (narrow),
    // not above it — i.e. the filter string appears in the plan at all
    // and no second corpus pass exists (single parquet scan)
    assert(s.contains("tok#") && s.contains(" IN (table,scan)"),
      s"term filter missing:\n${s.take(1500)}")
    assert("FileScan parquet".r.findAllIn(s).size == 1,
      "phrase search must read the corpus exactly once")
  }

  test("q_inverted_index: posting heads come from the bounded topk partial aggregate") {
    val p = finalPlan(SparkEntry.queries("q_inverted_index")(spark, sf001))
    assert(shuffles(p) == 2,
      s"(term,doc) tf + per-term rollup — exactly two exchanges:\n${p.toString.take(1500)}")
    assert(p.toString.contains("partial_topk"),
      "posting head must be the map-side-partial TopKAgg, not a collect+slice")
  }

  test("q_knn_filtered: metadata predicate reaches the parquet scan") {
    val df = SparkEntry.queries("q_knn_filtered")(spark, sf001)
    df.collect()
    val scans = df.queryExecution.executedPlan.toString
    assert(scans.contains("PushedFilters: [") &&
      scans.contains("EqualTo(label,2)"),
      s"filter not pushed:\n${scans.take(1500)}")
  }

  test("q_asof_join: ONE user-key shuffle (window formulation, no range self-join)") {
    // the scalable as-of shape: union + last_value window over user
    // partitions; a regression to a range self-join would add exchanges
    // and explode pair volume at scale
    val p = finalPlan(SparkEntry.queries("q_asof_join")(spark, sf001))
    assert(shuffles(p) <= 2, s"asof must be window-shaped (user shuffle + sort):\n$p")
    assert(p.toString.contains("RunningWindowFunction") ||
      p.toString.contains("Window"), "window formulation lost")
  }

  test("q_hopping_windows: narrow hop expansion, one aggregate shuffle, bounded top-k") {
    val p = finalPlan(SparkEntry.queries("q_hopping_windows")(spark, sf001))
    assert(shuffles(p) == 1,
      s"only the window-start aggregate may shuffle (hop expansion is narrow):\n$p")
    assert(p.toString.contains("TakeOrderedAndProject"),
      "top-20 must push down, not global-sort")
  }

  test("q_events_hourly: one tumbling-window aggregate exchange plus the output sort") {
    val p = finalPlan(SparkEntry.queries("q_events_hourly")(spark, sf001))
    assert(shuffles(p) <= 2, s"tumbling agg must be one keyed exchange + sort:\n$p")
  }

  test("q_priority_sample: the corpus never shuffles; sample comes from a bounded top-(N+1)") {
    val p = finalPlan(SparkEntry.queries("q_priority_sample")(spark, sf001))
    assert(shuffles(p) <= 1, s"only the post-limit window may exchange:\n$p")
    assert(p.toString.contains("TakeOrderedAndProject"),
      "the sample must come from a bounded top-k, not a corpus sort")
  }

  test("q_dsir_select: the llr model joins as a BROADCAST at any corpus size") {
    val p = finalPlan(SparkEntry.queries("q_dsir_select")(spark, sf001))
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    assert(collectAll(p).exists(_.isInstanceOf[BroadcastHashJoinExec]),
      s"scoring must probe the broadcast B-bucket model:\n${p.toString.take(1500)}")
    assert(p.toString.contains("TakeOrderedAndProject"),
      "selection must be a bounded top-k")
  }

  test("q_group_sample: bounded per-group aggregate, no corpus window or sort") {
    val p = finalPlan(SparkEntry.queries("q_group_sample")(spark, sf001))
    assert(p.toString.contains("ObjectHashAggregate"),
      "per-stratum sampling must run through the bounded TopKAgg")
    assert(!p.toString.contains("WindowExec"),
      "a window formulation would sort every stratum")
  }

  test("q18_big_orders: the HAVING aggregate runs below the joins") {
    val p = finalPlan(SparkEntry.queries("q18_big_orders")(spark, sf001))
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    val nodes = collectAll(p)
    def depth(cls: Class[_]): Int = {
      // max distance from root at which a node of this class appears —
      // expanding AQE stage / reused-exchange wrappers like collectAll
      def walk(q: org.apache.spark.sql.execution.SparkPlan, d: Int): Seq[Int] = {
        val wrapped: Seq[org.apache.spark.sql.execution.SparkPlan] = q match {
          case s: QueryStageExec => Seq(s.plan)
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case r: ReusedExchangeExec => Seq(r.child)
          case _ => Nil
        }
        val here = if (cls.isInstance(q)) Seq(d) else Nil
        here ++ (q.children ++ q.subqueries ++ wrapped).flatMap(walk(_, d + 1))
      }
      walk(p, 0).foldLeft(-1)(math.max)
    }
    assert(nodes.exists(_.isInstanceOf[HashAggregateExec]), "having aggregate missing")
    val hasJoin = nodes.exists(n => n.isInstanceOf[BroadcastHashJoinExec] ||
      n.isInstanceOf[ShuffledHashJoinExec] || n.isInstanceOf[SortMergeJoinExec])
    assert(hasJoin, "orders/customer joins missing")
    // the quantity aggregate must be DEEPER than every join (pre-join filter)
    assert(depth(classOf[HashAggregateExec]) >
      Seq(classOf[BroadcastHashJoinExec], classOf[ShuffledHashJoinExec],
        classOf[SortMergeJoinExec]).map(depth).max,
      s"HAVING aggregate must sit below the joins:\n${p.toString.take(1500)}")
    assert(p.toString.contains("TakeOrderedAndProject"), "top-100 must push down")
  }

  test("q_assoc_rules: broadcast item supports, top-50 as TakeOrderedAndProject") {
    // The pair-support table is the only relation allowed to shuffle at
    // scale; the two item-support joins and the n_orders scalar must be
    // broadcasts, and the deterministic top-50 must plan as a bounded
    // TakeOrderedAndProject — a global Sort+Limit here would total-order
    // the rule table.
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    val p = finalPlan(SparkEntry.queries("q_assoc_rules")(spark, sf001))
    assert(collectAll(p).exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
      s"top-50 must push down:\n${p.toString.take(1200)}")
    assert(broadcasts(p) >= 3,
      s"item supports + n_orders must broadcast:\n${p.toString.take(1200)}")
  }

  test("q_ols: the whole regression is one aggregation pass — no window, " +
    "bounded exchanges") {
    // Sufficient-statistics fitting must stay sort-free: no WindowExec
    // anywhere, and the exchange budget covers only the per-order
    // feature aggregate, the orders join and the 5-group moment
    // aggregate.
    import org.apache.spark.sql.execution.window.WindowExec
    val p = finalPlan(SparkEntry.queries("q_ols")(spark, sf001))
    assert(!collectAll(p).exists(_.isInstanceOf[WindowExec]),
      s"closed-form OLS must not sort:\n${p.toString.take(1200)}")
    assert(shuffles(p) <= 4,
      s"regression is one aggregation pass, got ${shuffles(p)} shuffles:\n" +
        p.toString.take(1200))
  }

  test("runtime bloom-filter join: a selective build side injects a row-level " +
    "filter into the probe-side scan") {
    // The third join-pruning lever beside broadcast and AQE skew split:
    // Catalyst's InjectRuntimeFilter plants a bloom_filter_might_contain
    // on the LARGE side keyed by the small side's join keys, so probe
    // rows that cannot match die at the scan instead of riding the
    // shuffle — at 100 TB this is the difference between shuffling the
    // full fact table and shuffling the ~selectivity fraction that can
    // join. Default thresholds target real clusters (10 GB application
    // side); lowered here to exercise the rewrite on the fixture.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      val ord = spark.read.parquet(s"$sf001/orders.parquet")
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      // force the non-broadcast regime: broadcast joins don't need the
      // bloom filter (the build side ships whole), so disable it to put
      // the rewrite on the shuffle path it exists for
      val savedBc = conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val joined = li.join(ord,
          li("l_orderkey") === ord("o_orderkey"))
        // the rewrite lands in the optimized plan as a might_contain()
        // probe over a bloom_filter_agg scalar subquery on the probe side
        val opt = joined.queryExecution.optimizedPlan.toString
        assert(opt.contains("might_contain") && opt.contains("bloom_filter_agg"),
          s"runtime bloom filter not injected:\n${opt.take(1200)}")
        assert(joined.count() > 0)
      } finally conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
