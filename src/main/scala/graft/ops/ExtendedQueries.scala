package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Coverage beyond the kNN core (SURVEY.md §2.4): set operations, grouping
  * sets/rollup, as-of join (via window, the shuffle-once formulation),
  * sketch aggregation (HLL approx distinct), and per-label embedding
  * centroids (the batch "index build" step of an IVF-style ANN index).
  */
object ExtendedQueries {

  /** q_cmsketch grid: d hash rows x w buckets (d*w = 256 counters), and
    * the probe set — frequent / mid / rare vocabulary plus an absent
    * token (exact 0; its estimate displays the one-sided overestimate).
    * Declared BEFORE `all`: oracle strings interpolate at object init. */
  final val CmD = 4
  final val CmW = 64
  final val CmProbes: Seq[String] =
    Seq("spark", "dup", "the", "value", "vector", "window", "quux_absent")

  /** Benford first-digit probabilities log10(1 + 1/d), d = 1..9 —
    * precomputed once so the transcendental never runs at query time and
    * BOTH engines receive the identical double literals (see q_benford;
    * the q_ndcg precedent). Scala's Double.toString round-trips, so the
    * interpolated oracle literal parses back to the same bits. */
  /** Shared LPA oracle CTEs (basket graph `edges`/`nodes` + 3 synchronous
    * label-propagation rounds ending in `l3(node, label)`) — interpolated
    * by BOTH q_communities and q_modularity, so the two oracles cannot
    * drift. Declared before `all` (oracle strings interpolate eagerly). */
  private val LpaOracleCte: String = {
    val rounds = (1 to 3).map { r =>
      val prev = if (r == 1) "l0" else s"l${r - 1}"
      s"""f$r AS (
         |  SELECT e.dst, l.label, count(*) AS cnt
         |  FROM edges e JOIN $prev l ON l.node = e.src
         |  GROUP BY e.dst, l.label),
         |l$r AS (
         |  SELECT dst AS node, label FROM (
         |    SELECT dst, label,
         |      row_number() OVER (PARTITION BY dst ORDER BY cnt DESC, label) AS rn
         |    FROM f$r) t WHERE rn = 1)"""
    }.mkString(",\n")
    s"""li AS (SELECT l_orderkey, l_partkey FROM lineitem),
       |und AS (
       |  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       |edges AS (SELECT a AS src, b AS dst FROM und
       |  UNION ALL SELECT b, a FROM und),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |l0 AS (SELECT node, node AS label FROM nodes),
       |$rounds""".stripMargin
  }

  private val BenfordP: Seq[Double] = Seq(
    0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514)

  val all: Seq[Q] = Seq(

    // Set operations: customers active in 1995 vs 1996 (INTERSECT/EXCEPT/UNION).
    Q("q_set_ops",
      (s, d) => {
        val ord = Tables.orders(s, d)
        def custsIn(yr: Int) = ord
          .filter(year(col("o_orderdate")) === yr)
          .select(col("o_custkey"))
        val a = custsIn(1995)
        val b = custsIn(1996)
        val r = a.intersect(b).agg(count(lit(1)).as("n_both"))
          .crossJoin(a.except(b).agg(count(lit(1)).as("n_only_1995")))
          .crossJoin(a.union(b).distinct().agg(count(lit(1)).as("n_either")))
        r
      },
      Some("""WITH a AS (SELECT o_custkey FROM orders WHERE date_part('year', o_orderdate) = 1995),
         |b AS (SELECT o_custkey FROM orders WHERE date_part('year', o_orderdate) = 1996)
         |SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM (SELECT * FROM a INTERSECT SELECT * FROM b) t) AS n_both,
         |  (SELECT CAST(count(*) AS BIGINT) FROM (SELECT * FROM a EXCEPT SELECT * FROM b) t) AS n_only_1995,
         |  (SELECT CAST(count(*) AS BIGINT) FROM (SELECT DISTINCT * FROM (SELECT * FROM a UNION SELECT * FROM b) u) t) AS n_either""".stripMargin)),

    // Rollup: revenue at (region, nation), (region), and grand-total levels.
    Q("q_rollup",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val ord = Tables.orders(s, d)
        val cust = Tables.customer(s, d)
        val nat = Tables.nation(s, d)
        val reg = Tables.region(s, d)
        // customer unhinted: it grows with scale factor, so a static
        // broadcast hint would OOM the driver at the 100 TB design point
        // (AQE still broadcasts it at small SF). Hints stay only on the
        // fixed-cardinality dims (25 nations, 5 regions).
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(H.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_items"))
          .select(coalesce(col("r_name"), lit("ALL")).as("region"),
            coalesce(col("n_name"), lit("ALL")).as("nation"),
            col("revenue"), col("n_items"))
          .orderBy(col("region"), col("nation"))
      },
      Some("""SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
         |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
         |  CAST(count(*) AS BIGINT) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP(r_name, n_name)
         |ORDER BY region, nation""".stripMargin)),

    // As-of join: each purchase matched to the same user's most recent prior
    // click — expressed as ONE shuffle (union + window last_value), the
    // scalable formulation (no range self-join explosion).
    Q("q_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
            when(col("event_type") === "click", col("ts")).as("click_ts"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("last_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"),
            unix_micros(col("last_click_ts")).as("click_ts_us"))
          .orderBy(col("event_id"))
      },
      Some("""WITH ev AS (
         |  SELECT event_id, user_id, event_type, ts,
         |    CASE WHEN event_type = 'click' THEN ts END AS click_ts
         |  FROM events WHERE event_type IN ('click', 'purchase')),
         |m AS (
         |  SELECT event_id, user_id, event_type, ts,
         |    last_value(click_ts IGNORE NULLS) OVER (
         |      PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
         |  FROM ev)
         |SELECT event_id, user_id,
         |  CAST(epoch_us(ts) AS BIGINT) AS ts_us,
         |  CAST(epoch_us(last_click_ts) AS BIGINT) AS click_ts_us
         |FROM m WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin)),

    // CUBE over (orderstatus, orderpriority): all 4 grouping-set levels.
    Q("q_cube",
      (s, d) => Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), H.dsum(col("o_totalprice")).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy(col("status"), col("priority")),
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
         |  coalesce(o_orderpriority, 'ALL') AS priority,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total
         |FROM orders
         |GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY status, priority""".stripMargin)),

    // Time-series rollup: monthly order counts + revenue (date_trunc path).
    Q("q_monthly_orders",
      (s, d) => Tables.orders(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n_orders"), H.dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("month")),
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month,
         |  CAST(count(*) AS BIGINT) AS n_orders,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS revenue
         |FROM orders GROUP BY month ORDER BY month""".stripMargin)),

    // Incremental materialized-view maintenance — the warehouse pattern:
    // a stored monthly-revenue aggregate (base, orders before the
    // mid-month cutoff) absorbs a delta batch (orders after) by MERGING
    // PARTIALS: counts add, DECIMAL sums add (order-independent, exact),
    // and only then does the merged sum cast to double. The cutoff sits
    // mid-month so one month genuinely straddles both sides — the merge
    // is exercised, not just a union of disjoint key ranges. The oracle
    // recomputes the view from ALL orders: merged == recomputed IS the
    // MV maintenance invariant. Scale shape: at 100 TB the base is a
    // stored O(groups) table — the maintenance cost is O(delta + groups),
    // never a base rescan; both aggregate sides here shrink to ~100 rows
    // before the full-outer merge, which AQE plans as a broadcast join.
    Q("q_incr_agg",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(25, 6)
        val cutoff = lit("1996-06-15").cast("timestamp")
        def part(df: org.apache.spark.sql.DataFrame) = df
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(dec)).as("t"))
        val ord = Tables.orders(s, d)
        val base = part(ord.filter(col("o_orderdate") < cutoff))
          .select(col("month"), col("n").as("n_b"), col("t").as("t_b"))
        val delta = part(ord.filter(col("o_orderdate") >= cutoff))
          .select(col("month"), col("n").as("n_d"), col("t").as("t_d"))
        base.join(delta, Seq("month"), "full_outer")
          .select(col("month"),
            (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L)))
              .as("n_orders"),
            (coalesce(col("t_b"), lit(0).cast(dec))
              + coalesce(col("t_d"), lit(0).cast(dec)))
              .cast("double").as("revenue"))
          .orderBy(col("month"))
      },
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month,
         |  CAST(count(*) AS BIGINT) AS n_orders,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS revenue
         |FROM orders GROUP BY month ORDER BY month""".stripMargin)),

    // arg-max aggregation: each nation's highest-balance customer
    // (max_by / arg_max; c_acctbal is unique enough — tie-break free on
    // this data, asserted by the deterministic compare).
    Q("q_argmax",
      (s, d) => Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(max_by(col("c_custkey"), struct(col("c_acctbal"), col("c_custkey"))).as("top_cust"),
          max(col("c_acctbal")).as("top_bal"))
        .orderBy(col("n_name")),
      Some("""SELECT n_name, CAST(c_custkey AS BIGINT) AS top_cust, c_acctbal AS top_bal
         |FROM (
         |  SELECT n_name, c_custkey, c_acctbal,
         |    row_number() OVER (PARTITION BY n_name
         |      ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
         |  FROM customer JOIN nation ON c_nationkey = n_nationkey) t
         |WHERE rn = 1 ORDER BY n_name""".stripMargin)),

    // Edit-distance verification of dedup candidates: exact Levenshtein
    // over 64-char prefixes for the token-set duplicate groups (the
    // "verify" stage after candidate generation; integer-exact both sides).
    // One scan + ONE shuffle (groupBy fp), pairs generated group-locally:
    // a self-join on fp would scan and shuffle the corpus twice; collecting
    // each duplicate group (bounded: dup-group size) and exploding i<j
    // pairs inside the group produces the identical pair set with half the
    // shuffle volume — the shape that survives 100 TB.
    Q("q_levenshtein",
      (s, d) => {
        val groups = Tables.documents(s, d)
          .select(col("doc_id"),
            md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " "))))).as("fp"),
            substring(col("text"), 1, 64).as("pre"))
          .groupBy(col("fp"))
          .agg(sort_array(collect_list(struct(col("doc_id"), col("pre")))).as("g"))
          .filter(size(col("g")) > 1)
        groups
          .select(posexplode(col("g")).as(Seq("i", "a")), col("g"))
          .select(col("a"), explode(slice(col("g"), col("i") + 2, size(col("g")))).as("b"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            col("a.pre").as("pre_a"), col("b.pre").as("pre_b"))
          // one giant dup group generates all its pairs in one task; the
          // pair rows are cheap (two 64-char prefixes) — redistribute them
          // on the pair key so the O(64x64) DP below parallelizes evenly
          // no matter how skewed the group sizes are
          // explicit count: AQE would coalesce this few-MB shuffle back to
          // one partition (pair rows are small but each carries O(64x64)
          // compute — bytes are the wrong balance metric here)
          .repartition(64, col("doc_a"), col("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            levenshtein(col("pre_a"), col("pre_b")).cast("long").as("edit_dist"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""WITH f AS (
         |  SELECT doc_id,
         |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
         |    substr(text, 1, 64) AS pre
         |  FROM documents)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(levenshtein(a.pre, b.pre) AS BIGINT) AS edit_dist
         |FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin)),

    // Interval (range) join, the scalable formulation: a naive range join
    // is an n^2 blowup at 100 TB; instead both sides are bucketed into
    // 30-minute epochs, purchases probe buckets {b-1, b} via an EQUI-join
    // on (user, bucket), and the exact range predicate filters after.
    // The oracle states the naive range join — proving result identity.
    Q("q_interval_join",
      (s, d) => {
        val BUCKET = 1800000000L // 30 min in micros
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("us").as("c_us"),
            (col("us") / BUCKET).cast("long").as("cb"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("us").as("p_us"),
            (col("us") / BUCKET).cast("long").as("pb"))
        val probes = purchases
          .withColumn("cb", explode(array(col("pb") - 1, col("pb"))))
        probes.join(clicks, Seq("user_id", "cb"), "left")
          .withColumn("hit",
            when(col("c_us").isNotNull &&
              col("c_us") >= col("p_us") - BUCKET && col("c_us") < col("p_us"), 1)
              .otherwise(0))
          .groupBy(col("event_id"), col("user_id"))
          .agg(sum(col("hit")).cast("long").as("n_recent_clicks"))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (
         |  SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS p_us
         |  FROM events WHERE event_type = 'purchase'),
         |c AS (
         |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS c_us
         |  FROM events WHERE event_type = 'click')
         |SELECT p.event_id, p.user_id,
         |  CAST(count(c.c_us) AS BIGINT) AS n_recent_clicks
         |FROM p LEFT JOIN c
         |  ON c.user_id = p.user_id
         |  AND c.c_us >= p.p_us - 1800000000
         |  AND c.c_us < p.p_us
         |GROUP BY p.event_id, p.user_id
         |ORDER BY p.event_id""".stripMargin)),

    // Sketch aggregation: HLL++ approx distinct counts.
    // Oracle closure: the HLL estimate itself is engine-specific, so the
    // query emits the EXACT distinct counts (recomputable by DuckDB) plus
    // per-key `within_tol` invariants |approx-exact|/exact <= 0.03
    // (3 sigma at rsd=0.01) which the oracle states as the constant 1 —
    // a sketch-accuracy regression flips the boolean and fails the
    // hash-match. The exact countDistinct companions exist only for the
    // correctness gate; the 100 TB path runs the single partial-merged
    // HLL aggregate alone (bounded O(1/rsd^2) buffer per key, no
    // distinct-shuffle — that is the point of the sketch).
    // NOTE the exact companions are deliberately SEPARATE one-column
    // distinct sub-plans, not countDistinct() in the same agg: mixing
    // multiple countDistinct with the HLL aggregates triggers Spark's
    // multi-distinct Expand rewrite, whose first aggregate groups by
    // (gid, value) — materializing a ~16 KB HLL partial buffer per
    // DISTINCT VALUE (measured: 39s vs 2s at sf0.1). Each distinct()
    // below partial-dedups map-side and shuffles only distinct keys.
    Q("q_approx_distinct",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        def exact(c: String, as: String) =
          li.select(col(c)).distinct().agg(count(lit(1)).as(as))
        li.agg(
            approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("a_o"),
            approx_count_distinct(col("l_partkey"), rsd = 0.01).as("a_p"),
            approx_count_distinct(col("l_suppkey"), rsd = 0.01).as("a_s"))
          .crossJoin(exact("l_orderkey", "exact_orders"))
          .crossJoin(exact("l_partkey", "exact_parts"))
          .crossJoin(exact("l_suppkey", "exact_supps"))
          .select(col("exact_orders"), col("exact_parts"), col("exact_supps"),
          (abs(col("a_o") - col("exact_orders")).cast("double") /
            col("exact_orders") <= lit(0.03)).cast("long").as("orders_within_tol"),
          (abs(col("a_p") - col("exact_parts")).cast("double") /
            col("exact_parts") <= lit(0.03)).cast("long").as("parts_within_tol"),
          (abs(col("a_s") - col("exact_supps")).cast("double") /
            col("exact_supps") <= lit(0.03)).cast("long").as("supps_within_tol"))
      },
      Some("""SELECT
         |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
         |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
         |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
         |  CAST(1 AS BIGINT) AS orders_within_tol,
         |  CAST(1 AS BIGINT) AS parts_within_tol,
         |  CAST(1 AS BIGINT) AS supps_within_tol
         |FROM lineitem""".stripMargin)),

    // Sketch RE-AGGREGATION — the warehouse rollup pattern
    // q_approx_distinct only hints at: per-day Apache DataSketches HLL
    // sketches of the customer set (the stored pre-aggregate; bytes, not
    // counts) MERGED up to months with hll_union_agg, checked against
    // both the direct monthly sketch and the exact distinct count. A
    // measured subtlety pinned here: union is NOT bit-lossless across
    // DataSketches mode transitions — per-day sketches arrive in sparse
    // (coupon) mode and the union's target promotion yields estimates
    // that differ slightly from the direct dense sketch (first seen at
    // sf0.1, where merged != direct on 79 of 80 months while both stay
    // inside the error bound) — so the invariants are the two error
    // bounds vs exact plus a merged-vs-direct closeness band (5% of
    // exact; the worst month at sf0.1 sits between 2% and 5%), not
    // equality. At 100 TB this is THE incremental-distinct design:
    // daily sketch partials are a few KB per group, months re-aggregate
    // without rescanning days — map-side-combinable agg + tiny merge
    // shuffle.
    Q("q_hll_merge",
      (s, d) => {
        val ord = Tables.orders(s, d)
          .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
            to_date(col("o_orderdate")).as("day"), col("o_custkey"))
        val daily = ord.groupBy(col("month"), col("day"))
          .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
        val merged = daily.groupBy(col("month"))
          .agg(count(lit(1)).as("n_days"),
            hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_merged"))
        val direct = ord.groupBy(col("month").as("m2"))
          .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("est_direct"),
            countDistinct(col("o_custkey")).as("exact_cust"))
        merged.join(direct, col("month") === col("m2"))
          .select(col("month"), col("n_days"), col("exact_cust"),
            (abs(col("est_merged") - col("exact_cust")) /
              col("exact_cust") <= lit(0.05)).cast("long").as("merged_within_tol"),
            (abs(col("est_direct") - col("exact_cust")) /
              col("exact_cust") <= lit(0.05)).cast("long").as("direct_within_tol"),
            (abs(col("est_merged") - col("est_direct")) /
              col("exact_cust") <= lit(0.05)).cast("long").as("merge_vs_direct_ok"))
          .orderBy(col("month"))
      },
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month,
         |  CAST(count(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT) AS n_days,
         |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_cust,
         |  CAST(1 AS BIGINT) AS merged_within_tol,
         |  CAST(1 AS BIGINT) AS direct_within_tol,
         |  CAST(1 AS BIGINT) AS merge_vs_direct_ok
         |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Count-min sketch (Cormode & Muthukrishnan 2005) — the point-lookup
    // FREQUENCY tier completing the sketch family (HLL: distinct; theta:
    // set algebra; Bloom: membership; space-saving: top set; HistSketch:
    // quantiles): a d x w counter grid answering "how often did THIS
    // token occur" with est >= exact ALWAYS (one-sided error) and
    // overestimate bounded by the collision mass in the sparsest of d
    // rows. Fully deterministic here — row hashes are the seeded md5
    // buckets every membership query in this engine uses — so the oracle
    // replays the grid bit-for-bit; the probe set spans frequent /
    // mid / rare vocabulary plus an ABSENT token (whose nonzero estimate,
    // if any, is the overestimate semantics on display).
    //
    // Scale shape: ONE token pass into a d*w-cell aggregate (map-side
    // combinable — the shuffle is 256 cells regardless of corpus size),
    // probes are bounded lookups against the broadcast grid. At 100 TB
    // this is THE mergeable frequency state: per-partition grids add
    // cellwise, unlike the per-key exact groupBy whose shuffle grows
    // with the vocabulary.
    Q("q_cmsketch",
      (s, d) => {
        import s.implicits._
        val toks = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
        def buckets(c: org.apache.spark.sql.Column) = array(
          (0 until CmD).map(i =>
            (graft.functions.TextOps.md5Prefix60(
              concat(lit(s"cm$i:"), c)) % CmW).cast("int")): _*)
        val grid = toks.select(posexplode(buckets(col("tok")))
            .as(Seq("row", "bucket")))
          .groupBy(col("row"), col("bucket"))
          .agg(count(lit(1)).as("cnt"))
        val probes = CmProbes.toDF("token")
        val est = probes
          .select(col("token"), posexplode(buckets(col("token")))
            .as(Seq("row", "bucket")))
          .join(grid, Seq("row", "bucket"), "left")
          .groupBy(col("token"))
          .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
        val exact = probes.join(
          toks.groupBy(col("tok").as("token"))
            .agg(count(lit(1)).as("exact_cnt")),
          Seq("token"), "left")
          .select(col("token"),
            coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"))
        exact.join(est, "token")
          .select(col("token"), col("exact_cnt"), col("est_cnt"),
            (col("est_cnt") - col("exact_cnt")).as("overestimate"),
            (col("est_cnt") >= col("exact_cnt")).cast("long")
              .as("one_sided_ok"))
          .orderBy(col("token"))
      },
      Some {
        val probeList = CmProbes.map(t => s"('$t')").mkString(", ")
        def bucketSql(i: Int, c: String) =
          s"${graft.OracleSql.hexToLong(s"md5('cm$i:' || $c)", 1, 15)} % $CmW"
        val rows = (0 until CmD).map(i =>
          s"SELECT $i AS row_, ${bucketSql(i, "tok")} AS bucket FROM tnz")
          .mkString("\n  UNION ALL\n  ")
        val prows = (0 until CmD).map(i =>
          s"SELECT token, $i AS row_, ${bucketSql(i, "token")} AS bucket FROM probes")
          .mkString("\n  UNION ALL\n  ")
        s"""WITH toks AS (
           |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
           |tnz AS (SELECT tok FROM toks WHERE tok <> ''),
           |cells AS (
           |  $rows
           |),
           |grid AS (
           |  SELECT row_, bucket, CAST(count(*) AS BIGINT) AS cnt
           |  FROM cells GROUP BY 1, 2),
           |probes(token) AS (VALUES $probeList),
           |pcells AS (
           |  $prows
           |),
           |est AS (
           |  SELECT p.token,
           |    CAST(min(COALESCE(g.cnt, 0)) AS BIGINT) AS est_cnt
           |  FROM pcells p LEFT JOIN grid g
           |    ON g.row_ = p.row_ AND g.bucket = p.bucket
           |  GROUP BY 1),
           |ex AS (
           |  SELECT p.token,
           |    CAST(COALESCE(e.c, 0) AS BIGINT) AS exact_cnt
           |  FROM probes p LEFT JOIN (
           |    SELECT tok AS token, count(*) AS c FROM tnz GROUP BY 1) e
           |    USING (token))
           |SELECT ex.token, ex.exact_cnt, est.est_cnt,
           |  est.est_cnt - ex.exact_cnt AS overestimate,
           |  CAST(CASE WHEN est.est_cnt >= ex.exact_cnt THEN 1 ELSE 0 END
           |    AS BIGINT) AS one_sided_ok
           |FROM ex JOIN est USING (token)
           |ORDER BY token""".stripMargin
      }),

    // Theta-sketch set algebra — the INTERSECTION tier HLL cannot provide
    // (q_approx_distinct/q_hll_merge answer |A| and |A ∪ B|; "customers
    // who bought at BOTH priorities" needs the retained-hash-sample
    // design of theta sketches, functions/ThetaSketchAgg.scala — the
    // fourth custom TypedImperativeAggregate). Per order priority, one
    // distributed theta sketch of the distinct customer set (lgK=12 —
    // estimation mode is genuinely entered at sf0.1 where ~14k customers
    // per priority exceed the 4096 nominal entries); the 5 compact
    // sketches (<= 32 KB each, the codebook-class bounded collect) are
    // intersected/unioned pairwise on the driver. Gate: the sketch
    // bounds are DETERMINISTIC functions of the input set (the k
    // smallest hashes are order- and merge-shape-independent), and the
    // oracle replays the EXACT intersection and union per pair plus the
    // in-bounds booleans the Spark side computes from getLowerBound(2)/
    // getUpperBound(2). Exact union derives from inclusion-exclusion
    // (na + nb - inter) — no second corpus pass. Scale shape: one
    // distinct + one sketch aggregate over the corpus, one pair-keyed
    // exact-intersection join (priority-bounded), 10 output rows.
    Q("q_theta_sets",
      (s, d) => {
        import org.apache.datasketches.memory.Memory
        import org.apache.datasketches.theta.{SetOperation, Sketches}
        val pc = Tables.orders(s, d)
          .select(col("o_orderpriority").as("prio"),
            col("o_custkey").as("cust")).distinct()
        val sk = pc.groupBy(col("prio"))
          .agg(graft.functions.ThetaSketchAgg.thetaSketch(col("cust"))
            .as("sk"), count(lit(1)).as("n"))
          .collect() // 5 rows x <=32 KB compact sketches (bounded)
          .map(r => (r.getAs[String]("prio"), r.getAs[Array[Byte]]("sk"),
            r.getAs[Long]("n")))
          .sortBy(_._1)
        val pairBounds = for {
          i <- sk.indices; j <- (i + 1) until sk.length
        } yield {
          val a = Sketches.heapifyCompactSketch(Memory.wrap(sk(i)._2))
          val b = Sketches.heapifyCompactSketch(Memory.wrap(sk(j)._2))
          val inter = SetOperation.builder().buildIntersection()
          inter.intersect(a); inter.intersect(b)
          val ir = inter.getResult
          val un = SetOperation.builder().buildUnion()
          un.union(a); un.union(b)
          val ur = un.getResult
          val anb = SetOperation.builder().buildANotB()
          val dr = anb.aNotB(a, b) // A \\ B completes the set algebra
          (sk(i)._1, sk(j)._1, sk(i)._3, sk(j)._3,
            ir.getLowerBound(2), ir.getUpperBound(2),
            ur.getLowerBound(2), ur.getUpperBound(2),
            dr.getLowerBound(2), dr.getUpperBound(2))
        }
        val bounds = s.createDataFrame(pairBounds).toDF(
          "pa", "pb", "na", "nb", "ilo", "ihi", "ulo", "uhi", "dlo", "dhi")
        val exact = pc.select(col("prio").as("pa"), col("cust"))
          .join(pc.select(col("prio").as("pb"), col("cust")), "cust")
          .filter(col("pa") < col("pb"))
          .groupBy(col("pa"), col("pb"))
          .agg(count(lit(1)).as("exact_inter"))
        exact.join(broadcast(bounds), Seq("pa", "pb"))
          .select(col("pa"), col("pb"), col("exact_inter"),
            (col("na") + col("nb") - col("exact_inter")).as("exact_union"),
            (col("ilo") <= col("exact_inter").cast("double") &&
              col("exact_inter").cast("double") <= col("ihi"))
              .cast("long").as("inter_in_bounds"),
            (col("ulo") <= (col("na") + col("nb") - col("exact_inter"))
              .cast("double") &&
              (col("na") + col("nb") - col("exact_inter")).cast("double")
                <= col("uhi")).cast("long").as("union_in_bounds"),
            (col("na") - col("exact_inter")).as("exact_diff"),
            (col("dlo") <= (col("na") - col("exact_inter")).cast("double") &&
              (col("na") - col("exact_inter")).cast("double") <= col("dhi"))
              .cast("long").as("diff_in_bounds"))
          .orderBy(col("pa"), col("pb"))
      },
      Some("""WITH pc AS (
         |  SELECT DISTINCT o_orderpriority AS prio, o_custkey AS cust
         |  FROM orders),
         |cnt AS (SELECT prio, CAST(count(*) AS BIGINT) AS n
         |  FROM pc GROUP BY 1),
         |pairs AS (
         |  SELECT a.prio AS pa, b.prio AS pb,
         |    CAST(count(*) AS BIGINT) AS exact_inter
         |  FROM pc a JOIN pc b ON a.cust = b.cust AND a.prio < b.prio
         |  GROUP BY 1, 2)
         |SELECT pa, pb, exact_inter,
         |  ca.n + cb.n - exact_inter AS exact_union,
         |  CAST(1 AS BIGINT) AS inter_in_bounds,
         |  CAST(1 AS BIGINT) AS union_in_bounds,
         |  ca.n - exact_inter AS exact_diff,
         |  CAST(1 AS BIGINT) AS diff_in_bounds
         |FROM pairs
         |JOIN cnt ca ON pa = ca.prio
         |JOIN cnt cb ON pb = cb.prio
         |ORDER BY pa, pb""".stripMargin)),

    // Mergeable QUANTILE sketch re-aggregation — the percentile companion
    // to q_hll_merge's distinct tier, built on the graft fixed-grid
    // histogram aggregate (functions/HistSketch.scala): daily binary
    // partials -> monthly merge, never rescanning days. The deliberate
    // contrast with HLL (measured there): histogram merge is count
    // ADDITION, bitwise lossless, so this gate demands EXACT equality of
    // the merged vs directly-built rank bins — not a closeness band — and
    // the oracle REPLAYS the full sketch math (bin assignment, cumulative
    // rank walk, ceil-rank rule) from GROUP BY counts. The price of the
    // fixed grid is a one-bin value-space error bound (asserted against
    // the exact order statistic) and a domain pre-pass for [lo, hi]. At
    // 100 TB: partials are sparse-encoded KBs per group and map-side
    // combinable; the domain pass is a min/max scan (or lake metadata).
    Q("q_quantile_merge",
      (s, d) => {
        import graft.functions.HistOps
        val ord = Tables.orders(s, d)
          .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
            to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
        val dom = ord.agg(min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        val width = (col("hi") - col("lo")) / lit(4096.0)
        val binned = ord.crossJoin(broadcast(dom))
          .select(col("month"), col("day"), col("lo"), width.as("width"),
            least(floor((col("o_totalprice") - col("lo")) / width)
              .cast("long"), lit(4095L)).as("bin"))
        val daily = binned.groupBy(col("month"), col("day"))
          .agg(HistOps.histAgg(col("bin"), 4096).as("sk"),
            count(lit(1)).as("nd"),
            min(col("lo")).as("lo"), min(col("width")).as("width"))
        val monthly = daily.groupBy(col("month"))
          .agg(count(lit(1)).as("n_days"), sum(col("nd")).as("n"),
            HistOps.histMerge(col("sk")).as("msk"),
            min(col("lo")).as("lo"), min(col("width")).as("width"))
        val direct = binned.groupBy(col("month").as("m2"))
          .agg(HistOps.histAgg(col("bin"), 4096).as("dsk"))
        val wr = Window.partitionBy(col("month")).orderBy(col("o_totalprice"))
        val wn = Window.partitionBy(col("month"))
        val exact = ord
          .withColumn("r", row_number().over(wr))
          .withColumn("nm", count(lit(1)).over(wn))
          .filter(col("r") === floor((col("nm") + lit(1L)) / lit(2L)))
          .select(col("month").as("m3"), col("o_totalprice").as("exact_p50"))
        val p50m = HistOps.histRankBin(col("msk"), 1L, 2L)
        val p90m = HistOps.histRankBin(col("msk"), 9L, 10L)
        val est50 = col("lo") + (p50m.cast("double") + lit(0.5)) * col("width")
        monthly.join(direct, col("month") === col("m2"))
          .join(exact, col("month") === col("m3"))
          .select(col("month"), col("n_days"), col("n"),
            p50m.as("bin_p50"), p90m.as("bin_p90"),
            (p50m === HistOps.histRankBin(col("dsk"), 1L, 2L) &&
              p90m === HistOps.histRankBin(col("dsk"), 9L, 10L))
              .cast("long").as("merged_eq_direct"),
            (floor(est50 * lit(1e9)) / lit(1e9)).as("est_p50"),
            (abs(est50 - col("exact_p50")) <= col("width"))
              .cast("long").as("bound_ok"))
          .orderBy(col("month"))
      },
      Some("""WITH ord AS (
         |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         |    CAST(o_orderdate AS DATE) AS day, o_totalprice FROM orders),
         |dom AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
         |        FROM ord),
         |b AS (
         |  SELECT month, day, lo, (hi - lo) / 4096.0 AS width,
         |    LEAST(CAST(floor((o_totalprice - lo) / ((hi - lo) / 4096.0))
         |      AS BIGINT), 4095) AS bin, o_totalprice
         |  FROM ord, dom),
         |counts AS (SELECT month, bin, CAST(count(*) AS BIGINT) AS cnt
         |           FROM b GROUP BY month, bin),
         |tot AS (SELECT month, CAST(sum(cnt) AS BIGINT) AS n
         |        FROM counts GROUP BY month),
         |cum AS (SELECT month, bin, cnt,
         |          sum(cnt) OVER (PARTITION BY month ORDER BY bin) AS cum
         |        FROM counts),
         |p50 AS (SELECT c.month, min(bin) AS bin_p50
         |        FROM cum c JOIN tot t USING (month)
         |        WHERE c.cum >= (t.n + 1) // 2 GROUP BY c.month),
         |p90 AS (SELECT c.month, min(bin) AS bin_p90
         |        FROM cum c JOIN tot t USING (month)
         |        WHERE c.cum >= (t.n * 9 + 9) // 10 GROUP BY c.month),
         |nd AS (SELECT month, CAST(count(DISTINCT day) AS BIGINT) AS n_days,
         |         min(lo) AS lo, min(width) AS width
         |       FROM b GROUP BY month),
         |ex AS (SELECT month, o_totalprice AS exact_p50 FROM (
         |        SELECT month, o_totalprice,
         |          row_number() OVER (PARTITION BY month
         |            ORDER BY o_totalprice) AS r,
         |          count(*) OVER (PARTITION BY month) AS nm
         |        FROM b) t WHERE r = (nm + 1) // 2)
         |SELECT t.month, nd.n_days, t.n, p50.bin_p50, p90.bin_p90,
         |  CAST(1 AS BIGINT) AS merged_eq_direct,
         |  floor((nd.lo + (bin_p50 + 0.5) * nd.width) * 1e9) / 1e9 AS est_p50,
         |  CAST(abs((nd.lo + (bin_p50 + 0.5) * nd.width) - ex.exact_p50)
         |    <= nd.width AS BIGINT) AS bound_ok
         |FROM tot t JOIN p50 USING (month) JOIN p90 USING (month)
         |  JOIN nd USING (month) JOIN ex USING (month)
         |ORDER BY t.month""".stripMargin)),

    // Per-label embedding centroids — the batch index-build step of an
    // IVF-style ANN index (coarse quantizer), as a distributed aggregation.
    // Exactness note: float components are dyadic with <= 43 fractional
    // bits, so x*2^43 is an exactly-representable integer double; summing
    // those as DECIMAL(38,0) is exact and order-independent, and dividing
    // back by 2^43 is an exact power-of-two scaling — the mean is then
    // bitwise identical in Spark and DuckDB (a fixed-scale DECIMAL cast
    // would hit half-up vs half-even ties on dyadic values).
    Q("q_centroids",
      (s, d) => {
        val P43 = 8796093022208.0 // 2^43
        Tables.embeddings(s, d)
          .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
          .groupBy(col("label"), col("pos"))
          .agg(((sum(floor(col("x").cast("double") * lit(P43))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .cast("double") / lit(P43)) / count(lit(1))).as("c"))
          .select(col("label"), col("pos").cast("long").as("pos"), col("c"))
          .orderBy(col("label"), col("pos"))
      },
      Some("""WITH e AS (
         |  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
         |         unnest(embedding) AS x
         |  FROM embeddings)
         |SELECT label, CAST(pos AS BIGINT) AS pos,
         |  (CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 8796093022208.0) AS DECIMAL(38,0))) AS DOUBLE)
         |   / 8796093022208.0) / count(*) AS c
         |FROM e GROUP BY label, pos ORDER BY label, pos""".stripMargin)),

    // Sliding-window funnel (the ClickHouse windowFunnel shape): the max
    // funnel level a user reaches where the WHOLE view -> click ->
    // purchase chain fits inside a 6-hour window anchored at its view —
    // q_funnel's earliest-event formulation has no window, so a Monday
    // view plus a Friday purchase still converts there; this one answers
    // the session-bounded marketing question. Semantics are a GREEDY
    // SEQUENCE FOLD over (ts, event_id)-ordered events (the ClickHouse
    // design, not an EXISTS join): track the latest view, admit a click
    // strictly after it within W (keeping the maximal chain deadline),
    // admit a purchase within the best deadline. State is three BIGINTs;
    // both engines replay the identical fold — Spark as an aggregate-HOF
    // over the per-user sorted list, DuckDB as a per-user RECURSIVE CTE.
    // The CTE is deliberate: the first oracle draft used list_reduce with
    // a 3-long accumulator and MISFOLDED exactly one of 150 users at
    // sf0.01 — DuckDB 1.0's list_reduce corrupts the accumulator for
    // some rows under multi-row vectorized execution (folding the SAME
    // list standalone returns the right answer; reproduced and isolated
    // before the rewrite). W = 6h probed: 14/15 users reach level 2 and 1
    // reaches level 3 at sf0.001 (11 at sf0.01) — 1h leaves level 3
    // empty. Scale shape: ONE user-keyed shuffle; per-user lists are
    // bounded by events/user (the q_ewma contract), never corpus-sized.
    Q("q_window_funnel",
      (s, d) => {
        val W = 21600000000L // 6 h in micros
        val pairs = transform(
          sort_array(collect_list(struct(
            unix_micros(col("ts")).as("us"), col("event_id"),
            when(col("event_type") === "view", 1L)
              .when(col("event_type") === "click", 2L)
              .when(col("event_type") === "purchase", 3L)
              .otherwise(0L).as("code")))),
          p => array(p.getField("us"), p.getField("code")))
        val st = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(pairs.as("pairs"))
          .select(col("user_id"), expr(
            s"""aggregate(pairs, array(-1L, -1L, 0L), (a, x) ->
               |  CASE
               |    WHEN x[1] = 1 THEN array(greatest(a[0], x[0]), a[1], a[2])
               |    WHEN x[1] = 2 AND a[0] >= 0 AND x[0] > a[0]
               |      AND x[0] <= a[0] + ${W}L
               |      THEN array(a[0], greatest(a[1], a[0] + ${W}L), a[2])
               |    WHEN x[1] = 3 AND a[1] >= 0 AND x[0] <= a[1]
               |      THEN array(a[0], a[1], 1L)
               |    ELSE a
               |  END)""".stripMargin).as("st"))
        st.agg(
          count(lit(1)).as("n_users"),
          sum((col("st")(0) >= 0).cast("long")).as("n_level1"),
          sum((col("st")(1) >= 0).cast("long")).as("n_level2"),
          sum(col("st")(2)).as("n_level3"))
      },
      Some {
        val W = 21600000000L
        s"""WITH RECURSIVE t AS (
           |  SELECT user_id, ts, event_id, epoch_us(ts) AS us,
           |    CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
           |      WHEN 'purchase' THEN 3 ELSE 0 END AS code
           |  FROM events),
           |mi AS (
           |  SELECT user_id, CAST(row_number() OVER (PARTITION BY user_id
           |    ORDER BY ts, event_id) AS BIGINT) AS i, us, code
           |  FROM t),
           |n AS (SELECT user_id, max(i) AS mx FROM mi GROUP BY 1),
           |r(user_id, i, lv, bd, l3) AS (
           |  SELECT user_id, CAST(0 AS BIGINT), CAST(-1 AS BIGINT),
           |    CAST(-1 AS BIGINT), CAST(0 AS BIGINT) FROM n
           |  UNION ALL
           |  SELECT r.user_id, r.i + 1,
           |    CASE WHEN m.code = 1 THEN greatest(r.lv, m.us)
           |      ELSE r.lv END,
           |    CASE WHEN m.code = 2 AND r.lv >= 0 AND m.us > r.lv
           |      AND m.us <= r.lv + $W THEN greatest(r.bd, r.lv + $W)
           |      ELSE r.bd END,
           |    CASE WHEN m.code = 3 AND r.bd >= 0 AND m.us <= r.bd THEN 1
           |      ELSE r.l3 END
           |  FROM r JOIN mi m ON m.user_id = r.user_id AND m.i = r.i + 1),
           |st AS (
           |  SELECT r.user_id, lv, bd, l3
           |  FROM r JOIN n ON r.user_id = n.user_id WHERE r.i = n.mx)
           |SELECT CAST(count(*) AS BIGINT) AS n_users,
           |  CAST(sum(CASE WHEN lv >= 0 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_level1,
           |  CAST(sum(CASE WHEN bd >= 0 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_level2,
           |  CAST(sum(l3) AS BIGINT) AS n_level3
           |FROM st""".stripMargin
      }),

    // Ordered funnel (view -> click -> purchase): stage N counts users
    // whose earliest stage-N event strictly follows their earliest
    // stage-(N-1) event. Every stage is a groupBy(user) + equi-join on
    // user — shuffle keys are user ids throughout, never a time-range
    // product, so the funnel scales with events/user, not corpus size.
    Q("q_funnel",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, "user_id").filter(col("ts") > col("t1"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, "user_id").filter(col("ts") > col("t2"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
        ev.agg(countDistinct(col("user_id")).as("n_users"))
          .crossJoin(v.agg(count(lit(1)).as("n_view")))
          .crossJoin(c.agg(count(lit(1)).as("n_click_after_view")))
          .crossJoin(p.agg(count(lit(1)).as("n_purchase_after_click")))
      },
      Some("""WITH v AS (
         |  SELECT user_id, min(ts) AS t1 FROM events
         |  WHERE event_type = 'view' GROUP BY user_id),
         |c AS (
         |  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
         |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
         |p AS (
         |  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
         |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
         |SELECT
         |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events) AS n_users,
         |  (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
         |  (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_click_after_view,
         |  (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchase_after_click""".stripMargin)),

    // Weekly cohort retention: users grouped by the week of their first
    // event; cell (cohort, week_n) counts members active n weeks later.
    // Two shuffles (per-user first-week agg, then the cohort-cell agg) —
    // the matrix is (weeks x weeks), tiny at any corpus size.
    Q("q_cohort_retention",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
        ev.distinct().join(first, "user_id")
          .groupBy(col("cohort"),
            (datediff(col("wk"), col("cohort")) / 7).cast("long").as("week_n"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
            col("week_n"), col("n_active"))
          .orderBy(col("cohort_week"), col("week_n"))
      },
      Some("""WITH ev AS (
         |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
         |f AS (SELECT user_id, min(wk) AS cohort FROM ev GROUP BY user_id)
         |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
         |  CAST(date_diff('day', cohort, wk) // 7 AS BIGINT) AS week_n,
         |  CAST(count(DISTINCT ev.user_id) AS BIGINT) AS n_active
         |FROM ev JOIN f USING (user_id)
         |GROUP BY cohort, week_n
         |ORDER BY cohort_week, week_n""".stripMargin)),

    // Kaplan-Meier survival analysis (Kaplan & Meier 1958) over
    // repurchase gaps — the survival/reliability family beside q_churn's
    // binary flag and q_cohort_retention's matrix: spells are the days
    // between a customer's consecutive orders (event = the next order
    // arrives) with the last spell RIGHT-CENSORED at the snapshot date —
    // the estimator that handles "hasn't repurchased YET" correctly
    // where a naive mean-gap drops exactly the loyal tail. S(t) =
    // prod_{t_i <= t} (1 - d_i / n_i) over the distinct-duration grid.
    // Exactness: d/c/n_risk are exact BIGINTs on a CALENDAR-bounded grid
    // (probed: 547/1029/1500 distinct durations — days, not rows); the
    // survival product is a sequential double fold in ONE fixed op order
    // — Spark as the aggregate-HOF path fold (the q_holt_forecast
    // pattern, with the at-risk decrement carried in the state), DuckDB
    // as the identical recursive CTE — so the doubles match bitwise.
    // Scale shape: one user-keyed lead window (bounded per user), one
    // duration-grid aggregate, then calendar-sized math.
    Q("q_survival",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val o = Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
          .withColumn("nxt", lead(col("o_orderdate"), 1).over(w))
        val mx = o.agg(max(col("o_orderdate")).as("mx"))
        val spells = o.crossJoin(broadcast(mx))
          .select(datediff(coalesce(col("nxt"), col("mx")),
            col("o_orderdate")).cast("long").as("dur"),
            col("nxt").isNotNull.cast("long").as("ev"))
        val grid = spells.groupBy(col("dur"))
          .agg(sum(col("ev")).as("d"),
            sum(lit(1L) - col("ev")).as("c"))
        val ser = grid.agg(
          sort_array(collect_list(struct(col("dur"), col("d"), col("c"))))
            .as("g"),
          sum(col("d") + col("c")).as("tot"))
        ser.select(explode(expr(
            """slice(aggregate(g,
              |  array(named_struct('dur', -1L, 'nr', tot, 'd', 0L,
              |    'c', 0L, 's', CAST(1.0 AS DOUBLE))),
              |  (acc, x) -> concat(acc, array(named_struct(
              |    'dur', x.dur,
              |    'nr', element_at(acc, -1).nr - element_at(acc, -1).d
              |      - element_at(acc, -1).c,
              |    'd', x.d, 'c', x.c,
              |    's', element_at(acc, -1).s * (CAST(1.0 AS DOUBLE) -
              |      CAST(x.d AS DOUBLE) /
              |      CAST(element_at(acc, -1).nr - element_at(acc, -1).d
              |        - element_at(acc, -1).c AS DOUBLE)))))),
              |2, size(g))""".stripMargin)).as("p"))
          .select(col("p.dur").as("dur"), col("p.nr").as("n_risk"),
            col("p.d").as("d_events"), col("p.c").as("n_censored"),
            col("p.s").as("survival"))
          .orderBy(col("dur"))
      },
      Some("""WITH RECURSIVE o AS (
         |  SELECT o_custkey, o_orderdate, o_orderkey,
         |    lead(o_orderdate) OVER (PARTITION BY o_custkey
         |      ORDER BY o_orderdate, o_orderkey) AS nxt
         |  FROM orders),
         |m AS (SELECT max(o_orderdate) AS mx FROM orders),
         |sp AS (
         |  SELECT CAST(date_diff('day', o_orderdate, coalesce(nxt, m.mx))
         |      AS BIGINT) AS dur,
         |    CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS ev
         |  FROM o, m),
         |grid AS (
         |  SELECT dur, CAST(sum(ev) AS BIGINT) AS d,
         |    CAST(sum(1 - ev) AS BIGINT) AS c
         |  FROM sp GROUP BY dur),
         |g AS (SELECT CAST(row_number() OVER (ORDER BY dur) AS BIGINT)
         |    AS i, dur, d, c FROM grid),
         |tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS n FROM grid),
         |r(i, dur, nr, d, c, s) AS (
         |  SELECT CAST(0 AS BIGINT), CAST(-1 AS BIGINT), n,
         |    CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1.0 AS DOUBLE)
         |  FROM tot
         |  UNION ALL
         |  SELECT g.i, g.dur, r.nr - r.d - r.c, g.d, g.c,
         |    r.s * (CAST(1.0 AS DOUBLE) - CAST(g.d AS DOUBLE) /
         |      CAST(r.nr - r.d - r.c AS DOUBLE))
         |  FROM r JOIN g ON g.i = r.i + 1)
         |SELECT dur, nr AS n_risk, d AS d_events, c AS n_censored,
         |  s AS survival
         |FROM r WHERE i >= 1 ORDER BY dur""".stripMargin)),

    // Cohort LTV curves — the MONEY companion to q_cohort_retention's
    // activity matrix: customers grouped by first-order month, cell
    // (cohort, age) carries that month-age's exact cents revenue, and
    // the running window turns each cohort's row into its cumulative
    // lifetime value — the curve a marginal-CAC decision reads. All
    // integer: month indices are year*12+month arithmetic (no date
    // subtraction ambiguity), revenue rides the cents grid, and the
    // cumulative sum is BIGINT. Scale shape: one per-customer first-
    // order aggregate, one cohort-cell aggregate, then a window over
    // the (months x months) CALENDAR grid (~3.2k cells at 80 months) —
    // never row-scale.
    Q("q_cohort_ltv",
      (s, d) => {
        val o = Tables.orders(s, d).select(
          col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("mi"),
          floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"))
        val first = o.groupBy(col("o_custkey")).agg(min(col("mi")).as("ci"))
        val w = Window.partitionBy(col("ci")).orderBy(col("age"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o.join(first, "o_custkey")
          .groupBy(col("ci"), (col("mi") - col("ci")).as("age"))
          .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("rev"))
          .withColumn("cum_ltv", sum(col("rev")).over(w))
          .select(
            format_string("%04d-%02d", expr("(ci - 1) div 12"),
              (col("ci") - 1) % 12 + 1).as("cohort"),
            col("age"), col("n_orders"), col("rev"), col("cum_ltv"))
          .orderBy(col("cohort"), col("age"))
      },
      Some("""WITH o AS (
         |  SELECT o_custkey,
         |    CAST(year(o_orderdate)*12 + month(o_orderdate) AS BIGINT)
         |      AS mi,
         |    CAST(floor(o_totalprice * 100.0) AS BIGINT) AS cents
         |  FROM orders),
         |f AS (SELECT o_custkey, min(mi) AS ci FROM o GROUP BY 1),
         |cell AS (
         |  SELECT ci, mi - ci AS age,
         |    CAST(count(*) AS BIGINT) AS n_orders,
         |    CAST(sum(cents) AS BIGINT) AS rev
         |  FROM o JOIN f USING (o_custkey)
         |  GROUP BY ci, age)
         |SELECT printf('%04d-%02d', (ci - 1) // 12, (ci - 1) % 12 + 1)
         |    AS cohort,
         |  age, n_orders, rev,
         |  CAST(sum(rev) OVER (PARTITION BY ci ORDER BY age
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_ltv
         |FROM cell ORDER BY cohort, age""".stripMargin)),

    // Unpivot/melt (wide -> long): per-brand metric columns melted into
    // (brand, metric, value) rows — the inverse of q_pivot, and the
    // standard reshape before per-metric aggregation in feature pipelines.
    // A narrow Expand projection (each input row emits #metrics rows, no
    // shuffle beyond the upstream agg).
    Q("q_unpivot",
      (s, d) => Tables.part(s, d)
        .groupBy(col("p_brand"))
        .agg(H.dsum(col("p_retailprice")).as("sum_price"),
          sum(col("p_size")).cast("double").as("sum_size"),
          count(lit(1)).cast("double").as("n_parts"))
        .unpivot(Array(col("p_brand")),
          Array(col("sum_price"), col("sum_size"), col("n_parts")),
          "metric", "value")
        .orderBy(col("p_brand"), col("metric")),
      Some("""WITH g AS (
         |  SELECT p_brand,
         |    CAST(sum(CAST(p_retailprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price,
         |    CAST(sum(p_size) AS DOUBLE) AS sum_size,
         |    CAST(count(*) AS DOUBLE) AS n_parts
         |  FROM part GROUP BY p_brand)
         |SELECT p_brand, metric, value FROM (
         |  SELECT p_brand, 'sum_price' AS metric, sum_price AS value FROM g
         |  UNION ALL SELECT p_brand, 'sum_size', sum_size FROM g
         |  UNION ALL SELECT p_brand, 'n_parts', n_parts FROM g)
         |ORDER BY p_brand, metric""".stripMargin)),

    // RANGE-frame window: trailing-90-day revenue per customer — a VALUE
    // range over event time (rows-frames elsewhere in the registry can't
    // express "last 90 days", only "last N rows"). Partitioned per
    // customer, so frames stay bounded at any corpus size; the sum routes
    // through DECIMAL so frame-internal order can't perturb the double.
    Q("q_range_window",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
          .rangeBetween(-90, Window.currentRow)
        Tables.orders(s, d).filter(col("o_custkey") < 50)
          .withColumn("day",
            datediff(col("o_orderdate"), to_date(lit("1992-01-01"))).cast("long"))
          .withColumn("trail90",
            sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(25, 6)))
              .over(w).cast("double"))
          .select(col("o_custkey"), col("o_orderkey"), col("day"), col("trail90"))
          .orderBy(col("o_custkey"), col("day"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
         |  CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS day,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) OVER (
         |    PARTITION BY o_custkey
         |    ORDER BY date_diff('day', DATE '1992-01-01', o_orderdate)
         |    RANGE BETWEEN 90 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trail90
         |FROM orders WHERE o_custkey < 50
         |ORDER BY o_custkey, day, o_orderkey""".stripMargin)),

    // Explicit GROUPING SETS (neither rollup nor cube: the two 1-dim
    // slices plus the grand total, WITHOUT the 2-dim cells), through the
    // SQL surface. grouping() disambiguates real NULLs from subtotal rows.
    Q("q_grouping_sets",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_v")
        s.sql("""
          SELECT coalesce(o_orderstatus, 'ALL') AS status,
            coalesce(o_orderpriority, 'ALL') AS priority,
            count(1) AS n,
            CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total
          FROM orders_v
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          ORDER BY status, priority""")
      },
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
         |  coalesce(o_orderpriority, 'ALL') AS priority,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY status, priority""".stripMargin)),

    // FULL OUTER join: monthly order counts of the 'F' vs 'O' status
    // populations (they occupy mostly-disjoint date ranges, so both
    // null sides are genuinely exercised). Zero-filled with coalesce.
    Q("q_full_outer",
      (s, d) => {
        val ord = Tables.orders(s, d)
        def monthly(status: String, alias: String) = ord
          .filter(col("o_orderstatus") === status)
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
          .agg(count(lit(1)).as(alias))
        monthly("F", "n_f").join(monthly("O", "n_o"), Seq("month"), "full_outer")
          .select(col("month"),
            coalesce(col("n_f"), lit(0L)).as("n_f"),
            coalesce(col("n_o"), lit(0L)).as("n_o"))
          .orderBy(col("month"))
      },
      Some("""WITH f AS (
         |  SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n_f
         |  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
         |o AS (
         |  SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n_o
         |  FROM orders WHERE o_orderstatus = 'O' GROUP BY 1)
         |SELECT coalesce(f.month, o.month) AS month,
         |  CAST(coalesce(n_f, 0) AS BIGINT) AS n_f,
         |  CAST(coalesce(n_o, 0) AS BIGINT) AS n_o
         |FROM f FULL OUTER JOIN o ON f.month = o.month
         |ORDER BY month""".stripMargin)),

    // Time-series resample + gap-fill: per-customer monthly activity over
    // the corpus' full month span, missing months zero-filled. The month
    // grid is GENERATED (sequence over the min..max span — one 1-row agg,
    // never a corpus shuffle) and cross-joined with the small key set;
    // actuals then LEFT-join the grid on (key, month). At 100 TB the grid
    // is keys x months rows — tiny relative to the fact table — and the
    // only wide shuffle is the per-(key,month) aggregate of the facts.
    Q("q_gapfill",
      (s, d) => {
        val ord = Tables.orders(s, d)
          .withColumn("month", trunc(col("o_orderdate"), "month"))
        val span = ord.agg(min(col("month")).as("lo"), max(col("month")).as("hi"))
        val months = span.select(
          explode(sequence(col("lo"), col("hi"), expr("interval 1 month"))).as("month"))
        val active = ord.filter(col("o_custkey") < 10)
        val grid = active.select(col("o_custkey")).distinct().crossJoin(months)
        val actual = active.groupBy(col("o_custkey"), col("month"))
          .agg(count(lit(1)).as("n_orders"), H.dsum(col("o_totalprice")).as("revenue"))
        grid.join(actual, Seq("o_custkey", "month"), "left")
          .select(col("o_custkey"),
            date_format(col("month"), "yyyy-MM").as("month"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("revenue"), lit(0.0)).as("revenue"))
          .orderBy(col("o_custkey"), col("month"))
      },
      Some("""WITH ord AS (
         |  SELECT o_custkey, date_trunc('month', o_orderdate) AS month, o_totalprice
         |  FROM orders),
         |span AS (SELECT min(month) AS lo, max(month) AS hi FROM ord),
         |months AS (
         |  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
         |    CAST(hi AS TIMESTAMP), INTERVAL 1 MONTH)) AS DATE) AS month FROM span),
         |keys AS (SELECT DISTINCT o_custkey FROM ord WHERE o_custkey < 10),
         |grid AS (SELECT o_custkey, month FROM keys CROSS JOIN months),
         |actual AS (
         |  SELECT o_custkey, month, count(*) AS n_orders,
         |    CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS revenue
         |  FROM ord WHERE o_custkey < 10 GROUP BY 1, 2)
         |SELECT g.o_custkey, strftime(g.month, '%Y-%m') AS month,
         |  CAST(coalesce(a.n_orders, 0) AS BIGINT) AS n_orders,
         |  coalesce(a.revenue, 0.0) AS revenue
         |FROM grid g LEFT JOIN actual a
         |  ON g.o_custkey = a.o_custkey AND g.month = a.month
         |ORDER BY g.o_custkey, month""".stripMargin)),

    // Declarative data-quality suite (the Deequ/dbt-test operator
    // class): seven constraints over the star schema — primary-key
    // uniqueness, two referential-integrity checks, a not-null check,
    // an accepted-values check and two range checks — each reported as
    // (check_name, n_checked, n_violations, passed). Three checks FAIL
    // on the fixture by design (returnflag 'R', discounts > 0.08,
    // totalprice > 300k), so the violation counting is exercised, not
    // just the all-green path. Scale shape: ALL row-level checks on a
    // table fold into ONE aggregate pass over that table's scan (a
    // sum(when) per check — adding a check costs a column, not a
    // scan); the PK check is one countDistinct; each FK check is one
    // key-partitioned left_anti against the parent's key projection.
    // The result pivot runs on a 1-row relation.
    Q("q_dq_checks",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val ord = Tables.orders(s, d)
        val cust = Tables.customer(s, d)
        val liChecks = li.agg(
          count(lit(1)).as("n_li"),
          sum(when(!col("l_returnflag").isin("A", "N"), 1L).otherwise(0L))
            .as("v_flag"),
          sum(when(col("l_discount") < 0.0 || col("l_discount") > 0.08, 1L)
            .otherwise(0L)).as("v_disc"),
          sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("v_ship"))
        val ordChecks = ord.agg(
          count(lit(1)).as("n_ord"),
          (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_pk"),
          sum(when(col("o_totalprice") > 300000.0, 1L).otherwise(0L))
            .as("v_price"))
        val fkLi = li.select(col("l_orderkey"))
          .join(ord.select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("v_fk_li"))
        val fkOrd = ord.select(col("o_custkey"))
          .join(cust.select(col("c_custkey")),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("v_fk_ord"))
        val one = liChecks.crossJoin(ordChecks).crossJoin(fkLi).crossJoin(fkOrd)
        // The 7-way union of selects over `one` looks like it recomputes
        // the aggregate per branch — it does NOT lose time: Catalyst
        // prunes each branch to just ITS columns, so each recompute is a
        // cheap single-purpose aggregate, and a measured single-subtree
        // explode(array(struct...)) rewrite was SLOWER (0.83 -> 1.07s
        // isolated; on q_profile the same rewrite cost 0.60 -> 4.62s by
        // forcing the ONE 4-way multi-distinct Expand the pruned
        // branches each avoid). Branch-pruned unions are the measured
        // right plan for 1-row pivots over multi-distinct aggregates.
        def row(name: String, checked: org.apache.spark.sql.Column,
            viol: org.apache.spark.sql.Column) =
          one.select(lit(name).as("check_name"), checked.as("n_checked"),
            viol.as("n_violations"), (viol === 0L).as("passed"))
        row("accepted_values_l_returnflag", col("n_li"), col("v_flag"))
          .union(row("fk_lineitem_orderkey", col("n_li"), col("v_fk_li")))
          .union(row("fk_orders_custkey", col("n_ord"), col("v_fk_ord")))
          .union(row("not_null_l_shipdate", col("n_li"), col("v_ship")))
          .union(row("pk_unique_o_orderkey", col("n_ord"), col("v_pk")))
          .union(row("range_l_discount", col("n_li"), col("v_disc")))
          .union(row("range_o_totalprice", col("n_ord"), col("v_price")))
          .orderBy(col("check_name"))
      },
      Some("""WITH lic AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_li,
         |    CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N') THEN 1 ELSE 0 END) AS BIGINT) AS v_flag,
         |    CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.08 THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
         |    CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_ship
         |  FROM lineitem),
         |oc AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_ord,
         |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS v_pk,
         |    CAST(sum(CASE WHEN o_totalprice > 300000.0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price
         |  FROM orders),
         |fk1 AS (
         |  SELECT CAST(count(*) AS BIGINT) AS v_fk_li FROM lineitem l
         |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
         |fk2 AS (
         |  SELECT CAST(count(*) AS BIGINT) AS v_fk_ord FROM orders o
         |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
         |one AS (SELECT * FROM lic, oc, fk1, fk2)
         |SELECT check_name, n_checked, n_violations, n_violations = 0 AS passed
         |FROM (
         |  SELECT 'accepted_values_l_returnflag' AS check_name, n_li AS n_checked, v_flag AS n_violations FROM one
         |  UNION ALL SELECT 'fk_lineitem_orderkey', n_li, v_fk_li FROM one
         |  UNION ALL SELECT 'fk_orders_custkey', n_ord, v_fk_ord FROM one
         |  UNION ALL SELECT 'not_null_l_shipdate', n_li, v_ship FROM one
         |  UNION ALL SELECT 'pk_unique_o_orderkey', n_ord, v_pk FROM one
         |  UNION ALL SELECT 'range_l_discount', n_li, v_disc FROM one
         |  UNION ALL SELECT 'range_o_totalprice', n_ord, v_price FROM one) t
         |ORDER BY check_name""".stripMargin)),

    // Table profiling — the discovery half of the data-quality pair
    // (q_dq_checks asserts known constraints; this SUMMARIZES unknown
    // data): per-column row count, null count, exact distinct count and
    // min/max over four lineitem columns of three different types
    // (numeric, string, timestamp — timestamps profile as epoch
    // micros, so min/max stay in the exact-double lane). The pivot's
    // union branches each prune the aggregate to one column's stats, so
    // the plan runs four cheap SINGLE-distinct aggregates instead of
    // one 4-way multi-distinct Expand — measured 7.7x faster than the
    // single-subtree formulation (see the in-line note; production
    // profilers swap in the mergeable HLL sketch q_approx_distinct
    // demonstrates when 2% error is acceptable).
    Q("q_profile",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val one = li.agg(
          count(lit(1)).as("n"),
          sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("nn_qty"),
          countDistinct(col("l_quantity")).as("nd_qty"),
          min(col("l_quantity")).as("mn_qty"), max(col("l_quantity")).as("mx_qty"),
          sum(when(col("l_discount").isNull, 1L).otherwise(0L)).as("nn_disc"),
          countDistinct(col("l_discount")).as("nd_disc"),
          min(col("l_discount")).as("mn_disc"), max(col("l_discount")).as("mx_disc"),
          sum(when(col("l_returnflag").isNull, 1L).otherwise(0L)).as("nn_flag"),
          countDistinct(col("l_returnflag")).as("nd_flag"),
          min(col("l_returnflag")).as("mn_flag"), max(col("l_returnflag")).as("mx_flag"),
          sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("nn_ship"),
          countDistinct(col("l_shipdate")).as("nd_ship"),
          // l_shipdate is parquet TIMESTAMP_NTZ; the session TZ is pinned
          // UTC (Sessions.scala) so the cast is an exact reinterpretation
          // (the Tables.normalizeEventTs rule applied locally)
          min(unix_micros(col("l_shipdate").cast("timestamp"))).as("mn_ship"),
          max(unix_micros(col("l_shipdate").cast("timestamp"))).as("mx_ship"))
        // see q_dq_checks: the branch-pruned union is the measured
        // right pivot here — each union branch recomputes a PRUNED
        // single-distinct aggregate (no 4-way Expand); the "one pass"
        // explode rewrite measured 0.60 -> 4.62s
        def row(name: String, nn: String, nd: String,
            mnNum: Option[org.apache.spark.sql.Column],
            mnStr: Option[org.apache.spark.sql.Column],
            mxNum: Option[org.apache.spark.sql.Column],
            mxStr: Option[org.apache.spark.sql.Column]) =
          one.select(lit(name).as("column_name"), col("n"),
            col(nn).as("n_null"), col(nd).as("n_distinct"),
            mnNum.getOrElse(lit(null).cast("double")).as("min_num"),
            mxNum.getOrElse(lit(null).cast("double")).as("max_num"),
            mnStr.getOrElse(lit(null).cast("string")).as("min_str"),
            mxStr.getOrElse(lit(null).cast("string")).as("max_str"))
        row("l_discount", "nn_disc", "nd_disc",
            Some(col("mn_disc")), None, Some(col("mx_disc")), None)
          .union(row("l_quantity", "nn_qty", "nd_qty",
            Some(col("mn_qty")), None, Some(col("mx_qty")), None))
          .union(row("l_returnflag", "nn_flag", "nd_flag",
            None, Some(col("mn_flag")), None, Some(col("mx_flag"))))
          .union(row("l_shipdate", "nn_ship", "nd_ship",
            Some(col("mn_ship").cast("double")), None,
            Some(col("mx_ship").cast("double")), None))
          .orderBy(col("column_name"))
      },
      Some("""WITH one AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_qty,
         |    CAST(count(DISTINCT l_quantity) AS BIGINT) AS nd_qty,
         |    min(l_quantity) AS mn_qty, max(l_quantity) AS mx_qty,
         |    CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_disc,
         |    CAST(count(DISTINCT l_discount) AS BIGINT) AS nd_disc,
         |    min(l_discount) AS mn_disc, max(l_discount) AS mx_disc,
         |    CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_flag,
         |    CAST(count(DISTINCT l_returnflag) AS BIGINT) AS nd_flag,
         |    min(l_returnflag) AS mn_flag, max(l_returnflag) AS mx_flag,
         |    CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_ship,
         |    CAST(count(DISTINCT l_shipdate) AS BIGINT) AS nd_ship,
         |    CAST(epoch_us(min(l_shipdate)) AS BIGINT) AS mn_ship,
         |    CAST(epoch_us(max(l_shipdate)) AS BIGINT) AS mx_ship
         |  FROM lineitem)
         |SELECT column_name, n, n_null, n_distinct, min_num, max_num, min_str, max_str
         |FROM (
         |  SELECT 'l_discount' AS column_name, n, nn_disc AS n_null, nd_disc AS n_distinct,
         |    mn_disc AS min_num, mx_disc AS max_num,
         |    CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM one
         |  UNION ALL SELECT 'l_quantity', n, nn_qty, nd_qty, mn_qty, mx_qty, NULL, NULL FROM one
         |  UNION ALL SELECT 'l_returnflag', n, nn_flag, nd_flag, NULL, NULL, mn_flag, mx_flag FROM one
         |  UNION ALL SELECT 'l_shipdate', n, nn_ship, nd_ship,
         |    CAST(mn_ship AS DOUBLE), CAST(mx_ship AS DOUBLE), NULL, NULL FROM one) t
         |ORDER BY column_name""".stripMargin)),

    // Per-group statistical outlier detection — the data-CLEANING step
    // next to q_profile's data-DESCRIPTION: per event type, flag events
    // whose value sits more than 3 sigma from the group mean, report
    // the contamination count and the worst z-score. Two passes, both
    // cheap: one map-side-combinable group aggregate for the exact
    // moments (n, sum, sum-of-squares — decimal-routed so the reduction
    // is order-free), then the group stats BROADCAST back (the group
    // relation is event-type-sized, 5 rows at any SF) and z computed as
    // a narrow projection. Parity: the only order-sensitive reductions
    // are the two decimal sums; mean/var/std/z are identical IEEE
    // scalar arithmetic on identical inputs, so the >3 flags and max
    // |z| match bitwise with no tolerance.
    Q("q_outliers",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("event_type"), col("value"))
        val stats = ev.groupBy(col("event_type").as("et"))
          .agg(count(lit(1)).as("n"),
            H.dsum(col("value")).as("s1"),
            H.dsum(col("value") * col("value")).as("s2"))
          .select(col("et"), col("n"),
            (col("s1") / col("n")).as("mean"),
            sqrt(col("s2") / col("n") -
              (col("s1") / col("n")) * (col("s1") / col("n"))).as("std"))
        ev.join(broadcast(stats), col("event_type") === col("et"))
          // nullif guard (the q_triangles pattern): a constant-valued
          // group has std = 0, where Spark's Divide and DuckDB's IEEE
          // double division diverge (NULL vs inf) — snap BOTH to NULL.
          .select(col("event_type"), col("n"),
            abs((col("value") - col("mean")) / nullif(col("std"), lit(0.0)))
              .as("az"))
          .groupBy(col("event_type"))
          .agg(max(col("n")).as("n"),
            sum(when(col("az") > 3.0, 1L).otherwise(0L)).as("n_outliers"),
            max(col("az")).as("max_abs_z"))
          .orderBy(col("event_type"))
      },
      Some("""WITH st AS (
         |  SELECT event_type AS et, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS s1,
         |    CAST(sum(CAST(value*value AS DECIMAL(25,6))) AS DOUBLE) AS s2
         |  FROM events GROUP BY 1),
         |ms AS (
         |  SELECT et, n, s1/n AS mean, sqrt(s2/n - (s1/n)*(s1/n)) AS std
         |  FROM st),
         |z AS (
         |  SELECT e.event_type, ms.n,
         |    abs((e.value - ms.mean)/nullif(ms.std, 0)) AS az
         |  FROM events e JOIN ms ON e.event_type = ms.et)
         |SELECT event_type, max(n) AS n,
         |  CAST(sum(CASE WHEN az > 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
         |  max(az) AS max_abs_z
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Group-mean imputation of missing values — the data-REPAIR step
    // beside q_outliers (detect) and q_gapfill (missing ROWS; this is
    // missing VALUES). Missingness is injected deterministically (md5 of
    // the event id, 5%) so both engines see the identical mask; the fill
    // value is the per-type mean of the PRESENT values on the cents
    // grid, floored to BIGINT (mean imputation on an integer grid — the
    // repaired column stays exactly aggregable). Everything is one
    // map-side-combinable aggregate; the post-imputation sum is derived
    // arithmetically (sum_present + n_missing * fill) rather than by a
    // second pass — the production shortcut mean imputation permits.
    Q("q_impute",
      (s, d) => {
        val miss = graft.functions.TextOps.md5Prefix60(
          concat(lit("imp:"), col("event_id").cast("string"))) % 20 === 0
        Tables.events(s, d)
          .select(col("event_type"),
            when(miss, lit(null))
              .otherwise(floor(col("value") * lit(100.0)).cast("long"))
              .as("cents"))
          .groupBy(col("event_type"))
          .agg(count(col("cents")).as("n_present"),
            (count(lit(1)) - count(col("cents"))).as("n_missing"),
            sum(col("cents")).as("sum_present"))
          .select(col("event_type"), col("n_present"), col("n_missing"),
            expr("sum_present div n_present").as("fill_cents"),
            (col("sum_present") +
              col("n_missing") * expr("sum_present div n_present"))
              .as("sum_imputed"))
          .orderBy(col("event_type"))
      },
      Some {
        val miss = graft.OracleSql.hexToLong(
          "md5('imp:' || CAST(event_id AS VARCHAR))", 1, 15) + " % 20 = 0"
        s"""WITH e AS (
           |  SELECT event_type,
           |    CASE WHEN $miss THEN NULL
           |      ELSE CAST(floor(value * 100.0) AS BIGINT) END AS cents
           |  FROM events),
           |g AS (
           |  SELECT event_type,
           |    CAST(count(cents) AS BIGINT) AS n_present,
           |    CAST(count(*) - count(cents) AS BIGINT) AS n_missing,
           |    CAST(sum(cents) AS BIGINT) AS sum_present
           |  FROM e GROUP BY 1)
           |SELECT event_type, n_present, n_missing,
           |  sum_present // n_present AS fill_cents,
           |  sum_present + n_missing * (sum_present // n_present)
           |    AS sum_imputed
           |FROM g ORDER BY event_type""".stripMargin
      }),

    // Winsorization — the data-repair companion that TRANSFORMS instead
    // of flagging: clip l_extendedprice at the exact p01/p99 breakpoints
    // and report, per return flag, how much mass the tails carried.
    // Breakpoints ride the q_ntile scale-honest pattern (ONE percentile
    // aggregate, 1-row broadcast, narrow clip projection — no global
    // sort); the before/after sums route through DECIMAL so the
    // reduction is order-free, and clipped counts are exact BIGINTs.
    Q("q_winsorize",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val bounds = li.agg(percentile(col("l_extendedprice"),
          array(lit(0.01), lit(0.99))).as("bs"))
        li.crossJoin(broadcast(bounds))
          .select(col("l_returnflag"), col("l_extendedprice"),
            col("bs")(0).as("lo"), col("bs")(1).as("hi"))
          .select(col("l_returnflag"),
            (col("l_extendedprice") < col("lo")).cast("long").as("clo"),
            (col("l_extendedprice") > col("hi")).cast("long").as("chi"),
            col("l_extendedprice").as("raw"),
            when(col("l_extendedprice") < col("lo"), col("lo"))
              .when(col("l_extendedprice") > col("hi"), col("hi"))
              .otherwise(col("l_extendedprice")).as("wz"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(col("clo")).as("n_clipped_lo"),
            sum(col("chi")).as("n_clipped_hi"),
            H.dsum(col("raw")).as("sum_raw"),
            H.dsum(col("wz")).as("sum_winsorized"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH b AS (
         |  SELECT quantile_cont(l_extendedprice, [0.01, 0.99]) AS bs
         |  FROM lineitem),
         |c AS (
         |  SELECT l_returnflag,
         |    CASE WHEN l_extendedprice < bs[1] THEN 1 ELSE 0 END AS clo,
         |    CASE WHEN l_extendedprice > bs[2] THEN 1 ELSE 0 END AS chi,
         |    l_extendedprice AS raw,
         |    CASE WHEN l_extendedprice < bs[1] THEN bs[1]
         |         WHEN l_extendedprice > bs[2] THEN bs[2]
         |         ELSE l_extendedprice END AS wz
         |  FROM lineitem, b)
         |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(clo) AS BIGINT) AS n_clipped_lo,
         |  CAST(sum(chi) AS BIGINT) AS n_clipped_hi,
         |  CAST(sum(CAST(raw AS DECIMAL(25,6))) AS DOUBLE) AS sum_raw,
         |  CAST(sum(CAST(wz AS DECIMAL(25,6))) AS DOUBLE)
         |    AS sum_winsorized
         |FROM c GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // The approximate-breakpoints companion to q_winsorize (r12 verdict
    // item 4): exact `percentile` buffers the per-group value multiset in
    // an ObjectHashAggregate — the ONE aggregate in the registry whose
    // executor memory grows with corpus size. Here the breakpoints come
    // from the mergeable fixed-grid HistSketch instead (the
    // q_quantile_merge discipline): domain pre-pass -> 4096-bin global
    // histogram (ONE sparse KB-sized sketch, map-side combined — memory
    // constant in rows at any SF) -> p01/p99 BINS by the ceil-rank walk.
    // Clipping is defined ON THE BIN, not the value (bin < b01 clips to
    // the b01 lower edge; bin > b99 clips to the b99 upper edge), so the
    // clip predicate replays bitwise on both engines with no FP edge
    // cases, and the rank-walk construction yields a PROVEN bound tying
    // approx to exact clip counts: rows below the p01 bin < ceil(n/100)
    // (the exact p01 clip count's ceiling), symmetrically above the p99
    // bin — asserted as the clip_*_bounded booleans. Money sums ride the
    // floor-scale grid (floor(x*1e4) identical on both engines); the
    // thresholds are floor-scaled to 1e9. The exact-vs-approx threshold
    // proximity (|approx - exact| <= one bin width) is spec-gated in
    // AnalyticsSpec against q_winsorize's exact percentile.
    Q("q_winsorize_approx",
      (s, d) => {
        import graft.functions.HistOps
        val li = Tables.lineitem(s, d)
          .select(col("l_returnflag"), col("l_extendedprice").as("v"))
        val dom = li.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
        val width = (col("hi") - col("lo")) / lit(4096.0)
        val binned = li.crossJoin(broadcast(dom))
          .select(col("l_returnflag"), col("v"), col("lo"), width.as("width"),
            least(floor((col("v") - col("lo")) / width).cast("long"),
              lit(4095L)).as("bin"))
        val thr = binned
          .agg(HistOps.histAgg(col("bin"), 4096).as("sk"),
            count(lit(1)).as("n"),
            min(col("lo")).as("lo"), min(col("width")).as("width"))
          .select(col("n"), col("lo"), col("width"),
            HistOps.histRankBin(col("sk"), 1L, 100L).as("b01"),
            HistOps.histRankBin(col("sk"), 99L, 100L).as("b99"))
          .select(col("n"), col("b01"), col("b99"),
            (col("lo") + col("b01").cast("double") * col("width")).as("lo_t"),
            (col("lo") + (col("b99") + lit(1L)).cast("double") * col("width"))
              .as("hi_t"))
        val perFlag = binned.crossJoin(broadcast(thr))
          .select(col("l_returnflag"), col("n"),
            (col("bin") < col("b01")).cast("long").as("clo"),
            (col("bin") > col("b99")).cast("long").as("chi"),
            floor(col("v") * lit(1e4)).cast("long").as("raw4"),
            when(col("bin") < col("b01"), floor(col("lo_t") * lit(1e4)).cast("long"))
              .when(col("bin") > col("b99"), floor(col("hi_t") * lit(1e4)).cast("long"))
              .otherwise(floor(col("v") * lit(1e4)).cast("long")).as("wz4"),
            (floor(col("lo_t") * lit(1e9)) / lit(1e9)).as("lo_t9"),
            (floor(col("hi_t") * lit(1e9)) / lit(1e9)).as("hi_t9"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("clo")).as("n_clipped_lo"),
            sum(col("chi")).as("n_clipped_hi"),
            sum(col("raw4")).as("sum_raw_e4"),
            sum(col("wz4")).as("sum_winsorized_e4"),
            min(col("n")).as("n"),
            min(col("lo_t9")).as("lo_t9"), min(col("hi_t9")).as("hi_t9"))
        val totals = perFlag.agg(sum(col("n_clipped_lo")).as("tlo"),
          sum(col("n_clipped_hi")).as("thi"))
        perFlag.crossJoin(broadcast(totals))
          .select(col("l_returnflag"), col("n_rows"),
            col("n_clipped_lo"), col("n_clipped_hi"),
            col("sum_raw_e4"), col("sum_winsorized_e4"),
            col("lo_t9"), col("hi_t9"),
            // the rank-walk theorems: total rows in bins below b01 sit
            // STRICTLY under ceil(n/100) (= the exact clip count's
            // ceiling), and rows above b99 under n - ceil(99n/100)
            (col("tlo") < expr("(n + 99) div 100")).cast("long")
              .as("clip_lo_bounded"),
            (col("thi") <= col("n") - expr("(n * 99 + 99) div 100"))
              .cast("long").as("clip_hi_bounded"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH li AS (
         |  SELECT l_returnflag, l_extendedprice AS v FROM lineitem),
         |dom AS (SELECT min(v) AS lo, max(v) AS hi FROM li),
         |b AS (
         |  SELECT l_returnflag, v, lo, (hi - lo) / 4096.0 AS width,
         |    LEAST(CAST(floor((v - lo) / ((hi - lo) / 4096.0)) AS BIGINT),
         |      4095) AS bin
         |  FROM li, dom),
         |counts AS (SELECT bin, CAST(count(*) AS BIGINT) AS cnt
         |           FROM b GROUP BY 1),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM counts),
         |cum AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum
         |        FROM counts),
         |q01 AS (SELECT min(bin) AS b01 FROM cum, tot
         |        WHERE cum >= (n * 1 + 99) // 100),
         |q99 AS (SELECT min(bin) AS b99 FROM cum, tot
         |        WHERE cum >= (n * 99 + 99) // 100),
         |thr AS (
         |  SELECT b01, b99, n,
         |    lo + b01 * ((hi - lo) / 4096.0) AS lo_t,
         |    lo + (b99 + 1) * ((hi - lo) / 4096.0) AS hi_t
         |  FROM q01, q99, tot, dom),
         |c AS (
         |  SELECT l_returnflag, n,
         |    CASE WHEN bin < b01 THEN 1 ELSE 0 END AS clo,
         |    CASE WHEN bin > b99 THEN 1 ELSE 0 END AS chi,
         |    CAST(floor(v * 1e4) AS BIGINT) AS raw4,
         |    CAST(floor(CASE WHEN bin < b01 THEN lo_t
         |                    WHEN bin > b99 THEN hi_t
         |                    ELSE v END * 1e4) AS BIGINT) AS wz4,
         |    floor(lo_t * 1e9) / 1e9 AS lo_t9,
         |    floor(hi_t * 1e9) / 1e9 AS hi_t9
         |  FROM b, thr),
         |g AS (
         |  SELECT l_returnflag,
         |    CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(sum(clo) AS BIGINT) AS n_clipped_lo,
         |    CAST(sum(chi) AS BIGINT) AS n_clipped_hi,
         |    CAST(sum(raw4) AS BIGINT) AS sum_raw_e4,
         |    CAST(sum(wz4) AS BIGINT) AS sum_winsorized_e4,
         |    min(n) AS n, min(lo_t9) AS lo_t9, min(hi_t9) AS hi_t9
         |  FROM c GROUP BY 1),
         |t2 AS (SELECT CAST(sum(n_clipped_lo) AS BIGINT) AS tlo,
         |              CAST(sum(n_clipped_hi) AS BIGINT) AS thi FROM g)
         |SELECT l_returnflag, n_rows, n_clipped_lo, n_clipped_hi,
         |  sum_raw_e4, sum_winsorized_e4,
         |  CAST(lo_t9 AS DOUBLE) AS lo_t9, CAST(hi_t9 AS DOUBLE) AS hi_t9,
         |  CAST(CASE WHEN tlo < (n * 1 + 99) // 100 THEN 1 ELSE 0 END
         |    AS BIGINT) AS clip_lo_bounded,
         |  CAST(CASE WHEN thi <= n - (n * 99 + 99) // 100 THEN 1 ELSE 0 END
         |    AS BIGINT) AS clip_hi_bounded
         |FROM g, t2 ORDER BY l_returnflag""".stripMargin)),

    // Distributed triangle counting over the market-basket graph (parts
    // co-occurring in an order) — the canonical cyclic multi-way
    // self-join, via the DEGREE-ORIENTED algorithm (Suri &
    // Vassilvitskii, WWW 2011; "compact-forward"): orient every
    // undirected edge from its lower-(degree, id) endpoint to the
    // higher, enumerate wedges ONLY from each node's out-edges, and
    // close them with a left_semi against the oriented edge set. The
    // orientation is the whole scale story: out-degrees are bounded by
    // O(sqrt(m)), so oriented wedges (41.1M at sf0.1) stay 3.6x below
    // the unoriented wedge count (147.8M) and hot hub nodes never
    // enumerate their full neighborhood — the skew-resistant plan for a
    // power-law graph at 100 TB. Edge generation is per-order bounded
    // (C(lines-per-order, 2) pairs, ~4 lines/order), the degree table
    // is node-sized, and every join is an equi-join (pair-key
    // partitioned); no cartesian anywhere. All outputs are exact
    // BIGINTs; the clustering coefficient is one double division of
    // exact longs — deterministic on both engines.
    Q("q_triangles",
      (s, d) => {
        val stats = triangleStats(basketEdges(s, d))
        stats.select(col("n_nodes"), col("n_edges"), col("n_wedges"),
          col("n_triangles"),
          // nullif-style zero guard: on a wedge-free degenerate graph
          // Spark's Divide yields NULL while DuckDB's IEEE float division
          // yields inf — NULL on both engines keeps oracle parity there.
          (lit(3.0) * col("n_triangles") /
            when(col("all_wedges") === 0, lit(null)).otherwise(col("all_wedges")))
            .as("global_cc"))
      },
      Some(triangleOracle(sampleWhere = "",
        select = """SELECT n_nodes, ne.n_edges, nw.n_wedges, tri.n_triangles,
         |  3.0 * tri.n_triangles / nullif(agg.all_wedges, 0) AS global_cc
         |FROM agg, ne, nw, tri"""))),

    // Doulion (Tsourakakis et al., KDD 2009) sampled-triangle companion —
    // the production path next to q_triangles' exact count, exactly as
    // q_minhash_lsh is to q_ngram_jaccard: keep each EDGE with
    // probability p = 3/10 (deterministically — an md5 bucket of the
    // canonical pair, so both engines keep the SAME sample and the
    // result hash-matches with no tolerance), run the identical
    // degree-oriented count on the sampled graph, and scale by 1/p^3 =
    // 1000/27 (integer numerator first, ONE double division — bit-equal
    // both sides). Wedge volume drops by ~p^2 (measured ~10x less
    // shuffle), which is the whole point at 100 TB; the estimator is
    // unbiased with concentration bounds from the paper. The SAMPLED
    // counts are exact on both engines; the accuracy-vs-exact claim is
    // asserted in PlanGuardSpec at fixture scale rather than oracled.
    Q("q_triangles_sampled",
      (s, d) => {
        val sampled = basketEdges(s, d).filter(edgeKeep)
        val stats = triangleStats(sampled)
        stats.select(col("n_edges").as("n_edges_sampled"),
          col("n_wedges").as("n_wedges_sampled"),
          col("n_triangles").as("tri_sampled"),
          ((col("n_triangles") * lit(1000L)).cast("double") / lit(27.0))
            .as("est_triangles"))
      },
      Some(triangleOracle(
        sampleWhere = s"WHERE $edgeKeepSql",
        select = """SELECT ne.n_edges AS n_edges_sampled,
         |  nw.n_wedges AS n_wedges_sampled,
         |  tri.n_triangles AS tri_sampled,
         |  CAST(tri.n_triangles * 1000 AS DOUBLE) / 27.0 AS est_triangles
         |FROM agg, ne, nw, tri"""))),

    // PageRank over the market-basket graph — the canonical iterative
    // distributed-graph workload (power iteration, damping 0.85, 5
    // rounds), top-20 parts by rank. Per round each node ships
    // r(u)/deg(u) along its out-edges and the receiver sums — one
    // edge-keyed equi-join + one node-keyed aggregate per round, the
    // textbook Pregel schedule expressed as DataFrames; eager
    // localCheckpoints cut the 5-round lineage (at 1000 executors: a
    // reliable checkpoint, same note as basketEdges). ORACLE PARITY for
    // an iterative double computation: each round's neighbor sum is the
    // one order-sensitive reduction, so every contribution is
    // FLOOR-SCALED to the 2^-43 grid and summed as DECIMAL(38,0) —
    // exact, order-free — before ONE double rescale (the P43 pattern);
    // the scalar ops around it (1/N, 0.15/N, 0.85*s) are identical IEEE
    // scalar arithmetic on identical inputs. DuckDB replays all 5 rounds
    // as unrolled CTEs; ranks match bitwise and the top-20 needs no
    // tolerance. The undirected basket graph has no dangling nodes
    // (every node has out-degree >= 1), so no dangling redistribution
    // term is needed.
    Q("q_pagerank",
      (s, d) => {
        val P43 = 8796093022208.0
        val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val und = basketEdges(s, d)
        val edges = und.select(col("a").as("src"), col("b").as("dst"))
          .union(und.select(col("b").as("src"), col("a").as("dst")))
          .localCheckpoint(true)
        val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("dd"))
          .localCheckpoint(true)
        val n = deg.count() // 1-row bounded driver value (node count)
        var ranks = deg.select(col("src").as("node"),
          (lit(1.0) / lit(n.toDouble)).as("r"))
        // the 5-round plan stays ONE lazy chain: each round's ranks feed
        // the next exactly once and edges/deg are already checkpointed,
        // so nothing recomputes (measured equal to per-round eager
        // checkpoints at sf0.1 — 4.06 vs 4.27 s isolated min; the cost
        // is the edge build + the 5 keyed shuffles, not lineage). A
        // deep-iteration variant (10s of rounds) would checkpoint every
        // ~5 rounds to bound plan depth.
        for (_ <- 1 to 5) {
          val contrib = edges
            .join(ranks, col("src") === col("node"))
            .join(deg, "src")
            .select(col("dst"),
              floor(col("r") / col("dd") * lit(P43)).cast(dec38).as("c"))
          ranks = contrib.groupBy(col("dst").as("node"))
            .agg((lit(0.15) / lit(n.toDouble) +
              lit(0.85) * (sum(col("c")).cast("double") / lit(P43))).as("r"))
        }
        ranks.select(col("node"), col("r").as("pr"))
          .orderBy(col("pr").desc, col("node"))
          .limit(20)
      },
      Some {
        val iters = (1 to 5).map { i =>
          val prev = if (i == 1) "r0" else s"r${i - 1}"
          s"""r$i AS (
             |  SELECT e.dst AS node,
             |    0.15/(SELECT nn FROM n) + 0.85*(CAST(sum(CAST(floor(p.r/dg.dd*8796093022208.0) AS DECIMAL(38,0))) AS DOUBLE)/8796093022208.0) AS r
             |  FROM edges e JOIN $prev p ON e.src = p.node JOIN deg dg ON dg.src = e.src
             |  GROUP BY e.dst)"""
        }.mkString(",\n")
        s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
           |und AS (
           |  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
           |  FROM li a JOIN li b
           |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
           |edges AS (SELECT a AS src, b AS dst FROM und
           |  UNION ALL SELECT b, a FROM und),
           |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS dd
           |  FROM edges GROUP BY 1),
           |n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM deg),
           |r0 AS (SELECT src AS node, 1.0/nn AS r FROM deg, n),
           |$iters
           |SELECT node, r AS pr FROM r5
           |ORDER BY r DESC, node LIMIT 20""".stripMargin
      }),

    // Deterministic random-walk corpus over the basket graph — the
    // training-data generator graph embeddings (DeepWalk/node2vec) start
    // from: one fixed-length walk per seed node, each step hopping to a
    // pseudo-randomly chosen neighbor. "Random" is a seeded md5 over
    // (seed, step, cur, dst) with a (hash, dst) tie-break, so the walk
    // corpus is BIT-REPRODUCIBLE across engines AND re-runs — the same
    // determinism contract as q_hash_split/q_triangles_sampled, which is
    // what makes walk corpora cacheable and auditable in production.
    // Seeds are an md5-mod 2% node sample (6/34/421 nodes at the three
    // SFs); 4 steps, first-order (unbiased; node2vec's p/q bias would
    // only change the hash's argmin weighting). Scale shape: each step is
    // one edge equi-join keyed on the frontier + a per-seed argmin —
    // walks shard by seed, the frontier is seed-count-sized, and the
    // edge set is the memoized basketEdges build shared with
    // q_triangles/q_pagerank. The oracle unrolls the 4 steps as CTEs.
    Q("q_random_walks",
      (s, d) => {
        val und = basketEdges(s, d)
        val edges = und.select(col("a").as("src"), col("b").as("dst"))
          .union(und.select(col("b").as("src"), col("a").as("dst")))
          .localCheckpoint(true)
        val seedPred = graft.functions.TextOps.md5Prefix60(
          concat(lit("rws:"), col("node").cast("string"))) % 1000 < 20
        var walk = edges.select(col("src").as("node")).distinct()
          .filter(seedPred)
          .select(col("node").as("seed"), col("node").as("cur"))
        for (t <- 1 to 4) {
          val h = graft.functions.TextOps.md5Prefix60(concat(
            lit("rw:"), col("seed").cast("string"), lit(s":$t:"),
            col("cur").cast("string"), lit(":"), col("dst").cast("string")))
          val w = Window.partitionBy(col("seed"))
            .orderBy(col("h").asc, col("dst").asc)
          val prevPath = walk.columns.filter(c => c != "cur").map(col).toSeq
          walk = walk.join(edges, col("cur") === col("src"))
            .select((prevPath :+ col("dst")) :+ h.as("h"): _*)
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1)
            .select((prevPath :+ col("dst").as(s"s$t")) :+ col("dst").as("cur"): _*)
        }
        walk.drop("cur").orderBy(col("seed"))
      },
      Some {
        val seedHash = graft.OracleSql.hexToLong(
          "md5('rws:' || CAST(node AS VARCHAR))", 1, 15)
        val steps = (1 to 4).map { t =>
          val prev = if (t == 1) "w0" else s"w${t - 1}"
          val carried = (1 until t).map(i => s"w.s$i").mkString(", ")
          val carriedSel = if (carried.isEmpty) "" else carried + ", "
          val carriedOut = (1 until t).map(i => s"s$i").mkString(", ")
          val carriedOutSel = if (carriedOut.isEmpty) "" else carriedOut + ", "
          val h = graft.OracleSql.hexToLong(
            s"md5('rw:' || CAST(w.seed AS VARCHAR) || ':$t:' || " +
              s"CAST(w.cur AS VARCHAR) || ':' || CAST(e.dst AS VARCHAR))", 1, 15)
          s"""c$t AS (
             |  SELECT w.seed, ${carriedSel}e.dst,
             |    row_number() OVER (PARTITION BY w.seed ORDER BY $h, e.dst) AS rn
             |  FROM $prev w JOIN edges e ON e.src = w.cur),
             |w$t AS (SELECT seed, ${carriedOutSel}dst AS s$t, dst AS cur
             |  FROM c$t WHERE rn = 1)"""
        }.mkString(",\n")
        s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
           |und AS (
           |  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
           |  FROM li a JOIN li b
           |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
           |edges AS (SELECT a AS src, b AS dst FROM und
           |  UNION ALL SELECT b, a FROM und),
           |nodes AS (SELECT DISTINCT src AS node FROM edges),
           |w0 AS (SELECT node AS seed, node AS cur FROM nodes
           |  WHERE $seedHash % 1000 < 20),
           |$steps
           |SELECT seed, s1, s2, s3, s4 FROM w4 ORDER BY seed""".stripMargin
      }),

    // Synchronous label-propagation COMMUNITY detection (LPA, Raghavan et
    // al. 2007) over the basket graph — the densest-neighborhood
    // clustering next to the connectivity operators (q_dedup_components
    // finds what is REACHABLE; LPA finds what is TIGHT). Each round every
    // node adopts its neighbors' plurality label with a bit-deterministic
    // (count DESC, label ASC) tie-break, so the classic "label storms"
    // nondeterminism of async LPA is removed and DuckDB replays the 3
    // unrolled rounds exactly. Scale shape: per round ONE node-keyed
    // equi-join + a (node, label) count + a per-node argmax window — the
    // same join-agg round as min-label propagation with a plurality
    // instead of a min; edge set is the shared memoized basketEdges.
    Q("q_communities",
      (s, d) => {
        lpaLabels(s, d)
          .groupBy(col("label").as("community"))
          .agg(count(lit(1)).as("size"))
          .orderBy(col("community"))
      },
      Some {
        s"""WITH $LpaOracleCte
           |SELECT CAST(label AS BIGINT) AS community,
           |  CAST(count(*) AS BIGINT) AS size
           |FROM l3 GROUP BY label ORDER BY community""".stripMargin
      }),

    // Newman modularity of the LPA partition (Newman & Girvan 2004) —
    // the QUALITY measure the clustering family lacked (q_calibration
    // plays the same role for the classifier): did q_communities find
    // real structure, or a relabeling of noise? Q = sum_c [ e_c/m -
    // (d_c/2m)^2 ] restated over one common denominator:
    //   Q = (4m * sum_c e_c - sum_c d_c^2) / (4 m^2)
    // — every input an exact BIGINT (intra-community edge count per c,
    // degree sums per c, the undirected edge count m), products routed
    // through DECIMAL(38,0)/HUGEINT (d_c^2 and 4m^2 wrap BIGINT at
    // SF100 edge counts), ONE remainder-subtraction integral division
    // to the 1e9 grid. The numerator can be NEGATIVE (a worse-than-
    // random partition): `num - num % den` truncates toward zero on
    // BOTH engines (Spark and DuckDB % both follow the dividend), so
    // the snapped value is engine-identical there too.
    // Scale shape: two node-keyed label joins onto the edge list + two
    // label-keyed aggregates — the same exchanges one LPA round costs;
    // everything after is community-sized.
    Q("q_modularity",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val labels = lpaLabels(s, d).localCheckpoint(true)
        val und = basketEdges(s, d)
        val lab = und
          .join(labels.select(col("node").as("a"), col("label").as("la")),
            "a")
          .join(labels.select(col("node").as("b"), col("label").as("lb")),
            "b")
        val intra = lab
          .agg(count(lit(1)).as("m"),
            sum(when(col("la") === col("lb"), 1L).otherwise(0L))
              .as("e_intra"))
        val degs = und.select(col("a").as("node"))
          .union(und.select(col("b").as("node")))
          .join(labels, "node")
          .groupBy(col("label")).agg(count(lit(1)).as("d_c"))
        val sumD2 = degs.agg(
          sum(col("d_c").cast(dec) * col("d_c")).cast(dec).as("sum_d2"),
          count(lit(1)).as("n_communities"))
        val base = intra.crossJoin(broadcast(sumD2))
          .select(col("m"), col("e_intra"), col("n_communities"),
            ((col("m").cast(dec) * col("e_intra") * lit(4L) -
              col("sum_d2")) * lit(1000000000L)).cast(dec).as("num"),
            (col("m").cast(dec) * col("m") * lit(4L)).cast(dec).as("den"))
        base
          .withColumn("modularity_e9",
            ((col("num") - col("num") % col("den")) / col("den"))
              .cast(dec).cast("long"))
          .select(col("m").as("m_edges"), col("e_intra"),
            col("n_communities"), col("modularity_e9"),
            (col("modularity_e9") / lit(1e9)).as("modularity"))
      },
      Some {
        s"""WITH $LpaOracleCte,
           |lab AS (
           |  SELECT u.a, u.b, la.label AS la, lb.label AS lb
           |  FROM und u JOIN l3 la ON la.node = u.a
           |    JOIN l3 lb ON lb.node = u.b),
           |intra AS (
           |  SELECT CAST(count(*) AS BIGINT) AS m,
           |    CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
           |      AS e_intra
           |  FROM lab),
           |degs AS (
           |  SELECT l.label, CAST(count(*) AS BIGINT) AS d_c
           |  FROM (SELECT a AS node FROM und
           |        UNION ALL SELECT b FROM und) x
           |  JOIN l3 l ON l.node = x.node
           |  GROUP BY l.label),
           |sd AS (
           |  SELECT sum(CAST(d_c AS HUGEINT) * d_c) AS sum_d2,
           |    CAST(count(*) AS BIGINT) AS n_communities
           |  FROM degs),
           |base AS (
           |  SELECT m, e_intra, n_communities,
           |    (CAST(m AS HUGEINT) * e_intra * 4 - sum_d2) * 1000000000
           |      AS num,
           |    CAST(m AS HUGEINT) * m * 4 AS den
           |  FROM intra, sd)
           |SELECT m AS m_edges, e_intra, n_communities,
           |  CAST((num - num % den) // den AS BIGINT) AS modularity_e9,
           |  CAST((num - num % den) // den AS BIGINT) / 1e9 AS modularity
           |FROM base""".stripMargin
      }),

    // CDC changelog -> snapshot compaction — what a merge-on-read lake
    // format's compaction does, restated on the events fixture as a
    // changelog (signup = insert, error = delete tombstone, other events
    // = updates; ordered per key by (ts, event_id) — the unique
    // tie-break every CDC stream needs, since equal timestamps are real
    // at scale). Replay semantics without replaying: the final state of
    // a key is the LAST upsert after its LAST tombstone — two per-key
    // extremes instead of an ordered scan, so the whole compaction is
    // one key-partitioned shuffle (+ a same-key count the planner
    // colocates), no matter how long the log. Keys whose log ends in a
    // tombstone drop out (users 'deleted' at compaction time), which an
    // ordered full replay would produce identically.
    Q("q_cdc_compact",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("user_id"), col("ts"),
          col("event_id"), col("value"),
          when(col("event_type") === "signup", "I")
            .when(col("event_type") === "error", "D")
            .otherwise("U").as("op"))
        val lastD = ev.filter(col("op") === "D")
          .groupBy(col("user_id"))
          .agg(max(struct(col("ts"), col("event_id"))).as("dmax"))
        val live = ev.filter(col("op") =!= "D")
          .join(lastD, Seq("user_id"), "left")
          .filter(col("dmax").isNull ||
            struct(col("ts"), col("event_id")) > col("dmax"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        val fin = live.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
        val nops = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_ops"))
        fin.join(nops, "user_id")
          .select(col("user_id"), unix_micros(col("ts")).as("last_ts_us"),
            col("value").as("final_value"), col("n_ops"))
          .orderBy(col("user_id"))
      },
      Some("""WITH ev AS (
         |  SELECT user_id, ts, event_id, value,
         |    CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D'
         |      ELSE 'U' END AS op
         |  FROM events),
         |lastd AS (
         |  SELECT user_id, ts AS dts, event_id AS did FROM (
         |    SELECT user_id, ts, event_id,
         |      row_number() OVER (PARTITION BY user_id
         |        ORDER BY ts DESC, event_id DESC) AS rn
         |    FROM ev WHERE op = 'D') t WHERE rn = 1),
         |live AS (
         |  SELECT e.user_id, e.ts, e.event_id, e.value
         |  FROM ev e LEFT JOIN lastd d USING (user_id)
         |  WHERE e.op <> 'D'
         |    AND (d.dts IS NULL OR (e.ts, e.event_id) > (d.dts, d.did))),
         |fin AS (
         |  SELECT user_id, ts, value FROM (
         |    SELECT user_id, ts, value,
         |      row_number() OVER (PARTITION BY user_id
         |        ORDER BY ts DESC, event_id DESC) AS rn
         |    FROM live) t WHERE rn = 1),
         |nops AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ops
         |  FROM ev GROUP BY user_id)
         |SELECT CAST(f.user_id AS BIGINT) AS user_id,
         |  CAST(epoch_us(f.ts) AS BIGINT) AS last_ts_us,
         |  f.value AS final_value, n.n_ops
         |FROM fin f JOIN nops n USING (user_id)
         |ORDER BY user_id""".stripMargin)),

    // k-core peeling over the SUPPORT-THRESHOLDED co-purchase graph — the
    // graph-degeneracy operator next to the connectivity (components),
    // density (LPA communities) and motif (triangles) families. Two-stage
    // pipeline: (1) the Apriori edge filter — keep part pairs co-bought in
    // >= 2 orders, which drops the single-co-occurrence noise edges that
    // dominate a basket graph as it grows (measured: 5,922 nodes but
    // median degree 1 at sf0.1); (2) synchronous 2-core peeling, 3
    // unrolled rounds — each round removes nodes whose CURRENT degree is
    // < 2 and recomputes degrees among survivors. The cascade is real on
    // the fixture (sf0.1: 1,067 -> 138 -> 22 survivors). Scale shape: a
    // round is ONE count aggregate + two node-keyed semi-joins — never a
    // pairwise product; a full decomposition peels to fixpoint with the
    // same per-round cost, rounds bounded by the graph's degeneracy.
    // Aggregates without GROUP BY keep the 3 output rows present even if
    // a larger SF empties a core (count 0, NULL extremes on both engines).
    Q("q_kcore",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val und = li.select(col("l_orderkey"), col("l_partkey").as("a"))
          .join(li.select(col("l_orderkey"), col("l_partkey").as("b")),
            "l_orderkey")
          .filter(col("a") < col("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))
          .filter(col("support") >= 2)
        val edges = und.select(col("a").as("src"), col("b").as("dst"))
          .union(und.select(col("b").as("src"), col("a").as("dst")))
          .localCheckpoint(true)
        var cur = edges
        val stats = (1 to 3).map { r =>
          val deg = cur.groupBy(col("src").as("node"))
            .agg(count(lit(1)).as("deg"))
          val surv = deg.filter(col("deg") >= 2).localCheckpoint(true)
          cur = edges
            .join(surv.select(col("node").as("src")), Seq("src"), "left_semi")
            .join(surv.select(col("node").as("dst")), Seq("dst"), "left_semi")
            .select(col("src"), col("dst"))
          surv.agg(count(lit(1)).as("n_nodes"), min(col("deg")).as("min_deg"),
              max(col("deg")).as("max_deg"))
            .select(lit(r.toLong).as("round"), col("n_nodes"),
              col("min_deg"), col("max_deg"))
        }
        stats.reduce(_ union _).orderBy(col("round"))
      },
      Some {
        val rounds = (1 to 3).map { r =>
          val src = if (r == 1) "edges" else s"e$r"
          val pre = if (r == 1) ""
          else {
            s"""e$r AS (
               |  SELECT e.src, e.dst FROM edges e
               |  WHERE e.src IN (SELECT node FROM s${r - 1})
               |    AND e.dst IN (SELECT node FROM s${r - 1})),
               |""".stripMargin
          }
          s"""${pre}d$r AS (
             |  SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
             |  FROM $src GROUP BY src),
             |s$r AS (SELECT node, deg FROM d$r WHERE deg >= 2)"""
        }.mkString(",\n")
        val sel = (1 to 3).map { r =>
          s"""SELECT CAST($r AS BIGINT) AS round,
             |  CAST(count(*) AS BIGINT) AS n_nodes,
             |  min(deg) AS min_deg, max(deg) AS max_deg FROM s$r"""
        }.mkString("\nUNION ALL ")
        s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
           |und AS (
           |  SELECT a.l_partkey AS a, b.l_partkey AS b
           |  FROM li a JOIN li b
           |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           |  GROUP BY 1, 2 HAVING count(*) >= 2),
           |edges AS (SELECT a AS src, b AS dst FROM und
           |  UNION ALL SELECT b, a FROM und),
           |$rounds
           |SELECT * FROM (
           |$sel) ORDER BY round""".stripMargin
      }),

    // Classical additive seasonal decomposition (trend + seasonal +
    // residual) of the monthly revenue series — the time-series operator
    // beside q_gapfill/q_ewma that every demand or load analysis starts
    // from. Exactness design: the series is dollars-grid BIGINT; the
    // centered 13-month moving-average trend stays an exact integer SUM
    // (t13), and the detrended value d13 = 13*rev - t13 stays BIGINT, so
    // the per-calendar-month seasonal means aggregate EXACT integers —
    // the only doubles are final display scalings (/13, /count), applied
    // in identical op order and floor-scaled. Edge months without a full
    // window are excluded (the standard treatment). Scale shape: one
    // month-grid aggregate; the unpartitioned window runs over the
    // CALENDAR-sized series (~80 rows — in production one window per
    // series key), never over row-scale data. Months are contiguous on
    // this fixture; a gapped series would compose q_gapfill first.
    Q("q_seasonal_decompose",
      (s, d) => {
        val m = Tables.orders(s, d)
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
            month(col("o_orderdate")).as("cal"))
          .agg(sum(floor(col("o_totalprice")).cast("long")).as("rev"))
        val w = Window.orderBy(col("month")).rowsBetween(-6, 6)
        val f = m
          .withColumn("t13", sum(col("rev")).over(w))
          .withColumn("c13", count(lit(1)).over(w))
          .filter(col("c13") === 13)
          .withColumn("d13", lit(13) * col("rev") - col("t13"))
        val seas = f.groupBy(col("cal"))
          .agg(sum(col("d13")).as("sd"), count(lit(1)).as("sc"))
        val seasonal = (col("sd").cast("double") / col("sc")) / lit(13.0)
        f.join(broadcast(seas), "cal")
          .select(col("month"), col("rev"),
            (floor(col("t13").cast("double") / lit(13.0) * lit(1e9))
              / lit(1e9)).as("trend"),
            (floor(seasonal * lit(1e9)) / lit(1e9)).as("seasonal"),
            (floor((col("d13").cast("double") / lit(13.0) - seasonal)
              * lit(1e9)) / lit(1e9)).as("residual"))
          .orderBy(col("month"))
      },
      Some("""WITH m AS (
         |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         |    month(o_orderdate) AS cal,
         |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
         |      AS rev
         |  FROM orders GROUP BY 1, 2),
         |t AS (
         |  SELECT month, cal, rev,
         |    CAST(sum(rev) OVER win AS BIGINT) AS t13,
         |    count(*) OVER win AS c13
         |  FROM m WINDOW win AS (ORDER BY month
         |    ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING)),
         |f AS (
         |  SELECT month, cal, rev, t13, 13*rev - t13 AS d13
         |  FROM t WHERE c13 = 13),
         |s AS (
         |  SELECT cal, CAST(sum(d13) AS BIGINT) AS sd,
         |    CAST(count(*) AS BIGINT) AS sc
         |  FROM f GROUP BY cal)
         |SELECT month, rev,
         |  floor(CAST(t13 AS DOUBLE) / 13.0 * 1e9) / 1e9 AS trend,
         |  floor((CAST(sd AS DOUBLE) / sc) / 13.0 * 1e9) / 1e9 AS seasonal,
         |  floor((CAST(d13 AS DOUBLE) / 13.0
         |    - (CAST(sd AS DOUBLE) / sc) / 13.0) * 1e9) / 1e9 AS residual
         |FROM f JOIN s USING (cal) ORDER BY month""".stripMargin)),

    // Two-sided CUSUM change-point detection (Page 1954) on the monthly
    // revenue series — the SHIFT detector beside q_psi_drift (distribution
    // drift) and q_outliers (point anomalies): a persistent small shift
    // that never trips a 3-sigma test accumulates in the CUSUM until it
    // crosses the decision interval. Exactness: the classic recursion
    // s_t = max(0, s_{t-1} + d_t) is restated in closed form as
    // cum_t - min(0, running_min(cum)) — cumulative sums and running
    // extremes of BIGINT cents deviations, so the whole statistic is
    // exact integer arithmetic; the reference level mu0 is the floored
    // global mean (one integer division), the decision interval h = mu0
    // (one mean month of accumulated deviation). Scale shape: one
    // month-grid aggregate; the unpartitioned window runs over the
    // CALENDAR-sized series (~80 rows — per series key in production),
    // the q_seasonal_decompose precedent.
    Q("q_changepoint",
      (s, d) => {
        val m = Tables.orders(s, d)
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
          .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long"))
            .as("cents"))
        val tot = m.agg(sum(col("cents")).as("sc"), count(lit(1)).as("nm"))
        val w = Window.orderBy(col("month"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        m.crossJoin(broadcast(tot))
          .withColumn("mu0", expr("sc div nm"))
          .withColumn("cum", sum(col("cents") - col("mu0")).over(w))
          .withColumn("cusum_up",
            col("cum") - least(lit(0L), min(col("cum")).over(w)))
          .withColumn("cusum_dn",
            greatest(lit(0L), max(col("cum")).over(w)) - col("cum"))
          .select(col("month"), col("cents"), col("cusum_up"),
            col("cusum_dn"),
            (col("cusum_up") > col("mu0")).cast("long").as("shift_up"),
            (col("cusum_dn") > col("mu0")).cast("long").as("shift_dn"))
          .orderBy(col("month"))
      },
      Some("""WITH m AS (
         |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         |    CAST(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT))
         |      AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS sc,
         |  CAST(count(*) AS BIGINT) AS nm FROM m),
         |cu AS (
         |  SELECT month, cents, sc // nm AS mu0,
         |    CAST(sum(cents - sc // nm) OVER win AS BIGINT) AS cum
         |  FROM m, tot
         |  WINDOW win AS (ORDER BY month
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |c AS (
         |  SELECT month, cents, mu0, cum,
         |    CAST(min(cum) OVER win2 AS BIGINT) AS rmin,
         |    CAST(max(cum) OVER win2 AS BIGINT) AS rmax
         |  FROM cu
         |  WINDOW win2 AS (ORDER BY month
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT month, cents,
         |  cum - least(0, rmin) AS cusum_up,
         |  greatest(0, rmax) - cum AS cusum_dn,
         |  CAST(CASE WHEN cum - least(0, rmin) > mu0 THEN 1 ELSE 0 END
         |    AS BIGINT) AS shift_up,
         |  CAST(CASE WHEN greatest(0, rmax) - cum > mu0 THEN 1 ELSE 0 END
         |    AS BIGINT) AS shift_dn
         |FROM c ORDER BY month""".stripMargin)),

    // Holt double-exponential smoothing + 6-month-ahead linear forecast
    // (Holt 1957) on the monthly revenue series — the FORECAST operator
    // completing the time-series family (q_ewma smooths level only;
    // q_seasonal_decompose explains; this extrapolates). alpha = beta =
    // 1/2, so every recursion step is adds + exact binary halvings:
    //   l_t = (x_t + l_{t-1} + b_{t-1}) / 2
    //   b_t = ((l_t - l_{t-1}) + b_{t-1}) / 2
    // in ONE fixed operation order — Spark folds with the `aggregate`
    // HOF accumulating the full (level, trend) path as an array state,
    // DuckDB replays the identical fold as a recursive CTE, and the
    // doubles match bitwise because both engines execute the same IEEE
    // ops on the same cents-grid inputs (the q_ewma contract, extended
    // to a 2-component state). Forecast rows F1..F6 are l_T + h*b_T.
    // Scale shape: one month-grid aggregate collapses the corpus; the
    // fold runs over the CALENDAR-sized series (~80 rows, one row after
    // the global agg — per series key in production), never row-scale.
    Q("q_holt_forecast",
      (s, d) => {
        val m = Tables.orders(s, d)
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
          .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long"))
            .as("rev"))
        val ser = m.agg(sort_array(collect_list(
          struct(col("month"), col("rev")))).as("ms"))
        def lastS(acc: org.apache.spark.sql.Column) = element_at(acc, -1)
        def lp(acc: org.apache.spark.sql.Column,
            x: org.apache.spark.sql.Column) =
          (x.getField("rev").cast("double") + lastS(acc).getField("l") +
            lastS(acc).getField("b")) * lit(0.5)
        val folded = ser.select(aggregate(
          slice(col("ms"), lit(2), size(col("ms")) - 1),
          array(struct(
            element_at(col("ms"), 1).getField("month").as("month"),
            element_at(col("ms"), 1).getField("rev").cast("double")
              .as("l"),
            lit(0.0).as("b"))),
          (acc, x) => concat(acc, array(struct(
            x.getField("month").as("month"),
            lp(acc, x).as("l"),
            ((lp(acc, x) - lastS(acc).getField("l")) +
              lastS(acc).getField("b")).*(lit(0.5)).as("b"))))).as("path"))
        val fitted = folded
          .select(explode(col("path")).as("p"))
          .select(col("p.month").as("month"), col("p.l").as("level"),
            col("p.b").as("trend"), lit(0L).as("is_forecast"))
        val last = folded.select(lastS(col("path")).as("p"))
          .select(col("p.l").as("l"), col("p.b").as("b"))
        val forecasts = last
          .select(explode(sequence(lit(1), lit(6))).as("h"),
            col("l"), col("b"))
          .select(concat(lit("F"), col("h")).as("month"),
            (col("l") + col("h").cast("double") * col("b")).as("level"),
            col("b").as("trend"), lit(1L).as("is_forecast"))
        fitted.union(forecasts)
          .orderBy(col("is_forecast"), col("month"))
      },
      Some("""WITH RECURSIVE mo AS (
         |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         |    CAST(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT))
         |      AS BIGINT) AS rev
         |  FROM orders GROUP BY 1),
         |mi AS (
         |  SELECT CAST(row_number() OVER (ORDER BY month) AS BIGINT) AS i,
         |    month, rev
         |  FROM mo),
         |h(i, month, l, b) AS (
         |  SELECT i, month, CAST(rev AS DOUBLE), CAST(0.0 AS DOUBLE)
         |  FROM mi WHERE i = 1
         |  UNION ALL
         |  SELECT mi.i, mi.month,
         |    (CAST(mi.rev AS DOUBLE) + h.l + h.b) * 0.5,
         |    (((CAST(mi.rev AS DOUBLE) + h.l + h.b) * 0.5 - h.l) + h.b)
         |      * 0.5
         |  FROM h JOIN mi ON mi.i = h.i + 1),
         |lastrow AS (SELECT l, b FROM h ORDER BY i DESC LIMIT 1)
         |SELECT month, level, trend, is_forecast FROM (
         |  SELECT month, l AS level, b AS trend,
         |    CAST(0 AS BIGINT) AS is_forecast
         |  FROM h
         |  UNION ALL
         |  SELECT 'F' || CAST(t.h AS VARCHAR),
         |    l + CAST(t.h AS DOUBLE) * b, b, CAST(1 AS BIGINT)
         |  FROM lastrow, generate_series(1, 6) t(h))
         |ORDER BY is_forecast, month""".stripMargin)),

    // Benford first-digit audit (Newcomb 1881 / Benford 1938) — the
    // fraud/synthesis detector beside q_dq_checks: naturally-occurring
    // monetary amounts follow P(d) = log10(1 + 1/d); fabricated or
    // truncated data breaks the curve, and the chi-square statistic
    // quantifies the break. Exactness: the leading digit comes from the
    // STRING form of the cents-grid BIGINT (identical on both engines —
    // no log at row level); the nine Benford probabilities are literal
    // double CONSTANTS interpolated from one Scala source into both
    // plans (the q_ndcg precomputed-transcendental pattern); each
    // digit's chi-square term floor-scales to the 1e9 grid so the 9-term
    // sum is an exact BIGINT. The fixture's uniform-ish synthetic prices
    // FAIL Benford — flagged honestly (chi2 >> 21.7): the audit detects
    // exactly the synthetic data it is looking at. Scale shape: one
    // map-side-combinable 9-group aggregate; everything after is 9 rows.
    Q("q_benford",
      (s, d) => {
        val obs = Tables.orders(s, d)
          .select(substring(floor(col("o_totalprice") * lit(100.0))
            .cast("long").cast("string"), 1, 1).cast("long").as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
        val tot = obs.agg(sum(col("n_obs")).as("nn"))
        val pArr = array(BenfordP.map(lit): _*)
        obs.crossJoin(broadcast(tot))
          .withColumn("expected",
            col("nn").cast("double") * element_at(pArr, col("digit").cast("int")))
          .withColumn("dev_scaled",
            floor((col("n_obs").cast("double") - col("expected")) *
              (col("n_obs").cast("double") - col("expected")) /
              col("expected") * lit(1e9)).cast("long"))
          .withColumn("chi2_scaled",
            sum(col("dev_scaled")).over(Window.partitionBy(lit(1))))
          .select(col("digit"), col("n_obs"), col("expected"),
            col("dev_scaled"), col("chi2_scaled"))
          .orderBy(col("digit"))
      },
      Some {
        val pList = BenfordP.mkString("[", ", ", "]")
        s"""WITH obs AS (
           |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100.0)
           |      AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
           |    CAST(count(*) AS BIGINT) AS n_obs
           |  FROM orders GROUP BY 1),
           |tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS nn FROM obs),
           |p(ps) AS (VALUES ($pList)),
           |t AS (
           |  SELECT digit, n_obs,
           |    CAST(nn AS DOUBLE) * ps[CAST(digit AS INT)] AS expected
           |  FROM obs, tot, p),
           |dv AS (
           |  SELECT digit, n_obs, expected,
           |    CAST(floor((CAST(n_obs AS DOUBLE) - expected)
           |      * (CAST(n_obs AS DOUBLE) - expected) / expected * 1e9)
           |      AS BIGINT) AS dev_scaled
           |  FROM t)
           |SELECT digit, n_obs, expected, dev_scaled,
           |  CAST(sum(dev_scaled) OVER () AS BIGINT) AS chi2_scaled
           |FROM dv ORDER BY digit""".stripMargin
      }),

    // Chi-square test of independence + Cramér's V on the order
    // priority x status contingency grid — the CATEGORICAL-association
    // test beside q_benford's goodness-of-fit and q_ab_test's two-sample
    // mean test: does fulfillment status depend on priority, and how
    // strongly (V in [0,1] is the effect size a dashboard actually
    // reports). Exactness: observed counts and margins are exact
    // BIGINTs; each cell's term (obs - exp)^2/exp floor-scales to the
    // 1e9 grid (exp = row*col/n, one identically-ordered double chain),
    // so the 15-term statistic sums as an exact BIGINT; V is one sqrt of
    // the grid-snapped value. Scale shape: one map-side-combinable
    // contingency aggregate; everything after is grid-sized (15 cells).
    Q("q_chi2_assoc",
      (s, d) => {
        val cells = Tables.orders(s, d)
          .groupBy(col("o_orderpriority").as("prio"),
            col("o_orderstatus").as("status"))
          .agg(count(lit(1)).as("obs"))
        val rowm = cells.groupBy(col("prio")).agg(sum(col("obs")).as("rm"))
        val colm = cells.groupBy(col("status")).agg(sum(col("obs")).as("cm"))
        val tot = cells.agg(sum(col("obs")).as("n"))
        val exp = (col("rm") * col("cm")).cast("double") /
          col("n").cast("double")
        val term = (col("obs").cast("double") - exp) *
          (col("obs").cast("double") - exp) / exp
        val scored = cells.join(broadcast(rowm), "prio")
          .join(broadcast(colm), "status")
          .crossJoin(broadcast(tot))
          .select(col("prio"), col("status"), col("obs"), col("n"),
            floor(term * lit(1e9)).cast("long").as("term_scaled"))
        scored
          .agg(sum(col("term_scaled")).as("chi2_scaled"),
            max(col("n")).as("n"),
            count(lit(1)).as("n_cells"))
          .select(col("n_cells"), col("chi2_scaled"),
            (col("chi2_scaled").cast("double") / lit(1e9)).as("chi2"),
            // V = sqrt(chi2 / (n * min(r-1, c-1))); r=5, c=3 -> min = 2
            sqrt((col("chi2_scaled").cast("double") / lit(1e9)) /
              (col("n").cast("double") * lit(2.0))).as("cramers_v"))
      },
      Some("""WITH cells AS (
         |  SELECT o_orderpriority AS prio, o_orderstatus AS status,
         |    CAST(count(*) AS BIGINT) AS obs
         |  FROM orders GROUP BY 1, 2),
         |rm AS (SELECT prio, CAST(sum(obs) AS BIGINT) AS rm
         |  FROM cells GROUP BY 1),
         |cm AS (SELECT status, CAST(sum(obs) AS BIGINT) AS cm
         |  FROM cells GROUP BY 1),
         |tot AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM cells),
         |sc AS (
         |  SELECT obs, n,
         |    CAST(floor(
         |      (CAST(obs AS DOUBLE) - CAST(rm.rm*cm.cm AS DOUBLE)/CAST(n AS DOUBLE)) *
         |      (CAST(obs AS DOUBLE) - CAST(rm.rm*cm.cm AS DOUBLE)/CAST(n AS DOUBLE)) /
         |      (CAST(rm.rm*cm.cm AS DOUBLE)/CAST(n AS DOUBLE)) * 1e9)
         |      AS BIGINT) AS term_scaled
         |  FROM cells JOIN rm USING (prio) JOIN cm USING (status), tot)
         |SELECT CAST(count(*) AS BIGINT) AS n_cells,
         |  CAST(sum(term_scaled) AS BIGINT) AS chi2_scaled,
         |  CAST(CAST(sum(term_scaled) AS BIGINT) AS DOUBLE) / 1e9 AS chi2,
         |  sqrt((CAST(CAST(sum(term_scaled) AS BIGINT) AS DOUBLE) / 1e9)
         |    / (CAST(max(n) AS DOUBLE) * 2.0)) AS cramers_v
         |FROM sc""".stripMargin)),

    // Autocorrelation function (lags 1..12) of the monthly revenue
    // series — the quantitative companion to q_seasonal_decompose (which
    // ASSUMES a 12-month period; the ACF is how one finds it). Exactness:
    // deviations from the FLOORED mean are BIGINTs; lag products route
    // through DECIMAL(38,0) on the Spark side and HUGEINT in DuckDB
    // (either holds the exact +-1e20-scale integer sums), and the ratio
    // ships as a SCALED INTEGRAL DIVISION (num * 1e9 div den — Spark's
    // `div` and DuckDB's `//` both truncate toward zero, probed on
    // negatives) so no engine converts a >2^53 integer to double: the
    // first formulation died on exactly that, Spark's Decimal-to-double
    // and DuckDB's HUGEINT-to-double disagreeing in the last ulp. Scale
    // shape: one month-grid aggregate collapses the corpus; the lag
    // self-join runs on the CALENDAR-sized series (80 rows x 12 lags).
    Q("q_acf",
      (s, d) => {
        val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val m = Tables.orders(s, d)
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
          .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long"))
            .as("cents"))
        val tot = m.agg(sum(col("cents")).as("sc"), count(lit(1)).as("nm"))
        val idx = m.crossJoin(broadcast(tot))
          .select(col("month"), (col("cents") - expr("sc div nm")).as("dev"))
          .withColumn("i", row_number().over(Window.orderBy(col("month"))))
        val den = idx.agg(sum(col("dev").cast(dec38) * col("dev").cast(dec38))
          .as("den"))
        val lags = idx.sparkSession.range(1, 13).select(col("id").as("lag"))
        idx.select(col("i"), col("dev")).crossJoin(broadcast(lags))
          .join(idx.select(col("i").as("i2"), col("dev").as("dev2")),
            col("i2") === col("i") + col("lag"))
          .groupBy(col("lag"))
          .agg(sum(col("dev").cast(dec38) * col("dev2").cast(dec38))
            .as("num"), count(lit(1)).as("n_pairs"))
          .crossJoin(broadcast(den))
          .select(col("lag"), col("n_pairs"),
            expr("(num * 1000000000) div den").as("acf_scaled"))
          .select(col("lag"), col("n_pairs"), col("acf_scaled"),
            (col("acf_scaled").cast("double") / lit(1e9)).as("acf"))
          .orderBy(col("lag"))
      },
      Some("""WITH m AS (
         |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         |    CAST(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT))
         |      AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS sc,
         |  CAST(count(*) AS BIGINT) AS nm FROM m),
         |idx AS (
         |  SELECT CAST(row_number() OVER (ORDER BY month) AS BIGINT) AS i,
         |    cents - sc // nm AS dev
         |  FROM m, tot),
         |den AS (SELECT sum(CAST(dev AS HUGEINT) * CAST(dev AS HUGEINT))
         |  AS den FROM idx),
         |acf AS (
         |  SELECT t.lag,
         |    CAST(count(*) AS BIGINT) AS n_pairs,
         |    sum(CAST(a.dev AS HUGEINT) * CAST(b.dev AS HUGEINT)) AS num
         |  FROM generate_series(1, 12) t(lag)
         |  JOIN idx a ON true
         |  JOIN idx b ON b.i = a.i + t.lag
         |  GROUP BY t.lag)
         |SELECT lag, n_pairs,
         |  CAST((num * 1000000000) // den AS BIGINT) AS acf_scaled,
         |  CAST(CAST((num * 1000000000) // den AS BIGINT) AS DOUBLE)
         |    / 1e9 AS acf
         |FROM acf, den ORDER BY lag""".stripMargin)),

    // RFM customer segmentation (the classic marketing-analytics cube):
    // per-customer Recency (days since last order at the snapshot date),
    // Frequency (order count) and Monetary (cents-grid revenue), each cut
    // into quintiles, customers counted per 3-digit R-F-M segment code.
    // Quintiles use q_ntile's SCALE-HONEST pattern — exact percentile
    // breakpoints from ONE aggregate, broadcast back, bucket by
    // comparison — never a global ntile window (an unpartitioned
    // row-scale sort). Spark `percentile` and DuckDB `quantile_cont`
    // hash-match on doubles (the q_ntile precedent); all three metrics
    // are exact integers cast once to double for the compare. Bucket
    // numbering is raw value-ascending on every axis (recency bucket 1 =
    // most recent buyers; the marketing inversion is a relabeling).
    // Scale shape: one custkey-keyed aggregate, a 1-row broadcast of the
    // 9 breakpoints, a narrow bucket projection, and a <=125-row output.
    Q("q_rfm",
      (s, d) => {
        val cents = floor(col("o_totalprice") * lit(100.0)).cast("long")
        val cm = Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(max(col("o_orderdate")).as("last_dt"),
            count(lit(1)).as("freq"), sum(cents).as("money"))
        val snap = cm.agg(max(col("last_dt")).as("snap_dt"))
        val m = cm.crossJoin(broadcast(snap))
          .select(datediff(col("snap_dt"), col("last_dt")).cast("long")
            .as("rec"), col("freq"), col("money"))
        val qs = array(lit(0.2), lit(0.4), lit(0.6), lit(0.8))
        val bounds = m.agg(
          percentile(col("rec"), qs).as("br"),
          percentile(col("freq"), qs).as("bf"),
          percentile(col("money"), qs).as("bm"))
        def bucket(v: org.apache.spark.sql.Column,
            bs: String): org.apache.spark.sql.Column =
          (0 to 3).map(i => (v.cast("double") > col(bs)(i)).cast("long"))
            .reduce(_ + _) + lit(1L)
        m.crossJoin(broadcast(bounds))
          .select((bucket(col("rec"), "br") * 100 +
            bucket(col("freq"), "bf") * 10 +
            bucket(col("money"), "bm")).as("segment"),
            col("money"))
          .groupBy(col("segment"))
          .agg(count(lit(1)).as("n_customers"),
            sum(col("money")).as("segment_cents"))
          .orderBy(col("segment"))
      },
      Some {
        def bucket(v: String, bs: String) = (1 to 4).map(i =>
          s"CASE WHEN CAST($v AS DOUBLE) > $bs[$i] THEN 1 ELSE 0 END")
          .mkString("(1 + ", " + ", ")")
        s"""WITH cm AS (
           |  SELECT o_custkey, max(o_orderdate) AS last_dt,
           |    CAST(count(*) AS BIGINT) AS freq,
           |    CAST(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT))
           |      AS BIGINT) AS money
           |  FROM orders GROUP BY 1),
           |m AS (
           |  SELECT CAST(date_diff('day', last_dt,
           |      (SELECT max(last_dt) FROM cm)) AS BIGINT) AS rec,
           |    freq, money
           |  FROM cm),
           |b AS (
           |  SELECT quantile_cont(rec, [0.2, 0.4, 0.6, 0.8]) AS br,
           |    quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]) AS bf,
           |    quantile_cont(money, [0.2, 0.4, 0.6, 0.8]) AS bm
           |  FROM m)
           |SELECT CAST(${bucket("rec", "br")} * 100 +
           |    ${bucket("freq", "bf")} * 10 +
           |    ${bucket("money", "bm")} AS BIGINT) AS segment,
           |  CAST(count(*) AS BIGINT) AS n_customers,
           |  CAST(sum(money) AS BIGINT) AS segment_cents
           |FROM m, b GROUP BY 1 ORDER BY segment""".stripMargin
      }),

    // HITS hubs & authorities (Kleinberg 1999) on the BIPARTITE
    // customer -> part purchase graph — the second eigenvector-style
    // ranking beside q_pagerank, on a genuinely different graph (the
    // basket projection loses who bought; HITS ranks buyers and items
    // jointly: a hub is a customer who buys authoritative parts, an
    // authority is a part bought by strong hubs). Two full iterations,
    // SUM-normalized each half-step (the L1 choice keeps normalization
    // RATIONAL — an L2 norm would put a sqrt inside the iteration).
    // Oracle parity is the q_pagerank P43 pattern: each neighbor sum
    // floor-scales contributions to the 2^-43 grid and sums as
    // DECIMAL(38,0); the resulting scores are grid-aligned, so the
    // normalizing total re-enters DECIMAL exactly and the final division
    // is identical IEEE scalar math. Scale shape per half-step: one
    // edge-keyed equi-join + one node-keyed aggregate (the Pregel
    // schedule); the 1-row totals broadcast; top-15 per role ships as
    // two bounded sorts unioned.
    Q("q_hits",
      (s, d) => {
        val P43 = 8796093022208.0
        val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val edges = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"))
          .join(Tables.lineitem(s, d)
            .select(col("l_orderkey"), col("l_partkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
          .distinct().localCheckpoint(true)
        var auth = edges.select(col("part")).distinct()
          .select(col("part"), lit(1.0).as("a"))
        var hub: org.apache.spark.sql.DataFrame = null
        for (_ <- 1 to 2) {
          val hraw = edges.join(auth, "part")
            .select(col("cust"), floor(col("a") * lit(P43)).cast(dec38)
              .as("c"))
            .groupBy(col("cust"))
            .agg((sum(col("c")).cast("double") / lit(P43)).as("hr"))
          val htot = hraw.agg(sum((col("hr") * lit(P43)).cast(dec38))
            .cast("double").as("t"))
          hub = hraw.crossJoin(broadcast(htot))
            .select(col("cust"), (col("hr") / (col("t") / lit(P43)))
              .as("h"))
          val araw = edges.join(hub, "cust")
            .select(col("part"), floor(col("h") * lit(P43)).cast(dec38)
              .as("c"))
            .groupBy(col("part"))
            .agg((sum(col("c")).cast("double") / lit(P43)).as("ar"))
          val atot = araw.agg(sum((col("ar") * lit(P43)).cast(dec38))
            .cast("double").as("t"))
          auth = araw.crossJoin(broadcast(atot))
            .select(col("part"), (col("ar") / (col("t") / lit(P43)))
              .as("a"))
        }
        val topHubs = hub.select(lit("hub").as("role"),
            col("cust").as("node"), col("h").as("score"))
          .orderBy(col("score").desc, col("node")).limit(15)
        val topAuth = auth.select(lit("authority").as("role"),
            col("part").as("node"), col("a").as("score"))
          .orderBy(col("score").desc, col("node")).limit(15)
        topAuth.union(topHubs)
          .orderBy(col("role"), col("score").desc, col("node"))
      },
      Some {
        val P = "8796093022208.0"
        def half(src: String, out: String, key: String, other: String,
            prevScore: String, prev: String) =
          s"""${out}raw AS (
             |  SELECT $key, CAST(sum(CAST(floor($prevScore * $P)
             |    AS DECIMAL(38,0))) AS DOUBLE) / $P AS r
             |  FROM edges JOIN $prev ON edges.$other = $prev.$other
             |  GROUP BY $key),
             |${out}tot AS (SELECT CAST(sum(CAST(r * $P AS DECIMAL(38,0)))
             |  AS DOUBLE) AS t FROM ${out}raw),
             |$out AS (SELECT $key, r / (t / $P) AS s
             |  FROM ${out}raw, ${out}tot)"""
        s"""WITH edges AS (
           |  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
           |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
           |a0 AS (SELECT DISTINCT part, 1.0 AS s FROM edges),
           |${half("edges", "h1", "cust", "part", "a0.s", "a0")},
           |${half("edges", "a1", "part", "cust", "h1.s", "h1")},
           |${half("edges", "h2", "cust", "part", "a1.s", "a1")},
           |${half("edges", "a2", "part", "cust", "h2.s", "h2")}
           |SELECT role, node, score FROM (
           |  SELECT 'authority' AS role, part AS node, s AS score
           |  FROM a2 ORDER BY s DESC, part LIMIT 15)
           |UNION ALL
           |SELECT role, node, score FROM (
           |  SELECT 'hub' AS role, cust AS node, s AS score
           |  FROM h2 ORDER BY s DESC, cust LIMIT 15)
           |ORDER BY role, score DESC, node""".stripMargin
      }),

    // Population-stability-index drift monitor — the FEATURE-distribution
    // companion to q_index_drift's embedding-space monitor: each event
    // type's value distribution is compared to the 'view' reference over
    // a fixed 10-bin grid, PSI = sum (q-p) * ln(q/p) with add-one
    // smoothing so empty bins stay defined; the full type x bin grid is
    // materialized (broadcast nested-loop of a 10-row range — never a
    // CartesianProduct) so missing bins contribute their smoothed term
    // instead of silently dropping. The 10-cell sum routes through the
    // 2^43 floor/DECIMAL fold (q_feature_mi's order-independent pattern),
    // and the drifted flag thresholds the grid-snapped value at the
    // industry 0.1 cut. Scale shape: two map-side-combinable bin counts;
    // everything after is (types x 10)-sized.
    Q("q_psi_drift",
      (s, d) => {
        val P43 = 8796093022208.0
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val ev = Tables.events(s, d).select(col("event_type"),
          least(floor(col("value") / lit(10.0)), lit(9.0)).cast("long")
            .as("bin"))
        val ref = ev.filter(col("event_type") === "view")
          .groupBy(col("bin")).agg(count(lit(1)).as("rc"))
        val refN = ref.agg(sum(col("rc")).as("rn"))
        val cur = ev.filter(col("event_type") =!= "view")
          .groupBy(col("event_type"), col("bin")).agg(count(lit(1)).as("cc"))
        val curN = cur.groupBy(col("event_type").as("t2"))
          .agg(sum(col("cc")).as("cn"))
        val grid = ev.filter(col("event_type") =!= "view")
          .select(col("event_type")).distinct()
          .crossJoin(broadcast(s.range(0, 10).select(col("id").as("bin"))))
        val filled = grid
          .join(cur, Seq("event_type", "bin"), "left")
          .join(broadcast(ref), Seq("bin"), "left")
          .join(broadcast(curN), col("event_type") === col("t2"))
          .crossJoin(broadcast(refN))
          .select(col("event_type"),
            ((coalesce(col("rc"), lit(0L)) + lit(1)).cast("double") /
              (col("rn") + lit(10)).cast("double")).as("p"),
            ((coalesce(col("cc"), lit(0L)) + lit(1)).cast("double") /
              (col("cn") + lit(10)).cast("double")).as("q"))
        val term = (col("q") - col("p")) * log(col("q") / col("p"))
        val psi = sum(floor(term * lit(P43)).cast(dec)).cast("double") / lit(P43)
        filled.groupBy(col("event_type"))
          .agg(psi.as("psi"))
          .select(col("event_type"), col("psi"),
            (col("psi") > lit(0.1)).cast("long").as("drifted"))
          .orderBy(col("event_type"))
      },
      Some {
        val P = "8796093022208.0"
        s"""WITH ev AS (
          |  SELECT event_type,
          |    LEAST(CAST(floor(value / 10.0) AS BIGINT), 9) AS bin
          |  FROM events),
          |ref AS (SELECT bin, CAST(count(*) AS BIGINT) AS rc
          |        FROM ev WHERE event_type = 'view' GROUP BY bin),
          |refn AS (SELECT CAST(sum(rc) AS BIGINT) AS rn FROM ref),
          |cur AS (SELECT event_type, bin, CAST(count(*) AS BIGINT) AS cc
          |        FROM ev WHERE event_type <> 'view'
          |        GROUP BY event_type, bin),
          |curn AS (SELECT event_type, CAST(sum(cc) AS BIGINT) AS cn
          |         FROM cur GROUP BY event_type),
          |grid AS (
          |  SELECT t.event_type, b.bin
          |  FROM (SELECT DISTINCT event_type FROM ev
          |        WHERE event_type <> 'view') t,
          |       (SELECT unnest(range(0, 10)) AS bin) b),
          |filled AS (
          |  SELECT g.event_type,
          |    CAST(coalesce(r.rc, 0) + 1 AS DOUBLE)
          |      / CAST(rn.rn + 10 AS DOUBLE) AS p,
          |    CAST(coalesce(c.cc, 0) + 1 AS DOUBLE)
          |      / CAST(cn.cn + 10 AS DOUBLE) AS q
          |  FROM grid g
          |  LEFT JOIN cur c ON c.event_type = g.event_type AND c.bin = g.bin
          |  LEFT JOIN ref r ON r.bin = g.bin
          |  JOIN curn cn ON cn.event_type = g.event_type
          |  CROSS JOIN refn rn),
          |agg AS (
          |  SELECT event_type,
          |    CAST(sum(CAST(floor((q - p) * ln(q / p) * $P)
          |      AS DECIMAL(38,0))) AS DOUBLE) / $P AS psi
          |  FROM filled GROUP BY event_type)
          |SELECT event_type, psi,
          |  CAST(psi > 0.1 AS BIGINT) AS drifted
          |FROM agg ORDER BY event_type""".stripMargin
      }),

    // Gini concentration of customer revenue per market segment — the
    // inequality/concentration operator (Lorenz-curve summary) a revenue
    // or token-budget analysis reads first. Monetary value snaps to the
    // dollars grid (floor, exact BIGINT per customer), each segment
    // ranks its customers ascending with a unique (y, custkey)
    // tie-break, and Gini = 2*sum(i*y)/(n*sum(y)) - (n+1)/n assembles
    // from DECIMAL(38,0)-routed exact sums in identical double op order,
    // floor-scaled. Rank ties share equal y so the i*y sum is
    // order-invariant regardless. Scale shape: one orderkey-less
    // customer aggregate, a segment-partitioned sort (the inherent cost
    // of any rank statistic), one map-side-combinable moment aggregate.
    Q("q_gini",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val mon = Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice")).cast("long")).as("y"))
        val cust = Tables.customer(s, d)
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("y"), col("o_custkey"))
        val r = mon.join(cust, "o_custkey")
          .withColumn("i", row_number().over(w))
        val g = r.groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            sum(col("y").cast(dec)).cast("double").as("sy"),
            sum((col("i") * col("y")).cast(dec)).cast("double").as("siy"))
        val gini = lit(2.0) * col("siy") / (col("n") * col("sy")) -
          (col("n") + lit(1)).cast("double") / col("n").cast("double")
        g.select(col("c_mktsegment"), col("n"),
            (floor(gini * lit(1e9)) / lit(1e9)).as("gini"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""WITH mon AS (
         |  SELECT o_custkey,
         |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS y
         |  FROM orders GROUP BY o_custkey),
         |r AS (
         |  SELECT c_mktsegment, y,
         |    row_number() OVER (PARTITION BY c_mktsegment
         |      ORDER BY y, c_custkey) AS i
         |  FROM mon JOIN customer ON c_custkey = o_custkey),
         |g AS (
         |  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
         |    CAST(sum(CAST(i*y AS DECIMAL(38,0))) AS DOUBLE) AS siy
         |  FROM r GROUP BY c_mktsegment)
         |SELECT c_mktsegment, n,
         |  floor((2.0*siy/(n*sy) - CAST(n+1 AS DOUBLE)/CAST(n AS DOUBLE))
         |    * 1e9) / 1e9 AS gini
         |FROM g ORDER BY c_mktsegment""".stripMargin)),

    // Association-rule mining (Apriori's output stage) over the basket
    // fixture: pair supports with min-support 2 (the same edge filter
    // that feeds q_kcore), per-item supports, then confidence = s(a,b)/
    // s(a) and lift = n*s(a,b)/(s(a)*s(b)) for BOTH rule directions.
    // All supports are BIGINT-exact; the ratios divide exact integers in
    // doubles with identical op order and are floor-scaled; the top-50 is
    // ordered by the SCALED-LONG lift (integer compare, no float-order
    // ambiguity) with a full (antecedent, consequent) tie-break, so the
    // limit is deterministic and plans as TakeOrderedAndProject. Scale
    // shape: the pair table is the only large relation (orderkey-keyed
    // self-join + pair groupBy); item supports are a vocabulary-sized
    // broadcast; nothing all-pairs, nothing driver-side.
    Q("q_assoc_rules",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val n = li.agg(countDistinct(col("l_orderkey")).as("n_orders"))
        val item = li.groupBy(col("l_partkey").as("item"))
          .agg(count(lit(1)).as("supp"))
        val pairs = li.select(col("l_orderkey"), col("l_partkey").as("a"))
          .join(li.select(col("l_orderkey"), col("l_partkey").as("b")),
            "l_orderkey")
          .filter(col("a") < col("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("supp_ab"))
          .filter(col("supp_ab") >= 2)
        val rules = pairs
          .select(col("a").as("antecedent"), col("b").as("consequent"),
            col("supp_ab"))
          .union(pairs.select(col("b"), col("a"), col("supp_ab")))
          .join(broadcast(item.select(col("item").as("antecedent"),
            col("supp").as("supp_a"))), "antecedent")
          .join(broadcast(item.select(col("item").as("consequent"),
            col("supp").as("supp_b"))), "consequent")
          .crossJoin(broadcast(n))
        val conf = col("supp_ab").cast("double") / col("supp_a").cast("double")
        val lift = (col("n_orders") * col("supp_ab")).cast("double") /
          (col("supp_a") * col("supp_b")).cast("double")
        rules
          .select(col("antecedent"), col("consequent"), col("supp_ab"),
            (floor(conf * lit(1e9)) / lit(1e9)).as("confidence"),
            (floor(lift * lit(1e9)) / lit(1e9)).as("lift"),
            floor(lift * lit(1e9)).cast("long").as("lift_s"))
          .orderBy(col("lift_s").desc, col("antecedent"), col("consequent"))
          .limit(50)
          .drop("lift_s")
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
         |      FROM li),
         |item AS (SELECT l_partkey AS item, CAST(count(*) AS BIGINT) AS supp
         |         FROM li GROUP BY 1),
         |pairs AS (
         |  SELECT a.l_partkey AS a, b.l_partkey AS b,
         |    CAST(count(*) AS BIGINT) AS supp_ab
         |  FROM li a JOIN li b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |rules AS (
         |  SELECT a AS antecedent, b AS consequent, supp_ab FROM pairs
         |  UNION ALL SELECT b, a, supp_ab FROM pairs),
         |scored AS (
         |  SELECT r.antecedent, r.consequent, r.supp_ab,
         |    floor(CAST(r.supp_ab AS DOUBLE) / CAST(ia.supp AS DOUBLE)
         |      * 1e9) / 1e9 AS confidence,
         |    floor(CAST(n.n_orders * r.supp_ab AS DOUBLE)
         |      / CAST(ia.supp * ic.supp AS DOUBLE) * 1e9) / 1e9 AS lift,
         |    CAST(floor(CAST(n.n_orders * r.supp_ab AS DOUBLE)
         |      / CAST(ia.supp * ic.supp AS DOUBLE) * 1e9) AS BIGINT) AS lift_s
         |  FROM rules r
         |  JOIN item ia ON ia.item = r.antecedent
         |  JOIN item ic ON ic.item = r.consequent, n)
         |SELECT antecedent, consequent, supp_ab, confidence, lift
         |FROM scored
         |ORDER BY lift_s DESC, antecedent, consequent LIMIT 50""".stripMargin)),

    // Last-touch attribution: each purchase is credited to the user's
    // most recent PRIOR non-purchase event (the marketing-analytics twin
    // of sessionization). One user-keyed window ordered by the fixture's
    // total (ts, event_id) order — the same tie-break q_cdc_compact pins,
    // since equal timestamps are real at scale — carrying the last
    // non-purchase type with an IGNORE NULLS frame ending 1 row before
    // current; purchases with no prior touch credit 'none'. Scale shape:
    // the window partitions by user (shuffle key = user_id, never a
    // time-range product), then a 5-row aggregate.
    Q("q_attribution",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("src", last(
            when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .groupBy(coalesce(col("src"), lit("none")).as("channel"))
          .agg(count(lit(1)).as("n_purchases"))
          .orderBy(col("channel"))
      },
      Some("""WITH a AS (
         |  SELECT event_type,
         |    last_value(CASE WHEN event_type <> 'purchase'
         |        THEN event_type END IGNORE NULLS)
         |      OVER (PARTITION BY user_id ORDER BY ts, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS src
         |  FROM events)
         |SELECT coalesce(src, 'none') AS channel,
         |  CAST(count(*) AS BIGINT) AS n_purchases
         |FROM a WHERE event_type = 'purchase'
         |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Two-sample hypothesis test (Welch z) — experiment analysis as a
    // distributed aggregation: each event type is compared against the
    // 'view' control on mean event value. The metric is snapped to the
    // CENTS grid first (floor(value*100) — identical IEEE op on both
    // engines), so all moments are BIGINT-exact, map-side-combinable,
    // and order-independent: the whole test is ONE 5-group aggregate +
    // a 1-row broadcast of the control moments, no matter the corpus
    // size. The z statistic is assembled in doubles with identical
    // operation order and floor-scaled to the 1e-9 grid (the tie-free
    // snap — see Q.scala); the decision threshold 1.96 is two-sided 5%.
    Q("q_ab_test",
      (s, d) => {
        val m = Tables.events(s, d)
          .select(col("event_type"),
            floor(col("value") * lit(100.0)).cast("long").as("v"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
            sum(col("v") * col("v")).as("svv"))
        val ctl = m.filter(col("event_type") === "view")
          .select(col("n").as("nc"), col("sv").as("svc"),
            col("svv").as("svvc"))
        def mean(sv: org.apache.spark.sql.Column,
            n: org.apache.spark.sql.Column) = sv.cast("double") / n
        // nullif on n-1: a 1-row arm has undefined sample variance —
        // snap BOTH engines to NULL instead of div-by-zero divergence.
        def variance(svv: org.apache.spark.sql.Column,
            sv: org.apache.spark.sql.Column,
            n: org.apache.spark.sql.Column) =
          (svv.cast("double") -
            sv.cast("double") * sv.cast("double") / n) /
            nullif(n - lit(1), lit(0L))
        val z = (mean(col("sv"), col("n")) - mean(col("svc"), col("nc"))) /
          sqrt(variance(col("svv"), col("sv"), col("n")) / col("n") +
            variance(col("svvc"), col("svc"), col("nc")) / col("nc"))
        m.filter(col("event_type") =!= "view")
          .crossJoin(broadcast(ctl))
          .select(col("event_type"), col("n"),
            (floor(mean(col("sv"), col("n")) * lit(1e9)) / lit(1e9))
              .as("mean_cents"),
            (floor(z * lit(1e9)) / lit(1e9)).as("z"),
            (abs(z) > lit(1.96)).cast("long").as("significant"))
          .orderBy(col("event_type"))
      },
      Some("""WITH m AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v*v) AS BIGINT) AS svv
         |  FROM (SELECT event_type,
         |          CAST(floor(value * 100.0) AS BIGINT) AS v FROM events) t
         |  GROUP BY event_type),
         |c AS (SELECT n AS nc, sv AS svc, svv AS svvc FROM m
         |      WHERE event_type = 'view')
         |SELECT event_type, n,
         |  floor(CAST(sv AS DOUBLE) / n * 1e9) / 1e9 AS mean_cents,
         |  floor((CAST(sv AS DOUBLE) / n - CAST(svc AS DOUBLE) / nc)
         |    / sqrt(((CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE)*CAST(sv AS DOUBLE)/n) / nullif(n - 1, 0)) / n
         |         + ((CAST(svvc AS DOUBLE) - CAST(svc AS DOUBLE)*CAST(svc AS DOUBLE)/nc) / nullif(nc - 1, 0)) / nc)
         |    * 1e9) / 1e9 AS z,
         |  CAST(abs((CAST(sv AS DOUBLE) / n - CAST(svc AS DOUBLE) / nc)
         |    / sqrt(((CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE)*CAST(sv AS DOUBLE)/n) / nullif(n - 1, 0)) / n
         |         + ((CAST(svvc AS DOUBLE) - CAST(svc AS DOUBLE)*CAST(svc AS DOUBLE)/nc) / nullif(nc - 1, 0)) / nc))
         |    > 1.96 AS BIGINT) AS significant
         |FROM m, c WHERE event_type <> 'view'
         |ORDER BY event_type""".stripMargin)),

    // CUPED variance reduction (Deng et al., WSDM 2013, public — the
    // technique every large experiment platform applies before reading
    // a lift): use each user's PRE-period spend as a control covariate
    // for their post-period metric, subtracting theta * (x - xbar) with
    // theta = Cov(x,y)/Var(x), which shrinks metric variance by rho^2
    // without biasing the effect. Parity is the q_acf discipline end to
    // end: per-user (pre, post) cents ride one user-keyed aggregate;
    // the pooled moments and centered cross-moments are EXACT
    // DECIMAL(38,0)/HUGEINT sums (n*Sxy - Sx*Sy class — magnitudes past
    // 2^53, so no double ever touches them); theta and rho^2 are scaled
    // integral divisions; and the CUPED-adjusted arm means multiply
    // through by n so the adjustment (sya*1e9*n - theta9*sxa*n +
    // theta9*n_arm*Sx) div (n_arm*n) stays an exact integer — the
    // adjusted lift is a DIFFERENCE OF EXACT LONGS like q_diff_in_diff.
    // Scale shape: one user aggregate, one 2-group arm aggregate, two
    // 1-row broadcasts.
    Q("q_cuped",
      (s, d) => {
        val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val CUT = 1705363200000000L
        val treat = graft.functions.TextOps.md5Prefix60(
          concat(lit("cuped:"), col("user_id").cast("string"))) % 1000L < 500L
        val per = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"),
            floor(col("value") * lit(100.0)).cast("long").as("cents"),
            (unix_micros(col("ts")) >= CUT).as("post"))
          .groupBy(col("user_id"))
          .agg(sum(when(!col("post"), col("cents")).otherwise(0L)).as("x"),
            sum(when(col("post"), col("cents")).otherwise(0L)).as("y"))
          .withColumn("treat", treat)
        val mo = per.agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x").cast(dec38) * col("x").cast(dec38)).as("sxx"),
            sum(col("x").cast(dec38) * col("y").cast(dec38)).as("sxy"),
            sum(col("y").cast(dec38) * col("y").cast(dec38)).as("syy"))
          .select(col("n"), col("sx"), col("sy"),
            (col("n").cast(dec38) * col("sxy") -
              col("sx").cast(dec38) * col("sy").cast(dec38)).as("cxy"),
            (col("n").cast(dec38) * col("sxx") -
              col("sx").cast(dec38) * col("sx").cast(dec38)).as("cxx"),
            (col("n").cast(dec38) * col("syy") -
              col("sy").cast(dec38) * col("sy").cast(dec38)).as("cyy"))
          .withColumn("theta9", expr("(cxy * 1000000000) div cxx"))
          .withColumn("rho2_9",
            expr("(CAST(theta9 AS DECIMAL(38,0)) * cxy) div cyy"))
        val arms = per.groupBy(col("treat"))
          .agg(count(lit(1)).as("n_arm"),
            sum(col("x")).as("sxa"), sum(col("y")).as("sya"))
          .groupBy()
          .agg(
            max(when(col("treat"), col("n_arm"))).as("n_t"),
            max(when(col("treat"), col("sxa"))).as("sx_t"),
            max(when(col("treat"), col("sya"))).as("sy_t"),
            max(when(!col("treat"), col("n_arm"))).as("n_c"),
            max(when(!col("treat"), col("sxa"))).as("sx_c"),
            max(when(!col("treat"), col("sya"))).as("sy_c"))
        def adj9(sy: String, sx: String, na: String) =
          s"""(CAST($sy AS DECIMAL(38,0)) * 1000000000 * n
             | - CAST(theta9 AS DECIMAL(38,0)) * CAST($sx AS DECIMAL(38,0)) * n
             | + CAST(theta9 AS DECIMAL(38,0)) * $na * sx)
             | div ($na * n)""".stripMargin.replaceAll("\n", "")
        arms.crossJoin(broadcast(mo))
          .withColumn("madj9_t", expr(adj9("sy_t", "sx_t", "n_t")))
          .withColumn("madj9_c", expr(adj9("sy_c", "sx_c", "n_c")))
          .withColumn("raw9_t", expr("sy_t * 1000000000L div n_t"))
          .withColumn("raw9_c", expr("sy_c * 1000000000L div n_c"))
          .select(col("n"), col("n_t"), col("n_c"),
            (col("theta9").cast("double") / 1e9).as("theta"),
            (col("rho2_9").cast("double") / 1e9).as("rho2"),
            ((col("raw9_t") - col("raw9_c")).cast("double") / 1e9)
              .as("raw_lift_cents"),
            ((col("madj9_t") - col("madj9_c")).cast("double") / 1e9)
              .as("cuped_lift_cents"))
      },
      Some {
        val bucket = graft.OracleSql.hexToLong(
          "md5('cuped:' || CAST(user_id AS VARCHAR))", 1, 15)
        s"""WITH per AS (
           |  SELECT user_id,
           |    CAST(sum(CASE WHEN epoch_us(ts) < 1705363200000000
           |      THEN CAST(floor(value * 100.0) AS BIGINT) ELSE 0 END)
           |      AS BIGINT) AS x,
           |    CAST(sum(CASE WHEN epoch_us(ts) >= 1705363200000000
           |      THEN CAST(floor(value * 100.0) AS BIGINT) ELSE 0 END)
           |      AS BIGINT) AS y,
           |    $bucket % 1000 < 500 AS treat
           |  FROM events WHERE event_type = 'purchase'
           |  GROUP BY user_id),
           |mo AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
           |    sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
           |    sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
           |  FROM per),
           |cm AS (
           |  SELECT n, sx, sy,
           |    CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS cxy,
           |    CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS cxx,
           |    CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT) AS cyy
           |  FROM mo),
           |th AS (
           |  SELECT n, sx, cxy, cyy,
           |    (cxy * 1000000000) // cxx AS theta9
           |  FROM cm),
           |th2 AS (
           |  SELECT n, sx, theta9,
           |    (CAST(theta9 AS HUGEINT) * cxy) // cyy AS rho2_9
           |  FROM th),
           |arms AS (
           |  SELECT
           |    CAST(sum(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
           |    CAST(sum(CASE WHEN treat THEN x ELSE 0 END) AS BIGINT) AS sx_t,
           |    CAST(sum(CASE WHEN treat THEN y ELSE 0 END) AS BIGINT) AS sy_t,
           |    CAST(sum(CASE WHEN treat THEN 0 ELSE 1 END) AS BIGINT) AS n_c,
           |    CAST(sum(CASE WHEN treat THEN 0 ELSE x END) AS BIGINT) AS sx_c,
           |    CAST(sum(CASE WHEN treat THEN 0 ELSE y END) AS BIGINT) AS sy_c
           |  FROM per)
           |SELECT n, n_t, n_c,
           |  CAST(theta9 AS DOUBLE) / 1e9 AS theta,
           |  CAST(rho2_9 AS DOUBLE) / 1e9 AS rho2,
           |  CAST(sy_t * 1000000000 // n_t - sy_c * 1000000000 // n_c
           |    AS DOUBLE) / 1e9 AS raw_lift_cents,
           |  CAST(
           |    (CAST(sy_t AS HUGEINT) * 1000000000 * n
           |      - CAST(theta9 AS HUGEINT) * CAST(sx_t AS HUGEINT) * n
           |      + CAST(theta9 AS HUGEINT) * n_t * sx) // (CAST(n_t AS HUGEINT) * n)
           |    - (CAST(sy_c AS HUGEINT) * 1000000000 * n
           |      - CAST(theta9 AS HUGEINT) * CAST(sx_c AS HUGEINT) * n
           |      + CAST(theta9 AS HUGEINT) * n_c * sx) // (CAST(n_c AS HUGEINT) * n)
           |    AS DOUBLE) / 1e9 AS cuped_lift_cents
           |FROM arms, th2""".stripMargin
      }),

    // Sample-ratio-mismatch guard — the health check every experiment
    // platform runs BEFORE reading any metric: if the md5 user split
    // doesn't land 50/50, the assignment pipeline is broken and all
    // downstream stats are invalid. One-df chi-square against the
    // expected even split reduces to (n_t - n_c)^2 / n, computed as an
    // exact scaled integral division so the decision threshold compares
    // scaled longs — integer arithmetic end to end. The threshold is the
    // INDUSTRY one, p < 0.001 (chi2 > 10.8276): platforms page at
    // stricter-than-95% cuts because a fair split fails p < 0.05 one
    // run in twenty — exactly what this fixture demonstrates (the srm:
    // salt lands 709/791 on 1,500 users, chi2 = 4.48: suspicious at 95%,
    // rightly NOT paged at the production threshold). ONE distinct-user
    // aggregate; corpus-size-independent output.
    Q("q_srm_check",
      (s, d) => {
        val treat = graft.functions.TextOps.md5Prefix60(
          concat(lit("srm:"), col("user_id").cast("string"))) % 1000L < 500L
        Tables.events(s, d)
          .select(col("user_id")).distinct()
          .select(when(treat, 1L).otherwise(0L).as("t"))
          .agg(sum(col("t")).as("n_treat"),
            sum(lit(1L) - col("t")).as("n_ctrl"))
          .withColumn("chi2_9", expr(
            "(n_treat - n_ctrl) * (n_treat - n_ctrl) * 1000000000L div (n_treat + n_ctrl)"))
          .select(col("n_treat"), col("n_ctrl"),
            (col("chi2_9").cast("double") / 1e9).as("chi2"),
            (col("chi2_9") > 10827566170L).cast("long").as("srm"))
      },
      Some {
        val bucket = graft.OracleSql.hexToLong(
          "md5('srm:' || CAST(user_id AS VARCHAR))", 1, 15)
        s"""WITH u AS (SELECT DISTINCT user_id FROM events),
           |a AS (
           |  SELECT
           |    CAST(sum(CASE WHEN $bucket % 1000 < 500 THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_treat,
           |    CAST(sum(CASE WHEN $bucket % 1000 < 500 THEN 0 ELSE 1 END)
           |      AS BIGINT) AS n_ctrl
           |  FROM u),
           |c AS (
           |  SELECT n_treat, n_ctrl,
           |    (n_treat - n_ctrl) * (n_treat - n_ctrl) * 1000000000
           |      // (n_treat + n_ctrl) AS chi2_9
           |  FROM a)
           |SELECT n_treat, n_ctrl,
           |  CAST(chi2_9 AS DOUBLE) / 1e9 AS chi2,
           |  CAST(chi2_9 > 10827566170 AS BIGINT) AS srm
           |FROM c""".stripMargin
      }),

    // Difference-in-differences — the quasi-experimental causal estimate
    // completing the experimentation family (q_ab_test parametric,
    // q_mann_whitney nonparametric, q_wilson_ci proportions,
    // q_bootstrap_ci resampling; this one handles treatment WITHOUT
    // randomized assignment by differencing out both the arm baseline
    // and the secular time trend). Arms are a deterministic md5 user
    // split (the q_hash_split discipline); periods cut at the fixture
    // month's midpoint (2024-01-16 UTC, epoch-micros literal on both
    // engines). Parity: each cell mean rides the scaled integral
    // division (sum_cents * 1e9 div n — exact longs), and the DiD
    // estimate is a DIFFERENCE OF EXACT LONGS on the 1e-9 grid, so the
    // whole causal contrast is integer arithmetic with one final
    // exact-long/1e9 display division per column. Scale shape: ONE
    // map-side-combinable 8-way conditional aggregate over the purchase
    // scan — corpus-size-independent output.
    Q("q_diff_in_diff",
      (s, d) => {
        val CUT = 1705363200000000L // 2024-01-16T00:00:00Z in epoch micros
        val treat = graft.functions.TextOps.md5Prefix60(
          concat(lit("did:"), col("user_id").cast("string"))) % 1000L < 500L
        val post = unix_micros(col("ts")) >= CUT
        val ev = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(floor(col("value") * lit(100.0)).cast("long").as("cents"),
            treat.as("treat"), post.as("post"))
        def cell(t: Boolean, p: Boolean, agg: org.apache.spark.sql.Column) =
          sum(when(col("treat") === t && col("post") === p, agg).otherwise(0L))
        val a = ev.agg(
          cell(true, false, lit(1L)).as("n_t0"), cell(true, false, col("cents")).as("s_t0"),
          cell(true, true, lit(1L)).as("n_t1"), cell(true, true, col("cents")).as("s_t1"),
          cell(false, false, lit(1L)).as("n_c0"), cell(false, false, col("cents")).as("s_c0"),
          cell(false, true, lit(1L)).as("n_c1"), cell(false, true, col("cents")).as("s_c1"))
        a.selectExpr(
            "n_t0", "n_t1", "n_c0", "n_c1",
            "s_t0 * 1000000000L div n_t0 as m9_t0",
            "s_t1 * 1000000000L div n_t1 as m9_t1",
            "s_c0 * 1000000000L div n_c0 as m9_c0",
            "s_c1 * 1000000000L div n_c1 as m9_c1")
          .select(col("n_t0"), col("n_t1"), col("n_c0"), col("n_c1"),
            (col("m9_t0").cast("double") / 1e9).as("m_treat_pre"),
            (col("m9_t1").cast("double") / 1e9).as("m_treat_post"),
            (col("m9_c0").cast("double") / 1e9).as("m_ctrl_pre"),
            (col("m9_c1").cast("double") / 1e9).as("m_ctrl_post"),
            (((col("m9_t1") - col("m9_t0")) - (col("m9_c1") - col("m9_c0")))
              .cast("double") / 1e9).as("did_cents"))
      },
      Some {
        val bucket = graft.OracleSql.hexToLong(
          "md5('did:' || CAST(user_id AS VARCHAR))", 1, 15)
        s"""WITH ev AS (
           |  SELECT CAST(floor(value * 100.0) AS BIGINT) AS cents,
           |    $bucket % 1000 < 500 AS treat,
           |    CAST(epoch_us(ts) AS BIGINT) >= 1705363200000000 AS post
           |  FROM events WHERE event_type = 'purchase'),
           |a AS (
           |  SELECT
           |    CAST(sum(CASE WHEN treat AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_t0,
           |    CAST(sum(CASE WHEN treat AND NOT post THEN cents ELSE 0 END) AS BIGINT) AS s_t0,
           |    CAST(sum(CASE WHEN treat AND post THEN 1 ELSE 0 END) AS BIGINT) AS n_t1,
           |    CAST(sum(CASE WHEN treat AND post THEN cents ELSE 0 END) AS BIGINT) AS s_t1,
           |    CAST(sum(CASE WHEN NOT treat AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_c0,
           |    CAST(sum(CASE WHEN NOT treat AND NOT post THEN cents ELSE 0 END) AS BIGINT) AS s_c0,
           |    CAST(sum(CASE WHEN NOT treat AND post THEN 1 ELSE 0 END) AS BIGINT) AS n_c1,
           |    CAST(sum(CASE WHEN NOT treat AND post THEN cents ELSE 0 END) AS BIGINT) AS s_c1
           |  FROM ev),
           |m AS (
           |  SELECT n_t0, n_t1, n_c0, n_c1,
           |    s_t0 * 1000000000 // n_t0 AS m9_t0,
           |    s_t1 * 1000000000 // n_t1 AS m9_t1,
           |    s_c0 * 1000000000 // n_c0 AS m9_c0,
           |    s_c1 * 1000000000 // n_c1 AS m9_c1
           |  FROM a)
           |SELECT n_t0, n_t1, n_c0, n_c1,
           |  CAST(m9_t0 AS DOUBLE) / 1e9 AS m_treat_pre,
           |  CAST(m9_t1 AS DOUBLE) / 1e9 AS m_treat_post,
           |  CAST(m9_c0 AS DOUBLE) / 1e9 AS m_ctrl_pre,
           |  CAST(m9_c1 AS DOUBLE) / 1e9 AS m_ctrl_post,
           |  CAST((m9_t1 - m9_t0) - (m9_c1 - m9_c0) AS DOUBLE) / 1e9
           |    AS did_cents
           |FROM m""".stripMargin
      }),

    // Frequent-sequence mining (PrefixSpan-style; Pei et al. 2001, public)
    // — the frequent-pattern operator the event-analytics family lacked
    // beside funnel/attribution/transitions: top-20 frequent event-type
    // SEQUENCES (ordered, not necessarily contiguous; length <= 3) with
    // support >= 20% of users. The key to both exactness and scale is the
    // GREEDY EARLIEST-OCCURRENCE theorem for subsequence matching: a user
    // contains (t1,t2,t3) iff t3 occurs after the earliest valid t2
    // position p2, where p2 is the earliest t2 after the earliest t1
    // position p1 — so each level is ONE user-keyed equi-join + min()
    // aggregate instead of an O(L^3) positional self-join. Per-user join
    // fan-out is bounded by |alphabet| x events-per-user (level 2) and
    // |alphabet|^2 x events-per-user (level 3) over a <= 6-type alphabet;
    // every shuffle key is user_id; supports are map-side-combinable
    // counts; the support filter is integer math (5*support >= n_users);
    // the final top-20 rides a total order (support DESC, seq ASC). The
    // oracle replays the identical three-level min-position chain.
    Q("q_prefixspan",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wSeq = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type").as("t"),
            row_number().over(wSeq).cast("long").as("rn"))
        val nUsers = ev.agg(countDistinct(col("user_id")).as("nu"))
        val s1 = ev.groupBy(col("user_id"), col("t"))
          .agg(min(col("rn")).as("p1"))
        val s2 = s1
          .join(ev.select(col("user_id"), col("t").as("t2"), col("rn")),
            Seq("user_id"))
          .filter(col("rn") > col("p1"))
          .groupBy(col("user_id"), col("t"), col("t2"))
          .agg(min(col("rn")).as("p2"))
        val s3 = s2
          .join(ev.select(col("user_id"), col("t").as("t3"), col("rn")),
            Seq("user_id"))
          .filter(col("rn") > col("p2"))
          .select(col("user_id"), col("t"), col("t2"), col("t3"))
          .distinct()
        val c1 = s1.groupBy(col("t"))
          .agg(count(lit(1)).as("support"))
          .select(col("t").as("seq"), lit(1L).as("len"), col("support"))
        val c2 = s2.groupBy(col("t"), col("t2"))
          .agg(count(lit(1)).as("support"))
          .select(concat(col("t"), lit(">"), col("t2")).as("seq"),
            lit(2L).as("len"), col("support"))
        val c3 = s3.groupBy(col("t"), col("t2"), col("t3"))
          .agg(count(lit(1)).as("support"))
          .select(concat(col("t"), lit(">"), col("t2"), lit(">"), col("t3"))
            .as("seq"), lit(3L).as("len"), col("support"))
        c1.unionByName(c2).unionByName(c3)
          .crossJoin(broadcast(nUsers))
          .filter(col("support") * lit(5L) >= col("nu"))
          .select(col("seq"), col("len"), col("support"),
            col("nu").as("n_users"))
          .orderBy(col("support").desc, col("seq"))
          .limit(20)
      },
      Some("""WITH ev AS (
         |  SELECT user_id, event_type AS t,
         |    CAST(row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS BIGINT) AS rn
         |  FROM events),
         |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu
         |       FROM ev),
         |s1 AS (SELECT user_id, t, min(rn) AS p1 FROM ev GROUP BY 1, 2),
         |s2 AS (SELECT s1.user_id, s1.t, e.t AS t2, min(e.rn) AS p2
         |       FROM s1 JOIN ev e
         |         ON e.user_id = s1.user_id AND e.rn > s1.p1
         |       GROUP BY 1, 2, 3),
         |s3 AS (SELECT DISTINCT s2.user_id, s2.t, s2.t2, e.t AS t3
         |       FROM s2 JOIN ev e
         |         ON e.user_id = s2.user_id AND e.rn > s2.p2),
         |c AS (
         |  SELECT t AS seq, CAST(1 AS BIGINT) AS len,
         |    CAST(count(*) AS BIGINT) AS support
         |  FROM s1 GROUP BY 1
         |  UNION ALL
         |  SELECT t || '>' || t2, CAST(2 AS BIGINT),
         |    CAST(count(*) AS BIGINT)
         |  FROM s2 GROUP BY t, t2
         |  UNION ALL
         |  SELECT t || '>' || t2 || '>' || t3, CAST(3 AS BIGINT),
         |    CAST(count(*) AS BIGINT)
         |  FROM s3 GROUP BY t, t2, t3)
         |SELECT seq, len, support, nu AS n_users
         |FROM c, nu WHERE support * 5 >= nu
         |ORDER BY support DESC, seq LIMIT 20""".stripMargin)),

    // Markov (data-driven) attribution — the removal-effect model beside
    // q_attribution's last-touch heuristic (Anderl et al. 2016 class,
    // public): build the first-order journey chain start -> channels ->
    // {purchase | end} from per-user event sequences (journeys truncate
    // at the FIRST purchase; non-converting journeys absorb at '(end)'),
    // then credit each channel by its REMOVAL EFFECT — how much the
    // chain's start->purchase absorption probability drops when every
    // hop into that channel is severed. Absorption probabilities come
    // from K=16 value-iteration steps computed in EXACT INTEGERS on the
    // 2^30 grid: v'(s) = (sum_j c(s,j) * v(j)) div n(s) with
    // v(purchase) = 2^30 and v(end) = v(removed) = 0 — counts and
    // truncating integral division only, so all five scenarios (full +
    // one per removed channel) are bit-identical on both engines and the
    // final effects/shares are exact integer ratios (re9 = 1e9 -
    // p_removed*1e9 div p; share in ppm by integral division). Scale
    // shape: the corpus-scale work is the distributed journey/transition
    // aggregation (two user-keyed windows + one map-side-combinable
    // count); the chain itself is a <= 7x7 count matrix — a bounded
    // sidecar-sized collect (the OPQ driver-side-SVD class) iterated on
    // the driver, while the oracle replays the identical integer
    // iteration as 16 unrolled CTEs over a (scenario x state) vector
    // table (the q_pagerank oracle discipline).
    Q("q_markov_attribution",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wSeq = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
            row_number().over(wSeq).as("rn"))
        val fp = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id")).agg(min(col("rn")).as("fp"))
        val j = ev.join(fp, Seq("user_id"), "left_outer")
          .filter(col("fp").isNull || col("rn") <= col("fp"))
        val wj = Window.partitionBy(col("user_id")).orderBy(col("rn"))
        val tr0 = j.select(
          coalesce(lag(col("event_type"), 1).over(wj), lit("start")).as("src"),
          col("event_type").as("dst"))
        val ends = j
          .withColumn("mr", max(col("rn")).over(Window.partitionBy(col("user_id"))))
          .filter(col("rn") === col("mr") && col("fp").isNull)
          .select(col("event_type").as("src"), lit("(end)").as("dst"))
        // bounded collect: the transition matrix is <= (channels+2)^2
        // cells (7x7 here) — the chain solve is driver math, like the
        // OPQ 64x64 SVD; the corpus-scale aggregation above is what
        // actually distributes
        val cells = tr0.union(ends).groupBy(col("src"), col("dst"))
          .agg(count(lit(1)).as("c"))
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        val ONE = 1L << 30
        val K = 16
        val n = cells.groupBy(_._1).map { case (src, rs) => src -> rs.map(_._3).sum }
        val transient0 = cells.map(_._1).distinct.sorted
        def solve(removed: Option[String]): Long = {
          var v = transient0.map(_ -> 0L).toMap
          for (_ <- 1 to K) {
            v = transient0.map { st =>
              val num = cells.filter(_._1 == st).map { case (_, dst, c) =>
                val vd =
                  if (removed.contains(dst)) 0L
                  else if (dst == "purchase") ONE
                  else if (dst == "(end)") 0L
                  else v.getOrElse(dst, 0L)
                c * vd
              }.sum
              st -> num / n(st)
            }.toMap
          }
          v.getOrElse("start", 0L)
        }
        val p = solve(None)
        require(p > 0L, "q_markov_attribution: chain never converts")
        val channels = transient0.filter(c => c != "start").sorted
        // Removal scenarios are DERIVED from the observed transition
        // sources on both engines (the oracle's sc CTE selects DISTINCT
        // src from tr) — the r13 fixture-pinned channel-set require is
        // gone: a domain change now produces a reviewable row-set diff
        // on both sides instead of a runtime abort of the whole board.
        val re9 = channels.map(c => c -> (1000000000L - solve(Some(c)) * 1000000000L / p))
        val tot = re9.map(_._2).sum
        require(tot > 0L, "q_markov_attribution: all removal effects zero")
        import s.implicits._
        re9.map { case (c, r) =>
          (c, r.toDouble / 1e9, r * 1000000L / tot)
        }.toSeq.toDF("channel", "removal_effect", "share_ppm")
          .orderBy(col("channel"))
      },
      Some {
        val ONE = 1L << 30
        val iters = (1 to 16).map { i =>
          val prev = s"v${i - 1}"
          s"""v$i AS MATERIALIZED (
             |  SELECT s.scen, dn.src AS state,
             |    CAST(sum(t.c * CASE WHEN t.dst = s.rm THEN 0
             |                        WHEN t.dst = 'purchase' THEN $ONE
             |                        WHEN t.dst = '(end)' THEN 0
             |                        ELSE coalesce(pv.v, 0) END) AS BIGINT)
             |      // dn.n AS v
             |  FROM den dn CROSS JOIN sc s
             |  JOIN tr t ON t.src = dn.src
             |  LEFT JOIN $prev pv ON pv.scen = s.scen AND pv.state = t.dst
             |  GROUP BY s.scen, dn.src, dn.n)"""
        }.mkString(",\n")
        s"""WITH ev AS (
           |  SELECT user_id, event_type,
           |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           |      AS rn
           |  FROM events),
           |fp AS (SELECT user_id, min(rn) AS fp FROM ev
           |  WHERE event_type = 'purchase' GROUP BY 1),
           |j AS (
           |  SELECT e.user_id, e.event_type, e.rn
           |  FROM ev e LEFT JOIN fp ON e.user_id = fp.user_id
           |  WHERE fp.fp IS NULL OR e.rn <= fp.fp),
           |tr0 AS (
           |  SELECT coalesce(lag(event_type) OVER (
           |      PARTITION BY user_id ORDER BY rn), 'start') AS src,
           |    event_type AS dst
           |  FROM j),
           |ends AS (
           |  SELECT j.event_type AS src, '(end)' AS dst
           |  FROM j
           |  JOIN (SELECT user_id, max(rn) AS mr FROM j GROUP BY 1) m
           |    ON j.user_id = m.user_id AND j.rn = m.mr
           |  LEFT JOIN fp ON j.user_id = fp.user_id
           |  WHERE fp.fp IS NULL),
           |tr AS MATERIALIZED (
           |  SELECT src, dst, CAST(count(*) AS BIGINT) AS c
           |  FROM (SELECT src, dst FROM tr0 UNION ALL SELECT src, dst FROM ends)
           |  GROUP BY 1, 2),
           |den AS MATERIALIZED (
           |  SELECT src, CAST(sum(c) AS BIGINT) AS n FROM tr GROUP BY 1),
           |sc AS MATERIALIZED (
           |  SELECT 'full' AS scen, '' AS rm
           |  UNION ALL
           |  SELECT DISTINCT src, src FROM tr WHERE src <> 'start'),
           |v0 AS MATERIALIZED (
           |  SELECT s.scen, dn.src AS state, CAST(0 AS BIGINT) AS v
           |  FROM den dn CROSS JOIN sc s),
           |$iters,
           |p AS (SELECT v FROM v16 WHERE scen = 'full' AND state = 'start'),
           |re AS (
           |  SELECT scen AS channel,
           |    1000000000 - (v * 1000000000 // (SELECT v FROM p)) AS re9
           |  FROM v16 WHERE scen <> 'full' AND state = 'start'),
           |tot AS (SELECT CAST(sum(re9) AS BIGINT) AS t FROM re)
           |SELECT channel, CAST(re9 AS DOUBLE) / 1e9 AS removal_effect,
           |  CAST(re9 * 1000000 // t AS BIGINT) AS share_ppm
           |FROM re, tot ORDER BY channel""".stripMargin
      }),

    // Mann-Whitney U (Wilcoxon rank-sum) — the NONPARAMETRIC two-sample
    // test beside q_ab_test's Welch z: compares purchase vs view on the
    // cents grid without assuming normality, the robust check an
    // experiment analysis runs when the metric is skewed. Formulated
    // WITHOUT materializing per-row ranks: aggregate to distinct values
    // first (n1(v), n2(v) per cents value), then 2*U1 = sum over values
    // of 2*n1(v)*c2_below(v) + n1(v)*n2(v) — the pairwise-comparison
    // definition with the tie term, ALL EXACT BIGINTs (c2_below via one
    // cumulative window over the distinct-value grid, which is
    // value-domain-sized, not corpus-sized). Tie-corrected normal
    // approximation: var = (n1*n2/12) * ((N+1) - T/(N(N-1))) with
    // T = sum(t^3 - t) over tie groups — every input an exact integer
    // (probed: 8,053 tied values at sf0.1, so the correction genuinely
    // bites), the double assembly shares one op order and z floor-scales.
    // Scale shape: one map-side-combinable value aggregate, one
    // value-grid window, one 1-row reduce.
    Q("q_mann_whitney",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("purchase", "view"))
          .select(col("event_type"),
            floor(col("value") * lit(100.0)).cast("long").as("x"))
        val byVal = ev.groupBy(col("x")).agg(
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n1v"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n2v"))
        val wCum = Window.orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val parts = byVal
          .withColumn("c2b", coalesce(sum(col("n2v")).over(wCum), lit(0L)))
          .withColumn("t", col("n1v") + col("n2v"))
          .agg(
            sum(lit(2L) * col("n1v") * col("c2b") + col("n1v") * col("n2v"))
              .as("u2x"),
            sum(col("n1v")).as("n1"), sum(col("n2v")).as("n2"),
            sum(col("t") * col("t") * col("t") - col("t")).as("tsum"))
        val nn = col("n1") * col("n2")
        val bigN = col("n1") + col("n2")
        val u1 = col("u2x").cast("double") / lit(2.0)
        val mu = nn.cast("double") / lit(2.0)
        val variance = (nn.cast("double") / lit(12.0)) *
          ((bigN + lit(1L)).cast("double") -
            col("tsum").cast("double") / (bigN * (bigN - lit(1L))).cast("double"))
        // nullif guard (the q_outliers rule): a degenerate sample
        // (either arm empty / all values tied) has zero variance, where
        // the engines' division semantics diverge — snap BOTH to NULL.
        val z = (u1 - mu) / nullif(sqrt(variance), lit(0.0))
        parts.select(col("n1"), col("n2"), u1.as("u1"),
          (floor(z * lit(1e9)) / lit(1e9)).as("z"),
          (abs(z) > lit(1.96)).cast("long").as("significant"))
      },
      Some("""WITH ev AS (
         |  SELECT event_type, CAST(floor(value * 100.0) AS BIGINT) AS x
         |  FROM events WHERE event_type IN ('purchase', 'view')),
         |bv AS (
         |  SELECT x,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n1v,
         |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n2v
         |  FROM ev GROUP BY x),
         |cum AS (
         |  SELECT x, n1v, n2v,
         |    coalesce(sum(n2v) OVER (ORDER BY x
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c2b,
         |    n1v + n2v AS t
         |  FROM bv),
         |agg AS (
         |  SELECT CAST(sum(2*n1v*c2b + n1v*n2v) AS BIGINT) AS u2x,
         |    CAST(sum(n1v) AS BIGINT) AS n1, CAST(sum(n2v) AS BIGINT) AS n2,
         |    CAST(sum(t*t*t - t) AS BIGINT) AS tsum
         |  FROM cum)
         |SELECT n1, n2, CAST(u2x AS DOUBLE) / 2.0 AS u1,
         |  floor((CAST(u2x AS DOUBLE) / 2.0 - CAST(n1*n2 AS DOUBLE) / 2.0)
         |    / nullif(sqrt((CAST(n1*n2 AS DOUBLE) / 12.0) *
         |        (CAST(n1 + n2 + 1 AS DOUBLE) -
         |         CAST(tsum AS DOUBLE) / CAST((n1+n2)*(n1+n2-1) AS DOUBLE))), 0)
         |    * 1e9) / 1e9 AS z,
         |  CAST(abs((CAST(u2x AS DOUBLE) / 2.0 - CAST(n1*n2 AS DOUBLE) / 2.0)
         |    / nullif(sqrt((CAST(n1*n2 AS DOUBLE) / 12.0) *
         |        (CAST(n1 + n2 + 1 AS DOUBLE) -
         |         CAST(tsum AS DOUBLE) / CAST((n1+n2)*(n1+n2-1) AS DOUBLE))), 0))
         |    > 1.96 AS BIGINT) AS significant
         |FROM agg""".stripMargin)),

    // Two-sample Kolmogorov-Smirnov — the DISTRIBUTION-SHAPE test beside
    // q_mann_whitney's location shift: purchase vs view spend on the
    // cents grid, D = sup_x |F1(x) - F2(x)|. Fully exact integers end to
    // end: per distinct grid value, cumulative counts c1/c2 over the
    // value-ordered walk (the q_mann_whitney single-partition window —
    // scale-safe because the walk is over DISTINCT GRID VALUES, bounded
    // by the price grid, not the corpus), and the sup statistic is
    // max |c1*n2 - c2*n1| — a BIGINT, the rational D's numerator over
    // the common denominator n1*n2 (products via DECIMAL(38,0)/HUGEINT,
    // the q_cuped rule, so a 10^4x fixture cannot wrap). The one double
    // per bound is exact-integer / sqrt: IEEE sqrt is correctly rounded,
    // so d_stat and the Smirnov asymptotic critical value
    // c(0.05)=1.358 * sqrt((n1+n2)/(n1*n2)) are bit-identical on both
    // engines; both are floor-snapped to the 1e9 grid anyway.
    Q("q_ks_test",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("purchase", "view"))
          .select(col("event_type"),
            floor(col("value") * lit(100.0)).cast("long").as("x"))
        val byVal = ev.groupBy(col("x")).agg(
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n1v"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n2v"))
        val wCum = Window.orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val agg = byVal
          .withColumn("c1", sum(col("n1v")).over(wCum))
          .withColumn("c2", sum(col("n2v")).over(wCum))
          .withColumn("n1", sum(col("n1v")).over(wAll))
          .withColumn("n2", sum(col("n2v")).over(wAll))
          .select(col("n1"), col("n2"),
            abs(expr("CAST(c1 AS DECIMAL(38,0)) * n2") -
              expr("CAST(c2 AS DECIMAL(38,0)) * n1")).as("dn"))
          .groupBy(col("n1"), col("n2"))
          .agg(max(col("dn")).as("d_num"))
        agg.select(col("n1"), col("n2"),
          (expr("CAST(d_num AS DECIMAL(38,0)) * 1000000000 div " +
            "(CAST(n1 AS DECIMAL(38,0)) * n2)").cast("double") / lit(1e9))
            .as("d_stat"),
          (floor(lit(1.358) *
            sqrt((col("n1") + col("n2")).cast("double") /
              (col("n1").cast("double") * col("n2").cast("double"))) *
            lit(1e9)) / lit(1e9)).as("d_crit_05"),
          (expr("CAST(d_num AS DECIMAL(38,0)) * 1000000000 div " +
            "(CAST(n1 AS DECIMAL(38,0)) * n2)").cast("double") / lit(1e9) >
            floor(lit(1.358) *
              sqrt((col("n1") + col("n2")).cast("double") /
                (col("n1").cast("double") * col("n2").cast("double"))) *
              lit(1e9)) / lit(1e9)).cast("long").as("reject_05"))
      },
      Some("""WITH ev AS (
         |  SELECT event_type, CAST(floor(value * 100.0) AS BIGINT) AS x
         |  FROM events WHERE event_type IN ('purchase', 'view')),
         |bv AS (
         |  SELECT x,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n1v,
         |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n2v
         |  FROM ev GROUP BY x),
         |cum AS (
         |  SELECT x,
         |    sum(n1v) OVER (ORDER BY x) AS c1,
         |    sum(n2v) OVER (ORDER BY x) AS c2,
         |    sum(n1v) OVER () AS n1, sum(n2v) OVER () AS n2
         |  FROM bv),
         |agg AS (
         |  SELECT CAST(min(n1) AS BIGINT) AS n1,
         |    CAST(min(n2) AS BIGINT) AS n2,
         |    max(abs(CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1))
         |      AS d_num
         |  FROM cum)
         |SELECT n1, n2,
         |  CAST(d_num * 1000000000 // (CAST(n1 AS HUGEINT) * n2) AS DOUBLE)
         |    / 1e9 AS d_stat,
         |  floor(CAST(1.358 AS DOUBLE) *
         |    sqrt(CAST(n1 + n2 AS DOUBLE) /
         |      (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) * 1e9) / 1e9
         |    AS d_crit_05,
         |  CAST(CAST(d_num * 1000000000 // (CAST(n1 AS HUGEINT) * n2)
         |      AS DOUBLE) / 1e9 >
         |    floor(CAST(1.358 AS DOUBLE) *
         |      sqrt(CAST(n1 + n2 AS DOUBLE) /
         |        (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) * 1e9) / 1e9
         |    AS BIGINT) AS reject_05
         |FROM agg""".stripMargin)),

    // 1-D Wasserstein-1 (earth mover's) distance between the SAME two
    // spend distributions q_ks_test contrasts — the L1 companion to the
    // KS sup-norm, and the drift metric ML pipelines use where PSI's
    // fixed binning is too coarse: W1 = integral |F1 - F2| dx. On the
    // cents grid this is EXACT integers end to end: per distinct value,
    // the CDF-difference numerator d = c1*n2 - c2*n1 (the q_ks_test
    // walk) weighted by the gap to the next grid value, summed as a
    // DECIMAL(38,0)/HUGEINT (a term can reach |d| <= n1*n2 times a
    // cents gap — far past 2^63 at 100x the fixture), then ONE scaled
    // integral division by n1*n2 gives W1 in cents on the 1e9 grid.
    Q("q_wasserstein",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("purchase", "view"))
          .select(col("event_type"),
            floor(col("value") * lit(100.0)).cast("long").as("x"))
        val byVal = ev.groupBy(col("x")).agg(
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n1v"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n2v"))
        val wCum = Window.orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val wLead = Window.orderBy(col("x"))
        byVal
          .withColumn("c1", sum(col("n1v")).over(wCum))
          .withColumn("c2", sum(col("n2v")).over(wCum))
          .withColumn("n1", sum(col("n1v")).over(wAll))
          .withColumn("n2", sum(col("n2v")).over(wAll))
          .withColumn("gap", lead(col("x"), 1).over(wLead) - col("x"))
          .filter(col("gap").isNotNull) // the last grid point carries no mass gap
          .select(col("n1"), col("n2"),
            (abs(expr("CAST(c1 AS DECIMAL(38,0)) * n2") -
              expr("CAST(c2 AS DECIMAL(38,0)) * n1")) * col("gap")).as("term"))
          .groupBy(col("n1"), col("n2"))
          .agg(sum(col("term")).as("wnum"))
          .select(col("n1"), col("n2"),
            (expr("CAST(wnum AS DECIMAL(38,0)) * 1000000000 div " +
              "(CAST(n1 AS DECIMAL(38,0)) * n2)").cast("double") / lit(1e9))
              .as("w1_cents"))
      },
      Some("""WITH ev AS (
         |  SELECT event_type, CAST(floor(value * 100.0) AS BIGINT) AS x
         |  FROM events WHERE event_type IN ('purchase', 'view')),
         |bv AS (
         |  SELECT x,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n1v,
         |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n2v
         |  FROM ev GROUP BY x),
         |cum AS (
         |  SELECT x,
         |    sum(n1v) OVER (ORDER BY x) AS c1,
         |    sum(n2v) OVER (ORDER BY x) AS c2,
         |    sum(n1v) OVER () AS n1, sum(n2v) OVER () AS n2,
         |    lead(x) OVER (ORDER BY x) - x AS gap
         |  FROM bv),
         |agg AS (
         |  SELECT CAST(min(n1) AS BIGINT) AS n1,
         |    CAST(min(n2) AS BIGINT) AS n2,
         |    sum(abs(CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1)
         |      * gap) AS wnum
         |  FROM cum WHERE gap IS NOT NULL)
         |SELECT n1, n2,
         |  CAST(wnum * 1000000000 // (CAST(n1 AS HUGEINT) * n2) AS DOUBLE)
         |    / 1e9 AS w1_cents
         |FROM agg""".stripMargin)),


    // Wilson score interval — the PROPORTION confidence interval beside
    // q_bootstrap_ci's resampling CI: per event type, the fraction of
    // high-value events (value >= 100, ~13% of the fixture) with the
    // interval that stays inside [0,1] and behaves at small n where the
    // naive Wald interval fails (Wilson 1927, the industry-standard CTR
    // CI). Counts are exact BIGINTs; z^2 is PRECOMPUTED once in Scala
    // and interpolated as the same literal into both plans (the
    // transcendental-constant rule); the double assembly shares one op
    // order and the bounds floor-scale. ONE 5-group aggregate.
    Q("q_wilson_ci",
      (s, d) => {
        val z = 1.96
        val z2 = z * z // 3.8415999999999997 — same literal both engines
        val st = Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("value") >= 100.0, 1L).otherwise(0L)).as("k"))
        val nD = col("n").cast("double")
        val p = col("k").cast("double") / nD
        val denom = lit(1.0) + lit(z2) / nD
        val center = p + lit(z2) / (lit(2.0) * nD)
        val half = lit(z) * sqrt(p * (lit(1.0) - p) / nD +
          lit(z2) / (lit(4.0) * nD * nD))
        st.select(col("event_type"), col("n"), col("k"),
          (floor(p * lit(1e9)) / lit(1e9)).as("p_hat"),
          (floor((center - half) / denom * lit(1e9)) / lit(1e9)).as("ci_lo"),
          (floor((center + half) / denom * lit(1e9)) / lit(1e9)).as("ci_hi"))
          .orderBy(col("event_type"))
      },
      Some {
        val z2 = (1.96 * 1.96).toString
        s"""WITH st AS (
           |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN value >= 100.0 THEN 1 ELSE 0 END)
           |      AS BIGINT) AS k
           |  FROM events GROUP BY 1)
           |SELECT event_type, n, k,
           |  floor(CAST(k AS DOUBLE) / CAST(n AS DOUBLE) * 1e9) / 1e9
           |    AS p_hat,
           |  floor((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
           |      + CAST($z2 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE))
           |      - 1.96 * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
           |          * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
           |          / CAST(n AS DOUBLE)
           |        + CAST($z2 AS DOUBLE) / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
           |    / (1.0 + CAST($z2 AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9) / 1e9 AS ci_lo,
           |  floor((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
           |      + CAST($z2 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE))
           |      + 1.96 * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
           |          * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
           |          / CAST(n AS DOUBLE)
           |        + CAST($z2 AS DOUBLE) / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
           |    / (1.0 + CAST($z2 AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9) / 1e9 AS ci_hi
           |FROM st ORDER BY event_type""".stripMargin
      }),

    // Poisson bootstrap (Chamandy et al., "Estimating uncertainty for
    // massive data streams", public Google report; the standard
    // resampling design AT SCALE) — a classic bootstrap materializes B
    // row-resamples (O(B x n) shuffled rows); the Poisson bootstrap
    // instead gives every row an independent Poisson(1) weight per
    // resample, so the per-resample statistic is ONE map-side-combinable
    // weighted aggregate and the shuffle is O(B) partial rows per
    // partition, corpus size irrelevant. Weights are DETERMINISTIC here:
    // u = md5(event_id, b) mod 1e6 inverted through the exact Poisson(1)
    // CDF thresholds (floor(cum x 1e6): 367879/735758/919698/981011/
    // 996340/999405, capped at 6) — integer arithmetic both engines
    // replay bitwise. Per-resample mean rides the P43 scaled integral
    // division (swx*1e9 div sw); the CI bounds are ORDER STATISTICS of
    // the B=40 resample means (rank 2 / rank 38 = the 5th/95th
    // percentile under the ceil-rank rule), so no double re-aggregation
    // ever happens — the one double division per bound is exact-long/1e9.
    Q("q_bootstrap_ci",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val B = 40
        // the PURCHASE stratum: the revenue-mean CI a growth analysis
        // actually ships; also bounds the md5 volume (rows x B) to the
        // stratum, the deterministic-replay cost of the weight draw
        val ev = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("event_id"),
            floor(col("value") * lit(100.0)).cast("long").as("x"))
        val thresholds = Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L)
        val u = graft.functions.TextOps.md5Prefix60(
          concat(lit("boot:"), col("event_id").cast("string"), lit(":"),
            col("b").cast("string"))) % 1000000L
        val per = ev
          .select(col("event_id"), col("x"),
            explode(sequence(lit(0), lit(B - 1))).as("b"))
          .withColumn("u", u)
          .withColumn("w", thresholds.map(t => (col("u") >= t).cast("long"))
            .reduce(_ + _))
          .groupBy(col("b"))
          .agg(sum(col("w")).as("sw"), sum(col("w") * col("x")).as("swx"))
          // swx*1e9 in plain Long wraps silently at ~10x the sf0.1
          // purchase volume (Spark wraps, DuckDB errors — a larger
          // fixture would corrupt Spark-side while the oracle crashes);
          // route the product through DECIMAL(38,0)/HUGEINT, the q_cuped
          // discipline. `div` on decimals still returns an exact long.
          .withColumn("mean9",
            expr("CAST(swx AS DECIMAL(38,0)) * 1000000000 div sw"))
          .withColumn("rn",
            row_number().over(Window.orderBy(col("mean9"), col("b"))))
        val lo = per.filter(col("rn") === 2)
          .select((col("mean9").cast("double") / 1e9).as("ci_lo_cents"))
        val hi = per.filter(col("rn") === B - 2)
          .select((col("mean9").cast("double") / 1e9).as("ci_hi_cents"))
        val full = ev.agg(
          expr("CAST(sum(x) AS DECIMAL(38,0)) * 1000000000 div count(*)").as("m9"),
          count(lit(1)).as("n_events"))
          .select(col("n_events"), lit(B.toLong).as("n_resamples"),
            (col("m9").cast("double") / 1e9).as("mean_cents"))
        full.crossJoin(lo).crossJoin(hi)
      },
      Some(s"""WITH ev AS (
         |  SELECT event_id, CAST(floor(value * 100.0) AS BIGINT) AS x
         |  FROM events WHERE event_type = 'purchase'),
         |e2 AS (SELECT event_id, x, b
         |  FROM ev, (SELECT unnest(range(0, 40)) AS b) r),
         |uw AS (
         |  SELECT x, b,
         |    ${graft.OracleSql.hexToLong(
               "md5('boot:' || CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR))",
               1, 15)} % 1000000 AS u
         |  FROM e2),
         |ww AS (
         |  SELECT b, x,
         |    (CASE WHEN u >= 367879 THEN 1 ELSE 0 END) +
         |    (CASE WHEN u >= 735758 THEN 1 ELSE 0 END) +
         |    (CASE WHEN u >= 919698 THEN 1 ELSE 0 END) +
         |    (CASE WHEN u >= 981011 THEN 1 ELSE 0 END) +
         |    (CASE WHEN u >= 996340 THEN 1 ELSE 0 END) +
         |    (CASE WHEN u >= 999405 THEN 1 ELSE 0 END) AS w
         |  FROM uw),
         |per AS (
         |  SELECT b, CAST(sum(w) AS BIGINT) AS sw,
         |    CAST(sum(w * x) AS BIGINT) AS swx
         |  FROM ww GROUP BY b),
         |m AS (
         |  SELECT b, CAST(swx AS HUGEINT) * 1000000000 // sw AS mean9,
         |    row_number() OVER (
         |      ORDER BY CAST(swx AS HUGEINT) * 1000000000 // sw, b) AS rn
         |  FROM per),
         |f AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_events,
         |    CAST(sum(x) AS HUGEINT) * 1000000000 // count(*) AS m9
         |  FROM ev)
         |SELECT n_events, CAST(40 AS BIGINT) AS n_resamples,
         |  CAST(m9 AS DOUBLE) / 1e9 AS mean_cents,
         |  (SELECT CAST(mean9 AS DOUBLE) / 1e9 FROM m WHERE rn = 2)
         |    AS ci_lo_cents,
         |  (SELECT CAST(mean9 AS DOUBLE) / 1e9 FROM m WHERE rn = 38)
         |    AS ci_hi_cents
         |FROM f""".stripMargin)),

    // Neyman (optimal) allocation for stratified sampling — the
    // data-selection twin of q_stratified_sample: given a total budget of
    // 10,000 samples, allocate n_h across strata proportionally to
    // N_h x S_h (stratum size x stratum std — the allocation minimizing
    // estimator variance; Neyman 1934, public). Moments ride the
    // q_outliers DECIMAL route (order-independent exact sums -> identical
    // IEEE mean/var/std on both engines); the allocation then snaps each
    // stratum's weight to an integer grid FIRST (w6 = floor(N_h*S_h*1e6),
    // a per-stratum double->int snap, no cross-stratum double sums), so
    // the budget split is EXACT integer arithmetic end to end: floor
    // shares by scaled integral division + largest-remainder rounding
    // (rank by remainder desc, stratum asc). Scale shape: one 5-group
    // aggregate + two 1-row broadcasts — corpus-size-independent
    // allocation math, the same shape at 100 TB.
    Q("q_neyman_alloc",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val BUDGET = 10000L
        val st = Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("nh"),
            H.dsum(col("value")).as("s1"),
            H.dsum(col("value") * col("value")).as("s2"))
          .select(col("event_type"), col("nh"),
            sqrt(col("s2") / col("nh") -
              (col("s1") / col("nh")) * (col("s1") / col("nh"))).as("sh"))
          .withColumn("w6",
            floor(col("nh").cast("double") * col("sh") * lit(1e6)).cast("long"))
        val tot = st.agg(sum(col("w6")).as("t6"))
        val shares = st.crossJoin(broadcast(tot))
          .withColumn("alloc0", expr(s"$BUDGET * w6 div t6"))
          .withColumn("rem", expr(s"($BUDGET * w6) % t6"))
        val used = shares.agg(sum(col("alloc0")).as("used"))
        shares.crossJoin(broadcast(used))
          .withColumn("rn", row_number().over(
            Window.orderBy(col("rem").desc, col("event_type"))))
          .withColumn("alloc",
            col("alloc0") + when(col("rn") <= lit(BUDGET) - col("used"), 1L)
              .otherwise(0L))
          .select(col("event_type"), col("nh"),
            (floor(col("sh") * lit(1e9)) / lit(1e9)).as("sh"),
            col("alloc"))
          .orderBy(col("event_type"))
      },
      Some("""WITH st AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS nh,
         |    CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS s1,
         |    CAST(sum(CAST(value*value AS DECIMAL(25,6))) AS DOUBLE) AS s2
         |  FROM events GROUP BY 1),
         |ms AS (
         |  SELECT event_type, nh,
         |    sqrt(s2/nh - (s1/nh)*(s1/nh)) AS sh
         |  FROM st),
         |w AS (
         |  SELECT event_type, nh, sh,
         |    CAST(floor(CAST(nh AS DOUBLE) * sh * 1e6) AS BIGINT) AS w6
         |  FROM ms),
         |t AS (SELECT CAST(sum(w6) AS BIGINT) AS t6 FROM w),
         |shares AS (
         |  SELECT event_type, nh, sh,
         |    10000 * w6 // t6 AS alloc0,
         |    (10000 * w6) % t6 AS rem
         |  FROM w, t),
         |u AS (SELECT CAST(sum(alloc0) AS BIGINT) AS used FROM shares),
         |r AS (
         |  SELECT event_type, nh, sh, alloc0, rem,
         |    row_number() OVER (ORDER BY rem DESC, event_type) AS rn
         |  FROM shares)
         |SELECT event_type, nh,
         |  floor(sh * 1e9) / 1e9 AS sh,
         |  CAST(alloc0 + CASE WHEN rn <= 10000 - u.used THEN 1 ELSE 0 END
         |    AS BIGINT) AS alloc
         |FROM r, u ORDER BY event_type""".stripMargin)),

    // Power-law tail index (Hill 1975 estimator, public) over the order-
    // value distribution: alpha = 1 + k / sum_{i<=k} ln(x_i / x_min) on
    // the k = 200 largest order totals (cents grid), the standard
    // heavy-tail diagnostic a revenue/degree distribution analysis runs.
    // Parity: the top-k selection is an integer sort (cents, orderkey
    // tie-break) -> TakeOrderedAndProject-class; each ln(x_i/x_min) is
    // the same double op on identical inputs, snapped to the 9-dp grid
    // BEFORE the DECIMAL re-aggregation (round-then-DECIMAL is exact for
    // irrational ln values — the q_lm_score rule; ln(1) = 0 exactly for
    // the k-th element itself), so the sum is order-independent and the
    // final alpha floor-scales. Scale shape: global top-k (k-bounded
    // per-partition heaps + one k-row merge), then a k-row aggregate.
    Q("q_hill_tail",
      (s, d) => {
        val K = 200
        val topk = Tables.orders(s, d)
          .select(floor(col("o_totalprice") * lit(100.0)).cast("long").as("x"),
            col("o_orderkey"))
          .orderBy(col("x").desc, col("o_orderkey"))
          .limit(K)
        val xmin = topk.agg(min(col("x")).as("xmin"))
        topk.crossJoin(broadcast(xmin))
          .select(round(log(col("x").cast("double") / col("xmin").cast("double")), 9)
            .as("lr"))
          .agg(count(lit(1)).as("k"),
            H.dsum12(col("lr")).as("slr"))
          .select(col("k"),
            (floor((lit(1.0) + col("k") / col("slr")) * lit(1e9)) / lit(1e9))
              .as("alpha"))
      },
      Some("""WITH c AS (
         |  SELECT CAST(floor(o_totalprice * 100.0) AS BIGINT) AS x,
         |    o_orderkey
         |  FROM orders ORDER BY x DESC, o_orderkey LIMIT 200),
         |mn AS (SELECT min(x) AS xmin FROM c),
         |lr AS (
         |  SELECT round(ln(CAST(x AS DOUBLE) / CAST(xmin AS DOUBLE)), 9)
         |    AS lr
         |  FROM c, mn),
         |agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS k,
         |    CAST(sum(CAST(lr AS DECIMAL(25,12))) AS DOUBLE) AS slr
         |  FROM lr)
         |SELECT k, floor((1.0 + k / slr) * 1e9) / 1e9 AS alpha
         |FROM agg""".stripMargin)),

    // Theil-Sen robust trend per market segment (Theil 1950 / Sen 1968,
    // public) — the robust companion the statistics family lacked beside
    // q_ols: one gross outlier month corrupts the OLS slope, while the
    // median-of-pairwise-slopes estimator tolerates ~29% corruption.
    // NO doubles anywhere in the estimation (r13 verdict #5 shape):
    //  - the monthly series is exact (cents revenue on the month-index
    //    grid, x = calendar months since the fixture's first order);
    //  - pairwise slopes are exact rationals dy/dx, ORDERED by the exact
    //    integer key trunc(dy * 2^20 / dx): two DISTINCT slope rationals
    //    differ by >= 1/(dx1*dx2) >= 2^-14 (dx <= ~84 calendar months),
    //    so the 2^20 scaling separates their keys by >= 2^6 and trunc
    //    (monotone, identical toward-zero semantics on both engines)
    //    preserves strict order while equal rationals collide — an order
    //    isomorphism, not an approximation;
    //  - the even-count median is the exact rational
    //    (dyL*dxH + dyH*dxL) / (2*dxL*dxH) of the two middle elements
    //    (ranks (np+1) div 2 and (np+2) div 2 — equal when np is odd,
    //    where the formula reduces to the same rational);
    //  - the Sen intercept is the median residual, and residuals share
    //    the per-segment positive denominator den, so their order is the
    //    order of the exact integer numerators rev*den - num*x.
    // Outputs are e6-scaled BIGINTs from one DECIMAL(38,0)/HUGEINT
    // integral division per statistic (trunc == // probed on negatives)
    // plus exact-long/1e6 display doubles — bitwise by construction.
    // Scale shape: one map-side-combinable month-grid aggregate, then a
    // per-segment CALENDAR-BOUNDED self-join (<= months^2 pairs per
    // segment, corpus-size-INDEPENDENT) and two bounded-grid rank
    // windows — Theil-Sen at 100 TB costs the one aggregate pass.
    Q("q_theil_sen",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val m0 = Tables.orders(s, d)
          .join(Tables.customer(s, d),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("seg"),
            (year(col("o_orderdate")) * lit(12) + month(col("o_orderdate")))
              .cast("long").as("mi"))
          .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long"))
            .as("rev"))
        val m = m0.crossJoin(broadcast(m0.agg(min(col("mi")).as("m0"))))
          .select(col("seg"), (col("mi") - col("m0")).as("x"), col("rev"))
        val p = m.select(col("seg"), col("x").as("xa"), col("rev").as("ra"))
          .join(m.select(col("seg").as("sb"), col("x").as("xb"),
            col("rev").as("rb")),
            col("seg") === col("sb") && col("xa") < col("xb"))
          .select(col("seg"), (col("rb") - col("ra")).as("dy"),
            (col("xb") - col("xa")).as("dx"))
          .withColumn("skey",
            expr("(CAST(dy AS DECIMAL(38,0)) * 1048576) div dx"))
        val r = p
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("seg"))
              .orderBy(col("skey"), col("dx"), col("dy"))))
          .withColumn("np",
            count(lit(1)).over(Window.partitionBy(col("seg"))))
        val lo = r.filter(col("rk") === expr("(np + 1) div 2"))
          .select(col("seg"), col("dy").as("dyl"), col("dx").as("dxl"),
            col("np").as("n_pairs"))
        val hi = r.filter(col("rk") === expr("(np + 2) div 2"))
          .select(col("seg").as("sh"), col("dy").as("dyh"),
            col("dx").as("dxh"))
        val med = lo.join(hi, col("seg") === col("sh"))
          .select(col("seg"), col("n_pairs"),
            expr("CAST(dyl AS DECIMAL(38,0)) * dxh + CAST(dyh AS DECIMAL(38,0)) * dxl")
              .as("num"),
            expr("CAST(2 AS DECIMAL(38,0)) * dxl * dxh").as("den"))
        val res = m.join(med.withColumnRenamed("seg", "sm"),
            col("seg") === col("sm"))
          .select(col("seg"), col("n_pairs"), col("num"), col("den"),
            expr("CAST(rev AS DECIMAL(38,0)) * den - num * x").as("rn"))
        val rr = res
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("seg")).orderBy(col("rn"))))
          .withColumn("nm",
            count(lit(1)).over(Window.partitionBy(col("seg"))))
        val lo2 = rr.filter(col("rk") === expr("(nm + 1) div 2"))
          .select(col("seg"), col("n_pairs"), col("num"), col("den"),
            col("rn").as("rnl"), col("nm").as("n_months"))
        val hi2 = rr.filter(col("rk") === expr("(nm + 2) div 2"))
          .select(col("seg").as("s2"), col("rn").as("rnh"))
        lo2.join(hi2, col("seg") === col("s2"))
          .select(col("seg"), col("n_months"), col("n_pairs"),
            expr("CAST((num * 1000000) div den AS BIGINT)").as("slope_e6"),
            expr("CAST((rnl + rnh) * 1000000 div (2 * den) AS BIGINT)")
              .as("intercept_e6"))
          .select(col("seg"), col("n_months"), col("n_pairs"),
            col("slope_e6"),
            (col("slope_e6").cast("double") / lit(1e6)).as("slope"),
            col("intercept_e6"),
            (col("intercept_e6").cast("double") / lit(1e6)).as("intercept"))
          .orderBy(col("seg"))
      },
      Some("""WITH m0 AS (
         |  SELECT c_mktsegment AS seg,
         |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
         |      AS mi,
         |    CAST(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT))
         |      AS BIGINT) AS rev
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1, 2),
         |m AS (SELECT seg, mi - (SELECT min(mi) FROM m0) AS x, rev FROM m0),
         |p AS (
         |  SELECT a.seg, b.rev - a.rev AS dy, b.x - a.x AS dx,
         |    CAST(b.rev - a.rev AS HUGEINT) * 1048576 // (b.x - a.x)
         |      AS skey
         |  FROM m a JOIN m b ON a.seg = b.seg AND a.x < b.x),
         |r AS (
         |  SELECT seg, dy, dx,
         |    CAST(row_number() OVER (PARTITION BY seg
         |      ORDER BY skey, dx, dy) AS BIGINT) AS rk,
         |    CAST(count(*) OVER (PARTITION BY seg) AS BIGINT) AS np
         |  FROM p),
         |lo AS (SELECT seg, dy AS dyl, dx AS dxl, np AS n_pairs
         |  FROM r WHERE rk = (np + 1) // 2),
         |hi AS (SELECT seg, dy AS dyh, dx AS dxh
         |  FROM r WHERE rk = (np + 2) // 2),
         |med AS (
         |  SELECT lo.seg, n_pairs,
         |    CAST(dyl AS HUGEINT) * dxh + CAST(dyh AS HUGEINT) * dxl AS num,
         |    CAST(2 AS HUGEINT) * dxl * dxh AS den
         |  FROM lo JOIN hi USING (seg)),
         |res AS (
         |  SELECT m.seg, n_pairs, num, den,
         |    CAST(m.rev AS HUGEINT) * den - num * m.x AS rn
         |  FROM m JOIN med ON m.seg = med.seg),
         |rr AS (
         |  SELECT seg, n_pairs, num, den, rn,
         |    CAST(row_number() OVER (PARTITION BY seg ORDER BY rn)
         |      AS BIGINT) AS rk,
         |    CAST(count(*) OVER (PARTITION BY seg) AS BIGINT) AS nm
         |  FROM res),
         |lo2 AS (SELECT seg, n_pairs, num, den, rn AS rnl, nm AS n_months
         |  FROM rr WHERE rk = (nm + 1) // 2),
         |hi2 AS (SELECT seg, rn AS rnh FROM rr WHERE rk = (nm + 2) // 2)
         |SELECT lo2.seg, n_months, n_pairs,
         |  CAST((num * 1000000) // den AS BIGINT) AS slope_e6,
         |  CAST(CAST((num * 1000000) // den AS BIGINT) AS DOUBLE) / 1e6
         |    AS slope,
         |  CAST((rnl + rnh) * 1000000 // (2 * den) AS BIGINT)
         |    AS intercept_e6,
         |  CAST(CAST((rnl + rnh) * 1000000 // (2 * den) AS BIGINT)
         |    AS DOUBLE) / 1e6 AS intercept
         |FROM lo2 JOIN hi2 USING (seg) ORDER BY seg""".stripMargin)),

    // Isotonic regression of the monthly revenue series per market
    // segment — the monotone-trend RESTORATION beside q_theil_sen's
    // robust line and q_ols's least squares: the best monotone
    // (non-decreasing) fit in L2, the standard calibration tool
    // (Barlow et al. 1972; classifier-score calibration uses exactly
    // this). Formulated for SQL via the MINIMAX identity
    //   iso[i] = max_{j<=i} min_{k>=i} mean(y[j..k])
    // instead of the sequential pool-adjacent-violators stack (which a
    // declarative plan cannot express): subrange means come from exact
    // BIGINT prefix sums on the cents grid, and each mean enters the
    // min/max as its e6-truncated integral division — a legitimate
    // order key BECAUSE distinct subrange means differ by >= 1/den1*den2
    // >= 1/84^2 cents ~ 142 e6-units, so truncation (monotone,
    // injective on this set) commutes with min and max and the final
    // value is EXACTLY trunc(iso * 1e6). AnalyticsSpec replays the
    // classic PAVA stack in BigInt rationals — a genuinely different
    // algorithm whose agreement is the Barlow minimax THEOREM, not a
    // shared formulation.
    // Scale shape: the theil_sen contract — ONE corpus month-grid
    // aggregate; the (j,k) pair and (j,i,k) triple relations are
    // calendar-bounded (<= 84^3/6 rows per segment, corpus-independent).
    Q("q_isotonic",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wSeg = Window.partitionBy(col("seg")).orderBy(col("mi"))
        val m = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("seg"),
            (year(col("o_orderdate")) * lit(12) + month(col("o_orderdate")))
              .cast("long").as("mi"))
          .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long"))
            .as("rev"))
          .withColumn("i", row_number().over(wSeg).cast("long"))
          .withColumn("p", sum(col("rev")).over(wSeg))
        val a = m.select(col("seg"), col("i").as("j"),
          (col("p") - col("rev")).as("q"))
        val b = m.select(col("seg").as("seg_b"), col("i").as("k"),
          col("p").as("pk"))
        val pairs = a.join(b,
            col("seg") === col("seg_b") && col("j") <= col("k"))
          .select(col("seg"), col("j"), col("k"),
            // cum-revenue x 1e6 runs through DECIMAL(38,0) (the q_cuped
            // rule) so a large-SF month grid cannot wrap — and the
            // e6-scaled mean STAYS DECIMAL through the min/max stages:
            // `div` would return BIGINT, whose silent-NULL overflow at
            // ~9.2e18 (an SF100-class month revenue is within 2x of it)
            // would drop the month from the fit instead of failing
            // loudly. The integral division is exact decimal arithmetic
            // (num - num % den is divisible by den); BIGINT appears only
            // at the final output cast, where both engines convert the
            // same exact value.
            expr("CAST(((CAST(pk - q AS DECIMAL(38,0)) * 1000000) - " +
              "((CAST(pk - q AS DECIMAL(38,0)) * 1000000) % (k - j + 1))) " +
              "/ (k - j + 1) AS DECIMAL(38,0))")
              .as("v_e6"))
        val trip = pairs.join(
            m.select(col("seg").as("seg_i"), col("i")),
            col("seg") === col("seg_i") &&
              col("j") <= col("i") && col("i") <= col("k"))
          .select(col("seg"), col("i"), col("j"), col("k"), col("v_e6"))
        val inner = trip.groupBy(col("seg"), col("i"), col("j"))
          .agg(min(col("v_e6")).as("lo"))
        val iso = inner.groupBy(col("seg"), col("i"))
          .agg(max(col("lo")).as("fit_e6"))
        // output-cast guard (ADVICE r16): Spark's non-ANSI decimal->long
        // cast silently NULLs on overflow while DuckDB's CAST(HUGEINT AS
        // BIGINT) raises — at SF100-class revenues the e6-scaled fit sits
        // within 2x of 2^63, so past it the engines would diverge as a
        // silent-NULL hash mismatch instead of a loud failure. raise_error
        // makes Spark fail exactly where the oracle does, on the same value.
        val fitLong = when(
            abs(col("fit_e6")) <=
              lit("9223372036854775807").cast("decimal(38,0)"),
            col("fit_e6").cast("long"))
          .otherwise(raise_error(concat(
            lit("q_isotonic fit_e6 overflows BIGINT: "),
            col("fit_e6").cast("string"))).cast("long"))
        m.select(col("seg").as("seg_m"), col("i").as("i_m"),
            col("mi"), col("rev"))
          .join(iso, col("seg_m") === col("seg") && col("i_m") === col("i"))
          .select(col("seg"), col("i"), col("mi"), col("rev"),
            fitLong.as("fit_e6"),
            (fitLong.cast("double") / lit(1e6)).as("fit_cents"))
          .orderBy(col("seg"), col("i"))
      },
      Some("""WITH m0 AS (
         |  SELECT c_mktsegment AS seg,
         |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
         |      AS mi,
         |    CAST(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT))
         |      AS BIGINT) AS rev
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1, 2),
         |m AS (
         |  SELECT seg, mi, rev,
         |    CAST(row_number() OVER (PARTITION BY seg ORDER BY mi)
         |      AS BIGINT) AS i,
         |    CAST(sum(rev) OVER (PARTITION BY seg ORDER BY mi
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS p
         |  FROM m0),
         |pairs AS (
         |  SELECT a.seg, a.i AS j, b.i AS k,
         |    (CAST(b.p - (a.p - a.rev) AS HUGEINT) * 1000000)
         |      // (b.i - a.i + 1) AS v_e6
         |  FROM m a JOIN m b ON a.seg = b.seg AND a.i <= b.i),
         |trip AS (
         |  SELECT p.seg, c.i, p.j, p.v_e6
         |  FROM pairs p JOIN m c
         |    ON p.seg = c.seg AND p.j <= c.i AND c.i <= p.k),
         |inner_min AS (
         |  SELECT seg, i, j, min(v_e6) AS lo FROM trip GROUP BY 1, 2, 3),
         |iso AS (
         |  SELECT seg, i, CAST(max(lo) AS BIGINT) AS fit_e6
         |  FROM inner_min GROUP BY 1, 2)
         |SELECT m.seg, m.i, m.mi, m.rev, fit_e6,
         |  CAST(fit_e6 AS DOUBLE) / 1e6 AS fit_cents
         |FROM m JOIN iso ON m.seg = iso.seg AND m.i = iso.i
         |ORDER BY m.seg, m.i""".stripMargin)),

    // Spearman rank correlation — the MONOTONE-dependence measure beside
    // q_ols/q_theil_sen's linear fits and q_acf's serial correlation:
    // quantity vs extended price per lineitem. Formulated WITHOUT
    // materializing per-row ranks as a global sort (the q_mann_whitney
    // discipline): aggregate each variable to its distinct-value grid,
    // compute tie-averaged ranks there as EXACT 2-scaled integers
    // (rx2 = 2*cum_before + cnt + 1 — the average of ranks cb+1..cb+cnt
    // is cb + (cnt+1)/2, always a half-integer), then map rows to rank
    // pairs by two equi-joins and take Pearson on the rank pairs via
    // exact DECIMAL(38,0)/HUGEINT moment sums (rho is shift/scale
    // invariant, so the 2x scaling cancels). The one double step is the
    // final assembly: num/ (sqrt(ax)*sqrt(ay)) with both factors exact
    // integers cast to double — one shared op order, floor-snapped e9.
    // Scale shape: two grid aggregates (value-domain-sized, saturating),
    // one broadcast join (quantity grid: 50 values), one keyed join on
    // the price grid, one 1-row reduce. No corpus-wide window, no sort.
    Q("q_spearman",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base = Tables.lineitem(s, d).select(
          col("l_quantity").cast("long").as("x"),
          floor(col("l_extendedprice") * lit(100.0)).cast("long").as("y"))
        def rankGrid(keyCol: String): org.apache.spark.sql.DataFrame = {
          val wCum = Window.orderBy(col(keyCol))
            .rowsBetween(Window.unboundedPreceding, -1)
          base.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
            .withColumn("cb", coalesce(sum(col("cnt")).over(wCum), lit(0L)))
            .select(col(keyCol),
              (lit(2L) * col("cb") + col("cnt") + lit(1L))
                .as(s"r${keyCol}2"))
        }
        val joined = base
          .join(broadcast(rankGrid("x")), "x")
          .join(rankGrid("y"), "y")
          .select(col("rx2"), col("ry2"))
        val a = joined.agg(
          count(lit(1)).as("n"),
          sum(expr("CAST(rx2 AS DECIMAL(38,0))")).as("sx"),
          sum(expr("CAST(ry2 AS DECIMAL(38,0))")).as("sy"),
          sum(expr("CAST(rx2 AS DECIMAL(38,0)) * rx2")).as("sxx"),
          sum(expr("CAST(ry2 AS DECIMAL(38,0)) * ry2")).as("syy"),
          sum(expr("CAST(rx2 AS DECIMAL(38,0)) * ry2")).as("sxy"))
        val num = expr("CAST(n AS DECIMAL(38,0)) * sxy - sx * sy")
        val ax = expr("CAST(n AS DECIMAL(38,0)) * sxx - sx * sx")
        val ay = expr("CAST(n AS DECIMAL(38,0)) * syy - sy * sy")
        val rho = num.cast("double") /
          nullif(sqrt(ax.cast("double")) * sqrt(ay.cast("double")), lit(0.0))
        a.select(col("n"),
          floor(rho * lit(1e9)).cast("long").as("rho_e9"),
          (floor(rho * lit(1e9)) / lit(1e9)).as("rho"))
      },
      Some("""WITH b AS (
         |  SELECT CAST(l_quantity AS BIGINT) AS x,
         |    CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS y
         |  FROM lineitem),
         |gx0 AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY x),
         |gx AS (
         |  SELECT x, 2 * coalesce(CAST(sum(cnt) OVER (ORDER BY x
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
         |      0) + cnt + 1 AS rx2
         |  FROM gx0),
         |gy0 AS (SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY y),
         |gy AS (
         |  SELECT y, 2 * coalesce(CAST(sum(cnt) OVER (ORDER BY y
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
         |      0) + cnt + 1 AS ry2
         |  FROM gy0),
         |j AS (SELECT rx2, ry2 FROM b JOIN gx USING (x) JOIN gy USING (y)),
         |a AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    sum(CAST(rx2 AS HUGEINT)) AS sx, sum(CAST(ry2 AS HUGEINT)) AS sy,
         |    sum(CAST(rx2 AS HUGEINT) * rx2) AS sxx,
         |    sum(CAST(ry2 AS HUGEINT) * ry2) AS syy,
         |    sum(CAST(rx2 AS HUGEINT) * ry2) AS sxy
         |  FROM j)
         |SELECT n,
         |  CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
         |    / nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
         |             * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0) * 1e9)
         |    AS BIGINT) AS rho_e9,
         |  floor(CAST(n * sxy - sx * sy AS DOUBLE)
         |    / nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
         |             * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0) * 1e9)
         |    / 1e9 AS rho
         |FROM a""".stripMargin)),

    // Kendall tau-b rank stability — the RANKING-agreement measure the
    // family lacked beside q_spearman's value correlation: do the top
    // suppliers rank the same by revenue in the first and second half of
    // the shipping range? (The eval-pipeline question: is a leaderboard
    // stable across time slices, or is its order noise?) The entity set
    // is the BOUNDED top-10 by total revenue (deterministic revenue-then-
    // key order), the time cut is DERIVED from the data (epoch-day
    // midpoint of min/max shipdate — no fixture-pinned date, the
    // q_markov_attribution lesson), and tau-b is exact integer
    // concordance arithmetic over the C(10,2) pairs: sign products via
    // CASE (portable, no double signum), tie terms t1/t2 per the tau-b
    // convention, one shared-op-order double assembly
    // (C - D) / (sqrt(n0-t1) * sqrt(n0-t2)), floor-snapped e9.
    // Scale shape: ONE corpus aggregate to per-supplier half-revenues
    // (map-side combinable), a supplier-count-bounded top-k, and a
    // 45-row pair join — corpus-size-independent after the first pass.
    Q("q_kendall",
      (s, d) => {
        val li = Tables.lineitem(s, d).select(
          col("l_suppkey").cast("long").as("sk"),
          datediff(col("l_shipdate").cast("date"),
            to_date(lit("1970-01-01"))).cast("long").as("day"),
          floor(col("l_extendedprice") * lit(100.0)).cast("long").as("rev"))
        val mid = li.agg(
          ((min(col("day")) + max(col("day"))) / lit(2L)).cast("long")
            .as("mid"))
        val sup = li.crossJoin(broadcast(mid))
          .groupBy(col("sk"))
          .agg(
            sum(when(col("day") <= col("mid"), col("rev")).otherwise(0L))
              .as("rev_a"),
            sum(when(col("day") > col("mid"), col("rev")).otherwise(0L))
              .as("rev_b"),
            sum(col("rev")).as("rev_t"))
          .orderBy(col("rev_t").desc, col("sk"))
          .limit(10)
        val p = sup.select(col("sk").as("ska"), col("rev_a").as("aa"),
            col("rev_b").as("ab"))
          .join(sup.select(col("sk").as("skb"), col("rev_a").as("ba"),
            col("rev_b").as("bb")), col("ska") < col("skb"))
          .select(
            (when(col("aa") > col("ba"), 1L)
              .when(col("aa") < col("ba"), -1L).otherwise(0L)).as("sa"),
            (when(col("ab") > col("bb"), 1L)
              .when(col("ab") < col("bb"), -1L).otherwise(0L)).as("sb"))
        val agg = p.agg(
          count(lit(1)).as("n0"),
          sum(when(col("sa") * col("sb") === 1L, 1L).otherwise(0L)).as("nc"),
          sum(when(col("sa") * col("sb") === -1L, 1L).otherwise(0L)).as("nd"),
          sum(when(col("sa") === 0L, 1L).otherwise(0L)).as("t1"),
          sum(when(col("sb") === 0L, 1L).otherwise(0L)).as("t2"))
        val tau = (col("nc") - col("nd")).cast("double") /
          nullif(sqrt((col("n0") - col("t1")).cast("double")) *
            sqrt((col("n0") - col("t2")).cast("double")), lit(0.0))
        agg.select(col("n0"), col("nc"), col("nd"), col("t1"), col("t2"),
          floor(tau * lit(1e9)).cast("long").as("tau_e9"),
          (floor(tau * lit(1e9)) / lit(1e9)).as("tau"))
      },
      Some("""WITH li AS (
         |  SELECT CAST(l_suppkey AS BIGINT) AS sk,
         |    CAST(date_diff('day', DATE '1970-01-01',
         |      CAST(l_shipdate AS DATE)) AS BIGINT) AS day,
         |    CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS rev
         |  FROM lineitem),
         |mid AS (SELECT (min(day) + max(day)) // 2 AS mid FROM li),
         |sup AS (
         |  SELECT sk,
         |    CAST(sum(CASE WHEN day <= mid THEN rev ELSE 0 END) AS BIGINT)
         |      AS rev_a,
         |    CAST(sum(CASE WHEN day > mid THEN rev ELSE 0 END) AS BIGINT)
         |      AS rev_b,
         |    CAST(sum(rev) AS BIGINT) AS rev_t
         |  FROM li, mid GROUP BY sk, mid
         |  ORDER BY rev_t DESC, sk LIMIT 10),
         |p AS (
         |  SELECT
         |    CASE WHEN a.rev_a > b.rev_a THEN 1
         |         WHEN a.rev_a < b.rev_a THEN -1 ELSE 0 END AS sa,
         |    CASE WHEN a.rev_b > b.rev_b THEN 1
         |         WHEN a.rev_b < b.rev_b THEN -1 ELSE 0 END AS sb
         |  FROM sup a JOIN sup b ON a.sk < b.sk),
         |agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n0,
         |    CAST(sum(CASE WHEN sa * sb = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS nc,
         |    CAST(sum(CASE WHEN sa * sb = -1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS nd,
         |    CAST(sum(CASE WHEN sa = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t1,
         |    CAST(sum(CASE WHEN sb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t2
         |  FROM p)
         |SELECT n0, nc, nd, t1, t2,
         |  CAST(floor(CAST(nc - nd AS DOUBLE)
         |    / nullif(sqrt(CAST(n0 - t1 AS DOUBLE))
         |             * sqrt(CAST(n0 - t2 AS DOUBLE)), 0) * 1e9)
         |    AS BIGINT) AS tau_e9,
         |  floor(CAST(nc - nd AS DOUBLE)
         |    / nullif(sqrt(CAST(n0 - t1 AS DOUBLE))
         |             * sqrt(CAST(n0 - t2 AS DOUBLE)), 0) * 1e9) / 1e9
         |    AS tau
         |FROM agg""".stripMargin)),

    // Mann–Kendall trend TEST (Mann 1945, Kendall 1975) — the
    // significance companion to q_theil_sen's slope: per nation, is the
    // monthly revenue series monotonically trending, and is the trend
    // statistically significant? S = sum of sign(x_j - x_i) over ordered
    // month pairs; Var(S) carries the EXACT tie correction
    // (n(n-1)(2n+5) - sum_g t_g(t_g-1)(2t_g+5)) / 18; z applies the
    // standard continuity correction (S -/+ 1). Everything up to z is
    // BIGINT-exact (revenue on the cents grid, integer pair signs, an
    // integer variance numerator); z itself is one sqrt + one division of
    // exact integers, snapped to the 1e9 grid (the q_kendall discipline)
    // before the 1.96 two-sided cut.
    //
    // Scale shape: the corpus collapses to the O(nations x months) grid
    // FIRST (one key-partitioned aggregate); the quadratic pair join,
    // the tie groups and the variance run on that bounded grid — at
    // 100 TB the test costs one aggregate no matter how many orders.
    Q("q_mann_kendall",
      (s, d) => {
        mannKendallZ(s, d)
          .select(col("nationkey"), col("n_months"), col("s_stat"),
            col("var_num"), col("z_e9"),
            (col("z_e9") / lit(1e9)).as("z"),
            when(col("z_e9") > lit(1960000000L), "increasing")
              .when(col("z_e9") < lit(-1960000000L), "decreasing")
              .otherwise("none").as("trend"))
          .orderBy(col("nationkey"))
      },
      Some("""WITH rev AS (
         |  SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey,
         |    strftime(o.o_orderdate, '%Y-%m') AS month,
         |    CAST(sum(CAST(floor(o.o_totalprice * 100.0) AS BIGINT))
         |      AS BIGINT) AS rev
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |  GROUP BY 1, 2),
         |sagg AS (
         |  SELECT a.nationkey,
         |    CAST(sum(CASE WHEN b.rev > a.rev THEN 1
         |                  WHEN b.rev < a.rev THEN -1 ELSE 0 END)
         |      AS BIGINT) AS s_stat
         |  FROM rev a JOIN rev b
         |    ON a.nationkey = b.nationkey AND a.month < b.month
         |  GROUP BY 1),
         |nm AS (
         |  SELECT nationkey, CAST(count(*) AS BIGINT) AS n_months
         |  FROM rev GROUP BY 1),
         |ties AS (
         |  SELECT nationkey,
         |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_sum
         |  FROM (SELECT nationkey, rev, CAST(count(*) AS BIGINT) AS t
         |        FROM rev GROUP BY 1, 2) g
         |  GROUP BY 1),
         |base AS (
         |  SELECT nm.nationkey, nm.n_months, sagg.s_stat,
         |    nm.n_months * (nm.n_months - 1) * (2 * nm.n_months + 5)
         |      - ties.tie_sum AS var_num
         |  FROM nm JOIN sagg USING (nationkey) JOIN ties USING (nationkey)),
         |z AS (
         |  SELECT *,
         |    CAST(floor(
         |      CASE WHEN var_num > 0 AND s_stat > 0 THEN
         |        CAST(s_stat - 1 AS DOUBLE)
         |          / sqrt(CAST(var_num AS DOUBLE) / 18.0)
         |      WHEN var_num > 0 AND s_stat < 0 THEN
         |        CAST(s_stat + 1 AS DOUBLE)
         |          / sqrt(CAST(var_num AS DOUBLE) / 18.0)
         |      ELSE 0.0 END * 1e9) AS BIGINT) AS z_e9
         |  FROM base)
         |SELECT nationkey, n_months, s_stat, CAST(var_num AS BIGINT)
         |    AS var_num, z_e9,
         |  z_e9 / 1e9 AS z,
         |  CASE WHEN z_e9 > 1960000000 THEN 'increasing'
         |       WHEN z_e9 < -1960000000 THEN 'decreasing'
         |       ELSE 'none' END AS trend
         |FROM z ORDER BY nationkey""".stripMargin)),

    // Benjamini-Hochberg FDR control (Benjamini & Hochberg 1995) over
    // the 25 per-nation Mann-Kendall trend tests — the MULTIPLE-TESTING
    // step every many-metric experiment pipeline needs: run q_mann_kendall
    // per nation and 5% of null nations cross 1.96 by chance; BH bounds
    // the FALSE DISCOVERY RATE of the whole family instead. Two-sided
    // p from the snapped z via the Abramowitz-Stegun 7.1.26 polynomial
    // (|err| < 7.5e-8; exp + one Horner chain with PINNED op order on
    // both engines — the q_jsd/q_psi_drift transcendental discipline —
    // then floor-snapped to the 1e9 grid BEFORE any comparison). The BH
    // step function is then EXACT INTEGER arithmetic: at alpha = 0.05,
    // p_(i) <= i*alpha/m  <=>  p_e9 * m * 20 <= i * 1e9 (all BIGINT),
    // and the rejection set is ranks <= kmax = max qualifying rank (the
    // step-up rule — ranks below kmax are rejected EVEN IF their own
    // inequality fails; a pointwise filter would be a different, wrong
    // procedure).
    // Scale shape: the corpus collapses to the nations x months grid in
    // ONE aggregate (the q_mann_kendall shape); ranking and the step-up
    // walk run on m = 25 rows.
    Q("q_bh_fdr",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val az = abs(col("z_e9") / lit(1e9))
        val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
        val phi = exp(-(az * az) / lit(2.0)) * lit(0.3989422804014327)
        val poly = t * (lit(0.319381530) + t * (lit(-0.356563782) +
          t * (lit(1.781477937) + t * (lit(-1.821255978) +
            t * lit(1.330274429)))))
        val p2 = least(lit(2.0) * (phi * poly), lit(1.0))
        val wAll = Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        val ranked = mannKendallZ(s, d)
          .withColumn("p_e9", floor(p2 * lit(1e9)).cast("long"))
          .withColumn("p_rank",
            row_number().over(Window.orderBy(col("p_e9"), col("nationkey")))
              .cast("long"))
          .withColumn("m", count(lit(1)).over(wAll))
        val flagged = ranked.withColumn("kmax",
          max(when(col("p_e9") * col("m") * lit(20L) <=
              col("p_rank") * lit(1000000000L), col("p_rank"))
            .otherwise(0L)).over(wAll))
        flagged.select(col("nationkey"), (col("z_e9") / lit(1e9)).as("z"),
          col("p_e9"), (col("p_e9") / lit(1e9)).as("p"),
          col("p_rank"), col("m"),
          (col("p_rank") <= col("kmax")).cast("long").as("discovery"))
          .orderBy(col("nationkey"))
      },
      Some("""WITH rev AS (
         |  SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey,
         |    strftime(o.o_orderdate, '%Y-%m') AS month,
         |    CAST(sum(CAST(floor(o.o_totalprice * 100.0) AS BIGINT))
         |      AS BIGINT) AS rev
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |  GROUP BY 1, 2),
         |sagg AS (
         |  SELECT a.nationkey,
         |    CAST(sum(CASE WHEN b.rev > a.rev THEN 1
         |                  WHEN b.rev < a.rev THEN -1 ELSE 0 END)
         |      AS BIGINT) AS s_stat
         |  FROM rev a JOIN rev b
         |    ON a.nationkey = b.nationkey AND a.month < b.month
         |  GROUP BY 1),
         |nm AS (
         |  SELECT nationkey, CAST(count(*) AS BIGINT) AS n_months
         |  FROM rev GROUP BY 1),
         |ties AS (
         |  SELECT nationkey,
         |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_sum
         |  FROM (SELECT nationkey, rev, CAST(count(*) AS BIGINT) AS t
         |        FROM rev GROUP BY 1, 2) g
         |  GROUP BY 1),
         |base AS (
         |  SELECT nm.nationkey, sagg.s_stat,
         |    nm.n_months * (nm.n_months - 1) * (2 * nm.n_months + 5)
         |      - ties.tie_sum AS var_num
         |  FROM nm JOIN sagg USING (nationkey) JOIN ties USING (nationkey)),
         |z AS (
         |  SELECT nationkey,
         |    CAST(floor(
         |      CASE WHEN var_num > 0 AND s_stat > 0 THEN
         |        CAST(s_stat - 1 AS DOUBLE)
         |          / sqrt(CAST(var_num AS DOUBLE) / 18.0)
         |      WHEN var_num > 0 AND s_stat < 0 THEN
         |        CAST(s_stat + 1 AS DOUBLE)
         |          / sqrt(CAST(var_num AS DOUBLE) / 18.0)
         |      ELSE 0.0 END * 1e9) AS BIGINT) AS z_e9
         |  FROM base),
         |pv AS (
         |  SELECT nationkey, z_e9,
         |    CAST(floor(least(
         |      2.0 * ((exp(-(abs(z_e9 / 1e9) * abs(z_e9 / 1e9)) / 2.0)
         |              * 0.3989422804014327)
         |        * ((1.0 / (1.0 + 0.2316419 * abs(z_e9 / 1e9)))
         |           * (0.319381530 + (1.0 / (1.0 + 0.2316419 * abs(z_e9 / 1e9)))
         |             * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * abs(z_e9 / 1e9)))
         |               * (1.781477937 + (1.0 / (1.0 + 0.2316419 * abs(z_e9 / 1e9)))
         |                 * (-1.821255978 + (1.0 / (1.0 + 0.2316419 * abs(z_e9 / 1e9)))
         |                   * 1.330274429)))))),
         |      1.0) * 1e9) AS BIGINT) AS p_e9
         |  FROM z),
         |rk AS (
         |  SELECT nationkey, z_e9, p_e9,
         |    CAST(row_number() OVER (ORDER BY p_e9, nationkey) AS BIGINT)
         |      AS p_rank,
         |    CAST(count(*) OVER () AS BIGINT) AS m
         |  FROM pv),
         |km AS (
         |  SELECT *,
         |    max(CASE WHEN p_e9 * m * 20 <= p_rank * 1000000000
         |             THEN p_rank ELSE 0 END) OVER () AS kmax
         |  FROM rk)
         |SELECT nationkey, z_e9 / 1e9 AS z, p_e9, p_e9 / 1e9 AS p,
         |  p_rank, m, CAST(p_rank <= kmax AS BIGINT) AS discovery
         |FROM km ORDER BY nationkey""".stripMargin)),

    // Cochran-Armitage trend test (Cochran 1954, Armitage 1955) — the
    // ORDERED-GROUPS proportion test the family lacked: q_chi2_assoc
    // asks "is conversion independent of group?"; this asks the sharper
    // monotone question "does the ordering rate RISE with account-
    // balance quintile?" — one df spent on the trend instead of k-1 on
    // any difference. Quintiles use q_rfm's scale-honest percentile
    // breakpoints (Spark `percentile` hash-matches DuckDB
    // `quantile_cont`, the q_ntile precedent); scores w_i = bucket
    // index 1..5. All moments are exact integers:
    //   A = N*sum(w_i r_i) - R*sum(w_i n_i)      (trend numerator * N)
    //   V = R(N-R)(N*sum(n_i w_i^2) - (sum(n_i w_i))^2)   (variance*N^3)
    //   z = A / sqrt(V / N)
    // — V routes through DECIMAL(38,0)/HUGEINT (the triple product
    // wraps BIGINT at SF100 corpus sizes); one sqrt + one division with
    // pinned op order, 1e9-snapped, nullif on the degenerate
    // all-converted/none-converted corpus.
    // Scale shape: one customer-keyed outcome join (left_semi-shaped),
    // a 1-row breakpoint broadcast, one 5-row bucket aggregate.
    Q("q_cochran_armitage",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"),
            floor(col("c_acctbal") * lit(100.0)).cast("long").as("x"))
        val buyers = Tables.orders(s, d).select(col("o_custkey")).distinct()
        val outcome = cust.join(
          buyers.withColumn("pos", lit(1L)),
          col("c_custkey") === col("o_custkey"), "left")
          .select(col("x"), coalesce(col("pos"), lit(0L)).as("pos"))
        val qs = array(lit(0.2), lit(0.4), lit(0.6), lit(0.8))
        val bounds = outcome.agg(percentile(col("x"), qs).as("bx"))
        val bucket = (0 to 3).map(i =>
          (col("x").cast("double") > col("bx")(i)).cast("long"))
          .reduce(_ + _) + lit(1L)
        val byB = outcome.crossJoin(broadcast(bounds))
          .select(bucket.as("w"), col("pos"))
          .groupBy(col("w"))
          .agg(count(lit(1)).as("n_i"), sum(col("pos")).as("r_i"))
        val agg = byB.agg(
          sum(col("n_i")).as("n"), sum(col("r_i")).as("r"),
          sum(col("w") * col("r_i")).as("swr"),
          sum(col("w") * col("n_i")).as("swn"),
          sum(col("w") * col("w") * col("n_i")).as("sw2n"))
        val a = (col("n").cast(dec) * col("swr") -
          col("r").cast(dec) * col("swn")).cast(dec)
        val v = (col("r").cast(dec) * (col("n") - col("r")) *
          (col("n").cast(dec) * col("sw2n") -
            col("swn").cast(dec) * col("swn"))).cast(dec)
        val z = a.cast("double") /
          nullif(sqrt(v.cast("double") / col("n").cast("double")), lit(0.0))
        agg
          .withColumn("z_e9", floor(z * lit(1e9)).cast("long"))
          .select(col("n"), col("r").as("r_total"), col("z_e9"),
            (col("z_e9") / lit(1e9)).as("z"),
            when(col("z_e9") > lit(1960000000L), "increasing")
              .when(col("z_e9") < lit(-1960000000L), "decreasing")
              .otherwise("none").as("trend"))
      },
      Some("""WITH cust AS (
         |  SELECT c_custkey, CAST(floor(c_acctbal * 100.0) AS BIGINT) AS x
         |  FROM customer),
         |outcome AS (
         |  SELECT cust.x,
         |    CASE WHEN b.o_custkey IS NULL THEN 0 ELSE 1 END AS pos
         |  FROM cust LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) b
         |    ON cust.c_custkey = b.o_custkey),
         |bounds AS (
         |  SELECT quantile_cont(x, [0.2, 0.4, 0.6, 0.8]) AS bx
         |  FROM outcome),
         |byb AS (
         |  SELECT (1 + CASE WHEN CAST(x AS DOUBLE) > bx[1] THEN 1 ELSE 0 END
         |            + CASE WHEN CAST(x AS DOUBLE) > bx[2] THEN 1 ELSE 0 END
         |            + CASE WHEN CAST(x AS DOUBLE) > bx[3] THEN 1 ELSE 0 END
         |            + CASE WHEN CAST(x AS DOUBLE) > bx[4] THEN 1 ELSE 0 END)
         |      AS w,
         |    CAST(count(*) AS BIGINT) AS n_i, CAST(sum(pos) AS BIGINT) AS r_i
         |  FROM outcome, bounds GROUP BY 1),
         |agg AS (
         |  SELECT CAST(sum(n_i) AS BIGINT) AS n, CAST(sum(r_i) AS BIGINT) AS r,
         |    CAST(sum(w * r_i) AS BIGINT) AS swr,
         |    CAST(sum(w * n_i) AS BIGINT) AS swn,
         |    CAST(sum(w * w * n_i) AS BIGINT) AS sw2n
         |  FROM byb),
         |z AS (
         |  SELECT n, r,
         |    CAST(floor(
         |      CAST(CAST(n AS HUGEINT) * swr - CAST(r AS HUGEINT) * swn
         |        AS DOUBLE)
         |      / nullif(sqrt(
         |          CAST(CAST(r AS HUGEINT) * (n - r)
         |            * (CAST(n AS HUGEINT) * sw2n
         |               - CAST(swn AS HUGEINT) * swn) AS DOUBLE)
         |          / CAST(n AS DOUBLE)), 0.0)
         |      * 1e9) AS BIGINT) AS z_e9
         |  FROM agg)
         |SELECT n, r AS r_total, z_e9, z_e9 / 1e9 AS z,
         |  CASE WHEN z_e9 > 1960000000 THEN 'increasing'
         |       WHEN z_e9 < -1960000000 THEN 'decreasing'
         |       ELSE 'none' END AS trend
         |FROM z""".stripMargin)),

    // Kruskal-Wallis H (Kruskal & Wallis 1952) — the K-SAMPLE rank test
    // the family lacked: q_mann_whitney compares TWO arms; this asks
    // whether ANY of the five event types' spend distributions differ,
    // the omnibus check an experiment analysis runs before pairwise
    // drill-down. Same no-per-row-ranks formulation as q_mann_whitney:
    // aggregate to the distinct cents-value grid first (n_gv per
    // (value, type), t_v per value), then DOUBLED average ranks are
    // integers — 2*r(v) = 2*c_below(v) + t_v + 1 — so the doubled rank
    // sums 2R_g are exact BIGINTs. The squared term routes through
    // DECIMAL(38,0)/HUGEINT ((2R_g)^2 wraps BIGINT already at sf0.1) and
    // the per-group division is INTEGRAL (floor, identical on both
    // engines; <=1 absolute per group, invisible after the 1e9 snap):
    //   q_g = (2R_g)^2 div (4 n_g),   H = 12*sum(q_g)/(N(N+1)) - 3(N+1)
    // Tie correction exact: H' = H / (1 - T/(N^3-N)) with
    // T = sum(t^3 - t) — both in DECIMAL(38,0) (t^3 wraps BIGINT at
    // SF100 corpus sizes). One double assembly with pinned op order,
    // floor-snapped to the 1e9 grid, cut at the df=4 chi-square table
    // value 9.488 (the 1.96 convention of the z-tests).
    // Scale shape: one map-side-combinable (value, type) aggregate; the
    // rank walk is ONE window over the distinct-value grid (price-grid
    // bounded, not corpus-sized); everything after is k-sized.
    Q("q_kruskal_wallis",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val types = Seq("click", "error", "purchase", "signup", "view")
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin(types: _*))
          .select(col("event_type"),
            floor(col("value") * lit(100.0)).cast("long").as("x"))
        val byValG = ev.groupBy(col("x"), col("event_type"))
          .agg(count(lit(1)).as("n_gv"))
        val byVal = byValG.groupBy(col("x")).agg(sum(col("n_gv")).as("t_v"))
        val wCum = Window.orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val ranked = byVal
          .withColumn("cb", coalesce(sum(col("t_v")).over(wCum), lit(0L)))
          .select(col("x"),
            (lit(2L) * col("cb") + col("t_v") + lit(1L)).as("r2"))
        val perG = byValG.join(ranked, "x")
          .groupBy(col("event_type"))
          .agg(sum(col("n_gv") * col("r2")).as("r2sum"),
            sum(col("n_gv")).as("n_g"))
        // (2R_g)^2 div (4 n_g) WITHOUT IntegralDivide (whose LongType
        // result would silently wrap at SF100 magnitudes — the q_isotonic
        // class): subtract the exact remainder, then the decimal division
        // is exact (zero fractional part) at any SF. DuckDB's HUGEINT //
        // is the same floor since both operands are non-negative.
        val qSum = perG.agg(
          sum(expr("""CAST((CAST(r2sum AS DECIMAL(38,0)) * r2sum
                - CAST(r2sum AS DECIMAL(38,0)) * r2sum
                    % CAST(4 * n_g AS DECIMAL(38,0)))
              / CAST(4 * n_g AS DECIMAL(38,0)) AS DECIMAL(38,0))"""))
            .cast(dec).as("qsum"),
          sum(col("n_g")).as("n"), count(lit(1)).as("k"))
        val ties = byVal.agg(
          sum(col("t_v").cast(dec) * col("t_v") * col("t_v") - col("t_v"))
            .cast(dec).as("tsum"))
        val base = qSum.crossJoin(broadcast(ties))
        val nD = col("n").cast("double")
        val hRaw = lit(12.0) * col("qsum").cast("double") /
          (nD * (nD + lit(1.0))) - lit(3.0) * (nD + lit(1.0))
        val corr = lit(1.0) - col("tsum").cast("double") /
          (nD * nD * nD - nD)
        val h = hRaw / nullif(corr, lit(0.0))
        base
          .withColumn("h_e9", floor(h * lit(1e9)).cast("long"))
          .select(col("n"), col("k"), col("h_e9"),
            (col("h_e9") / lit(1e9)).as("h"),
            (col("h_e9") > lit(9488000000L)).cast("long").as("reject_05"))
      },
      Some("""WITH ev AS (
         |  SELECT event_type, CAST(floor(value * 100.0) AS BIGINT) AS x
         |  FROM events
         |  WHERE event_type IN ('click','error','purchase','signup','view')),
         |bvg AS (
         |  SELECT x, event_type, CAST(count(*) AS BIGINT) AS n_gv
         |  FROM ev GROUP BY 1, 2),
         |bv AS (
         |  SELECT x, CAST(sum(n_gv) AS BIGINT) AS t_v FROM bvg GROUP BY 1),
         |rk AS (
         |  SELECT x, 2 * coalesce(sum(t_v) OVER (ORDER BY x
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    + t_v + 1 AS r2
         |  FROM bv),
         |pg AS (
         |  SELECT bvg.event_type,
         |    CAST(sum(n_gv * r2) AS BIGINT) AS r2sum,
         |    CAST(sum(n_gv) AS BIGINT) AS n_g
         |  FROM bvg JOIN rk USING (x) GROUP BY 1),
         |qs AS (
         |  SELECT sum(CAST(r2sum AS HUGEINT) * r2sum // (4 * n_g)) AS qsum,
         |    CAST(sum(n_g) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k
         |  FROM pg),
         |tsum AS (
         |  SELECT sum(CAST(t_v AS HUGEINT) * t_v * t_v - t_v) AS tsum
         |  FROM bv),
         |h AS (
         |  SELECT n, k,
         |    CAST(floor(
         |      (12.0 * CAST(qsum AS DOUBLE)
         |         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
         |       - 3.0 * (CAST(n AS DOUBLE) + 1.0))
         |      / nullif(1.0 - CAST(tsum AS DOUBLE)
         |          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
         |             - CAST(n AS DOUBLE)), 0.0)
         |      * 1e9) AS BIGINT) AS h_e9
         |  FROM qs, tsum)
         |SELECT n, k, h_e9, h_e9 / 1e9 AS h,
         |  CAST(h_e9 > 9488000000 AS BIGINT) AS reject_05
         |FROM h""".stripMargin)),

    // One-way ANOVA F — the PARAMETRIC companion to q_kruskal_wallis:
    // does mean account balance differ across the five market segments?
    // The classical sum-of-squares identity on the cents grid, kept
    // exact until two final divisions: per group n_g and S_g = sum(x)
    // (BIGINT), global Q2 = sum(x^2) in DECIMAL(38,0) (x^2 ~ 1e12 per
    // row wraps a BIGINT sum at SF100 corpus sizes). Squared sums route
    // through DECIMAL/HUGEINT with INTEGRAL division (floor; squares are
    // non-negative so floor is identical on both engines, <=1 absolute
    // per group):
    //   A  = sum_g(S_g^2 div n_g),  CF = S^2 div N
    //   SSB = A - CF,  SSW = Q2 - A,  F = (SSB/(k-1)) / (SSW/(N-k))
    // F and the eta^2 effect size are one double assembly each with
    // pinned op order, floor-snapped to the 1e9 grid. The 0.05 cut uses
    // the df2->infinity table value F(4,inf)=2.372 — an ASYMPTOTIC
    // convention like q_mann_whitney's 1.96 (df2 >= 145 already at
    // sf0.001, where the exact critical value is 2.434).
    // Scale shape: ONE map-side-combinable segment aggregate (5 rows
    // out); everything after is k-sized arithmetic on the driver plan.
    Q("q_anova",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val c = Tables.customer(s, d)
          .select(col("c_mktsegment").as("seg"),
            floor(col("c_acctbal") * lit(100.0)).cast("long").as("x"))
        val perG = c.groupBy(col("seg"))
          .agg(count(lit(1)).as("n_g"), sum(col("x")).as("s_g"),
            sum(col("x").cast(dec) * col("x")).cast(dec).as("q_g"))
        // S_g^2 div n_g and S^2 div N via the remainder-subtraction trick
        // (exact decimal division, no LongType IntegralDivide — the
        // q_isotonic SF100 discipline). Squares are non-negative so the
        // floor matches DuckDB's HUGEINT // exactly.
        val agg = perG.agg(
          sum(expr("""CAST((CAST(s_g AS DECIMAL(38,0)) * s_g
                - CAST(s_g AS DECIMAL(38,0)) * s_g
                    % CAST(n_g AS DECIMAL(38,0)))
              / CAST(n_g AS DECIMAL(38,0)) AS DECIMAL(38,0))""")).cast(dec)
            .as("a"),
          sum(col("s_g")).as("s"), sum(col("n_g")).as("n"),
          sum(col("q_g")).cast(dec).as("q2"), count(lit(1)).as("k"))
        val base = agg.select(col("n"), col("k"),
          (col("a") - expr("""CAST((CAST(s AS DECIMAL(38,0)) * s
                - CAST(s AS DECIMAL(38,0)) * s % CAST(n AS DECIMAL(38,0)))
              / CAST(n AS DECIMAL(38,0)) AS DECIMAL(38,0))""")).cast(dec)
            .as("ssb_d"),
          (col("q2") - col("a")).cast(dec).as("ssw_d"))
        val ssb = col("ssb_d").cast("double")
        val ssw = col("ssw_d").cast("double")
        val kD = col("k").cast("double")
        val nD = col("n").cast("double")
        val f = (ssb / (kD - lit(1.0))) /
          nullif(ssw / (nD - kD), lit(0.0))
        val eta2 = ssb / nullif(ssb + ssw, lit(0.0))
        base
          .withColumn("f_e9", floor(f * lit(1e9)).cast("long"))
          .withColumn("eta2_e9", floor(eta2 * lit(1e9)).cast("long"))
          .select(col("n"), col("k"), ssb.as("ssb"), ssw.as("ssw"),
            col("f_e9"), (col("f_e9") / lit(1e9)).as("f"),
            (col("eta2_e9") / lit(1e9)).as("eta2"),
            (col("f_e9") > lit(2372000000L)).cast("long")
              .as("reject_asym_05"))
      },
      Some("""WITH c AS (
         |  SELECT c_mktsegment AS seg,
         |    CAST(floor(c_acctbal * 100.0) AS BIGINT) AS x
         |  FROM customer),
         |pg AS (
         |  SELECT seg, CAST(count(*) AS BIGINT) AS n_g,
         |    CAST(sum(x) AS BIGINT) AS s_g,
         |    sum(CAST(x AS HUGEINT) * x) AS q_g
         |  FROM c GROUP BY 1),
         |agg AS (
         |  SELECT sum(CAST(s_g AS HUGEINT) * s_g // n_g) AS a,
         |    CAST(sum(s_g) AS BIGINT) AS s, CAST(sum(n_g) AS BIGINT) AS n,
         |    sum(q_g) AS q2, CAST(count(*) AS BIGINT) AS k
         |  FROM pg),
         |base AS (
         |  SELECT n, k,
         |    CAST(a - CAST(s AS HUGEINT) * s // n AS DOUBLE) AS ssb,
         |    CAST(q2 - a AS DOUBLE) AS ssw
         |  FROM agg),
         |fx AS (
         |  SELECT n, k, ssb, ssw,
         |    CAST(floor((ssb / (CAST(k AS DOUBLE) - 1.0))
         |      / nullif(ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)), 0.0)
         |      * 1e9) AS BIGINT) AS f_e9,
         |    CAST(floor(ssb / nullif(ssb + ssw, 0.0) * 1e9) AS BIGINT)
         |      AS eta2_e9
         |  FROM base)
         |SELECT n, k, ssb, ssw, f_e9, f_e9 / 1e9 AS f,
         |  eta2_e9 / 1e9 AS eta2,
         |  CAST(f_e9 > 2372000000 AS BIGINT) AS reject_asym_05
         |FROM fx""".stripMargin)),

    // Lagged cross-correlation (CCF) between the daily purchase and view
    // spend series — the TWO-SERIES companion to q_acf's
    // autocorrelation: does view activity LEAD purchases (negative lags)
    // or LAG them? Standard CCF normalization by the full-series
    // variances: r(l) = sum(dev_a(i) * dev_b(i+l)) / sqrt(da * db).
    // The q_acf discipline end to end: the corpus collapses to the
    // O(days) grid FIRST (one map-side-combinable aggregate with both
    // series as conditional sums, so the day join key exists once);
    // means are integral divisions (exact, identical); the lag relation
    // is a grid-sized self-join against a broadcast 15-row lag axis;
    // deviation products are DECIMAL(38,0)/HUGEINT. The final double is
    // exact-integer / sqrt(product of exact integers) with pinned op
    // order (the q_ks_test pattern), floor-snapped to the 1e9 grid.
    // Scale shape: day-grid everything after one corpus aggregate —
    // at 100 TB the CCF costs one scan no matter how many events.
    Q("q_ccf",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val cents = floor(col("value") * lit(100.0)).cast("long")
        val daily = Tables.events(s, d)
          .filter(col("event_type").isin("purchase", "view"))
          .groupBy(to_date(col("ts")).as("day"))
          .agg(
            sum(when(col("event_type") === "purchase", cents)
              .otherwise(0L)).as("a"),
            sum(when(col("event_type") === "view", cents)
              .otherwise(0L)).as("b"))
        val tot = daily.agg(sum(col("a")).as("sa"), sum(col("b")).as("sb"),
          count(lit(1)).as("nd"))
        val idx = daily.crossJoin(broadcast(tot))
          .select(
            row_number().over(Window.orderBy(col("day"))).cast("long")
              .as("i"),
            (col("a") - expr("sa div nd")).as("dev_a"),
            (col("b") - expr("sb div nd")).as("dev_b"))
        val den = idx.agg(
          sum(col("dev_a").cast(dec) * col("dev_a")).cast(dec).as("da"),
          sum(col("dev_b").cast(dec) * col("dev_b")).cast(dec).as("db"))
        val lags = idx.sparkSession.range(-7, 8).select(col("id").as("lag"))
        idx.select(col("i"), col("dev_a")).crossJoin(broadcast(lags))
          .join(idx.select(col("i").as("i2"), col("dev_b").as("dev_b2")),
            col("i2") === col("i") + col("lag"))
          .groupBy(col("lag"))
          .agg(sum(col("dev_a").cast(dec) * col("dev_b2")).cast(dec)
            .as("num"), count(lit(1)).as("n_pairs"))
          .crossJoin(broadcast(den))
          .withColumn("ccf_e9",
            floor(col("num").cast("double") /
              nullif(sqrt(col("da").cast("double") * col("db").cast("double")),
                lit(0.0)) * lit(1e9)).cast("long"))
          .select(col("lag"), col("n_pairs"), col("ccf_e9"),
            (col("ccf_e9") / lit(1e9)).as("ccf"))
          .orderBy(col("lag"))
      },
      Some("""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS day,
         |    CAST(sum(CASE WHEN event_type = 'purchase'
         |      THEN CAST(floor(value * 100.0) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS a,
         |    CAST(sum(CASE WHEN event_type = 'view'
         |      THEN CAST(floor(value * 100.0) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS b
         |  FROM events WHERE event_type IN ('purchase', 'view')
         |  GROUP BY 1),
         |tot AS (SELECT CAST(sum(a) AS BIGINT) AS sa,
         |  CAST(sum(b) AS BIGINT) AS sb, CAST(count(*) AS BIGINT) AS nd
         |  FROM daily),
         |idx AS (
         |  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
         |    a - sa // nd AS dev_a, b - sb // nd AS dev_b
         |  FROM daily, tot),
         |den AS (
         |  SELECT sum(CAST(dev_a AS HUGEINT) * dev_a) AS da,
         |    sum(CAST(dev_b AS HUGEINT) * dev_b) AS db
         |  FROM idx),
         |cc AS (
         |  SELECT t.lag, CAST(count(*) AS BIGINT) AS n_pairs,
         |    sum(CAST(x.dev_a AS HUGEINT) * y.dev_b) AS num
         |  FROM generate_series(-7, 7) t(lag)
         |  JOIN idx x ON true
         |  JOIN idx y ON y.i = x.i + t.lag
         |  GROUP BY t.lag)
         |SELECT lag, n_pairs,
         |  CAST(floor(CAST(num AS DOUBLE)
         |    / nullif(sqrt(CAST(da AS DOUBLE) * CAST(db AS DOUBLE)), 0.0)
         |    * 1e9) AS BIGINT) AS ccf_e9,
         |  CAST(floor(CAST(num AS DOUBLE)
         |    / nullif(sqrt(CAST(da AS DOUBLE) * CAST(db AS DOUBLE)), 0.0)
         |    * 1e9) AS BIGINT) / 1e9 AS ccf
         |FROM cc, den ORDER BY lag""".stripMargin)),

    // Jensen-Shannon divergence between the event-type mixes of the two
    // time halves — completes the drift family's metric set: q_psi_drift
    // (binned PSI), q_ks_test (sup-norm), q_wasserstein (L1 transport)
    // and now the SYMMETRIC, BOUNDED information divergence (0..ln 2,
    // finite even with zero cells — the reason production monitors
    // prefer it over raw KL). The cut is derived from the data (epoch-
    // micros midpoint), the category grid is the observed type set, and
    // the one inherently-double stage (p ln(p/m) terms) follows the
    // q_psi_drift discipline: pinned per-term op order, floor-snap to
    // the 2^43 grid, order-independent DECIMAL(38,0) sum. Zero cells
    // contribute exactly 0 (the 0 log 0 limit), via CASE on the exact
    // integer count — never on a computed double.
    // Scale shape: ONE map-side-combinable corpus aggregate to the
    // (type, half) grid; everything after is category-sized.
    Q("q_jsd",
      (s, d) => {
        val P43 = 8796093022208.0
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val ev = Tables.events(s, d).select(col("event_type"),
          unix_micros(col("ts")).as("us"))
        val mid = ev.agg(
          ((min(col("us")) + max(col("us"))) / lit(2L)).cast("long")
            .as("mid"))
        val g = ev.crossJoin(broadcast(mid))
          .groupBy(col("event_type"))
          .agg(
            sum(when(col("us") <= col("mid"), 1L).otherwise(0L)).as("ca"),
            sum(when(col("us") > col("mid"), 1L).otherwise(0L)).as("cb"))
        val tot = g.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
          count(lit(1)).as("n_types"))
        val terms = g.crossJoin(broadcast(tot))
          .select(col("na"), col("nb"), col("n_types"),
            (col("ca").cast("double") / col("na").cast("double")).as("p"),
            (col("cb").cast("double") / col("nb").cast("double")).as("q"),
            col("ca"), col("cb"))
          .withColumn("m", (col("p") + col("q")) / lit(2.0))
          .withColumn("t",
            when(col("ca") === 0L, lit(0.0))
              .otherwise(col("p") * log(col("p") / col("m"))) * lit(0.5) +
            when(col("cb") === 0L, lit(0.0))
              .otherwise(col("q") * log(col("q") / col("m"))) * lit(0.5))
        val jsd = sum(floor(col("t") * lit(P43)).cast(dec))
          .cast("double") / lit(P43)
        terms.groupBy(col("na"), col("nb"), col("n_types"))
          .agg(jsd.as("jsd_nats"))
          .select(col("na"), col("nb"), col("n_types"), col("jsd_nats"),
            (col("jsd_nats") / lit(0.6931471805599453)).as("jsd_norm"))
      },
      Some {
        val P = "8796093022208.0"
        s"""WITH ev AS (
          |  SELECT event_type,
          |    CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us
          |  FROM events),
          |mid AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
          |g AS (
          |  SELECT event_type,
          |    CAST(sum(CASE WHEN us <= mid THEN 1 ELSE 0 END) AS BIGINT)
          |      AS ca,
          |    CAST(sum(CASE WHEN us > mid THEN 1 ELSE 0 END) AS BIGINT)
          |      AS cb
          |  FROM ev, mid GROUP BY event_type, mid),
          |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
          |               CAST(sum(cb) AS BIGINT) AS nb,
          |               CAST(count(*) AS BIGINT) AS n_types FROM g),
          |terms AS (
          |  SELECT na, nb, n_types, ca, cb,
          |    CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) AS p,
          |    CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) AS q,
          |    (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
          |      + CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) / 2.0 AS m
          |  FROM g, tot),
          |tt AS (
          |  SELECT na, nb, n_types,
          |    (CASE WHEN ca = 0 THEN 0.0 ELSE p * ln(p / m) END) * 0.5
          |    + (CASE WHEN cb = 0 THEN 0.0 ELSE q * ln(q / m) END) * 0.5
          |      AS t
          |  FROM terms),
          |agg AS (
          |  SELECT na, nb, n_types,
          |    CAST(sum(CAST(floor(t * $P) AS HUGEINT)) AS DOUBLE) / $P
          |      AS jsd_nats
          |  FROM tt GROUP BY 1, 2, 3)
          |SELECT na, nb, n_types, jsd_nats,
          |  jsd_nats / 0.6931471805599453 AS jsd_norm
          |FROM agg""".stripMargin
      }),

    // Median-absolute-deviation outlier report — the ROBUST companion to
    // q_outliers' 3-sigma rule (one gross outlier corrupts both the mean
    // and sigma it is judged by; the median/MAD pair has a 50% breakdown
    // point). Per order priority: exact median and MAD of the order
    // total, then the modified z-score rule |0.6745*(x-med)/MAD| > 3.5
    // (Iglewicz-Hoaglin) — ALL in exact integer arithmetic on the cents
    // grid: med2 = x_lo + x_hi (2-scaled exact median, even/odd counts
    // both covered by the (n+1)/2,(n+2)/2 rank pair), deviations
    // d = |2v - med2| live on a 2-scaled grid, mad4 = d_lo + d_hi
    // (4-scaled MAD), and the flag 0.6745*(x-med)/MAD > 3.5 cross-
    // multiplies to 13490*d > 35000*mad4 — no division anywhere; the
    // max robust z is one e6 integral division per group.
    // Scale shape: ONE corpus aggregate to the (priority, cents) grid;
    // every median/deviation walk after it is grid-sized (windows
    // partition by the 5 priorities over distinct cents values). The
    // same degenerate-group guard as q_outliers: mad4 = 0 (over half
    // the group at one value) snaps z/outliers to NULL on both engines.
    Q("q_mad",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val g = Tables.orders(s, d)
          .select(col("o_orderpriority").as("grp"),
            floor(col("o_totalprice") * lit(100.0)).cast("long").as("v"))
          .groupBy(col("grp"), col("v")).agg(count(lit(1)).as("cnt"))
        def medianOf(grid: org.apache.spark.sql.DataFrame, keyCol: String,
            out: String): org.apache.spark.sql.DataFrame = {
          val wCum = Window.partitionBy(col("grp")).orderBy(col(keyCol))
            .rowsBetween(Window.unboundedPreceding, -1)
          val wAll = Window.partitionBy(col("grp"))
          val gg = grid
            .withColumn("cb", coalesce(sum(col("cnt")).over(wCum), lit(0L)))
            .withColumn("nn", sum(col("cnt")).over(wAll))
          val k1 = expr("(nn + 1) div 2")
          val k2 = expr("(nn + 2) div 2")
          val lo = gg.filter(col("cb") < k1 && k1 <= col("cb") + col("cnt"))
            .select(col("grp"), col(keyCol).as("vlo"), col("nn"))
          val hi = gg.filter(col("cb") < k2 && k2 <= col("cb") + col("cnt"))
            .select(col("grp").as("grp_h"), col(keyCol).as("vhi"))
          // one median row per group — always the broadcast side
          lo.join(broadcast(hi), col("grp") === col("grp_h"))
            .select(col("grp"), col("nn"), (col("vlo") + col("vhi")).as(out))
        }
        val med = medianOf(g, "v", "med2")
          .select(col("grp").as("grp_m"), col("nn").as("n"), col("med2"))
        val dg = g.join(med, col("grp") === col("grp_m"))
          .select(col("grp"), col("n"), col("med2"),
            abs(lit(2L) * col("v") - col("med2")).as("dv"), col("cnt"))
          .groupBy(col("grp"), col("n"), col("med2"), col("dv"))
          .agg(sum(col("cnt")).as("cnt"))
        val mad = medianOf(dg.select(col("grp"), col("dv"), col("cnt")),
            "dv", "mad4")
          .select(col("grp").as("grp_d"), col("mad4"))
        dg.join(broadcast(mad), col("grp") === col("grp_d"))
          .groupBy(col("grp"), col("n"), col("med2"), col("mad4"))
          .agg(
            sum(when(col("mad4") === 0L, lit(null).cast("long"))
              .when(lit(13490L) * col("dv") > lit(35000L) * col("mad4"),
                col("cnt")).otherwise(lit(0L))).as("n_outliers"),
            max(when(col("mad4") === 0L, lit(null).cast("long"))
              .otherwise(expr(
                "(13490 * dv * 1000000) div (10000 * mad4)")))
              .as("max_z_e6"))
          .select(col("grp"), col("n"),
            (col("med2").cast("double") / lit(2.0)).as("median"),
            (col("mad4").cast("double") / lit(4.0)).as("mad"),
            col("n_outliers"), col("max_z_e6"),
            (col("max_z_e6").cast("double") / lit(1e6)).as("max_z"))
          .orderBy(col("grp"))
      },
      Some("""WITH g AS (
         |  SELECT o_orderpriority AS grp,
         |    CAST(floor(o_totalprice * 100.0) AS BIGINT) AS v,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM orders GROUP BY 1, 2),
         |gg AS (
         |  SELECT grp, v, cnt,
         |    coalesce(CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
         |      0) AS cb,
         |    CAST(sum(cnt) OVER (PARTITION BY grp) AS BIGINT) AS nn
         |  FROM g),
         |med AS (
         |  SELECT lo.grp, lo.nn AS n, lo.v + hi.v AS med2
         |  FROM (SELECT grp, v, nn FROM gg
         |        WHERE cb < (nn + 1) // 2 AND (nn + 1) // 2 <= cb + cnt) lo
         |  JOIN (SELECT grp, v FROM gg
         |        WHERE cb < (nn + 2) // 2 AND (nn + 2) // 2 <= cb + cnt) hi
         |  USING (grp)),
         |dg AS (
         |  SELECT g.grp, n, med2, abs(2 * g.v - med2) AS dv,
         |    CAST(sum(cnt) AS BIGINT) AS cnt
         |  FROM g JOIN med ON g.grp = med.grp
         |  GROUP BY 1, 2, 3, 4),
         |dgg AS (
         |  SELECT grp, dv, cnt,
         |    coalesce(CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY dv
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
         |      0) AS cb,
         |    CAST(sum(cnt) OVER (PARTITION BY grp) AS BIGINT) AS nn
         |  FROM dg),
         |mad AS (
         |  SELECT lo.grp, lo.dv + hi.dv AS mad4
         |  FROM (SELECT grp, dv, nn FROM dgg
         |        WHERE cb < (nn + 1) // 2 AND (nn + 1) // 2 <= cb + cnt) lo
         |  JOIN (SELECT grp, dv FROM dgg
         |        WHERE cb < (nn + 2) // 2 AND (nn + 2) // 2 <= cb + cnt) hi
         |  USING (grp))
         |SELECT dg.grp, n,
         |  CAST(med2 AS DOUBLE) / 2.0 AS median,
         |  CAST(mad4 AS DOUBLE) / 4.0 AS mad,
         |  CAST(sum(CASE WHEN mad4 = 0 THEN NULL
         |    WHEN 13490 * dv > 35000 * mad4 THEN cnt ELSE 0 END)
         |    AS BIGINT) AS n_outliers,
         |  CAST(max(CASE WHEN mad4 = 0 THEN NULL
         |    ELSE (13490 * dv * 1000000) // (10000 * mad4) END)
         |    AS BIGINT) AS max_z_e6,
         |  CAST(CAST(max(CASE WHEN mad4 = 0 THEN NULL
         |    ELSE (13490 * dv * 1000000) // (10000 * mad4) END)
         |    AS BIGINT) AS DOUBLE) / 1e6 AS max_z
         |FROM dg JOIN mad ON dg.grp = mad.grp
         |GROUP BY 1, 2, 3, 4
         |ORDER BY dg.grp""".stripMargin)),
  )

  /** Synchronous 3-round LPA labels over the basket graph — the shared
    * pipeline of q_communities (which reports community sizes) and
    * q_modularity (which scores the partition). Bit-deterministic
    * plurality adoption with the (count DESC, label ASC) tie-break; see
    * q_communities' scaladoc. Returns (node, label). */
  private[graft] def lpaLabels(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val und = basketEdges(s, d)
    val edges = und.select(col("a").as("src"), col("b").as("dst"))
      .union(und.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to 3) {
      val freq = edges
        .join(labels.select(col("node").as("src"), col("label")), "src")
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("dst"))
        .orderBy(col("cnt").desc, col("label").asc)
      labels = freq.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("dst").as("node"), col("label"))
    }
    labels
  }

  /** Per-nation Mann–Kendall trend z-scores over the monthly cents-grid
    * revenue series — the shared pipeline of q_mann_kendall (which adds
    * the per-nation trend verdict) and q_bh_fdr (which corrects the 25
    * tests jointly). Columns: nationkey, n_months, s_stat, var_num, z_e9
    * (the continuity-corrected z floor-snapped to the 1e9 grid —
    * BIGINT-exact inputs, one sqrt, see q_mann_kendall's scaladoc). */
  private def mannKendallZ(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val rev = Tables.orders(s, d)
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nationkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(sum(floor(col("o_totalprice") * lit(100.0)).cast("long"))
        .as("rev"))
    val a = rev.select(col("nationkey"), col("month").as("ma"),
      col("rev").as("ra"))
    val b = rev.select(col("nationkey"), col("month").as("mb"),
      col("rev").as("rb"))
    val sAgg = a.join(b, Seq("nationkey"))
      .filter(col("ma") < col("mb"))
      .groupBy(col("nationkey"))
      .agg(sum(when(col("rb") > col("ra"), 1L)
        .when(col("rb") < col("ra"), -1L).otherwise(0L)).as("s_stat"))
    val nM = rev.groupBy(col("nationkey"))
      .agg(count(lit(1)).as("n_months"))
    val ties = rev.groupBy(col("nationkey"), col("rev"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("nationkey"))
      .agg(sum(col("t") * (col("t") - 1L) * (lit(2L) * col("t") + 5L))
        .as("tie_sum"))
    val base = nM.join(sAgg, "nationkey").join(ties, "nationkey")
      .select(col("nationkey"), col("n_months"), col("s_stat"),
        (col("n_months") * (col("n_months") - 1L) *
          (lit(2L) * col("n_months") + 5L) - col("tie_sum"))
          .as("var_num"))
    val zRaw = when(col("var_num") > 0L && col("s_stat") > 0L,
        (col("s_stat") - 1L).cast("double") /
          sqrt(col("var_num").cast("double") / lit(18.0)))
      .when(col("var_num") > 0L && col("s_stat") < 0L,
        (col("s_stat") + 1L).cast("double") /
          sqrt(col("var_num").cast("double") / lit(18.0)))
      .otherwise(lit(0.0))
    base.withColumn("z_e9", floor(zRaw * lit(1e9)).cast("long"))
  }

  /** The market-basket edge set (distinct canonical part pairs within an
    * order) — the shared graph input of q_triangles, q_triangles_sampled
    * AND q_pagerank, staged once (localCheckpoint; at 1000 executors a
    * reliable checkpoint/staging write is the durable variant) and
    * MEMOIZED per (session, dir, data-mtime) exactly like
    * TextQueries.componentLabels: the three graph queries consume a
    * prebuilt edge index during a sweep, their per-query numbers are the
    * algorithm cost, and Bench reports the build as its own
    * edges_build_sec line (cleared first so it is actually measured).
    * Same hygiene: stopped-session entries purged on access, a rewritten
    * lineitem.parquet evicts the stale entry, clearBasketEdges gives
    * benches/services deterministic release of the checkpoint blocks. */
  private[graft] def basketEdges(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    edgesCache.filterInPlace { case ((sess, _, _), _) => !sess.sparkContext.isStopped }
    val key = (s, d, lineitemMtime(s, d))
    edgesCache.keys.filter(k => k._1 == s && k._2 == d && k != key)
      .foreach(k => edgesCache.remove(k).foreach(_.release()))
    edgesCache.getOrElseUpdate(key, EdgeEntry(buildBasketEdges(s, d))).df
  }

  /** Deterministically drop every cached edge set (and its checkpoint
    * blocks) for `s`. */
  def clearBasketEdges(s: org.apache.spark.sql.SparkSession): Unit =
    edgesCache.keys.filter(_._1 == s)
      .foreach(k => edgesCache.remove(k).foreach(_.release()))

  // TrieMap, matching TextQueries.labelsCache: getOrElseUpdate is atomic,
  // so concurrent sessions never double-build or race eviction vs insert.
  private val edgesCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String, Long), EdgeEntry]

  private final case class EdgeEntry(df: org.apache.spark.sql.DataFrame) {
    def release(): Unit = df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ =>
    }
  }

  private def lineitemMtime(s: org.apache.spark.sql.SparkSession, d: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$d/lineitem.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    try fs.getFileStatus(p).getModificationTime catch { case _: Exception => 0L }
  }

  private def buildBasketEdges(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"))
    val rhs = li.select(col("l_orderkey").as("k2"), col("l_partkey").as("p2"))
    li.join(rhs,
        col("l_orderkey") === col("k2") && col("l_partkey") < col("p2"))
      .select(col("l_partkey").as("a"), col("p2").as("b")).distinct()
      .localCheckpoint()
  }

  /** Deterministic p = 300/1000 edge-sampling predicate (Doulion): an
    * md5 bucket of the canonical pair, identical on both engines. */
  private def edgeKeep: org.apache.spark.sql.Column =
    graft.functions.TextOps.md5Prefix60(
      concat(lit("tri:"), col("a").cast("string"), lit(":"),
        col("b").cast("string"))) % 1000 < 300

  private def edgeKeepSql: String =
    graft.OracleSql.hexToLong(
      "md5('tri:' || CAST(a AS VARCHAR) || ':' || CAST(b AS VARCHAR))",
      1, 15) + " % 1000 < 300"

  /** Degree-oriented triangle statistics over an undirected edge set
    * (a, b): 1 row of (n_nodes, n_edges, n_wedges, n_triangles,
    * all_wedges). See q_triangles for the algorithm and plan notes. */
  private[graft] def triangleStats(
      und: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // callers pass a STAGED edge set (basketEdges localCheckpoints);
    // the sampled variant's filter re-runs narrowly over those staged
    // blocks per consumer — cheaper than a second staging write
    val deg = und.select(col("a").as("n"))
      .union(und.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("dn"))
    val da = deg.select(col("n").as("na"), col("dn").as("da"))
    val db = deg.select(col("n").as("nb"), col("dn").as("db"))
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val o = und.join(da, col("a") === col("na"))
      .join(db, col("b") === col("nb"))
      .select(
        when(lowFirst, col("a")).otherwise(col("b")).as("x"),
        when(lowFirst, col("b")).otherwise(col("a")).as("y"),
        when(lowFirst, col("db")).otherwise(col("da")).as("dy"))
      .localCheckpoint()
    val o2 = o.select(col("x").as("x2"), col("y").as("z"), col("dy").as("dz"))
    // closing edges are DISTINCT (o is an edge set): the left outer join
    // cannot fan a wedge out, so ONE pass yields both counts; the
    // shuffle_hash hints skip sort-merge's sort of the wedge streams
    // (measured 5.1 -> 3.7s on the full graph) and stay scale-legit —
    // the build side is one PARTITION per task, never a broadcast.
    val closing = o.select(col("x").as("wa"), col("y").as("wb"))
      .withColumn("hit", lit(1))
    val wstats = o.join(o2.hint("shuffle_hash"),
        col("x") === col("x2") && (col("dy") < col("dz") ||
          (col("dy") === col("dz") && col("y") < col("z"))))
      .select(col("y").as("wa"), col("z").as("wb"))
      .join(closing.hint("shuffle_hash"), Seq("wa", "wb"), "left_outer")
      .agg(count(lit(1)).as("n_wedges"),
        count(col("hit")).as("n_triangles"))
    val nE = und.agg(count(lit(1)).as("n_edges"))
    val nN = deg.agg(count(lit(1)).as("n_nodes"),
      // dn*(dn-1) is even; >>1 keeps the whole sum in exact longs
      sum(shiftright(col("dn") * (col("dn") - 1), 1)).as("all_wedges"))
    nN.crossJoin(nE).crossJoin(wstats)
  }

  /** Shared DuckDB CTE chain for the two triangle queries; `sampleWhere`
    * filters the canonical edge set (Doulion), `select` is the final
    * projection over agg/ne/nw/tri. */
  private def triangleOracle(sampleWhere: String, select: String): String =
    s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
       |und0 AS (
       |  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       |und AS (SELECT a, b FROM und0 $sampleWhere),
       |deg AS (
       |  SELECT n, CAST(count(*) AS BIGINT) AS dn
       |  FROM (SELECT a AS n FROM und UNION ALL SELECT b FROM und)
       |  GROUP BY 1),
       |o AS (
       |  SELECT CASE WHEN (da.dn, u.a) < (db.dn, u.b) THEN u.a ELSE u.b END AS x,
       |         CASE WHEN (da.dn, u.a) < (db.dn, u.b) THEN u.b ELSE u.a END AS y,
       |         CASE WHEN (da.dn, u.a) < (db.dn, u.b) THEN db.dn ELSE da.dn END AS dy
       |  FROM und u JOIN deg da ON da.n = u.a JOIN deg db ON db.n = u.b),
       |w AS (
       |  SELECT o1.y AS wa, o2.y AS wb FROM o o1 JOIN o o2
       |  ON o1.x = o2.x AND ((o1.dy, o1.y) < (o2.dy, o2.y))),
       |tri AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM w
       |  WHERE EXISTS (SELECT 1 FROM o WHERE o.x = w.wa AND o.y = w.wb)),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       |    CAST(sum(dn * (dn - 1) // 2) AS BIGINT) AS all_wedges
       |  FROM deg),
       |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und),
       |nw AS (SELECT CAST(count(*) AS BIGINT) AS n_wedges FROM w)
       |$select""".stripMargin
}
