package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational surface over the TPC-H-ish star schema: scan/filter/project,
  * shuffle aggregations, multi-way joins (broadcast for dims, shuffle for
  * facts), window functions, running totals.
  *
  * Scale design notes (100 TB):
  *  - dimension tables (region/nation/supplier/customer at typical ratios)
  *    are broadcast; lineitem<->orders is a co-partitioned shuffle join on
  *    the order key, the dominant join of the schema — AQE handles skew.
  *  - aggregations are partial (map-side combine) by construction since all
  *    aggs used are algebraic (sum/count/min/max over decimals).
  */
object RelationalQueries {

  private val dec = DecimalType(25, 6)

  /** Per-customer EWMA (alpha = 1/2) over the (date, key)-sorted order
    * values: one key-shuffle groupBy collecting the bounded per-customer
    * series, then a narrow sequential fold — each multiply is an exact
    * power-of-two scaling, so the result is bit-equal to any engine
    * folding the same sequence (DuckDB's list_reduce, or the streaming
    * twin's per-trigger Scala fold in StreamEwma). */
  def ewmaPerKey(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val ps = transform(
      sort_array(collect_list(struct(col("o_orderdate"), col("o_orderkey"),
        col("o_totalprice")))),
      e => e.getField("o_totalprice"))
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), ps.as("ps"))
      .select(col("o_custkey"), col("n_orders"),
        aggregate(slice(col("ps"), lit(2), size(col("ps")) - 1),
          element_at(col("ps"), 1),
          (acc, x) => acc * lit(0.5) + x * lit(0.5)).as("ewma"))
  }

  val all: Seq[Q] = Seq(
    // TPC-H Q1 shape: the pricing summary scan-agg (SURVEY.md §2.4 aggregations).
    Q("q1_agg",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val discPrice = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        val charge = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * (lit(1.0) + col("l_tax"))
        li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            H.dsum(col("l_quantity")).as("sum_qty"),
            H.dsum(col("l_extendedprice")).as("sum_base"),
            H.dsum(discPrice).as("sum_disc_price"),
            H.dsum(charge).as("sum_charge"),
            (H.dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_base,
         |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc_price,
         |  CAST(sum(CAST((l_extendedprice*(1.0-l_discount))*(1.0+l_tax) AS DECIMAL(25,6))) AS DOUBLE) AS sum_charge,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)/count(*) AS avg_qty,
         |  CAST(count(*) AS BIGINT) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      headline = true),

    // TPC-H Q3 shape: segment revenue top-10 (customer [broadcast] ⋈ orders ⋈ lineitem).
    Q("q3_join",
      (s, d) => {
        val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val ord = Tables.orders(s, d)
          .filter(col("o_orderdate") < to_timestamp(lit("1998-03-15 00:00:00")))
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") > to_timestamp(lit("1998-03-15 00:00:00")))
        // No broadcast hint on customer: it grows with scale factor
        // (150k x SF rows — ~10 GiB+ at the 100 TB design point), so a
        // static hint would force a driver OOM there. AQE still picks a
        // broadcast join at small SF from runtime size stats.
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
          .agg(H.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey").asc)
          .limit(10)
      },
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
         |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
         |GROUP BY o_orderkey, o_date
         |ORDER BY revenue DESC, o_orderkey
         |LIMIT 10""".stripMargin),
      headline = true),

    // TPC-H Q5 shape: full star join, revenue by nation (dims broadcast).
    Q("q5_star",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val ord = Tables.orders(s, d)
        val cust = Tables.customer(s, d)
        val nat = Tables.nation(s, d)
        val reg = Tables.region(s, d)
        // customer unhinted (scale-factor-growing — see q3_join); the
        // broadcast hints stay only on fixed-cardinality dims (25 nations,
        // 5 regions), which are broadcast-safe at ANY scale factor.
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(reg.filter(col("r_name").isin("ASIA", "EUROPE"))),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            H.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("r_name"), col("revenue").desc, col("n_name"))
      },
      Some("""SELECT r_name, n_name,
         |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
         |  CAST(count(*) AS BIGINT) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name IN ('ASIA', 'EUROPE')
         |GROUP BY r_name, n_name
         |ORDER BY r_name, revenue DESC, n_name""".stripMargin),
      headline = true),

    // Window top-k per group: 3 priciest parts per brand (SURVEY.md §2.4).
    Q("q_top_per_group",
      (s, d) => {
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
        Tables.part(s, d)
          .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
            row_number().over(w).cast("long").as("rn"))
          .filter(col("rn") <= 3)
          .orderBy(col("p_brand"), col("rn"))
      },
      Some("""SELECT p_brand, p_partkey, p_retailprice, rn FROM (
         |  SELECT p_brand, p_partkey, p_retailprice,
         |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
         |  FROM part) t
         |WHERE rn <= 3
         |ORDER BY p_brand, rn""".stripMargin)),

    // Running total per customer (window aggregation; decimal-exact).
    Q("q_orders_running",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d).filter(col("o_custkey") < 150)
          .select(col("o_custkey"), col("o_orderkey"),
            sum(col("o_totalprice").cast(dec)).over(w).cast("double").as("running"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) OVER (
         |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
         |FROM orders
         |WHERE o_custkey < 150
         |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // Per-customer exponential smoothing (EWMA, alpha = 1/2) over the
    // order-value time series — the time-series companion to the running
    // total above. The recursion e_t = x_t/2 + e_{t-1}/2 is evaluated as
    // a SEQUENTIAL per-customer left fold over the (date, key)-sorted
    // value list: alpha = 1/2 makes every multiply an exact power-of-two
    // scaling, and the one rounding site per step (the add) is the same
    // IEEE double add on both engines — bit-equal without any decimal
    // routing. Scale shape: ONE groupBy on the customer key (bounded
    // per-group arrays — TPC-H-ish orders/customer is ~10-40 at any SF),
    // then a narrow fold + TakeOrderedAndProject for the top-20; no
    // window, no global sort.
    Q("q_ewma",
      (s, d) => ewmaPerKey(s, d)
        .orderBy(col("ewma").desc, col("o_custkey"))
        .limit(20),
      Some("""WITH ser AS (
         |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
         |    list(o_totalprice ORDER BY o_orderdate, o_orderkey) AS ps
         |  FROM orders GROUP BY o_custkey)
         |SELECT o_custkey, n_orders,
         |  list_reduce(list_prepend(ps[1], ps[2:len(ps)]),
         |    (acc, x) -> acc * CAST(0.5 AS DOUBLE) + x * CAST(0.5 AS DOUBLE)) AS ewma
         |FROM ser
         |ORDER BY ewma DESC, o_custkey LIMIT 20""".stripMargin)),

    // Quartile bucketing + per-bucket stats, WITHOUT a global sort.
    // The previous ntile() formulation used a partitionless window, which
    // funnels the whole table through ONE task — correct at sf0.1, a
    // scale-killer at 100 TB. Value-based quartile semantics instead: the
    // three exact interpolated boundaries (pos = p*(n-1), identical to
    // DuckDB's quantile_cont — parity proven by q_percentiles) come from
    // ONE partial-merged aggregate whose buffer is O(distinct values), the
    // 1-row result is broadcast, and each row is bucketed by a narrow
    // projection: quartile = 1 + (x>b1) + (x>b2) + (x>b3). Rows with
    // x exactly on a boundary fall in the lower bucket on both engines.
    Q("q_ntile",
      (s, d) => {
        val cust = Tables.customer(s, d)
        val bounds = cust.agg(percentile(col("c_acctbal"),
          array(lit(0.25), lit(0.5), lit(0.75))).as("bs"))
        cust.crossJoin(broadcast(bounds))
          .select(col("c_acctbal"),
            (lit(1) + (col("c_acctbal") > col("bs")(0)).cast("int")
              + (col("c_acctbal") > col("bs")(1)).cast("int")
              + (col("c_acctbal") > col("bs")(2)).cast("int")).as("quartile"))
          .groupBy(col("quartile"))
          .agg(count(lit(1)).as("n"),
            min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"))
          .select(col("quartile").cast("long").as("quartile"),
            col("n"), col("lo"), col("hi"))
          .orderBy(col("quartile"))
      },
      Some("""WITH b AS (
         |  SELECT quantile_cont(c_acctbal, [0.25, 0.5, 0.75]) AS bs
         |  FROM customer)
         |SELECT CAST(1 + CASE WHEN c_acctbal > bs[1] THEN 1 ELSE 0 END
         |         + CASE WHEN c_acctbal > bs[2] THEN 1 ELSE 0 END
         |         + CASE WHEN c_acctbal > bs[3] THEN 1 ELSE 0 END AS BIGINT) AS quartile,
         |  CAST(count(*) AS BIGINT) AS n, min(c_acctbal) AS lo, max(c_acctbal) AS hi
         |FROM customer, b
         |GROUP BY quartile ORDER BY quartile""".stripMargin)),

    // Semi + anti join combo: customers active in 1995 but gone in 1996
    // (churn), with their 1995 order count.
    Q("q_churn",
      (s, d) => {
        val ord = Tables.orders(s, d)
        val o95 = ord.filter(year(col("o_orderdate")) === 1995)
        val o96 = ord.filter(year(col("o_orderdate")) === 1996)
        Tables.customer(s, d)
          .join(o95.select(col("o_custkey")), col("c_custkey") === col("o_custkey"), "left_semi")
          .join(o96.select(col("o_custkey")), col("c_custkey") === col("o_custkey"), "left_anti")
          .join(o95.groupBy(col("o_custkey")).agg(count(lit(1)).as("n_1995")),
            col("c_custkey") === col("o_custkey"))
          .select(col("c_custkey"), col("c_mktsegment"), col("n_1995"))
          .orderBy(col("c_custkey"))
      },
      Some("""WITH o95 AS (SELECT o_custkey FROM orders WHERE date_part('year', o_orderdate) = 1995),
         |o96 AS (SELECT o_custkey FROM orders WHERE date_part('year', o_orderdate) = 1996)
         |SELECT c_custkey, c_mktsegment,
         |  (SELECT CAST(count(*) AS BIGINT) FROM o95 WHERE o_custkey = c_custkey) AS n_1995
         |FROM customer
         |WHERE EXISTS (SELECT 1 FROM o95 WHERE o_custkey = c_custkey)
         |  AND NOT EXISTS (SELECT 1 FROM o96 WHERE o_custkey = c_custkey)
         |ORDER BY c_custkey""".stripMargin)),

    // MERGE INTO / SCD1 upsert — the CDC apply step every warehouse
    // runs: a deterministic updates batch (each customer's LATEST order,
    // rn=1 by orderdate/orderkey desc; keys ≡ 0 mod 3 shifted past the
    // key space to exercise the not-matched branch) merged into the
    // customer dim via ONE full-outer join on the key: matched -> update
    // (acctbal += latest price), source-only -> insert, target-only ->
    // unchanged. Per-action counts + decimal-exact balance sums close the
    // books. Scale shape: the merge IS the single key-shuffle full-outer
    // join (both sides hash-partition on the merge key; AQE plans it) —
    // the same plan a Delta/Iceberg MERGE compiles to after file pruning,
    // which is the part a table format adds, not the engine.
    Q("q_merge_upsert",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        val src = Tables.orders(s, d)
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(
            when(col("o_custkey") % 3 === 0, col("o_custkey") + 1000000L)
              .otherwise(col("o_custkey")).as("key"),
            col("o_totalprice").as("price"))
        val tgt = Tables.customer(s, d)
          .select(col("c_custkey").as("key"), col("c_acctbal"))
        tgt.join(src, Seq("key"), "full_outer")
          .select(
            when(col("price").isNull, lit("unchanged"))
              .when(col("c_acctbal").isNull, lit("inserted"))
              .otherwise(lit("updated")).as("action"),
            coalesce(col("c_acctbal"), lit(0.0))
              .plus(coalesce(col("price"), lit(0.0))).as("bal"))
          .groupBy(col("action"))
          .agg(count(lit(1)).as("n"), H.dsum(col("bal")).as("total_bal"))
          .orderBy(col("action"))
      },
      Some("""WITH src AS (
         |  SELECT CASE WHEN o_custkey % 3 = 0 THEN o_custkey + 1000000
         |              ELSE o_custkey END AS key,
         |    o_totalprice AS price
         |  FROM (SELECT o_custkey, o_totalprice, o_orderkey, o_orderdate,
         |          row_number() OVER (PARTITION BY o_custkey
         |            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
         |        FROM orders) WHERE rn = 1),
         |tgt AS (SELECT c_custkey AS key, c_acctbal FROM customer),
         |m AS (
         |  SELECT
         |    CASE WHEN s.price IS NULL THEN 'unchanged'
         |         WHEN t.c_acctbal IS NULL THEN 'inserted'
         |         ELSE 'updated' END AS action,
         |    COALESCE(t.c_acctbal, 0.0) + COALESCE(s.price, 0.0) AS bal
         |  FROM tgt t FULL OUTER JOIN src s USING (key))
         |SELECT action, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(bal AS DECIMAL(25,6))) AS DOUBLE) AS total_bal
         |FROM m GROUP BY action ORDER BY action""".stripMargin)),

    // SCD2 dimension-history build — the companion to q_merge_upsert's
    // SCD1 overwrite: each customer order opens a version valid
    // [o_orderdate, next o_orderdate), the latest version stays open
    // (valid_to NULL). This is the standard lead()-window formulation a
    // warehouse uses to turn a change log into a type-2 history table.
    // Scale shape: ONE key shuffle — the window partitions by o_custkey
    // (bounded per-customer partitions, never global), and the summary
    // groupBy reuses the same hash partitioning so no second exchange.
    // closed_days is BIGINT-exact (date arithmetic, no floats).
    Q("q_scd2",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            col("o_totalprice"))
          .withColumn("valid_to", lead(col("o_orderdate"), 1).over(w))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_versions"),
            sum(when(col("valid_to").isNotNull,
              datediff(col("valid_to").cast("date"),
                col("o_orderdate").cast("date")))
              .otherwise(lit(0))).cast("long").as("closed_days"),
            max(when(col("valid_to").isNull, col("o_totalprice")))
              .as("current_price"))
          .orderBy(col("n_versions").desc, col("o_custkey"))
          .limit(20)
      },
      Some("""WITH v AS (
         |  SELECT o_custkey, o_totalprice, o_orderdate,
         |    lead(o_orderdate) OVER (PARTITION BY o_custkey
         |      ORDER BY o_orderdate, o_orderkey) AS valid_to
         |  FROM orders)
         |SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_versions,
         |  CAST(sum(CASE WHEN valid_to IS NOT NULL
         |    THEN date_diff('day', CAST(o_orderdate AS DATE),
         |                   CAST(valid_to AS DATE))
         |    ELSE 0 END) AS BIGINT) AS closed_days,
         |  max(CASE WHEN valid_to IS NULL THEN o_totalprice END)
         |    AS current_price
         |FROM v GROUP BY o_custkey
         |ORDER BY n_versions DESC, o_custkey LIMIT 20""".stripMargin)),

    // Pivot: return-flag x line-status revenue matrix (explicit pivot
    // values keep the output schema deterministic; the oracle is the
    // portable FILTER-based formulation).
    Q("q_pivot",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(H.dsum(col("l_extendedprice")))
        .withColumnRenamed("F", "rev_f")
        .withColumnRenamed("O", "rev_o")
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) FILTER (l_linestatus = 'F') AS DOUBLE) AS rev_f,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) FILTER (l_linestatus = 'O') AS DOUBLE) AS rev_o
         |FROM lineitem
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin)),

    // Spark-native session windows (session_window merges events with
    // gap < 30 min). Oracle: the first-principles lag formulation — a new
    // session starts when the gap is >= the window (session_window's end
    // is exclusive). Cross-validates the built-in against first principles.
    Q("q_session_window",
      (s, d) => Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"), sum(col("n")).cast("long").as("n_events"))
        .orderBy(col("user_id")),
      Some("""WITH e AS (
         |  SELECT user_id, ts,
         |    lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts) AS pts
         |  FROM events),
         |m AS (
         |  SELECT user_id,
         |    CASE WHEN pts IS NULL OR date_diff('microsecond', pts, ts) >= 1800000000 THEN 1 ELSE 0 END AS new_s
         |  FROM e)
         |SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions,
         |  CAST(count(*) AS BIGINT) AS n_events
         |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Exact interpolated percentiles (both engines: pos = p*(n-1),
    // v = lower + frac*(higher-lower) over the sorted values).
    // Key-skew profiling — the diagnostic that decides WHEN to reach for
    // q_skew_salted_join's salting (or AQE skew handling): per-key
    // frequency distribution of a prospective join/shuffle key. Two
    // aggregates, both bounded: per-key counts (map-side combinable),
    // then one 1-row rollup whose exact-percentile buffer is O(distinct
    // keys) — the key-cardinality relation, not the row count. top10n
    // comes from the bounded TopKAgg buffer, not a global sort. The
    // verdict ratios (max/p50, p99/p50) are single double divisions over
    // exact interpolated percentiles (quantile_cont parity per
    // q_percentiles).
    Q("q_skew_report",
      (s, d) => {
        val perKey = Tables.events(s, d)
          .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        perKey.agg(
            count(lit(1)).as("n_keys"),
            sum(col("n")).cast("long").as("n_rows"),
            max(col("n")).as("max_n"),
            percentile(col("n"), array(lit(0.5), lit(0.99))).as("ps"),
            graft.functions.VectorOps.topK(
              col("n").cast("double"), col("user_id"), 10).as("topk"))
          .select(col("n_keys"), col("n_rows"), col("max_n"),
            element_at(col("ps"), 1).as("p50_n"),
            element_at(col("ps"), 2).as("p99_n"),
            aggregate(col("topk"), lit(0.0),
              (acc, x) => acc + x.getField("score")).cast("long")
              .as("top10_n"),
            (col("max_n").cast("double") / element_at(col("ps"), 1))
              .as("max_over_p50"),
            (element_at(col("ps"), 2) / element_at(col("ps"), 1))
              .as("p99_over_p50"))
      },
      Some("""WITH pk AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS n
         |  FROM events GROUP BY user_id),
         |t10 AS (
         |  SELECT CAST(sum(n) AS BIGINT) AS top10_n FROM (
         |    SELECT n FROM pk ORDER BY n DESC, user_id LIMIT 10)),
         |r AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         |    CAST(sum(n) AS BIGINT) AS n_rows,
         |    CAST(max(n) AS BIGINT) AS max_n,
         |    quantile_cont(n, [0.5, 0.99]) AS ps
         |  FROM pk)
         |SELECT n_keys, n_rows, max_n, ps[1] AS p50_n, ps[2] AS p99_n,
         |  t10.top10_n,
         |  CAST(max_n AS DOUBLE) / ps[1] AS max_over_p50,
         |  ps[2] / ps[1] AS p99_over_p50
         |FROM r, t10""".stripMargin)),

    Q("q_percentiles",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(percentile(col("l_extendedprice"),
          array(lit(0.25), lit(0.5), lit(0.75), lit(0.95))).as("ps"))
        .select(col("l_returnflag"), posexplode(col("ps")).as(Seq("i", "p_value")))
        .select(col("l_returnflag"), col("i").cast("long").as("i"), col("p_value"))
        .orderBy(col("l_returnflag"), col("i")),
      Some("""WITH q AS (
         |  SELECT l_returnflag,
         |    quantile_cont(l_extendedprice, [0.25, 0.5, 0.75, 0.95]) AS ps
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag,
         |  CAST(generate_subscripts(ps, 1) - 1 AS BIGINT) AS i,
         |  unnest(ps) AS p_value
         |FROM q ORDER BY l_returnflag, i""".stripMargin)),

    // Scale-path twin of q_percentiles. The exact `percentile` holds every
    // group's full value list in its aggregation buffer — the right answer
    // when the oracle demands exactness, an OOM risk at 100 TB.
    // `percentile_approx` (Greenwald-Khanna summaries) keeps the buffer
    // bounded at O(accuracy) per group regardless of row count; at
    // accuracy=10000 the rank error is <= n/10000.
    // Oracle closure: the GK sketch values are engine-specific, so the
    // query emits the EXACT interpolated percentile (recomputable by
    // DuckDB — parity proven by q_percentiles) plus a `within_tol`
    // invariant |approx-exact|/|exact| <= 0.01 which the oracle states as
    // the constant 1. A sketch regression beyond 1% flips the boolean and
    // fails the hash-match. The exact companion exists for the gate; the
    // 100 TB path runs the approx aggregate alone (SCALE.md "Percentiles
    // at scale").
    Q("q_percentiles_approx",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          percentile(col("l_extendedprice"),
            array(lit(0.25), lit(0.5), lit(0.75), lit(0.95))).as("eps"),
          percentile_approx(col("l_extendedprice"),
            array(lit(0.25), lit(0.5), lit(0.75), lit(0.95)), lit(10000)).as("aps"))
        .select(col("l_returnflag"),
          posexplode(arrays_zip(col("eps"), col("aps"))).as(Seq("i", "z")))
        .select(col("l_returnflag"), col("i").cast("long").as("i"),
          col("z.eps").as("p_value"),
          (abs(col("z.aps") - col("z.eps")) / abs(col("z.eps")) <= lit(0.01))
            .cast("long").as("within_tol"))
        .orderBy(col("l_returnflag"), col("i")),
      Some("""WITH q AS (
         |  SELECT l_returnflag,
         |    quantile_cont(l_extendedprice, [0.25, 0.5, 0.75, 0.95]) AS ps
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag,
         |  CAST(generate_subscripts(ps, 1) - 1 AS BIGINT) AS i,
         |  unnest(ps) AS p_value,
         |  CAST(1 AS BIGINT) AS within_tol
         |FROM q ORDER BY l_returnflag, i""".stripMargin)),

    // Moment statistics from exact integer sums: prices are quantized to
    // cents (floor(x*100), identical doubles => identical longs on both
    // engines), then n / sum / sum-of-squares are exact integers — the
    // derived mean/variance/stddev are bitwise-reproducible regardless of
    // partitioning. (A DECIMAL cast of x*x would hit half-up vs half-even
    // ties: every double is dyadic, and ~2 per 60k rows land exactly on a
    // scale-6 rounding boundary.)
    Q("q_price_stats",
      (s, d) => {
        val xc = floor(col("l_extendedprice") * lit(100.0)) // cents, exact long
        Tables.lineitem(s, d)
          .select(col("l_returnflag"), xc.as("xc"))
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("xc").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
              .cast("double").as("s1"),
            sum((col("xc") * col("xc")).cast(org.apache.spark.sql.types.DecimalType(38, 0)))
              .cast("double").as("s2"))
          .select(col("l_returnflag"), col("n"),
            (col("s1") / col("n") / lit(100.0)).as("mean"),
            ((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1) / lit(10000.0)).as("variance"),
            sqrt(((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1) / lit(10000.0))).as("stddev"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH c AS (
         |  SELECT l_returnflag, CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS xc
         |  FROM lineitem),
         |m AS (
         |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CAST(xc AS DECIMAL(38,0))) AS DOUBLE) AS s1,
         |    CAST(sum(CAST(xc*xc AS DECIMAL(38,0))) AS DOUBLE) AS s2
         |  FROM c GROUP BY l_returnflag)
         |SELECT l_returnflag, n, s1/n/100.0 AS mean,
         |  (s2 - s1*s1/n)/(n - 1)/10000.0 AS variance,
         |  sqrt((s2 - s1*s1/n)/(n - 1)/10000.0) AS stddev
         |FROM m ORDER BY l_returnflag""".stripMargin)),

    // Closed-form OLS regression per segment — model FITTING as a
    // distributed aggregation: y = a + b*x (order value vs line count),
    // one model per o_orderpriority. All six sufficient statistics are
    // exact (features snapped to integer grids — x is a count, y =
    // floor(o_totalprice) dollars — then DECIMAL(38,0)-routed sums, the
    // q_price_stats pattern, so no partition-order float drift); the
    // normal-equation solution, intercept and R^2 are assembled in
    // doubles with identical operation order on both engines and
    // floor-scaled. Scale shape: the per-order feature aggregate and the
    // orders join share the o_orderkey partitioning (one shuffle), the
    // moment aggregate is map-side-combinable, and the model table is
    // segment-sized — regression at 100 TB costs one pass, no iteration,
    // no driver-side math.
    Q("q_ols",
      (s, d) => {
        val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val lc = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey").as("o_orderkey"))
          .agg(count(lit(1)).as("x"))
        val o = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"),
            floor(col("o_totalprice")).cast("long").as("y"))
        val g = o.join(lc, "o_orderkey")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(col("x").cast(dec38)).cast("double").as("sx"),
            sum(col("y").cast(dec38)).cast("double").as("sy"),
            sum((col("x") * col("x")).cast(dec38)).cast("double").as("sxx"),
            sum((col("x") * col("y")).cast(dec38)).cast("double").as("sxy"),
            sum((col("y") * col("y")).cast(dec38)).cast("double").as("syy"))
        val num = col("n") * col("sxy") - col("sx") * col("sy")
        val denx = col("n") * col("sxx") - col("sx") * col("sx")
        val deny = col("n") * col("syy") - col("sy") * col("sy")
        val slope = num / denx
        g.select(col("o_orderpriority"), col("n"),
            (floor(slope * lit(1e9)) / lit(1e9)).as("slope"),
            (floor((col("sy") - slope * col("sx")) / col("n") * lit(1e9))
              / lit(1e9)).as("intercept"),
            (floor(num * num / (denx * deny) * lit(1e9)) / lit(1e9))
              .as("r2"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""WITH lc AS (
         |  SELECT l_orderkey AS o_orderkey, CAST(count(*) AS BIGINT) AS x
         |  FROM lineitem GROUP BY l_orderkey),
         |o AS (
         |  SELECT o_orderkey, o_orderpriority,
         |    CAST(floor(o_totalprice) AS BIGINT) AS y FROM orders),
         |g AS (
         |  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
         |    CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
         |    CAST(sum(CAST(x*x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
         |    CAST(sum(CAST(x*y AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
         |    CAST(sum(CAST(y*y AS DECIMAL(38,0))) AS DOUBLE) AS syy
         |  FROM o JOIN lc USING (o_orderkey)
         |  GROUP BY o_orderpriority)
         |SELECT o_orderpriority, n,
         |  floor((n*sxy - sx*sy) / (n*sxx - sx*sx) * 1e9) / 1e9 AS slope,
         |  floor((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n * 1e9)
         |    / 1e9 AS intercept,
         |  floor((n*sxy - sx*sy) * (n*sxy - sx*sy)
         |    / ((n*sxx - sx*sx) * (n*syy - sy*sy)) * 1e9) / 1e9 AS r2
         |FROM g ORDER BY o_orderpriority""".stripMargin)),

    // TPC-H Q9-style product-line profit: the DEEP multi-join (lineitem
    // joins part, supplier, orders, nation — 5 tables) that exercises
    // Catalyst's join ordering. The selective part filter ('%red%')
    // prunes the fact rows early; the fixed-cardinality nation dim gets
    // the only broadcast hint (the scale-factor-growing sides are AQE's
    // call, per the r5 verdict). Profit sums route through DECIMAL for
    // order-independent bit-exactness.
    // TPC-H Q18 shape — "large orders": a HAVING pre-aggregation over the
    // fact table (map-side partials on the join key, so the filter runs
    // BEFORE any join and the surviving keys are ~1.5% of orders at
    // T=200) drives a semi-join-like reduction of orders + customer,
    // then a global top-100. The having-aggregate replaces what a naive
    // formulation would do with a window over the joined relation; at
    // 100 TB the big-orders key set is small enough to broadcast into
    // the orders join (AQE decides), and lineitem shuffles once on
    // l_orderkey — the same exchange a bucketed layout would eliminate.
    Q("q18_big_orders",
      (s, d) => {
        val big = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(H.dsum(col("l_quantity")).as("sum_qty"))
          .filter(col("sum_qty") > 200.0)
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        o.join(big, o("o_orderkey") === big("l_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderdate"),
            col("o_orderkey"))
          .limit(100)
      },
      Some("""WITH big AS (
         |  SELECT l_orderkey,
         |    CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
         |  FROM lineitem GROUP BY 1
         |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) > 200.0)
         |SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
         |  o.o_totalprice, b.sum_qty
         |FROM big b
         |JOIN orders o ON o.o_orderkey = b.l_orderkey
         |JOIN customer c ON c.c_custkey = o.o_custkey
         |ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
         |LIMIT 100""".stripMargin)),

    // TPC-H Q21's join STRUCTURE (the fixture carries no receipt/commit
    // dates, so "kept waiting" is restated on shipdate): per finished
    // multi-supplier order, the supplier whose line shipped STRICTLY
    // after every other supplier's — the same correlated EXISTS (another
    // supplier in the order) + NOT EXISTS (another supplier shipped
    // at-or-after) pair, compiled Spark-first: one left_semi + one
    // left_anti against the SAME (orderkey, supplier, shipdate)
    // projection, then the supplier⋈nation dims and a bounded top-k.
    // Broadcast-hint policy (SCALE.md round-6): ONLY nation carries the
    // hint — it is 25 rows at every scale factor. Supplier GROWS with
    // SF (~1B rows in the 100 TB regime), so it stays unhinted like the
    // semi/anti sides and plan selection is size-based on purpose: at
    // fixture scale AQE broadcasts the compact projections (runtime
    // stats under the threshold); past it, the supplier join and both
    // correlated joins become key-partitioned SORT-MERGE exchanges — column pruning makes them distinct subtrees (the semi
    // probe keeps 2 columns, the anti 3, so no ReusedExchange — two
    // NARROW keyed exchanges instead, and the left side re-partitions
    // once for the whole semi→anti→orders chain on the same key). The
    // 100 TB regime is exercised, not assumed: PlanGuardSpec re-runs the
    // query with broadcasts disabled and asserts all-sort-merge, bounded
    // exchange count, and an unchanged result. No per-order max window
    // over the corpus, no cartesian; counts are per qualifying LINE,
    // exactly like Q21's numwait. Same-supplier extra lines never block
    // the anti-join (the <> supplier condition), matching the
    // original's semantics.
    Q("q21_last_shipper",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        val others = li.select(col("l_orderkey").as("k2"),
          col("l_suppkey").as("s2"), col("l_shipdate").as("d2"))
        val multi = li.join(others,
          col("l_orderkey") === col("k2") && col("l_suppkey") =!= col("s2"),
          "left_semi")
        val last = multi.join(others,
          col("l_orderkey") === col("k2") && col("l_suppkey") =!= col("s2") &&
            col("d2") >= col("l_shipdate"),
          "left_anti")
        val fOrders = Tables.orders(s, d)
          .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
        val sup = Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
        val nat = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
        last.join(fOrders, col("l_orderkey") === col("o_orderkey"))
          .join(sup.join(broadcast(nat),
            col("s_nationkey") === col("n_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("n_name"), col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("n_name"), col("s_name"))
          .limit(10)
      },
      Some("""SELECT n.n_name, s.s_name, CAST(count(*) AS BIGINT) AS numwait
         |FROM lineitem l1
         |JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
         |JOIN supplier s ON s.s_suppkey = l1.l_suppkey
         |JOIN nation n ON n.n_nationkey = s.s_nationkey
         |WHERE EXISTS (
         |    SELECT 1 FROM lineitem l2
         |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
         |  AND NOT EXISTS (
         |    SELECT 1 FROM lineitem l3
         |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
         |      AND l3.l_shipdate >= l1.l_shipdate)
         |GROUP BY 1, 2
         |ORDER BY numwait DESC, n_name, s_name
         |LIMIT 10""".stripMargin)),

    // TPC-H Q13's outer-join count-distribution shape (the fixture carries
    // no o_comment, so the excluded class is restated on priority). The
    // Spark plan is deliberately NOT the classic formulation: orders
    // pre-aggregate to one (custkey, n) row BEFORE the join (map-side
    // combinable count), so the custkey-keyed left join carries one row
    // per customer — never one per order — and the histogram groupBy runs
    // over distinct counts (vocabulary-sized). At 100 TB that is one
    // orders shuffle at per-customer granularity + one bounded aggregate;
    // the oracle states the classic left-outer-then-count formulation, so
    // hash equality PROVES the aggregate-below-join rewrite, including the
    // zero-order customers the left join must preserve.
    Q("q13_custdist",
      (s, d) => {
        val perCust = Tables.orders(s, d)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        Tables.customer(s, d).select(col("c_custkey"))
          .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
          .select(coalesce(col("n"), lit(0L)).as("c_count"))
          .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
         |FROM (
         |  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
         |  FROM customer c
         |  LEFT OUTER JOIN orders o
         |    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
         |  GROUP BY 1) t
         |GROUP BY c_count
         |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // TPC-H Q17's correlated-scalar-subquery shape (no p_container in the
    // fixture, so the part class is a brand set; the 0.2 factor and the
    // /7.0 "avg yearly" output are Q17's). The correlated
    // `avg(l_quantity) WHERE l2.l_partkey = p_partkey` decorrelates into a
    // per-part aggregate JOINED BACK — both relations already restricted
    // to the brand's parts by the same semi-filtering join, so the
    // partkey-keyed avg relation is small (parts of 3 brands) and joins
    // broadcast at fixture scale / sort-merge past it, never a per-row
    // subquery. avg routes through the DECIMAL sum / count so the 0.2*avg
    // threshold is the same bit pattern on both engines — the float
    // comparison below it is then deterministic.
    Q("q17_small_qty",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        val bParts = Tables.part(s, d)
          .filter(col("p_brand").isin("Brand#7", "Brand#11", "Brand#22"))
          .select(col("p_partkey"), col("p_brand"))
        val branded = li.join(bParts, col("l_partkey") === col("p_partkey"))
        val avgq = branded.groupBy(col("p_partkey").as("ap"))
          .agg((H.dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
        branded.join(avgq, col("l_partkey") === col("ap"))
          .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
          .groupBy(col("p_brand"))
          .agg((H.dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("p_brand"))
      },
      Some("""WITH branded AS (
         |  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice, p.p_brand
         |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         |  WHERE p.p_brand IN ('Brand#7','Brand#11','Brand#22')),
         |avgq AS (
         |  SELECT l_partkey,
         |    CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)/count(*) AS avg_qty
         |  FROM branded GROUP BY 1)
         |SELECT b.p_brand,
         |  CAST(sum(CAST(b.l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)/7.0 AS avg_yearly,
         |  CAST(count(*) AS BIGINT) AS n_lines
         |FROM branded b JOIN avgq a ON a.l_partkey = b.l_partkey
         |WHERE b.l_quantity < 0.2*a.avg_qty
         |GROUP BY 1
         |ORDER BY 1""".stripMargin)),

    // TPC-H Q22's shape: a scalar subquery threshold (global average of
    // the positive balances) + a NOT EXISTS anti-join, grouped by a
    // country code (restated on c_nationkey — the fixture has no c_phone;
    // and every fixture customer has orders, so "no orders at all" is
    // restated as "no urgent order since 1997", which is non-trivial at
    // every SF: 35 / 331 / 3,399 qualifying customers). The threshold is
    // a 1-row aggregate cross-joined in (a 1-row broadcast nested loop —
    // the query-sized BNLJ class PlanGuardSpec allows); the anti-join
    // shuffles on custkey against the FILTERED orders projection, which
    // grows with SF and therefore carries no broadcast hint.
    Q("q22_idle_balance",
      (s, d) => {
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
        val avgBal = cust.filter(col("c_acctbal") > 0.0)
          .agg((H.dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
        val urgent = Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00")))
          .select(col("o_custkey"))
        cust.join(avgBal)
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("numcust"),
            H.dsum(col("c_acctbal")).as("totacctbal"))
          .orderBy(col("c_nationkey"))
      },
      Some("""WITH ab AS (
         |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)/count(*) AS avg_bal
         |  FROM customer WHERE c_acctbal > 0.0)
         |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
         |  CAST(sum(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS totacctbal
         |FROM customer, ab
         |WHERE c_acctbal > ab.avg_bal
         |  AND NOT EXISTS (SELECT 1 FROM orders o
         |    WHERE o.o_custkey = c_custkey
         |      AND o.o_orderpriority = '1-URGENT'
         |      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')
         |GROUP BY 1
         |ORDER BY 1""".stripMargin)),

    // TPC-H Q7's shape (volume shipping between two nations): the
    // double-nation-dimension join — lineitem resolves its SUPPLIER's
    // nation and its order's CUSTOMER's nation through two aliases of
    // the same 25-row dim, with the (supp, cust) pair restricted to one
    // unordered country pair. Plan shape: both nation aliases are
    // PRE-FILTERED to the two names (partition-pruning the pair space)
    // and broadcast; the pair disjunction rides as a post-join filter on
    // 2x2 combinations; the date window reaches the lineitem scan.
    Q("q7_nation_volume",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
        val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
        val pair = Seq("NATION_13", "NATION_19")
        val n1 = Tables.nation(s, d).filter(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, d).filter(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("snk"))
          .join(broadcast(n2), col("c_nationkey") === col("cnk"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(H.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(date_part('year', l_shipdate) AS BIGINT) AS l_year,
         |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
         |  CAST(count(*) AS BIGINT) AS n_lines
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND n1.n_name IN ('NATION_13', 'NATION_19')
         |  AND n2.n_name IN ('NATION_13', 'NATION_19')
         |  AND n1.n_name <> n2.n_name
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin)),

    // TPC-H Q8's shape (national market share): per order-year, the
    // revenue share supplied by ONE nation among lines of a part type
    // sold to customers of ONE region — the conditional-sum-over-sum
    // ratio (q14's parity pattern: both sums decimal-routed, ONE double
    // division) on top of a 6-table star. Region/nation dims broadcast;
    // the p_type filter reaches the part scan.
    Q("q8_market_share",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val p = Tables.part(s, d).filter(col("p_type") === "LARGE")
          .select(col("p_partkey"))
        val ord = Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("1995-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
        val cnat = Tables.nation(s, d)
          .select(col("n_nationkey").as("cnk"), col("n_regionkey"))
        val reg = Tables.region(s, d).filter(col("r_name") === "EUROPE")
          .select(col("r_regionkey"))
        val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
        val snat = Tables.nation(s, d)
          .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
        val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        li.join(p, col("l_partkey") === col("p_partkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(cnat), col("c_nationkey") === col("cnk"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(snat), col("s_nationkey") === col("snk"))
          .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(
            (H.dsum(when(col("supp_nation") === "NATION_5", vol).otherwise(lit(0.0))) /
              H.dsum(vol)).as("mkt_share"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("o_year"))
      },
      Some("""SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS o_year,
         |  CAST(sum(CAST(CASE WHEN n2.n_name = 'NATION_5'
         |      THEN l_extendedprice*(1.0-l_discount) ELSE 0.0 END AS DECIMAL(25,6))) AS DOUBLE)
         |    / CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(25,6))) AS DOUBLE)
         |    AS mkt_share,
         |  CAST(count(*) AS BIGINT) AS n_lines
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |JOIN region ON n1.n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |WHERE p_type = 'LARGE' AND r_name = 'EUROPE'
         |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q10's shape (returned-item reporting): revenue lost to
    // returns per customer in a quarter, top 20 — a 4-table join grouped
    // on the customer identity, ordered by a computed measure with a
    // LIMIT: the classic TakeOrderedAndProject top-k (never a global
    // sort). Both engines order by the identically-computed
    // decimal-routed revenue with the custkey tie-break.
    Q("q10_returned_items",
      (s, d) => {
        val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        val ord = Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1996-04-01 00:00:00")))
          .select(col("o_orderkey"), col("o_custkey"))
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))
        val nat = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
          .agg(H.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
         |  CAST(count(*) AS BIGINT) AS n_lines
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // TPC-H Q12's shape (shipping-priority split): per line class, how
    // many LATE lines belonged to critical- vs normal-priority orders —
    // the two-conditional-counts aggregate over a date-filtered join.
    // Restated on the fixture schema: the group is l_linestatus (no
    // l_shipmode) and "late" is shipped >= 80 days after the order date
    // (no commit/receipt dates — q4's restatement, reused verbatim so
    // the two queries' lateness semantics agree).
    Q("q12_priority_class",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        val ord = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        val late = col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 80 DAYS")
        val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .filter(late)
          .groupBy(col("l_linestatus"))
          .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
          .orderBy(col("l_linestatus"))
      },
      Some("""SELECT l_linestatus,
         |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
         |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_shipdate >= o_orderdate + INTERVAL 80 DAY
         |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q11's shape (important stock): per-part supply value from
    // ONE nation's suppliers, kept only where it exceeds a SCALAR
    // threshold computed from the whole filtered relation — the
    // HAVING-above-global-subquery structure. The fixture has no
    // partsupp, so supply value is restated as the decimal sum of
    // l_extendedprice over the nation's lines, and the threshold is
    // scale-free (2x the mean part value) instead of Q11's SF-dependent
    // fraction — at any corpus size the query keeps the
    // above-twice-average parts. The threshold is a 1-row aggregate
    // cross-joined in (the q22 class); everything else is one keyed
    // aggregate over the filtered join.
    Q("q11_important_parts",
      (s, d) => {
        val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
        val nat = Tables.nation(s, d).filter(col("n_name") === "NATION_3")
          .select(col("n_nationkey"))
        val li = Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"))
        val natLines = li
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        val perPart = natLines.groupBy(col("l_partkey"))
          .agg(H.dsum(col("l_extendedprice")).as("value"),
            count(lit(1)).as("n_lines"))
        val threshold = perPart.agg(
          (H.dsum(col("value")) / count(lit(1)) * lit(2.0)).as("cut"))
        perPart.join(threshold)
          .filter(col("value") > col("cut"))
          .select(col("l_partkey"), col("value"), col("n_lines"))
          .orderBy(col("value").desc, col("l_partkey"))
      },
      Some("""WITH pp AS (
         |  SELECT l_partkey,
         |    CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS value,
         |    CAST(count(*) AS BIGINT) AS n_lines
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_3'
         |  GROUP BY 1),
         |cut AS (
         |  SELECT CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)/count(*)*2.0 AS cut
         |  FROM pp)
         |SELECT l_partkey, value, n_lines FROM pp, cut
         |WHERE value > cut
         |ORDER BY value DESC, l_partkey""".stripMargin)),

    // TPC-H Q2's shape (minimum-cost supplier): for each part in a
    // size/type slice, the supplier(s) in one region achieving the
    // MINIMUM cost — the correlated-min subquery, decorrelated the
    // standard way into a per-part min aggregate joined back on
    // (partkey, cost = min_cost). The fixture has no partsupp, so the
    // supply relation is DERIVED from lineitem (a supplier supplies the
    // parts it has shipped) with cost = min unit price observed — a raw
    // column min, so the equality join-back compares bit-identical
    // doubles on both engines. Region restriction prunes the supplier
    // side before the per-part min; output is the Q2 ordering, top 100.
    Q("q2_min_cost_supplier",
      (s, d) => {
        val p = Tables.part(s, d)
          .filter(col("p_size") === 15 && col("p_type") === "STANDARD")
          .select(col("p_partkey"), col("p_brand"))
        val nat = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"),
          col("n_regionkey"))
        val reg = Tables.region(s, d).filter(col("r_name") === "EUROPE")
          .select(col("r_regionkey"))
        val sup = Tables.supplier(s, d)
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
        val supply = Tables.lineitem(s, d)
          .join(p, col("l_partkey") === col("p_partkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("p_partkey"), col("p_brand"), col("s_suppkey"),
            col("s_name"), col("s_acctbal"), col("n_name"))
          .agg(min(col("l_extendedprice")).as("cost"))
        val minCost = supply.groupBy(col("p_partkey").as("mk"))
          .agg(min(col("cost")).as("min_cost"))
        supply.join(minCost,
            col("p_partkey") === col("mk") && col("cost") === col("min_cost"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_brand"), col("cost"))
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
          .limit(100)
      },
      Some("""WITH supply AS (
         |  SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name,
         |    min(l_extendedprice) AS cost
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
         |  GROUP BY 1, 2, 3, 4, 5, 6),
         |mc AS (SELECT p_partkey AS mk, min(cost) AS min_cost FROM supply GROUP BY 1)
         |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, cost
         |FROM supply JOIN mc ON p_partkey = mk AND cost = min_cost
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin)),

    // TPC-H Q20's shape (excess-stock suppliers): suppliers of one
    // nation who DOMINATE the supply of some part of a type slice — a
    // semi-join chain whose inner condition compares a (part, supplier)
    // aggregate against a correlated per-part aggregate. Restated
    // without partsupp: 1996 shipped quantity per (part, supplier)
    // exceeding HALF the part's total 1996 quantity (the
    // dominant-supplier criterion — scale-free, unlike an absolute
    // availqty cut). Quantities are integer-valued; both engines sum
    // them as BIGINTs, so the 2x comparison is exact integer math.
    // The qualifying suppkey set semi-joins into the nation's suppliers.
    Q("q20_dominant_suppliers",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        val p = Tables.part(s, d).filter(col("p_type") === "SMALL")
          .select(col("p_partkey"))
        val typed = li.join(p, col("l_partkey") === col("p_partkey"))
          .select(col("l_partkey"), col("l_suppkey"),
            col("l_quantity").cast("long").as("qty"))
        val perPair = typed.groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("qty")).as("pair_qty"))
        val perPart = typed.groupBy(col("l_partkey").as("pk"))
          .agg(sum(col("qty")).as("part_qty"))
        val dominant = perPair.join(perPart, col("l_partkey") === col("pk"))
          .filter(col("pair_qty") * 2 > col("part_qty"))
          .select(col("l_suppkey")).distinct()
        val nat = Tables.nation(s, d).filter(col("n_name") === "NATION_3")
          .select(col("n_nationkey"))
        Tables.supplier(s, d)
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
          .orderBy(col("s_suppkey"))
      },
      Some("""WITH typed AS (
         |  SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS qty
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_type = 'SMALL'
         |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'),
         |pair AS (SELECT l_partkey, l_suppkey, CAST(sum(qty) AS BIGINT) AS pair_qty
         |  FROM typed GROUP BY 1, 2),
         |part_tot AS (SELECT l_partkey AS pk, CAST(sum(qty) AS BIGINT) AS part_qty
         |  FROM typed GROUP BY 1),
         |dom AS (SELECT DISTINCT l_suppkey FROM pair JOIN part_tot ON l_partkey = pk
         |  WHERE pair_qty * 2 > part_qty)
         |SELECT s_suppkey, s_name, s_acctbal
         |FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE n_name = 'NATION_3'
         |  AND EXISTS (SELECT 1 FROM dom WHERE dom.l_suppkey = s_suppkey)
         |ORDER BY s_suppkey""".stripMargin)),

    // TPC-H Q4's shape: orders (in a half-year window) having AT LEAST
    // ONE late line, counted by priority. The fixture carries no
    // commit/receipt dates, so "late" is restated as shipped >= 80 days
    // after the order date — which makes the EXISTS a semi-join whose
    // residual condition references BOTH tables (l_shipdate >=
    // o_orderdate + 80 days): the orderkey equality still drives the
    // key-partitioned semi, and the cross-table date inequality rides
    // along as the join residual. The date window reaches the orders
    // scan as pushed filters; the count groups on the 5-value priority
    // domain.
    Q("q4_priority_wait",
      (s, d) => {
        val ord = Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1996-07-01 00:00:00")))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
            col("o_orderdate"))
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_shipdate"))
        ord.join(li,
            col("o_orderkey") === col("l_orderkey") &&
              col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 80 DAYS"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
         |FROM orders o
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
         |  AND EXISTS (
         |    SELECT 1 FROM lineitem l
         |    WHERE l.l_orderkey = o.o_orderkey
         |      AND l.l_shipdate >= o.o_orderdate + INTERVAL 80 DAY)
         |GROUP BY 1
         |ORDER BY 1""".stripMargin)),

    // TPC-H Q6, verbatim shape (the forecasting-revenue-change query):
    // the pure filter-aggregate baseline of the suite — every predicate
    // (date year, discount band, quantity cap) reaches the ONE scan as
    // pushed filters, and the whole query is a single partial-aggregated
    // decimal sum. The simplest classic, kept as the family's floor: if
    // this plan ever grows an exchange beyond the 1-row final aggregate,
    // something upstream broke.
    Q("q6_forecast",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(H.dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n_lines")),
      Some("""SELECT
         |  CAST(sum(CAST(l_extendedprice*l_discount AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
         |  CAST(count(*) AS BIGINT) AS n_lines
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin)),

    // TPC-H Q14's conditional-aggregation share: one month of lineitem
    // joined to part, promo revenue as a CASE inside the sum, expressed
    // as a share of total revenue. Both sums route through DECIMAL so the
    // final division is one double op on exact operands — bit-equal on
    // both engines. Scale shape: the date filter reaches the lineitem
    // scan (PushedFilters), part joins on partkey (sort-merge past
    // fixture scale; no hint — part grows with SF), and the two sums are
    // ONE partial aggregate, not two scans.
    Q("q14_promo_share",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= to_timestamp(lit("1995-09-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1995-10-01 00:00:00")))
        val p = Tables.part(s, d).select(col("p_partkey"), col("p_type"))
        val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        li.join(p, col("l_partkey") === col("p_partkey"))
          .agg(
            (lit(100.0) * H.dsum(when(col("p_type") === "PROMO", disc)
              .otherwise(lit(0.0))) / H.dsum(disc)).as("promo_share"),
            count(lit(1)).as("n_lines"))
      },
      Some("""SELECT
         |  100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
         |      THEN l_extendedprice*(1.0-l_discount) ELSE 0.0 END AS DECIMAL(25,6))) AS DOUBLE)
         |    / CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(25,6))) AS DOUBLE)
         |    AS promo_share,
         |  CAST(count(*) AS BIGINT) AS n_lines
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'""".stripMargin)),

    // TPC-H Q15's argmax-over-aggregated-view shape: quarterly revenue
    // per supplier, then the supplier(s) achieving the MAXIMUM. The max
    // is a 1-ROW aggregate cross-joined back (broadcast nested loop over
    // one row) — NOT an unpartitioned window over the supplier relation,
    // which would single-partition a corpus that grows with SF. Equality
    // against the max is exact: both sides are the same decimal-routed
    // sum, so the double bit patterns match or don't, identically on
    // both engines (ties all surface, like Q15's spec requires).
    Q("q15_top_supplier",
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")))
          .groupBy(col("l_suppkey"))
          .agg(H.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("total_revenue"))
        val mx = rev.agg(max(col("total_revenue")).as("max_revenue"))
        val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))
        rev.join(mx).filter(col("total_revenue") === col("max_revenue"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
          .orderBy(col("s_suppkey"))
      },
      Some("""WITH rev AS (
         |  SELECT l_suppkey,
         |    CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(25,6))) AS DOUBLE)
         |      AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY 1)
         |SELECT s.s_suppkey, s.s_name, r.total_revenue
         |FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
         |WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
         |ORDER BY s.s_suppkey""".stripMargin)),

    // TPC-H Q16's distinct-count-with-exclusion shape. The fixture has no
    // partsupp table, so the part-supplier relation is the DISTINCT
    // (l_partkey, l_suppkey) projection of lineitem (what partsupp
    // records); the excluded supplier class ("customer complaints" in the
    // original) is restated as negative account balance. Scale shape: the
    // excluded-supplier relation is filter-pruned and joins as a
    // left_anti on suppkey; the pair-distinct and the per-attribute
    // countDistinct are partial aggregates on bounded attribute combos
    // (brand x type x size — vocabulary-sized at any SF).
    Q("q16_supplier_cnt",
      (s, d) => {
        val pairs = Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_suppkey")).distinct()
        val badSup = Tables.supplier(s, d)
          .filter(col("s_acctbal") < 0.0).select(col("s_suppkey"))
        val p = Tables.part(s, d)
          .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
          .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
        pairs.join(badSup, col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(p, col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
            col("p_size"))
      },
      Some("""SELECT p.p_brand, p.p_type, p.p_size,
         |  CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
         |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
         |JOIN part p ON p.p_partkey = ps.l_partkey
         |WHERE p.p_brand <> 'Brand#13' AND p.p_type <> 'PROMO'
         |  AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
         |  AND ps.l_suppkey NOT IN (
         |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
         |GROUP BY 1, 2, 3
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    // TPC-H Q19's disjunctive-predicate join: revenue over an OR of three
    // (brand, size-range, quantity-range) conjunctions (the original's
    // container/shipmode legs restated on the fixture's columns). The
    // interesting plan property is what Catalyst does with the
    // disjunction (verified via ExplainOne): each side's PROJECTION of
    // the OR is pushed to its scan — lineitem gets the quantity-range
    // OR, part gets the brand/size OR plus the factored p_size >= 1 —
    // both all the way into PushedFilters, while the join stays a
    // partkey equi-join with the full cross-side OR as its residual
    // condition. Never a nested-loop over the disjunction.
    Q("q19_disjunctive",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount"))
        val p = Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"), col("p_size"))
        val legs =
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#24" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30))
        li.join(p, col("l_partkey") === col("p_partkey") && legs)
          .agg(H.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some("""SELECT
         |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
         |  CAST(count(*) AS BIGINT) AS n_lines
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    Q("q9_profit",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val part = Tables.part(s, d)
          .filter(col("p_name").contains("red"))
          .select(col("p_partkey"))
        val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"))
        val nat = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
        li.join(part, col("l_partkey") === col("p_partkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(H.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("profit"),
            count(lit(1)).as("n_items"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some("""SELECT n_name AS nation,
         |  CAST(date_part('year', o_orderdate) AS BIGINT) AS o_year,
         |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS profit,
         |  CAST(count(*) AS BIGINT) AS n_items
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%red%'
         |GROUP BY 1, 2
         |ORDER BY 1, 2 DESC""".stripMargin)),

    // Skew-mitigated join: the salting pattern, verified oracle-exact.
    // The big (probe) side adds a deterministic salt; the small (build)
    // side is replicated across all salt values; the join key becomes
    // (key, salt) so one hot key spreads over SALT partitions. The result
    // is identical to the plain join — which is exactly what the DuckDB
    // oracle states. The shuffle_hash hint pins the SHUFFLED join the
    // pattern exists for: without it AQE broadcasts the replicated orders
    // side at bench SF (ShuffleAudit measured an 80 MB broadcast), which
    // silently turns the salting demo into a broadcast join — the one
    // strategy salting is irrelevant to.
    Q("q_skew_salted_join",
      (s, d) => {
        val SALT = 4
        val li = Tables.lineitem(s, d)
          .withColumn("salt", (col("l_linenumber") % SALT).cast("int"))
        val ord = Tables.orders(s, d)
          .withColumn("salt", explode(sequence(lit(0), lit(SALT - 1))))
          .withColumn("salt", col("salt").cast("int"))
          .hint("shuffle_hash")
        li.join(ord, col("l_orderkey") === col("o_orderkey") && li("salt") === ord("salt"))
          .groupBy(col("o_orderpriority"))
          .agg(H.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
         |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
         |  CAST(count(*) AS BIGINT) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin)),

    // AQE skew-join companion to q_skew_salted_join — the PRODUCTION-
    // default lever next to the manual one. Same join, same oracle, but
    // no salting: the shuffle_merge hint pins the sort-merge regime
    // (AQE's OptimizeSkewedJoin target; at fixture scale size-based
    // planning would otherwise broadcast orders and there would be
    // nothing to split), and spark.sql.adaptive.skewJoin (enabled by
    // default) splits any shuffle partition exceeding
    // max(skewedPartitionThresholdInBytes, factor x median) into
    // mapper-range chunks AT RUNTIME, replicating the matching build
    // rows — salting's spread, derived from measured sizes instead of a
    // hand-picked SALT constant. Nothing fires at fixture scale (no
    // partition nears the 256 MB default, which is the honest production
    // story: AQE splits only when skew is real); PlanGuardSpec forces the
    // split with lowered thresholds and asserts isSkewJoin + hash
    // equality with the salted variant. When to prefer which: AQE for
    // runtime-detected skew on sort-merge/shuffled-hash joins (zero query
    // rewrite); salting when the engine can't re-plan (a skewed
    // AGGREGATION key, or a join AQE must keep whole for a downstream
    // partitioning contract).
    Q("q_skew_aqe",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val ord = Tables.orders(s, d).hint("shuffle_merge")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(H.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
         |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
         |  CAST(count(*) AS BIGINT) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin)),

    // Tumbling 1-hour event-time windows (the batch twin of
    // streaming.EventsStream.windowedAgg).
    Q("q_events_hourly",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), H.dsum(col("value")).as("sum_value"))
        .select(unix_micros(col("w.start")).as("w_start_us"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("w_start_us"), col("event_type")),
      Some("""SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS w_start_us,
         |  event_type, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
         |FROM events
         |GROUP BY w_start_us, event_type
         |ORDER BY w_start_us, event_type""".stripMargin)),

    // Anomaly detection over event streams: per-user hourly activity
    // z-scored against that user's own mean/std, top-20 most anomalous
    // (user, hour) cells. All moments stay in exact BIGINT (the variance
    // numerator cnt*sum_n2 - sum_n^2 is integer arithmetic) with one
    // double division + sqrt at the end, so the score is bit-identical
    // across engines. Shape: two keyed aggregates (user-hour, then user)
    // + a broadcast-size stats join back + TakeOrderedAndProject.
    // Hopping (overlapping) event-time windows — peak detection: 4-hour
    // windows sliding hourly, so a traffic burst is never split by a
    // bucket boundary the way q_events_hourly's tumbling windows split
    // it. Spark's window(ts, 4h, 1h) assigns each event to its 4
    // covering windows (a narrow 4x row expansion — the standard cost of
    // hop overlap); ONE groupBy shuffle on the window start, then
    // TakeOrderedAndProject for the 20 busiest windows. The oracle
    // reconstructs the same slide-aligned assignment with an explicit
    // k=0..3 unnest.
    Q("q_hopping_windows",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "4 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("n"), H.dsum(col("value")).as("sum_value"))
        .select(unix_micros(col("w.start")).as("w_start_us"),
          col("n"), col("sum_value"))
        .orderBy(col("n").desc, col("w_start_us"))
        .limit(20),
      Some("""WITH e AS (
         |  SELECT unnest(generate_series(0, 3)) AS k, ts, value FROM events),
         |w AS (
         |  SELECT CAST(epoch_us(date_trunc('hour', ts) - k * INTERVAL 1 HOUR)
         |    AS BIGINT) AS w_start_us, value
         |  FROM e)
         |SELECT w_start_us, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
         |FROM w GROUP BY w_start_us
         |ORDER BY n DESC, w_start_us LIMIT 20""".stripMargin)),

    // Event-transition matrix — first-order Markov statistics over each
    // user's event sequence: P(next event type | current). One user-key
    // window (bounded per-user partitions) pairs each event with its
    // successor; the (from, to) count matrix is event-type-vocabulary
    // sized, so the normalizing per-from window runs over a BOUNDED
    // relation (contrast the banned partitionless doc-level windows).
    // Counts are BIGINT-exact; the one division is double-by-double.
    Q("q_transition_matrix",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val m = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("nxt", lead(col("event_type"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("nxt").as("to_type"))
          .agg(count(lit(1)).as("n"))
        m.select(col("from_type"), col("to_type"), col("n"),
            (col("n").cast("double") /
              sum(col("n")).over(Window.partitionBy(col("from_type")))
                .cast("double")).as("p"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH s AS (
         |  SELECT event_type,
         |    lead(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS nxt
         |  FROM events),
         |m AS (
         |  SELECT event_type AS from_type, nxt AS to_type,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM s WHERE nxt IS NOT NULL GROUP BY from_type, nxt)
         |SELECT from_type, to_type, n,
         |  CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type)
         |    AS DOUBLE) AS p
         |FROM m ORDER BY from_type, to_type""".stripMargin)),

    Q("q_anomaly_hours",
      (s, d) => {
        val hourly = Tables.events(s, d)
          .groupBy(col("user_id"),
            unix_micros(date_trunc("hour", col("ts"))).as("h_us"))
          .agg(count(lit(1)).as("n"))
        val stats = hourly.groupBy(col("user_id"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("n")).as("sum_n"),
            sum(col("n") * col("n")).as("sum_n2"))
          .filter(col("cnt") >= 2)
        hourly.join(stats, "user_id")
          .withColumn("mean", col("sum_n").cast("double") / col("cnt").cast("double"))
          .withColumn("varr",
            (col("cnt") * col("sum_n2") - col("sum_n") * col("sum_n")).cast("double") /
              (col("cnt") * col("cnt")).cast("double"))
          .filter(col("varr") > 0.0)
          .withColumn("z", (col("n").cast("double") - col("mean")) / sqrt(col("varr")))
          .select(col("user_id"), col("h_us"), col("n"), col("z"))
          .orderBy(col("z").desc, col("user_id"), col("h_us"))
          .limit(20)
      },
      Some("""WITH hourly AS (
         |  SELECT user_id, CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS h_us,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM events GROUP BY user_id, h_us),
         |stats AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt,
         |    CAST(sum(n) AS BIGINT) AS sum_n,
         |    CAST(sum(n*n) AS BIGINT) AS sum_n2
         |  FROM hourly GROUP BY user_id HAVING count(*) >= 2),
         |scored AS (
         |  SELECT h.user_id, h.h_us, h.n,
         |    (CAST(h.n AS DOUBLE) - CAST(sum_n AS DOUBLE)/CAST(cnt AS DOUBLE))
         |      / sqrt(CAST(cnt*sum_n2 - sum_n*sum_n AS DOUBLE)/CAST(cnt*cnt AS DOUBLE)) AS z
         |  FROM hourly h JOIN stats s ON h.user_id = s.user_id
         |  WHERE CAST(cnt*sum_n2 - sum_n*sum_n AS DOUBLE)/CAST(cnt*cnt AS DOUBLE) > 0.0)
         |SELECT user_id, h_us, n, z FROM scored
         |ORDER BY z DESC, user_id, h_us LIMIT 20""".stripMargin)),

    // JSON-typed event properties: from_json + grouped rollup.
    Q("q_events_json",
      (s, d) => Tables.events(s, d)
        .select(col("event_type"), col("value"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          H.dsum(col("value")).as("sum_value"),
          (sum(col("k")).cast("double") / count(lit(1))).as("avg_k"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value,
         |  CAST(CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS DOUBLE)/count(*) AS DOUBLE) AS avg_k
         |FROM events
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin)),

    // Sessionization: 30-minute-gap sessions per user via lag() + running flags.
    Q("q_events_sessions",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            lag(col("ts"), 1).over(w).as("pts"))
          .select(col("user_id"),
            when(col("pts").isNull ||
              (unix_timestamp(col("ts")) - unix_timestamp(col("pts"))) > 1800, 1)
              .otherwise(0).as("new_s"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("new_s")).cast("long").as("n_sessions"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (
         |  SELECT user_id, ts, event_id,
         |    lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
         |  FROM events),
         |m AS (
         |  SELECT user_id,
         |    CASE WHEN pts IS NULL OR date_diff('second', pts, ts) > 1800 THEN 1 ELSE 0 END AS new_s
         |  FROM e)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(new_s) AS BIGINT) AS n_sessions
         |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin),
      headline = true),

    // Snapshot reconciliation (table diff): classify every key across two
    // snapshot versions as inserted / deleted / updated / unchanged — the
    // audit operator behind backfill validation and replication checks
    // (the read-side companion to q_merge_upsert / q_cdc_compact, which
    // APPLY changes; this one DETECTS them). The "new" snapshot is derived
    // deterministically from orders via md5 buckets — 5% deleted, 10%
    // updated (+1 dollar on the cents grid), deletions re-keyed past the
    // key domain as inserts — so both engines construct the identical
    // pair of versions. Values ride the cents grid (floor(price*100),
    // the q_ab_test precedent) so "updated" detection is exact BIGINT
    // equality, never a double compare.
    //
    // Scale shape: ONE full-outer key-partitioned join of the two
    // snapshots (the unavoidable diff shuffle), a narrow codegen'd CASE
    // classify, and a 4-row aggregate. At 100 TB both sides prune to
    // changed partitions first when snapshots are partition-versioned;
    // the join is the worst-case full-diff cost.
    Q("q_table_diff",
      (s, d) => {
        val snap = Tables.orders(s, d).select(
          col("o_orderkey").as("key"),
          floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"),
          col("o_orderstatus").as("status"),
          col("o_orderpriority").as("prio"))
        val base = snap.withColumn("h",
          graft.functions.TextOps.md5Prefix60(
            concat(lit("diff:"), col("key").cast("string"))) % 100)
        val kept = base.filter(col("h") >= 5)
          .select(col("key"),
            when(col("h") < 15, col("cents") + 100).otherwise(col("cents"))
              .as("cents"),
            col("status"), col("prio"))
        val inserted = base.filter(col("h") < 5)
          .select((col("key") + lit(10000000000L)).as("key"),
            col("cents"), col("status"), col("prio"))
        val newSnap = kept.union(inserted)
        snap.select(col("key"), col("cents").as("oc"),
            col("status").as("os"), col("prio").as("op"))
          .join(newSnap.select(col("key"), col("cents").as("nc"),
            col("status").as("ns"), col("prio").as("np")),
            Seq("key"), "full_outer")
          .select(col("key"),
            when(col("oc").isNull, lit("inserted"))
              .when(col("nc").isNull, lit("deleted"))
              .when(col("oc") === col("nc") && col("os") === col("ns") &&
                col("op") === col("np"), lit("unchanged"))
              .otherwise(lit("updated")).as("diff_class"))
          .groupBy(col("diff_class"))
          .agg(count(lit(1)).as("n"), sum(col("key")).as("key_checksum"))
          .orderBy(col("diff_class"))
      },
      Some {
        val h = graft.OracleSql.hexToLong(
          "md5('diff:' || CAST(key AS VARCHAR))", 1, 15) + " % 100"
        s"""WITH snap AS (
           |  SELECT o_orderkey AS key,
           |    CAST(floor(o_totalprice * 100.0) AS BIGINT) AS cents,
           |    o_orderstatus AS status, o_orderpriority AS prio
           |  FROM orders),
           |base AS (SELECT *, $h AS h FROM snap),
           |news AS (
           |  SELECT key,
           |    CASE WHEN h < 15 THEN cents + 100 ELSE cents END AS cents,
           |    status, prio
           |  FROM base WHERE h >= 5
           |  UNION ALL
           |  SELECT key + 10000000000, cents, status, prio
           |  FROM base WHERE h < 5),
           |diff AS (
           |  SELECT coalesce(o.key, n.key) AS key,
           |    CASE WHEN o.key IS NULL THEN 'inserted'
           |         WHEN n.key IS NULL THEN 'deleted'
           |         WHEN o.cents = n.cents AND o.status = n.status
           |           AND o.prio = n.prio THEN 'unchanged'
           |         ELSE 'updated' END AS diff_class
           |  FROM snap o FULL OUTER JOIN news n ON o.key = n.key)
           |SELECT diff_class, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(key) AS BIGINT) AS key_checksum
           |FROM diff GROUP BY diff_class ORDER BY diff_class""".stripMargin
      })
  )
}
