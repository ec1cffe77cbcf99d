package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recommendation-mining operators over the market-basket graph — the
  * item-to-item layer on top of the motif (q_triangles), connectivity
  * (q_communities / q_kcore) and rule (q_assoc_rules) families:
  *
  *  - q_item_cf: item-item collaborative filtering (the Amazon
  *    item-to-item scheme, Linden et al. 2003): cosine similarity of the
  *    binary item-basket incidence vectors, computed from pure counts —
  *    cooc / sqrt(cnt_a * cnt_b) — so the only double math is ONE
  *    identically-ordered division both engines replay bitwise.
  *  - q_link_predict: link prediction by the Resource-Allocation index
  *    (Zhou et al. 2009): for non-adjacent pairs at distance 2, score =
  *    sum over common neighbors z of 1/deg(z). RA is chosen over
  *    Adamic-Adar deliberately: 1/deg is a RATIONAL weight, so the score
  *    ships as the exact BIGINT sum of `1e12 div deg(z)` — integer
  *    division both engines define identically — where AA's 1/ln(deg)
  *    would ride on a transcendental whose final-ulp may differ.
  *  - q_bfs: multi-source breadth-first search (3 unrolled rounds) from
  *    the 5 highest-degree hubs — the reachability/frontier primitive
  *    under "how much of the catalog is within k hops of the heads".
  *    Seeds are top-degree rather than a degree threshold because the
  *    support>=2 graph DENSIFIES as SF shrinks (probed: deg>=3 selects
  *    ALL 200 nodes at sf0.001 but only 145 of 5,922 at sf0.1 — a
  *    threshold seed set degenerates at one end or the other).
  *
  * All three run on the Apriori support>=2 co-purchase graph (the
  * q_kcore edge filter): part pairs co-bought in >= 2 distinct orders.
  * That threshold is what keeps the wedge/candidate volume bounded as
  * the basket graph grows — single-co-occurrence noise edges dominate
  * the raw graph at scale (probed: 3,573 support edges vs ~500k raw
  * pairs at sf0.1).
  *
  * 100 TB shape (all three): per-basket pair expansion is bounded by
  * basket size (C(n,2) with n ~ 4-7 lineitems), so the pair generation
  * is a key-partitioned self-join on l_orderkey — never a global
  * product; wedges/frontiers are node-keyed equi-joins on the SUPPORT
  * graph (orders of magnitude smaller than the corpus); outputs are
  * bounded top-k (TakeOrderedAndProject) or per-round 1-row aggregates.
  */
object RecoQueries {

  /** Distinct (order, part) incidence — the binary basket matrix. */
  private def incidence(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()

  /** Support>=2 undirected co-purchase edges (a < b) — q_kcore's graph. */
  private def supportEdges(s: SparkSession, d: String): DataFrame = {
    val li = incidence(s, d)
    li.select(col("l_orderkey"), col("l_partkey").as("a"))
      .join(li.select(col("l_orderkey"), col("l_partkey").as("b")),
        "l_orderkey")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
      .select(col("a"), col("b"))
  }

  /** The shared oracle CTE prefix: li / und (support>=2) / edges / deg. */
  private val graphCte: String =
    """li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |und AS (
      |  SELECT a.l_partkey AS a, b.l_partkey AS b
      |  FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |edges AS (SELECT a AS src, b AS dst FROM und
      |  UNION ALL SELECT b, a FROM und),
      |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
      |  FROM edges GROUP BY src)""".stripMargin

  val all: Seq[Q] = Seq(

    // Item-item CF: cosine over binary basket incidence. cooc and the
    // per-item basket counts are exact BIGINTs; the similarity is ONE
    // double division / sqrt in identical op order => bitwise parity.
    // Support cut cooc >= 2 bounds the pair relation (same argument as
    // the graph queries); top-50 ships as TakeOrderedAndProject.
    Q("q_item_cf",
      (s, d) => {
        val li = incidence(s, d)
        val cnt = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
        val pairs = li.select(col("l_orderkey"), col("l_partkey").as("item_a"))
          .join(li.select(col("l_orderkey"), col("l_partkey").as("item_b")),
            "l_orderkey")
          .filter(col("item_a") < col("item_b"))
          .groupBy(col("item_a"), col("item_b")).agg(count(lit(1)).as("cooc"))
          .filter(col("cooc") >= 2)
        pairs
          .join(cnt.select(col("l_partkey").as("item_a"), col("c").as("ca")),
            "item_a")
          .join(cnt.select(col("l_partkey").as("item_b"), col("c").as("cb")),
            "item_b")
          .select(col("item_a"), col("item_b"), col("cooc"),
            (col("cooc").cast("double") /
              sqrt((col("ca") * col("cb")).cast("double"))).as("score"))
          .orderBy(col("score").desc, col("item_a"), col("item_b"))
          .limit(50)
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |cnt AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
         |  FROM li GROUP BY 1),
         |pairs AS (
         |  SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
         |    CAST(count(*) AS BIGINT) AS cooc
         |  FROM li a JOIN li b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= 2)
         |SELECT item_a, item_b, cooc,
         |  CAST(cooc AS DOUBLE) / sqrt(CAST(ca.c * cb.c AS DOUBLE)) AS score
         |FROM pairs
         |JOIN cnt ca ON item_a = ca.l_partkey
         |JOIN cnt cb ON item_b = cb.l_partkey
         |ORDER BY score DESC, item_a, item_b LIMIT 50""".stripMargin)),

    // Link prediction: Resource-Allocation index over distance-2
    // non-adjacent pairs. Wedge enumeration is the triangle machinery
    // (node-keyed equi-join on the support graph); adjacency exclusion
    // is a left_anti on the canonical edge set; the score is an exact
    // integer sum (1e12 div deg — see object scaladoc).
    Q("q_link_predict",
      (s, d) => {
        val und = supportEdges(s, d).localCheckpoint(true)
        val edges = und.select(col("a").as("src"), col("b").as("dst"))
          .union(und.select(col("b").as("src"), col("a").as("dst")))
        val deg = edges.groupBy(col("src").as("z"))
          .agg(count(lit(1)).as("deg"))
        val wedges = edges.select(col("src").as("z"), col("dst").as("u"))
          .join(edges.select(col("src").as("z"), col("dst").as("w")), "z")
          .filter(col("u") < col("w"))
        wedges
          .join(und.select(col("a").as("u"), col("b").as("w")),
            Seq("u", "w"), "left_anti")
          .join(deg, "z")
          .groupBy(col("u").as("item_a"), col("w").as("item_b"))
          .agg(count(lit(1)).as("n_common"),
            sum(expr("1000000000000 div deg")).as("ra_score"))
          .orderBy(col("ra_score").desc, col("item_a"), col("item_b"))
          .limit(30)
      },
      Some(s"""WITH $graphCte,
         |wedges AS (
         |  SELECT e1.src AS z, e1.dst AS u, e2.dst AS w
         |  FROM edges e1 JOIN edges e2
         |    ON e1.src = e2.src AND e1.dst < e2.dst),
         |cand AS (
         |  SELECT u, w, z FROM wedges
         |  WHERE NOT EXISTS (SELECT 1 FROM und WHERE a = u AND b = w))
         |SELECT u AS item_a, w AS item_b,
         |  CAST(count(*) AS BIGINT) AS n_common,
         |  CAST(sum(1000000000000 // deg) AS BIGINT) AS ra_score
         |FROM cand JOIN deg ON z = node
         |GROUP BY u, w
         |ORDER BY ra_score DESC, item_a, item_b LIMIT 30""".stripMargin)),

    // Degree assortativity (Newman 2002): the Pearson correlation of
    // endpoint degrees over the directed edge list — one scalar that
    // says whether hubs attach to hubs (social-graph-like, r > 0) or to
    // leaves (technological/dissortative, r < 0); it decides whether
    // hub-targeted sampling or skew salting will pay on this graph.
    // Exactness: degrees on the support graph are small integers, so
    // every moment (sum xy, sum x, sum x^2 over 2m directed edges) is an
    // exact BIGINT comfortably under 2^53 — the doubles that follow
    // convert exactly and the remaining sqrt/division are identical IEEE
    // scalar ops, no scaling tricks needed (probed: max degree 51 at
    // sf0.001, 6 at sf0.1; the support graph SPARSIFIES with SF). Scale
    // shape: two node-keyed joins to attach degrees + ONE 1-row moment
    // aggregate.
    Q("q_assortativity",
      (s, d) => {
        val und = supportEdges(s, d)
        val edges = und.select(col("a").as("src"), col("b").as("dst"))
          .union(und.select(col("b").as("src"), col("a").as("dst")))
        val deg = edges.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("deg"))
        edges
          .join(deg.select(col("node").as("src"), col("deg").as("x")), "src")
          .join(deg.select(col("node").as("dst"), col("deg").as("y")), "dst")
          .agg(count(lit(1)).as("m"), sum(col("x") * col("y")).as("sxy"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("m").as("n_directed_edges"),
            (((col("m") * col("sxy") - col("sx") * col("sy")).cast("double")) /
              (sqrt((col("m") * col("sxx") - col("sx") * col("sx"))
                .cast("double")) *
                sqrt((col("m") * col("syy") - col("sy") * col("sy"))
                  .cast("double")))).as("r"))
      },
      Some(s"""WITH $graphCte,
         |ed AS (
         |  SELECT da.deg AS x, db.deg AS y
         |  FROM edges e
         |  JOIN deg da ON e.src = da.node
         |  JOIN deg db ON e.dst = db.node),
         |mo AS (
         |  SELECT CAST(count(*) AS BIGINT) AS m,
         |    CAST(sum(x*y) AS BIGINT) AS sxy,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x*x) AS BIGINT) AS sxx,
         |    CAST(sum(y*y) AS BIGINT) AS syy
         |  FROM ed)
         |SELECT m AS n_directed_edges,
         |  CAST(m*sxy - sx*sy AS DOUBLE) /
         |    (sqrt(CAST(m*sxx - sx*sx AS DOUBLE)) *
         |     sqrt(CAST(m*syy - sy*sy AS DOUBLE))) AS r
         |FROM mo""".stripMargin)),

    // Multi-source BFS, 3 unrolled rounds from the 5 top-degree hubs.
    // Each round is one semi-join (expand) + one anti-join (de-visit) +
    // a distinct — all node-keyed; per-round output is a 1-row aggregate
    // (count + id checksum), so 4 rows total at any SF. Frontiers are
    // localCheckpointed per round (the GraphOps contract: at 1000
    // executors this is a reliable checkpoint).
    Q("q_bfs",
      (s, d) => {
        val und = supportEdges(s, d).localCheckpoint(true)
        val edges = und.select(col("a").as("src"), col("b").as("dst"))
          .union(und.select(col("b").as("src"), col("a").as("dst")))
        val deg = edges.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("deg"))
        var frontier = deg.orderBy(col("deg").desc, col("node")).limit(5)
          .select(col("node")).localCheckpoint(true)
        var visited = frontier
        def stats(dist: Int, f: DataFrame): DataFrame =
          f.agg(count(lit(1)).as("n_nodes"), sum(col("node")).as("sum_nodes"))
            .select(lit(dist.toLong).as("dist"), col("n_nodes"),
              col("sum_nodes"))
        val rounds = Seq.newBuilder[DataFrame]
        rounds += stats(0, frontier)
        for (dist <- 1 to 3) {
          frontier = edges
            .join(frontier.select(col("node").as("src")), Seq("src"),
              "left_semi")
            .select(col("dst").as("node")).distinct()
            .join(visited, Seq("node"), "left_anti")
            .localCheckpoint(true)
          visited = visited.union(frontier).localCheckpoint(true)
          rounds += stats(dist, frontier)
        }
        rounds.result().reduce(_ union _).orderBy(col("dist"))
      },
      Some {
        val exclude = (r: Int) => (0 until r)
          .map(p => s"node NOT IN (SELECT node FROM d$p)").mkString(" AND ")
        val frontiers = (1 to 3).map { r =>
          s"""d$r AS (
             |  SELECT node FROM (
             |    SELECT DISTINCT e.dst AS node FROM edges e
             |    WHERE e.src IN (SELECT node FROM d${r - 1}))
             |  WHERE ${exclude(r)})"""
        }.mkString(",\n")
        val sel = (0 to 3).map { r =>
          s"""SELECT CAST($r AS BIGINT) AS dist,
             |  CAST(count(*) AS BIGINT) AS n_nodes,
             |  CAST(sum(node) AS BIGINT) AS sum_nodes FROM d$r"""
        }.mkString("\nUNION ALL ")
        s"""WITH $graphCte,
           |d0 AS (SELECT node FROM deg ORDER BY deg DESC, node LIMIT 5),
           |$frontiers
           |SELECT * FROM (
           |$sel) ORDER BY dist""".stripMargin
      }),

    // Landmark closeness centrality — the CENTRALITY companion to
    // q_bfs's reachability profile: how near is each top-5-degree hub
    // to the rest of the graph? Per landmark, a 4-round multi-source
    // BFS tracks (landmark, node) visitation (the q_bfs rounds with the
    // landmark riding the frontier key); bounded-horizon closeness is
    // then EXACT integers end to end: n_reached * 1e9 div sum_dist —
    // no doubles anywhere (the display column is one cast of the
    // snapped BIGINT). Exact BFS distances, not estimates: a node's
    // first visitation round IS its distance.
    // Scale shape: per-round exchanges are frontier-sized and keyed by
    // node (5 landmarks ride as payload); rounds are bounded (4);
    // per-landmark output is a 5-row aggregate. The quadratic
    // all-pairs closeness is exactly what this operator exists to
    // avoid — landmarks are the standard scale form (Brandes-style
    // sampling specializes the same plan).
    Q("q_closeness",
      (s, d) => {
        val und = supportEdges(s, d).localCheckpoint(true)
        val edges = und.select(col("a").as("src"), col("b").as("dst"))
          .union(und.select(col("b").as("src"), col("a").as("dst")))
          .localCheckpoint(true)
        val deg = edges.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("deg"))
        val lms = deg.orderBy(col("deg").desc, col("node")).limit(5)
          .select(col("node").as("lm"))
        var frontier = lms.select(col("lm"), col("lm").as("node"))
          .localCheckpoint(true)
        var visited = frontier
        val reached = Seq.newBuilder[DataFrame]
        for (dist <- 1 to 4) {
          frontier = frontier.select(col("lm"), col("node").as("src"))
            .join(edges, "src")
            .select(col("lm"), col("dst").as("node")).distinct()
            .join(visited, Seq("lm", "node"), "left_anti")
            .localCheckpoint(true)
          visited = visited.union(frontier).localCheckpoint(true)
          reached += frontier.withColumn("dist", lit(dist.toLong))
        }
        reached.result().reduce(_ union _)
          .groupBy(col("lm"))
          .agg(count(lit(1)).as("n_reached"), sum(col("dist")).as("sum_dist"))
          .join(deg.select(col("node").as("lm"), col("deg")), "lm")
          .select(col("lm"), col("deg"), col("n_reached"), col("sum_dist"),
            expr("n_reached * 1000000000 div sum_dist").as("closeness_e9"))
          .withColumn("closeness", col("closeness_e9") / lit(1e9))
          .orderBy(col("lm"))
      },
      Some {
        val priorNot = (r: Int) => (0 until r).map(p =>
          s"NOT EXISTS (SELECT 1 FROM d$p p WHERE p.lm = f.lm AND p.node = f.node)")
          .mkString(" AND ")
        val frontiers = (1 to 4).map { r =>
          s"""d$r AS (
             |  SELECT lm, node FROM (
             |    SELECT DISTINCT x.lm, e.dst AS node
             |    FROM d${r - 1} x JOIN edges e ON e.src = x.node) f
             |  WHERE ${priorNot(r)})"""
        }.mkString(",\n")
        val reachSel = (1 to 4).map(r =>
          s"SELECT lm, node, CAST($r AS BIGINT) AS dist FROM d$r")
          .mkString("\nUNION ALL ")
        s"""WITH $graphCte,
           |lmt AS (SELECT node AS lm FROM deg ORDER BY deg DESC, node LIMIT 5),
           |d0 AS (SELECT lm, lm AS node FROM lmt),
           |$frontiers,
           |reach AS (
           |$reachSel),
           |agg AS (
           |  SELECT lm, CAST(count(*) AS BIGINT) AS n_reached,
           |    CAST(sum(dist) AS BIGINT) AS sum_dist
           |  FROM reach GROUP BY lm)
           |SELECT a.lm, dg.deg, a.n_reached, a.sum_dist,
           |  a.n_reached * 1000000000 // a.sum_dist AS closeness_e9,
           |  CAST(a.n_reached * 1000000000 // a.sum_dist AS DOUBLE) / 1e9
           |    AS closeness
           |FROM agg a JOIN deg dg ON dg.node = a.lm
           |ORDER BY a.lm""".stripMargin
      })
  )
}
