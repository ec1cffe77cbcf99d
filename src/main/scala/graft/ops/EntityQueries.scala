package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage) — the curation step that runs on
  * every real customer/supplier/author table before it can join anything:
  * find records that are the SAME real-world entity despite small string
  * differences, then collapse them to one canonical ("golden") record.
  *
  *  - q_fuzzy_join — the pair finder: all within-block record pairs at
  *    Levenshtein edit distance <= 1 over the name field, found by a
  *    SYMMETRIC-DELETE (SymSpell) candidate join instead of an all-pairs
  *    scan. The deletion-neighborhood property is LOSSLESS for edit
  *    distance <= 1: if lev(u,v) <= 1 then u and v share at least one
  *    member of {x} ∪ {x minus one char} (equal strings share x itself; a
  *    substitution at position i means u·del(i) = v·del(i); an indel means
  *    the shorter string IS a deletion variant of the longer) — so an
  *    equi-join on (block, variant) produces a candidate superset and the
  *    exact edit-distance filter keeps precisely the true pairs. The
  *    oracle states the NAIVE within-block quadratic join, proving result
  *    identity — the lossless claim is checked, not asserted.
  *  - q_entity_resolve — the consumer: connected components over the
  *    fuzzy-pair graph (an entity is a transitively-linked match group),
  *    labeled by min member key via the pointer-jumping labeler
  *    (GraphOps.doublingLabels), with the canonical record's name and the
  *    group size. Multi-record entities only — singletons are already
  *    golden.
  *
  * Blocking: pairs are scoped to a HARD block key (nation), the way
  * production ER always scopes candidates (same country/zip/category).
  * The deletion-variant join then prunes WITHIN the block: variant keys
  * are near-unique, so the join's per-key bucket is O(1) rows and the
  * candidate volume is measured at 0.2% of within-block all-pairs
  * (2,196 candidates vs 1.12M block pairs at sf0.01), recovering the
  * 776-pair true set exactly; validated again at sf0.1 (38,322 candidates,
  * 10,435 true pairs, 112M block pairs).
  *
  * 100 TB shape: one narrow projection explodes each record into
  * (len(name)+1) ~20-char variant rows — the ONLY corpus-sized shuffle is
  * that variant relation, keyed by (block, variant) with near-unique keys
  * (no skew); the distinct + verify run on candidate pairs, bounded far
  * below quadratic by the measured candidate rate. Components run
  * O(log diameter) pointer-jumping rounds on the pair graph (node- and
  * edge-sized shuffles only; sf0.1 measures 1,997 entities, largest 190).
  * Nothing in the pipeline ever materializes a block cross product —
  * the naive quadratic form survives only in the DuckDB oracle.
  */
object EntityQueries {

  /** Edit-distance threshold of the fuzzy match (the SymSpell deletion
    * neighborhood below is lossless exactly for this threshold). */
  final val MaxEdits = 1

  /** Pointer-jumping round cap: components at sf0.1 top out at 190
    * members (diameter < 190 => ~8 doubling rounds); 16 leaves headroom
    * and still fails loudly on a non-converging graph. */
  final val CcMaxIter = 16

  /** The string itself plus every single-character deletion — the
    * symmetric-delete candidate key set for edit distance <= 1. */
  private def deletionVariants(name: Column): Column = {
    val dels = transform(sequence(lit(1), length(name)),
      i => concat(name.substr(lit(1), i - lit(1)),
        name.substr(i + lit(1), length(name))))
    // array_union dedups (doubled chars yield identical variants) and a
    // guard keeps sequence() away from the empty string (sequence(1,0)
    // would step BACKWARDS and fabricate variants).
    when(length(name) > lit(0), array_union(array(name), dels))
      .otherwise(array(name))
  }

  /** (nationkey, custkey, name, acctbal) of every customer — the ER
    * input (acctbal is the survivorship signal of q_golden_record). */
  private def records(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_nationkey").cast("long").as("nationkey"),
      col("c_custkey").cast("long").as("custkey"),
      col("c_name").as("name"),
      col("c_acctbal").as("acctbal"))

  /** The (nationkey, v, custkey, name) variant relation from a raw
    * customer frame — THE candidate key structure, shared verbatim by
    * the batch equi-join and the streaming twin's keyed state
    * (StreamFuzzy plans this same expression tree in its projection). */
  private[graft] def variantRows(customers: DataFrame): DataFrame =
    customers.select(
        col("c_nationkey").cast("long").as("nationkey"),
        col("c_custkey").cast("long").as("custkey"),
        col("c_name").as("name"))
      .select(col("nationkey"), col("custkey"), col("name"),
        explode(deletionVariants(col("name"))).as("v"))
      .select(col("nationkey"), col("v"), col("custkey"), col("name"))

  /** Exact Wagner–Fischer edit distance — the integer Scala twin of
    * Spark's levenshtein (ASCII fixture; any correct implementation
    * agrees on integers), used by the streaming twin's in-state verify. */
  def levRef(a: String, b: String): Int = {
    val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    var i = 1
    while (i <= a.length) {
      var j = 1
      while (j <= b.length) {
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        j += 1
      }
      i += 1
    }
    m(a.length)(b.length)
  }

  /** Scala twin of [[deletionVariants]]: the string plus each
    * single-character deletion. */
  def variantsOf(s: String): Set[String] =
    if (s.isEmpty) Set(s)
    else (0 until s.length).map(i => s.substring(0, i) + s.substring(i + 1))
      .toSet + s

  /** The streaming twin's single-emit arbiter: a pair colliding in
    * several variant buckets is reported only by the lexicographically
    * smallest shared variant — recomputable from the two names alone. */
  def minSharedVariant(a: String, b: String): Option[String] = {
    val shared = variantsOf(a) intersect variantsOf(b)
    if (shared.isEmpty) None else Some(shared.min)
  }

  /** Distinct candidate pairs from the deletion-variant equi-join
    * (superset of the true ED<=MaxEdits pairs; EntitySpec guards its
    * volume against the within-block quadratic). */
  private[graft] def candidatePairs(s: SparkSession, d: String): DataFrame = {
    val vars = variantRows(Tables.customer(s, d))
    val a = vars.select(col("nationkey"), col("v"),
      col("custkey").as("cust_a"), col("name").as("name_a"))
    val b = vars.select(col("nationkey"), col("v"),
      col("custkey").as("cust_b"), col("name").as("name_b"))
    a.join(b, Seq("nationkey", "v"))
      .filter(col("cust_a") < col("cust_b"))
      // a pair can share several variants — dedupe BEFORE the O(L^2)
      // verify so each candidate pays for one edit-distance computation
      .select(col("nationkey"), col("cust_a"), col("name_a"),
        col("cust_b"), col("name_b"))
      .distinct()
  }

  /** The verified fuzzy pair relation
    * (nationkey, cust_a, cust_b, edit_dist), cust_a < cust_b — shared by
    * q_fuzzy_join (reports it) and q_entity_resolve (clusters it). */
  private[graft] def fuzzyPairs(s: SparkSession, d: String): DataFrame =
    candidatePairs(s, d)
      // threshold form: the DP row bails out once the running minimum
      // exceeds MaxEdits (returns -1), so verification is O(L*MaxEdits)
      // per candidate instead of O(L^2)
      .withColumn("edit_dist",
        levenshtein(col("name_a"), col("name_b"), MaxEdits).cast("long"))
      .filter(col("edit_dist") >= 0)
      .select(col("nationkey"), col("cust_a"), col("cust_b"),
        col("edit_dist"))

  /** Component labels (doc_id = custkey, label = min member key) over
    * the fuzzy pair graph — shared by q_entity_resolve / q_golden_record. */
  private def entityLabels(s: SparkSession, d: String): DataFrame = {
    val edges = fuzzyPairs(s, d)
      .select(col("cust_a"), col("cust_b")).localCheckpoint(true)
    val sym = edges.select(col("cust_a").as("src"), col("cust_b").as("dst"))
      .unionAll(edges.select(col("cust_b").as("src"), col("cust_a").as("dst")))
    val (labels, _) = GraphOps.doublingLabels(sym, maxIter = CcMaxIter)
    labels.select(col("doc_id").as("custkey"), col("label"))
  }

  /** Naive within-block ED<=1 edge CTE — the quadratic ground truth the
    * oracles state (reference semantics; the engine must EQUAL it from
    * the deletion-variant join). DuckDB hash-joins the nation key first,
    * so the oracle's levenshtein count is sum over blocks of n_b^2 —
    * ~9M calls at sf0.1, fine test-side. */
  private val naiveEdges: String =
    """e AS (
      |  SELECT a.c_nationkey AS nationkey,
      |         a.c_custkey AS ca, a.c_name AS na,
      |         b.c_custkey AS cb, b.c_name AS nb
      |  FROM customer a JOIN customer b
      |    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
      |   AND levenshtein(a.c_name, b.c_name) <= 1)""".stripMargin

  val all: Seq[Q] = Seq(

    // The pair finder. Plan: corpus -> (L+1)-variant explode -> equi-join
    // on (nation, variant) -> candidate-pair distinct -> threshold
    // Levenshtein verify. Oracle: the naive quadratic block join — exact
    // hash parity proves the symmetric-delete candidates are lossless.
    Q("q_fuzzy_join",
      (s, d) => fuzzyPairs(s, d)
        .orderBy(col("cust_a"), col("cust_b")),
      Some(s"""WITH $naiveEdges
         |SELECT CAST(nationkey AS BIGINT) AS nationkey,
         |  CAST(ca AS BIGINT) AS cust_a, CAST(cb AS BIGINT) AS cust_b,
         |  CAST(levenshtein(na, nb) AS BIGINT) AS edit_dist
         |FROM e ORDER BY cust_a, cust_b""".stripMargin)),

    // The consumer: transitive match groups -> golden records. Components
    // via pointer jumping (O(log diameter) rounds, node/edge-sized
    // shuffles); every label is a member custkey, so the canonical name
    // is one key-join back to the records. Oracle: recursive-CTE
    // reachability + min-label over the same naive edges (components are
    // small — sf0.1 max 190 members — so the closure is cheap test-side).
    Q("q_entity_resolve",
      (s, d) => {
        val grp = entityLabels(s, d).groupBy(col("label").as("entity"))
          .agg(count(lit(1)).as("n_members"))
        grp.join(records(s, d).select(col("custkey").as("entity"),
            col("name").as("canon_name")), "entity")
          .select(col("entity"), col("canon_name"), col("n_members"))
          .orderBy(col("entity"))
      },
      Some(s"""WITH RECURSIVE $naiveEdges,
         |sym AS MATERIALIZED (
         |  SELECT ca AS src, cb AS dst FROM e
         |  UNION ALL
         |  SELECT cb AS src, ca AS dst FROM e),
         |reach(node, lbl) AS (
         |  SELECT src, src FROM sym
         |  UNION
         |  SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node),
         |lab AS (SELECT node, min(lbl) AS label FROM reach GROUP BY node),
         |grp AS (SELECT label AS entity, CAST(count(*) AS BIGINT) AS n_members
         |  FROM lab GROUP BY label)
         |SELECT CAST(g.entity AS BIGINT) AS entity, c.c_name AS canon_name,
         |  g.n_members
         |FROM grp g JOIN customer c ON c.c_custkey = g.entity
         |ORDER BY entity""".stripMargin)),

    // Survivorship — the third ER stage (match -> cluster -> SURVIVE):
    // within each entity, elect the record that wins the survivorship
    // rule (here: highest account balance, ties to the smallest key —
    // real pipelines use recency/completeness the same way) and report
    // the keeper beside the min-key entity id. One key-join of the
    // label table back to the records and a max_by aggregate per entity
    // — the argmax never sorts the corpus. Oracle: same reachability
    // closure + a row_number window stating the identical rule.
    Q("q_golden_record",
      (s, d) => {
        val members = entityLabels(s, d)
          .join(records(s, d), "custkey")
        members.groupBy(col("label").as("entity"))
          .agg(
            max_by(col("custkey"),
              struct(col("acctbal"), -col("custkey"))).as("keeper"),
            max_by(col("name"),
              struct(col("acctbal"), -col("custkey"))).as("keeper_name"),
            max(struct(col("acctbal"), -col("custkey")))
              .getField("acctbal").as("keeper_bal"),
            count(lit(1)).as("n_members"))
          .orderBy(col("entity"))
      },
      Some(s"""WITH RECURSIVE $naiveEdges,
         |sym AS MATERIALIZED (
         |  SELECT ca AS src, cb AS dst FROM e
         |  UNION ALL
         |  SELECT cb AS src, ca AS dst FROM e),
         |reach(node, lbl) AS (
         |  SELECT src, src FROM sym
         |  UNION
         |  SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node),
         |lab AS (SELECT node, min(lbl) AS label FROM reach GROUP BY node),
         |m AS (
         |  SELECT l.label AS entity, c.c_custkey AS custkey,
         |    c.c_name AS name, c.c_acctbal AS acctbal,
         |    row_number() OVER (PARTITION BY l.label
         |      ORDER BY c.c_acctbal DESC, c.c_custkey ASC) AS rn,
         |    count(*) OVER (PARTITION BY l.label) AS n_members
         |  FROM lab l JOIN customer c ON c.c_custkey = l.node)
         |SELECT CAST(entity AS BIGINT) AS entity,
         |  CAST(custkey AS BIGINT) AS keeper, name AS keeper_name,
         |  acctbal AS keeper_bal, CAST(n_members AS BIGINT) AS n_members
         |FROM m WHERE rn = 1 ORDER BY entity""".stripMargin))
  )
}
