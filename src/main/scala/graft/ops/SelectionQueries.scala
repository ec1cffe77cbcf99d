package graft.ops

import graft.{OracleSql, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data-SELECTION operators — the published designs a training-data build
  * uses to pick WHICH rows survive, complementing the dedup/quality tiers:
  *
  *  - q_priority_sample — priority sampling (Duffield, Lund, Thorup,
  *    JACM 2007): weight-proportional sampling WITHOUT replacement with an
  *    unbiased subset-sum estimator, from one narrow projection + one
  *    bounded top-(N+1). The production answer to "estimate corpus mass
  *    from a fixed-size sample" at 100 TB.
  *  - q_prefix_join — exact set-similarity join with PREFIX FILTERING
  *    (Bayardo et al. WWW 2007 / Xiao et al. PPJoin WWW 2008): a LOSSLESS
  *    candidate bound — unlike LSH there are no false negatives to argue
  *    about, the result set IS the brute-force result set, but candidates
  *    come from an equi-join on each document's rarest shingles only.
  *  - q_dsir_select — data selection with importance resampling (DSIR,
  *    Xie et al. NeurIPS 2023): hashed-bigram bag-of-ngrams likelihood
  *    ratio between a target domain and the raw corpus; the model is
  *    2xB counters, scoring is one narrow corpus pass, selection is a
  *    bounded top-k.
  *  - q_kcenter_coreset — greedy k-center (Gonzalez 1985; the
  *    Sener-Savarese ICLR 2018 data-selection shape): K corpus scans,
  *    each a narrow distance projection into a 1-row argmax.
  *  - q_group_sample — fixed-size per-stratum uniform sampling via the
  *    bounded TopKAgg (no corpus window/sort), completing the sampling
  *    trio with rate-based q_stratified_sample and the weighted-global
  *    estimator above.
  *
  * Float parity (Q.scala rules): priorities and Jaccards are single
  * IEEE divisions of exactly-cast integers (bitwise-equal across engines);
  * the only transcendental (DSIR's ln) is rounded to 9 decimals per bucket
  * to absorb the 1-ulp JVM-vs-DuckDB ln() divergence (the q_tfidf pattern)
  * and per-doc sums route through DECIMAL(25,12).
  */
object SelectionQueries {

  /** Sample size for priority sampling. */
  final val PrioN = 50

  /** 2^60 — the md5Prefix60 range, exactly representable as a double. */
  private final val Two60 = 1152921504606846976.0

  /** Shingle width and Jaccard threshold for the prefix-filtered join.
    * 5-gram shingles are discriminative on the fixture (28/25/256
    * qualifying pairs at the three SFs vs a near-complete pair graph for
    * raw tokens); T=0.5 keeps genuine near-dups only. */
  final val PjK = 5
  final val PjT = 0.5

  /** DSIR: hashed-feature buckets and selection size. */
  final val DsirB = 1024
  final val DsirN = 25

  /** k-center coreset size. */
  final val KcK = 5

  /** q_group_sample: rows kept per stratum, and the 2^52 modulus that
    * keeps hash priorities exactly representable as doubles (TopKAgg
    * compares doubles; 60-bit longs would round and could disagree with
    * the oracle's exact BIGINT ordering near ties). */
  final val GsK = 20
  final val GsMod = 4503599627370496L

  private def md5p60(c: org.apache.spark.sql.Column) =
    graft.functions.TextOps.md5Prefix60(c)

  /** Distinct 60-bit 5-gram shingle hashes per document (docs with >= 5
    * tokens). Set elements are the HASHES on both engines, so a collision
    * merges the same pair of shingles on both sides. One codegen'd kernel
    * call per doc (GramHashExpr == the former array_distinct(transform(
    * sequence(...))) HOF, which was CodegenFallback). */
  private def shingleSets(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= PjK)
      .select(col("doc_id"),
        graft.functions.TextOps.gramHashesDistinct(col("t"), PjK).as("g"))

  /** Prefix-filtered exact Jaccard join over a (doc_id, g: array<long>)
    * set relation: all pairs with J >= PjT, candidates bounded by the
    * AllPairs/PPJoin prefix principle (each set's s - ceil(T*s) + 1
    * RAREST elements under the global (df, element) order). Exposed for
    * property testing: losslessness must hold on ARBITRARY set corpora,
    * not just the fixture. */
  /** Shared scaffolding of the two prefix-filtered joins: the
    * materialized hashed set relation, the exploded (doc, s, gh) posting
    * relation, and each doc's RAREST-prefix relation — elements sorted by
    * (global df asc, element asc), prefix length given by `prefixLen`
    * (an integer SQL expression over `s`, the set size; each caller's
    * formula encodes ITS threshold, and the random-corpus property
    * sweeps in SelectionSpec catch a mismatch).
    *
    * Materialization: the set relation feeds four subtrees (df table,
    * prefix build, both verify sides) and recomputing the per-element
    * md5 hashing four times dominated the wall clock (12.2s -> 1.7s).
    * Durability tradeoff: localCheckpoint truncates lineage into
    * EXECUTOR-local blocks — a lost executor can't recompute them and
    * fails the job (acceptable single-JVM, where executor loss == driver
    * loss). On a real 1000-executor run, stage this relation durably
    * instead: reliable checkpoint() against the cluster FS, or
    * write/read a staging parquet — same plan shape, executor-loss-safe.
    * See SCALE.md. */
  private def prefixRelation(sh0: DataFrame, prefixLen: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val sh = sh0.localCheckpoint()
    val ex = sh.select(col("doc_id"), size(col("g")).cast("long").as("s"),
      explode(col("g")).as("gh"))
    val dfTab = ex.groupBy(col("gh")).agg(count(lit(1)).as("df"))
    val prefix = ex.join(dfTab, "gh")
      .groupBy(col("doc_id"), col("s"))
      .agg(array_sort(collect_list(struct(col("df"), col("gh")))).as("sorted"))
      .select(col("doc_id"),
        explode(slice(transform(col("sorted"), p => p("gh")),
          lit(1), expr(prefixLen).cast("int"))).as("gh"))
    (sh, ex, prefix)
  }

  private[graft] def prefixJoin(sh0: DataFrame): DataFrame = {
    // prefix length for T=0.5 via exact integer arithmetic:
    // s - ceil(s/2) + 1 (the formula encodes PjT = 0.5)
    val (sh, _, prefix) = prefixRelation(sh0, "s - ((s + 1) div 2) + 1")
    val cand = prefix.select(col("gh"), col("doc_id").as("doc_a"))
      .join(prefix.select(col("gh"), col("doc_id").as("doc_b")), "gh")
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("g").as("ga")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("g").as("gb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("ga"), col("gb"))).cast("long").as("n_inter"),
        (size(col("ga")) + size(col("gb"))).cast("long").as("s_ab"))
      .select(col("doc_a"), col("doc_b"), col("n_inter"),
        (col("s_ab") - col("n_inter")).as("n_union"),
        (col("n_inter").cast("double") /
          (col("s_ab") - col("n_inter")).cast("double")).as("jacc"))
      .filter(col("jacc") >= PjT)
  }

  /** Containment threshold for the asymmetric join. 0.6 keeps the prefix
    * arithmetic exactly integral: ceil(0.6*s) == (3*s + 4) div 5. */
  final val CjT = 0.6

  /** Asymmetric CONTAINMENT join (Broder 1997's containment coefficient;
    * the quote/subset-duplication policy): all DIRECTED pairs (a, b),
    * a != b, with C(a->b) = |g_a ∩ g_b| / |g_a| >= CjT — "most of A's
    * shingles appear in B". Symmetric Jaccard misses exactly this case:
    * a snippet quoted inside a much larger doc has low Jaccard but
    * containment ~1. LOSSLESS prefix bound, asymmetric form: if none of
    * a's s - ceil(T*s) + 1 globally-RAREST shingles occurs in g_b, then
    * |g_a ∩ g_b| <= ceil(T*s) - 1 < T*s, so the pair cannot qualify —
    * candidates come from an equi-join of A-prefixes against the FULL
    * posting relation (the b side must be complete: b's own prefix says
    * nothing about containment OF a). Shuffle = one corpus-scale gram
    * exchange (the substring-dedup shape); frequent grams have high df,
    * land in nobody's prefix, and join to nothing — dead weight in the
    * exchange, never a hot join key. Exposed for the random-corpus
    * losslessness sweep. */
  private[graft] def containmentJoin(sh0: DataFrame): DataFrame = {
    // prefix length for T=0.6 via exact integer arithmetic:
    // s - ceil(3s/5) + 1 (the formula encodes CjT = 0.6)
    val (sh, ex, prefix) = prefixRelation(sh0, "s - ((3*s + 4) div 5) + 1")
    val cand = prefix.select(col("gh"), col("doc_id").as("doc_a"))
      .join(ex.select(col("gh"), col("doc_id").as("doc_b")), "gh")
      .filter(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("g").as("ga")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("g").as("gb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("ga"), col("gb"))).cast("long").as("n_inter"),
        size(col("ga")).cast("long").as("s_a"))
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("s_a"),
        (col("n_inter").cast("double") / col("s_a").cast("double"))
          .as("containment"))
      .filter(col("containment") >= CjT)
  }

  private val shingleSetsSql: String =
    s"""d AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |  WHERE len(string_split(text, ' ')) >= $PjK),
       |sh AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(generate_series(1, len(t) - ${PjK - 1}),
       |      i -> ${OracleSql.hexToLong(s"md5(array_to_string(t[i:i+${PjK - 1}], ' '))", 1, 15)})) AS g
       |  FROM d)""".stripMargin

  val all: Seq[Q] = Seq(

    // Priority sampling (Duffield-Lund-Thorup): each row gets priority
    // q_i = w_i / u_i with u_i a deterministic hash-uniform in (0, 1];
    // the sample is the top-N priorities, tau the (N+1)-th, and
    // sum(max(w_i, tau)) over the sample is an UNBIASED estimator of the
    // corpus weight total. Scale shape: one narrow projection + a
    // TakeOrderedAndProject bounded at N+1 rows — the window/aggregates
    // below run on the 51 surviving rows only. No transcendentals: the
    // priority is (exact double) * 2^60 / (exact-cast double), the same
    // two IEEE ops on both engines.
    Q("q_priority_sample",
      (s, d) => {
        val base = Tables.documents(s, d).select(
          col("doc_id"), col("lang"), col("n_chars").as("w"),
          (col("n_chars").cast("double") * lit(Two60) /
            (md5p60(concat(lit("prio:"), col("doc_id").cast("string"))) + 1)
              .cast("double")).as("priority"))
        val top = base
          .orderBy(col("priority").desc, col("doc_id")).limit(PrioN + 1)
        // Window over the 51 bounded rows (post-limit), not the corpus.
        val ranked = top.withColumn("rn",
          row_number().over(Window.orderBy(col("priority").desc, col("doc_id"))))
        // DLT small-corpus fallback: with <= PrioN rows there is no
        // (N+1)-th priority — tau = 0 and the "sample" is the whole
        // corpus with est_w = w (the estimator is then exact). The
        // aggregate form yields EXACTLY ONE row either way, so the
        // cross join can never annihilate the sample.
        val tau = ranked.agg(coalesce(
          max(when(col("rn") === PrioN + 1, col("priority"))), lit(0.0))
          .as("tau"))
        val samp = ranked.filter(col("rn") <= PrioN).crossJoin(tau)
          .withColumn("est_w", greatest(col("w").cast("double"), col("tau")))
        val est = samp.agg(
          sum(col("est_w").cast(DecimalType(25, 6))).cast("double").as("est_total"))
        val tot = base.agg(sum(col("w")).cast("long").as("true_total"))
        samp.crossJoin(est).crossJoin(tot)
          .select(col("doc_id"), col("lang"), col("w"), col("priority"),
            col("est_w"), col("tau"), col("est_total"), col("true_total"))
          .orderBy(col("priority").desc, col("doc_id"))
      },
      Some(s"""WITH p AS (
         |  SELECT doc_id, lang, n_chars AS w,
         |    CAST(n_chars AS DOUBLE) * $Two60 /
         |      CAST(${OracleSql.hexToLong("md5('prio:' || CAST(doc_id AS VARCHAR))", 1, 15)} + 1 AS DOUBLE) AS priority
         |  FROM documents),
         |r AS (SELECT *, row_number() OVER (ORDER BY priority DESC, doc_id) AS rn FROM p),
         |tau AS (SELECT COALESCE(max(CASE WHEN rn = ${PrioN + 1} THEN priority END), 0.0) AS tau FROM r),
         |samp AS (
         |  SELECT doc_id, lang, w, priority,
         |    GREATEST(CAST(w AS DOUBLE), tau) AS est_w, tau
         |  FROM r, tau WHERE rn <= $PrioN),
         |est AS (SELECT CAST(sum(CAST(est_w AS DECIMAL(25,6))) AS DOUBLE) AS est_total FROM samp),
         |tot AS (SELECT CAST(sum(w) AS BIGINT) AS true_total FROM p)
         |SELECT doc_id, lang, w, priority, est_w, tau, est_total, true_total
         |FROM samp, est, tot ORDER BY priority DESC, doc_id""".stripMargin)),

    // Prefix-filtered EXACT Jaccard similarity join over 5-gram shingle
    // sets: every pair with J >= 0.5, no false negatives. Each document
    // keeps only its |g| - ceil(T*|g|) + 1 globally-RAREST shingles
    // (ascending document frequency, hash tiebreak) as its prefix; the
    // prefix-filtering principle guarantees any qualifying pair shares a
    // prefix shingle, so candidates come from an equi-join on rare keys —
    // never the all-pairs product, and never a hot frequent-shingle key
    // (prefixes prefer rare shingles BY CONSTRUCTION, the anti-skew
    // property that makes this shape survive 100 TB). Candidates are then
    // verified exactly against the full shingle sets. The oracle is the
    // brute-force formulation — equality IS the losslessness proof.
    Q("q_prefix_join",
      (s, d) => prefixJoin(shingleSets(s, d))
        .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH $shingleSetsSql,
         |tok AS (SELECT doc_id, len(g) AS s, unnest(g) AS gh FROM sh),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(a.s AS BIGINT) AS sa, CAST(b.s AS BIGINT) AS sb,
         |    CAST(count(*) AS BIGINT) AS n_inter
         |  FROM tok a JOIN tok b ON a.gh = b.gh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4)
         |SELECT doc_a, doc_b, n_inter,
         |  CAST(sa + sb - n_inter AS BIGINT) AS n_union,
         |  CAST(n_inter AS DOUBLE) / CAST(sa + sb - n_inter AS DOUBLE) AS jacc
         |FROM inter
         |WHERE CAST(n_inter AS DOUBLE) / CAST(sa + sb - n_inter AS DOUBLE) >= $PjT
         |ORDER BY doc_a, doc_b""".stripMargin)),

    // Asymmetric containment join over the same 5-gram shingle sets: all
    // DIRECTED pairs with |g_a ∩ g_b| / |g_a| >= 0.6 (see containmentJoin
    // — the quote/subset-dup policy symmetric Jaccard misses). The oracle
    // is the brute-force directed formulation; equality proves the
    // asymmetric prefix bound lossless on the fixture, and the
    // SelectionSpec random-corpus sweep proves it on arbitrary sets.
    Q("q_containment_join",
      (s, d) => containmentJoin(shingleSets(s, d))
        .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH $shingleSetsSql,
         |tok AS (SELECT doc_id, len(g) AS s, unnest(g) AS gh FROM sh),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(a.s AS BIGINT) AS s_a, CAST(count(*) AS BIGINT) AS n_inter
         |  FROM tok a JOIN tok b ON a.gh = b.gh AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2, 3)
         |SELECT doc_a, doc_b, n_inter, s_a,
         |  CAST(n_inter AS DOUBLE) / CAST(s_a AS DOUBLE) AS containment
         |FROM inter
         |WHERE CAST(n_inter AS DOUBLE) / CAST(s_a AS DOUBLE) >= $CjT
         |ORDER BY doc_a, doc_b""".stripMargin)),

    // DSIR importance selection: score every document by the hashed-bigram
    // log-likelihood ratio between the TARGET domain (lang='en') and the
    // raw corpus (add-1 smoothing over B=1024 buckets), keep the top-25.
    // Scale shape: ONE corpus bigram pass folds into a B-row count table
    // (the entire "model" is 2x1024 counters), the llr table broadcasts
    // back for scoring, and selection is a bounded TakeOrderedAndProject.
    // ln() operands are single counts (+smoothing) — exact doubles while
    // counts stay < 2^53, at ANY achievable corpus size; each bucket's
    // llr is rounded to 9 decimals and per-doc sums are decimal-routed,
    // so the score hash-matches bit-for-bit.
    Q("q_dsir_select",
      (s, d) => {
        val big = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), split(col("text"), " ").as("t"))
          .filter(size(col("t")) >= 2)
          // codegen'd bigram-hash kernel (GramHashExpr): identical hash
          // per position to md5p60(concat_ws(' ', t[i], t[i+1]))
          .select(col("doc_id"), col("lang"),
            explode(graft.functions.TextOps.gramHashes(col("t"), 2)).as("h"))
          .select(col("doc_id"), col("lang"), (col("h") % DsirB).as("b"))
        val cnt = big.groupBy(col("b")).agg(
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"),
          count(lit(1)).as("cr"))
        val tot = cnt.agg(sum(col("ct")).as("tct"), sum(col("cr")).as("tcr"))
        // 4-term form: each ln() operand is a single count (+smoothing),
        // exact as a double while counts stay < 2^53 — the factored
        // 2-term form multiplied two counts first, which overflows Long
        // (and loses double exactness) at corpus scales far below 100 TB.
        // round(, 9) absorbs the few-ulp JVM-vs-DuckDB ln() divergence
        // (the q_tfidf pattern).
        val llr = cnt.crossJoin(tot).select(col("b"),
          round(log((col("ct") + 1).cast("double")) +
              log((col("tcr") + DsirB).cast("double")) -
              log((col("cr") + 1).cast("double")) -
              log((col("tct") + DsirB).cast("double")), 9)
            .as("llr"))
        // llr is structurally B=1024 rows — broadcast it at ANY corpus size
        big.join(broadcast(llr), "b")
          .groupBy(col("doc_id"), col("lang"))
          .agg(count(lit(1)).as("n_bigrams"), H.dsum12(col("llr")).as("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(DsirN)
      },
      Some(s"""WITH tt AS (
         |  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
         |  WHERE len(string_split(text, ' ')) >= 2),
         |big AS (
         |  SELECT doc_id, lang, ${OracleSql.hexToLong("md5(bg)", 1, 15)} % $DsirB AS b
         |  FROM (
         |    SELECT doc_id, lang,
         |      unnest(list_transform(generate_series(1, len(t) - 1),
         |        i -> t[i] || ' ' || t[i+1])) AS bg
         |    FROM tt)),
         |cnt AS (
         |  SELECT b, CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         |    CAST(count(*) AS BIGINT) AS cr
         |  FROM big GROUP BY b),
         |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tct, CAST(sum(cr) AS BIGINT) AS tcr FROM cnt),
         |llr AS (
         |  SELECT b, round(ln(CAST(ct + 1 AS DOUBLE)) + ln(CAST(tcr + $DsirB AS DOUBLE)) -
         |    ln(CAST(cr + 1 AS DOUBLE)) - ln(CAST(tct + $DsirB AS DOUBLE)), 9) AS llr
         |  FROM cnt, tot)
         |SELECT big.doc_id, big.lang, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(CAST(llr AS DECIMAL(25,12))) AS DOUBLE) AS score
         |FROM big JOIN llr USING (b)
         |GROUP BY 1, 2
         |ORDER BY score DESC, doc_id LIMIT $DsirN""".stripMargin)),

    // Greedy k-center coreset (Gonzalez 1985; the Sener-Savarese ICLR
    // 2018 data-selection shape): pick the min-id seed, then K-1 times
    // add the point FARTHEST (int8-cosine distance) from the chosen set
    // — a 2-approximation of the optimal K-cover whose selection
    // distances bound the coverage radius. Scale shape: K corpus scans,
    // each a narrow least()/cosine projection + a 1-row argmax
    // (TakeOrderedAndProject(1)); the only driver traffic is K center
    // vectors (the MLlib-KMeans collect pattern, bounded by K x dim
    // bytes at ANY corpus size). Distances are exact-integer int8
    // cosines, so every double is bit-equal across engines and the
    // oracle can replay the greedy chain as K unrolled CTEs (the
    // q_bpe_train pattern).
    Q("q_kcenter_coreset",
      (s, d) => {
        val qv = Tables.embeddings(s, d).select(col("vec_id"),
          graft.functions.VectorOps.quantizeInt8(col("embedding")).as("q"))
        val seed = qv.orderBy(col("vec_id")).limit(1).collect()(0)
        var picks = List((1L, seed.getLong(0), Option.empty[Double]))
        var cur = qv.select(col("vec_id"), col("q"),
          (lit(1.0) - graft.functions.VectorOps.cosineInt8(col("q"),
            lit(seed.getAs[Array[Byte]]("q")))).as("dmin"))
        (2 to KcK).foreach { t =>
          val p = cur.orderBy(col("dmin").desc, col("vec_id")).limit(1)
            .collect()(0)
          picks ::= ((t.toLong, p.getLong(0), Some(p.getDouble(2))))
          cur = cur.select(col("vec_id"), col("q"),
            least(col("dmin"), lit(1.0) -
              graft.functions.VectorOps.cosineInt8(col("q"),
                lit(p.getAs[Array[Byte]]("q")))).as("dmin"))
        }
        import s.implicits._
        val sel = picks.reverse.toDF("t", "vec_id", "pick_dist")
        sel.crossJoin(cur.agg(max(col("dmin")).as("final_radius")))
          .orderBy(col("t"))
      },
      Some {
        val steps = (2 to KcK).map { t =>
          val prev = t - 1
          s"""p$t AS (SELECT vec_id AS id, q, dmin FROM d$prev ORDER BY dmin DESC, vec_id LIMIT 1),
             |d$t AS (SELECT v.vec_id, v.q, LEAST(v.dmin, 1.0 - ${OracleSql.int8Cos("v.q", s"p$t.q")}) AS dmin FROM d$prev v, p$t)"""
            .stripMargin
        }.mkString(",\n")
        val sel = (2 to KcK)
          .map(t => s"SELECT $t AS t, id AS vec_id, dmin AS pick_dist FROM p$t")
          .mkString("\n  UNION ALL ")
        s"""WITH ${OracleSql.quantizeCte},
           |p1 AS (SELECT vec_id AS id, q FROM qv ORDER BY vec_id LIMIT 1),
           |d1 AS (SELECT v.vec_id, v.q, 1.0 - ${OracleSql.int8Cos("v.q", "p1.q")} AS dmin FROM qv v, p1),
           |$steps,
           |rad AS (SELECT max(dmin) AS final_radius FROM d$KcK),
           |sel AS (
           |  SELECT 1 AS t, id AS vec_id, CAST(NULL AS DOUBLE) AS pick_dist FROM p1
           |  UNION ALL $sel)
           |SELECT CAST(t AS BIGINT) AS t, vec_id, pick_dist, final_radius
           |FROM sel, rad ORDER BY t""".stripMargin
      }),

    // Fixed-size-per-stratum uniform sample — the eval-set builder
    // (exactly k docs per language) completing the sampling trio next to
    // rate-based q_stratified_sample and weighted-global
    // q_priority_sample. The engine keeps each stratum's k SMALLEST hash
    // priorities with the bounded TopKAgg (map-side partial heaps, the
    // shuffle is groups x k rows), where the oracle's row_number window
    // sorts the whole stratum — the plan divergence IS the scale story:
    // a fixed-size sample at 100 TB must never imply a corpus sort.
    // Priorities are the 60-bit md5 reduced mod 2^52 so the aggregate's
    // double comparisons are exact (see GsMod).
    Q("q_group_sample",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val picked = docs.select(col("lang"), col("doc_id"),
            (md5p60(concat(lit("gsamp:"), col("doc_id").cast("string")))
              % GsMod).as("pr"))
          .groupBy(col("lang"))
          .agg(graft.functions.VectorOps.topK(
            -col("pr").cast("double"), col("doc_id"), GsK).as("top"))
          .select(col("lang"), posexplode(col("top")).as(Seq("i", "t")))
          .select(col("lang"), (col("i") + 1).cast("long").as("rn"),
            col("t.vec_id").as("doc_id"),
            (-col("t.score")).cast("long").as("pr"))
        picked.join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
          .select(col("lang"), col("rn"), col("doc_id"), col("pr"),
            col("n_chars"))
          .orderBy(col("lang"), col("rn"))
      },
      Some(s"""WITH p AS (
         |  SELECT lang, doc_id, n_chars,
         |    ${OracleSql.hexToLong("md5('gsamp:' || CAST(doc_id AS VARCHAR))", 1, 15)} % $GsMod AS pr
         |  FROM documents),
         |r AS (
         |  SELECT lang, doc_id, n_chars, pr,
         |    CAST(row_number() OVER (PARTITION BY lang ORDER BY pr, doc_id) AS BIGINT) AS rn
         |  FROM p)
         |SELECT lang, rn, doc_id, pr, CAST(n_chars AS BIGINT) AS n_chars
         |FROM r WHERE rn <= $GsK ORDER BY lang, rn""".stripMargin))
  )
}
