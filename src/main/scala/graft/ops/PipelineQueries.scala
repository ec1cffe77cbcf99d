package graft.ops

import graft.{OracleSql, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators beyond the dedup/similarity set:
  * reproducible dataset splitting, stratified sampling, keyword
  * relevance (BM25 ranking, per-document TF-IDF extraction), and the
  * content-safety blocklist gate.
  *
  * Scale design notes:
  *  - Splits and samples are DETERMINISTIC HASH assignments (md5 of the
  *    key, mod N), never RNG: the assignment is reproducible across
  *    engines, re-runs and re-partitions, needs no state, and is a pure
  *    narrow projection at 100 TB. This is how production corpus splits
  *    are done (a row's split must not change when the corpus grows).
  *  - BM25/TF-IDF shuffle only on (doc, term) / term keys; document
  *    frequencies are tiny aggregates broadcast back. No all-pairs stage.
  *  - Float parity with the oracle: scores are scalar double expressions
  *    written in identical operation order on both sides; the only float
  *    SUM (per-doc BM25 total) folds a term-sorted list left-to-right on
  *    both sides, so it is order-deterministic (see Q.scala parity rules).
  */
object PipelineQueries {

  /** 60-bit bucket hash of a salted doc_id — same value in both engines. */
  private def bucket(salt: String, mod: Int) =
    graft.functions.TextOps.md5Prefix60(
      concat(lit(salt), col("doc_id").cast("string"))) % mod

  private def bucketSql(salt: String, mod: Int): String =
    s"${OracleSql.hexToLong(s"md5('$salt' || CAST(doc_id AS VARCHAR))", 1, 15)} % $mod"

  /** BM25 terms: one rare ("dup", df≈5%) + two common — exercises the idf
    * spread of the synthetic vocabulary. */
  private val terms = Seq("dup", "spark", "join")
  private val termsSql = terms.map(t => s"'$t'").mkString("(", ", ", ")")

  /** q_bloom_decontaminate sizing: a doc is a false positive if ANY of
    * its ~90 grams collides, so the per-ITEM fpp must be sized to the
    * probes-per-doc — fpp 1% gave a 33-38% doc FP rate (tools/BloomProbe,
    * all SFs); 1e-4 gives 0.25-0.76%. That is the real Bloom-sizing
    * lesson at 100 TB: fpp ~ target_doc_rate / grams_per_doc, and the
    * filter is still broadcast-sized (~20 bits/item). The doc-rate cap
    * below is ~6x the worst observed SF — a filter regression (wrong
    * size, wrong hash input) blows well past it. */
  private val BloomFpp = 0.0001
  private val FpDocBound = 0.05

  /** Split-bucketed, tokenized documents with >= 8 tokens — the shared
    * base of both decontamination variants (private[graft]: the
    * FpDocBound measurement tool, tools/BloomProbe, must measure the
    * SAME pipeline the oracle gates). */
  private[graft] def decontDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("b", bucket("split:", 100))
      .withColumn("t", split(col("text"), " "))
      .filter(size(col("t")) >= 8)

  /** Distinct 8-gram 60-bit hashes per doc for one split side
    * (train: b < 80; test: b >= 90). One codegen'd kernel call per doc
    * (GramHashExpr — dedup BY HASH == array_distinct over md5Prefix60 of
    * the grams, set-identical to the former distinct-gram-string HOF
    * formulation; every consumer joins/intersects/blooms on the hash SET,
    * and the former transform(sequence(...)) was CodegenFallback). */
  private[graft] def gramHashes(docs: DataFrame, side: String): DataFrame = docs
    .filter(if (side == "train") col("b") < 80 else col("b") >= 90)
    .select(col("doc_id").as(s"${side}_doc"),
      explode(graft.functions.TextOps.gramHashesDistinct(col("t"), 8)).as("gh"))

  /** q_quality_classifier: feature buckets and the seeded integer
    * weight table (Knuth multiplicative hash, range [-1000, 1000] =
    * thousandths of a margin unit — integer so scoring is BIGINT-exact). */
  final val QualityD = 64
  final val QualityWeights: Array[Long] =
    Array.tabulate(QualityD)(i => ((i.toLong * 2654435761L) % 2001L) - 1000L)

  /** q_rrf_fusion: five hybrid queries — qid (= the query vector's
    * vec_id) with its own BM25 term pair, spanning the synthetic
    * vocabulary's idf range. Declared BEFORE `all` (the registry's oracle
    * strings interpolate it eagerly at object init). */
  final val RrfQueries: Seq[(Int, Seq[String])] = Seq(
    0 -> Seq("dup", "spark"), 1 -> Seq("join", "sort"),
    2 -> Seq("stream", "window"), 3 -> Seq("hash", "merge"),
    4 -> Seq("filter", "scan"))

  /** RRF constant (the SIGIR-2009 default), per-list candidate depth,
    * and fused rows kept per query. */
  final val RrfK = 60
  final val RrfDepth = 60
  final val RrfTopN = 10

  /** q_best_passage window width in tokens. */
  final val PassW = 16

  val all: Seq[Q] = Seq(

    // Reproducible train/val/test split: md5(doc_id) mod 100 -> 80/10/10.
    // A narrow projection (no shuffle for the assignment itself); the only
    // shuffle is the 3-group accounting aggregate.
    Q("q_hash_split",
      (s, d) => Tables.documents(s, d)
        .withColumn("b", bucket("split:", 100))
        .withColumn("split",
          when(col("b") < 80, "train").when(col("b") < 90, "val").otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"),
          countDistinct(col("lang")).as("n_langs"))
        .orderBy(col("split")),
      Some(s"""WITH b AS (
         |  SELECT *, ${bucketSql("split:", 100)} AS bk FROM documents),
         |sp AS (
         |  SELECT CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val'
         |              ELSE 'test' END AS split, n_chars, lang
         |  FROM b)
         |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
         |FROM sp GROUP BY split ORDER BY split""".stripMargin)),

    // Stratified deterministic sample: ~20% per language stratum via an
    // independent salt (a doc's sample membership is uncorrelated with its
    // split assignment). Reports achieved rate + exact mean length of the
    // sample per stratum (sum/count, not avg(), for bitwise parity).
    Q("q_stratified_sample",
      (s, d) => Tables.documents(s, d)
        .withColumn("in_sample", (bucket("strat:", 1000) < 200).cast("int"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total"),
          sum(col("in_sample")).cast("long").as("n_sampled"),
          // guarded: an empty stratum divides 0/0, which Spark (non-ANSI)
          // nulls but DuckDB IEEE-evaluates to NaN — make both sides NULL
          when(sum(col("in_sample")) > 0,
            sum(col("in_sample") * col("n_chars")).cast("double") /
              sum(col("in_sample")).cast("double")).as("mean_chars_sampled"))
        .orderBy(col("lang")),
      Some(s"""WITH b AS (
         |  SELECT lang, n_chars,
         |    CASE WHEN ${bucketSql("strat:", 1000)} < 200 THEN 1 ELSE 0 END AS in_sample
         |  FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_total,
         |  CAST(sum(in_sample) AS BIGINT) AS n_sampled,
         |  CASE WHEN sum(in_sample) > 0
         |    THEN CAST(sum(in_sample * n_chars) AS DOUBLE) / CAST(sum(in_sample) AS DOUBLE)
         |    ELSE NULL END AS mean_chars_sampled
         |FROM b GROUP BY lang ORDER BY lang""".stripMargin)),

    // Train/test decontamination: count test-split documents sharing an
    // 8-gram with any train-split document (the standard pre-training
    // contamination check; 8-grams, not 3-grams, so incidental phrase
    // overlap doesn't flag). Candidates come from an equi-join on the
    // 60-bit shingle hash — never a doc x doc product; at 100 TB this is
    // the same bucket-join shape as the dedup pipeline, run train x test.
    Q("q_decontaminate",
      (s, d) => {
        val docs = decontDocs(s, d)
        def grams(side: String) = gramHashes(docs, side)
        val pairs = grams("test").join(grams("train"), "gh")
          .select(col("test_doc"), col("train_doc")).distinct()
        docs.filter(col("b") >= 90).agg(count(lit(1)).as("n_test_docs"))
          .crossJoin(pairs.agg(
            countDistinct(col("test_doc")).as("n_contaminated"),
            count(lit(1)).as("n_pairs")))
      },
      Some(s"""WITH d AS (
         |  SELECT doc_id, string_split(text, ' ') AS t,
         |    ${bucketSql("split:", 100)} AS b
         |  FROM documents),
         |d8 AS (SELECT * FROM d WHERE len(t) >= 8),
         |grams AS (
         |  SELECT doc_id, b, ${OracleSql.hexToLong("md5(g)", 1, 15)} AS gh FROM (
         |    SELECT DISTINCT doc_id, b,
         |      unnest(list_transform(generate_series(1, len(t) - 7),
         |        i -> array_to_string(t[i:i+7], ' '))) AS g
         |    FROM d8)),
         |pairs AS (
         |  SELECT DISTINCT te.doc_id AS test_doc, tr.doc_id AS train_doc
         |  FROM grams te JOIN grams tr ON te.gh = tr.gh
         |  WHERE te.b >= 90 AND tr.b < 80)
         |SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM d8 WHERE b >= 90) AS n_test_docs,
         |  CAST(count(DISTINCT test_doc) AS BIGINT) AS n_contaminated,
         |  CAST(count(*) AS BIGINT) AS n_pairs
         |FROM pairs""".stripMargin)),

    // The full curation funnel — the engine's operators composed the way
    // a real training-data build runs them, with EXACT stage-by-stage
    // accounting the oracle recomputes end-to-end: total -> exact-dedup
    // keepers -> quality gate (length + uniq-ratio; thresholds sit at
    // ~p10 of the corpus so the gate is non-vacuous at every SF) ->
    // train split -> 8-gram decontamination against the test split.
    // Scale shape: every stage is a filter/aggregate over the previous
    // one; the only join is the decontamination shingle-hash equi-join
    // (q_decontaminate's shape, here restricted to the surviving train
    // docs); the output is five 1-row aggregates unioned. Dup classes
    // share identical text, so keeper features aggregate with min();
    // the keeper's OWN split bucket comes from min_by (arg_min).
    Q("q_curation_funnel",
      (s, d) => {
        val toksF = array_remove(split(col("text"), " "), "")
        val f = Tables.documents(s, d).select(col("doc_id"),
          md5(col("text")).as("th"), bucket("split:", 100).as("b"),
          size(toksF).cast("long").as("nt"),
          (size(array_distinct(toksF)).cast("double") / size(toksF))
            .as("ur"))
        val keepers = f.groupBy(col("th")).agg(
          min(col("doc_id")).as("doc_id"),
          min_by(col("b"), col("doc_id")).as("b"),
          min(col("nt")).as("nt"), min(col("ur")).as("ur"))
        val quality = keepers.filter(col("nt") >= 16 && col("ur") > 0.30)
        val train = quality.filter(col("b") < 80)
        val dd = decontDocs(s, d)
        val contam = gramHashes(dd, "train")
          .join(train.select(col("doc_id").as("train_doc")), "train_doc")
          .join(gramHashes(dd, "test").select(col("gh")).distinct(), "gh")
          .select(col("train_doc")).distinct()
        val clean = train.join(
          contam.withColumnRenamed("train_doc", "doc_id"),
          Seq("doc_id"), "left_anti")
        def stage(df: DataFrame, name: String) =
          df.agg(count(lit(1)).as("n_docs"))
            .select(lit(name).as("stage"), col("n_docs"))
        stage(Tables.documents(s, d), "0_total")
          .unionAll(stage(keepers, "1_dedup"))
          .unionAll(stage(quality, "2_quality"))
          .unionAll(stage(train, "3_train"))
          .unionAll(stage(clean, "4_decontaminated"))
          .orderBy(col("stage"))
      },
      Some(s"""WITH f AS (
         |  SELECT doc_id, text, md5(text) AS th,
         |    ${bucketSql("split:", 100)} AS b,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
         |      AS BIGINT) AS nt,
         |    CAST(len(list_distinct(list_filter(string_split(text, ' '),
         |      x -> x <> ''))) AS DOUBLE)
         |      / CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
         |        AS BIGINT) AS ur
         |  FROM documents),
         |k AS (
         |  SELECT min(doc_id) AS doc_id, arg_min(b, doc_id) AS b,
         |    min(nt) AS nt, min(ur) AS ur
         |  FROM f GROUP BY th),
         |q AS (SELECT * FROM k WHERE nt >= 16 AND ur > 0.30),
         |tr AS (SELECT * FROM q WHERE b < 80),
         |dt AS (
         |  SELECT doc_id, string_split(text, ' ') AS t,
         |    ${bucketSql("split:", 100)} AS b
         |  FROM documents),
         |d8 AS (SELECT * FROM dt WHERE len(t) >= 8),
         |grams AS (
         |  SELECT doc_id, b, ${OracleSql.hexToLong("md5(g)", 1, 15)} AS gh FROM (
         |    SELECT DISTINCT doc_id, b,
         |      unnest(list_transform(generate_series(1, len(t) - 7),
         |        i -> array_to_string(t[i:i+7], ' '))) AS g
         |    FROM d8)),
         |contam AS (
         |  SELECT DISTINCT g1.doc_id
         |  FROM grams g1 JOIN grams g2 ON g1.gh = g2.gh
         |  WHERE g2.b >= 90 AND g1.doc_id IN (SELECT doc_id FROM tr)),
         |clean AS (
         |  SELECT * FROM tr
         |  WHERE doc_id NOT IN (SELECT doc_id FROM contam))
         |SELECT '0_total' AS stage, CAST(count(*) AS BIGINT) AS n_docs
         |FROM documents
         |UNION ALL SELECT '1_dedup', CAST(count(*) AS BIGINT) FROM k
         |UNION ALL SELECT '2_quality', CAST(count(*) AS BIGINT) FROM q
         |UNION ALL SELECT '3_train', CAST(count(*) AS BIGINT) FROM tr
         |UNION ALL SELECT '4_decontaminated', CAST(count(*) AS BIGINT)
         |FROM clean
         |ORDER BY stage""".stripMargin)),

    // Bloom-filter decontamination — the sketch-side formulation of the
    // same check, completing the sketch family (HLL: q_approx_distinct;
    // CMS: q_heavy_hitters; Bloom: here). The test split's 8-gram hashes
    // build a Spark BloomFilter (fpp sized to probes-per-doc, see
    // BloomFpp); the train side is then a NARROW
    // codegen'd membership scan (`bloom_might_contain`) — at 100 TB you
    // broadcast a few-MB sketch to every executor instead of shuffling
    // the train-side grams into an equi-join. Invariants the oracle
    // states: exact doc counts (DuckDB recomputes the true contamination
    // via the join), no_false_negatives = 1 (structural — Bloom never
    // misses a member), fp_ok = 1 (observed false-positive DOC rate under
    // FpDocBound; deterministic given the filter, validated at all SFs).
    Q("q_bloom_decontaminate",
      (s, d) => {
        val docs = decontDocs(s, d)
        // both gram sides are consumed by multiple actions (count + bloom
        // build + exact join; flagged + truly) — materialize once instead
        // of re-running the tokenize/explode/md5 pipeline per action
        val test = gramHashes(docs, "test")
        val train = gramHashes(docs, "train").localCheckpoint(true)
        val testHashes = test.select(col("gh")).distinct().localCheckpoint(true)
        val expected = math.max(1L, testHashes.count()) // 1-value action
        val bloom = testHashes.stat.bloomFilter("gh", expected, BloomFpp)
        val flagged = train
          .filter(graft.functions.TextOps.bloomMightContain(col("gh"), bloom))
          .select(col("train_doc")).distinct()
        val truly = train.join(testHashes, "gh")
          .select(col("train_doc")).distinct()
        val missed = truly.join(flagged, Seq("train_doc"), "left_anti")
          .agg(count(lit(1)).as("n_missed"))
        val nTrain = docs.filter(col("b") < 80).agg(count(lit(1)).as("n_train_docs"))
        nTrain
          .crossJoin(truly.agg(count(lit(1)).as("n_true_contaminated")))
          .crossJoin(flagged.agg(count(lit(1)).as("n_flagged")))
          .crossJoin(missed)
          .select(col("n_train_docs"), col("n_true_contaminated"),
            (col("n_missed") === 0).cast("long").as("no_false_negatives"),
            ((col("n_flagged") - col("n_true_contaminated")).cast("double")
              <= lit(FpDocBound) *
                 (col("n_train_docs") - col("n_true_contaminated")).cast("double"))
              .cast("long").as("fp_ok"))
      },
      Some(s"""WITH d AS (
         |  SELECT doc_id, string_split(text, ' ') AS t,
         |    ${bucketSql("split:", 100)} AS b
         |  FROM documents),
         |d8 AS (SELECT * FROM d WHERE len(t) >= 8),
         |grams AS (
         |  SELECT doc_id, b, ${OracleSql.hexToLong("md5(g)", 1, 15)} AS gh FROM (
         |    SELECT DISTINCT doc_id, b,
         |      unnest(list_transform(generate_series(1, len(t) - 7),
         |        i -> array_to_string(t[i:i+7], ' '))) AS g
         |    FROM d8)),
         |truly AS (
         |  SELECT DISTINCT tr.doc_id
         |  FROM grams tr WHERE tr.b < 80 AND EXISTS (
         |    SELECT 1 FROM grams te WHERE te.b >= 90 AND te.gh = tr.gh))
         |SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM d8 WHERE b < 80) AS n_train_docs,
         |  (SELECT CAST(count(*) AS BIGINT) FROM truly) AS n_true_contaminated,
         |  CAST(1 AS BIGINT) AS no_false_negatives,
         |  CAST(1 AS BIGINT) AS fp_ok""".stripMargin)),

    // Overlap-FRACTION decontamination (the GPT-3 appendix-C / PaLM
    // eval-contamination policy shape): the binary any-shared-gram flag
    // (q_decontaminate) treats one boilerplate 8-gram the same as
    // wholesale leakage. Here every TEST doc gets the FRACTION of its
    // distinct 8-grams that appear anywhere in the train split, banded
    // into clean / trace(<=10%) / partial(<=50%) / heavy with exact
    // counts and a decimal-exact fraction mass per band — the report a
    // curation run uses to pick its removal threshold. Scale shape: the
    // same shingle-hash equi-join as the dedup family (left-semi against
    // the distinct train-gram relation, never doc x doc), two per-doc
    // aggregates, a 4-row band aggregate. frac is ONE double division of
    // exact longs (bit-equal across engines) and band edges compare that
    // double to literals, so banding is bit-deterministic too.
    Q("q_overlap_frac",
      (s, d) => {
        val docs = decontDocs(s, d)
        // materialized once: `test` feeds two differently-partitioned
        // subtrees (per-doc total vs the gh join), so the exchange can't
        // be reused and the tokenize + per-gram md5 would run twice
        // (the q_bloom_decontaminate pattern)
        val test = gramHashes(docs, "test").localCheckpoint(true)
        val trainG = gramHashes(docs, "train").select(col("gh")).distinct()
        val tot = test.groupBy(col("test_doc")).agg(count(lit(1)).as("n_grams"))
        val hit = test.join(trainG, Seq("gh"), "left_semi")
          .groupBy(col("test_doc")).agg(count(lit(1)).as("n_hit"))
        val frac = tot.join(hit, Seq("test_doc"), "left")
          .select(col("test_doc"), col("n_grams"),
            coalesce(col("n_hit"), lit(0L)).as("n_hit"))
          .withColumn("frac",
            col("n_hit").cast("double") / col("n_grams").cast("double"))
          .withColumn("band",
            when(col("frac") === 0.0, "0_clean")
              .when(col("frac") <= 0.1, "1_trace")
              .when(col("frac") <= 0.5, "2_partial")
              .otherwise("3_heavy"))
        frac.groupBy(col("band"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_hit")).cast("long").as("sum_hit"),
            sum(col("n_grams")).cast("long").as("sum_grams"),
            H.dsum12(col("frac")).as("sum_frac"))
          .orderBy(col("band"))
      },
      Some(s"""WITH d AS (
         |  SELECT doc_id, string_split(text, ' ') AS t,
         |    ${bucketSql("split:", 100)} AS b
         |  FROM documents),
         |d8 AS (SELECT * FROM d WHERE len(t) >= 8),
         |grams AS (
         |  SELECT DISTINCT doc_id, b, ${OracleSql.hexToLong("md5(g)", 1, 15)} AS gh FROM (
         |    SELECT doc_id, b,
         |      unnest(list_transform(generate_series(1, len(t) - 7),
         |        i -> array_to_string(t[i:i+7], ' '))) AS g
         |    FROM d8)),
         |te AS (SELECT doc_id, gh FROM grams WHERE b >= 90),
         |tr AS (SELECT DISTINCT gh FROM grams WHERE b < 80),
         |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM te GROUP BY doc_id),
         |hit AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit FROM te
         |  WHERE gh IN (SELECT gh FROM tr) GROUP BY doc_id),
         |fr AS (
         |  SELECT t.doc_id, t.n_grams,
         |    CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
         |    CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / CAST(t.n_grams AS DOUBLE) AS frac
         |  FROM tot t LEFT JOIN hit h USING (doc_id)),
         |bd AS (
         |  SELECT *, CASE WHEN frac = 0.0 THEN '0_clean'
         |                 WHEN frac <= 0.1 THEN '1_trace'
         |                 WHEN frac <= 0.5 THEN '2_partial'
         |                 ELSE '3_heavy' END AS band
         |  FROM fr)
         |SELECT band, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_hit) AS BIGINT) AS sum_hit,
         |  CAST(sum(n_grams) AS BIGINT) AS sum_grams,
         |  CAST(sum(CAST(frac AS DECIMAL(25,12))) AS DOUBLE) AS sum_frac
         |FROM bd GROUP BY band ORDER BY band""".stripMargin)),

    // BM25 keyword ranking (k1=1.2, b=0.75, Lucene idf): top-10 documents
    // for a fixed 3-term query. Because the term set is a compile-time
    // constant, per-doc tf is a NARROW array-filter projection — no token
    // explode, no (doc,term) shuffle anywhere. The whole plan is: one scan
    // with per-term counts, a 1-row corpus aggregate (n_docs/sum_dl/df per
    // term) broadcast back, and TakeOrderedAndProject for the top-k. The
    // per-doc score adds term-sorted per-term scores left-to-right (zeros
    // for absent terms are IEEE no-ops), so the double total matches the
    // oracle's term-ordered list fold bitwise.
    Q("q_bm25",
      (s, d) => {
        val ts = terms.sorted
        // one codegen'd pass for all per-term tfs (TermCountsExpr ==
        // size(filter(t, x -> x = term)) per term, which was k
        // interpreted ArrayFilter projections per corpus row)
        val base = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("t"))
          .select(col("doc_id"), size(col("t")).cast("double").as("dl"),
            graft.functions.TextOps.termCounts(col("t"), ts).as("tc"))
          .select(Seq(col("doc_id"), col("dl")) ++
            ts.zipWithIndex.map { case (tm, i) =>
              element_at(col("tc"), i + 1).cast("double").as(s"tf_$tm") }: _*)
        val stats = base.agg(
          count(lit(1)).cast("double").as("n_docs"),
          Seq(sum(col("dl").cast("long")).as("sum_dl")) ++
            ts.map(tm =>
              sum((col(s"tf_$tm") > 0).cast("long")).cast("double").as(s"df_$tm")): _*)
        def sc(tm: String) =
          log(lit(1.0) +
              (col("n_docs") - col(s"df_$tm") + lit(0.5)) / (col(s"df_$tm") + lit(0.5))) *
            ((col(s"tf_$tm") * lit(2.2)) /
              (col(s"tf_$tm") + lit(1.2) *
                (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") /
                  (col("sum_dl").cast("double") / col("n_docs")))))
        // round(9): JVM Math.log and DuckDB ln disagree in the last ulp for
        // some inputs; 9 decimals is far above the ~1e-16 noise and both
        // engines round positive halves identically (half-away-from-zero).
        base.crossJoin(broadcast(stats))
          .filter(ts.map(tm => col(s"tf_$tm") > 0).reduce(_ || _))
          .select(col("doc_id"),
            round(ts.foldLeft(lit(0.0))((acc, tm) => acc + sc(tm)), 9).as("score"),
            ts.map(tm => (col(s"tf_$tm") > 0).cast("long"))
              .reduce(_ + _).as("n_terms"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(10)
      },
      Some(s"""WITH docs AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |stats AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         |    CAST(sum(len(t)) AS BIGINT) AS sum_dl FROM docs),
         |tf AS (
         |  SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
         |  FROM (SELECT doc_id, unnest(t) AS tok FROM docs)
         |  WHERE tok IN $termsSql GROUP BY doc_id, tok),
         |df AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
         |scored AS (
         |  SELECT f.doc_id, f.tok,
         |    ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) *
         |      ((f.tf * 2.2) /
         |        (f.tf + 1.2 * (1.0 - 0.75 + 0.75 * CAST(len(d.t) AS DOUBLE) /
         |          (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))) AS sc
         |  FROM tf f
         |  JOIN df ON f.tok = df.tok
         |  JOIN docs d ON f.doc_id = d.doc_id
         |  CROSS JOIN stats s)
         |SELECT doc_id,
         |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE), list(sc ORDER BY tok)),
         |    (a, b) -> a + b), 9) AS score,
         |  CAST(count(*) AS BIGINT) AS n_terms
         |FROM scored GROUP BY doc_id
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)),

    // Per-document TF-IDF keyword extraction: top-3 characteristic terms
    // for a 20-doc slice, with document frequencies from the WHOLE corpus
    // (the df aggregate is corpus-wide; the window partitions per doc_id,
    // so partitions stay tiny at any scale).
    Q("q_tfidf_keywords",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
        val toks = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
        val df = toks.select(col("doc_id"), col("tok")).distinct()
          .groupBy(col("tok")).agg(count(lit(1)).cast("double").as("df"))
        val tf = toks.filter(col("doc_id") < 20)
          .groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).cast("double").as("tf"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("tok"))
        // Broadcast the 20-doc tf slice (bounded by construction), NOT the
        // corpus-wide vocabulary df (unbounded at scale — billions of
        // distinct tokens at 100 TB would OOM the driver). With tf
        // broadcast, the df side streams and the join output stays tiny.
        broadcast(tf).join(df, "tok")
          .crossJoin(broadcast(n))
          // round(9): absorbs the 1-ulp JVM-vs-DuckDB ln() divergence (see
          // q_bm25); rank ties broken by tok so rounding can't flip order
          // nondeterministically.
          .withColumn("tfidf", round(col("tf") * log(col("n_docs") / col("df")), 9))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("rank").cast("long").as("rank"),
            col("tok"), col("tfidf"))
          .orderBy(col("doc_id"), col("rank"))
      },
      Some("""WITH toks AS (
         |  SELECT doc_id, tok FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
         |  WHERE tok <> ''),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
         |df AS (
         |  SELECT tok, CAST(count(*) AS DOUBLE) AS df
         |  FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok),
         |tf AS (
         |  SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
         |  FROM toks WHERE doc_id < 20 GROUP BY doc_id, tok),
         |scored AS (
         |  SELECT f.doc_id, f.tok, round(f.tf * ln(n.n_docs / df.df), 9) AS tfidf
         |  FROM tf f JOIN df ON f.tok = df.tok CROSS JOIN n),
         |ranked AS (
         |  SELECT doc_id, tok, tfidf,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY tfidf DESC, tok) AS rank
         |  FROM scored)
         |SELECT doc_id, CAST(rank AS BIGINT) AS rank, tok, tfidf
         |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)),

    // Content-safety gate: table-driven blocklist filtering, the safety
    // stage every training-corpus build runs before assembly. The
    // blocklist is a maintained TABLE (here an inline 3-word stand-in),
    // broadcast into a token-level equi-join — per doc the flagged-token
    // count, per language the flag rate and the worst offender. Scale
    // shape: tokens never leave their partition until the tiny per-doc
    // aggregate; the blocklist side broadcasts at any realistic size
    // (blocklists are thousands of terms, not billions).
    Q("q_blocklist_filter",
      (s, d) => {
        import s.implicits._
        val bl = Seq("slow", "big", "vector").toDF("btok")
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("tok"))
        val flagged = toks
          .join(broadcast(bl), col("tok") === col("btok"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_bad"))
        Tables.documents(s, d).select(col("doc_id"), col("lang"))
          .join(flagged, Seq("doc_id"), "left")
          .select(col("lang"), col("doc_id"),
            coalesce(col("n_bad"), lit(0L)).as("n_bad"))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("n_bad") > 0, 1L).otherwise(0L)).as("n_flagged"),
            // composite argmax key packed into one BIGINT (DuckDB 1.0
            // arg_max has no list keys): max n_bad, tie -> smallest doc_id
            max_by(col("doc_id"),
              col("n_bad") * lit(4294967296L) - col("doc_id")).as("worst_doc"),
            max(col("n_bad")).as("worst_n_bad"))
          .withColumn("flag_rate",
            col("n_flagged").cast("double") / col("n_docs").cast("double"))
          .orderBy(col("lang"))
      },
      Some("""WITH bl(btok) AS (VALUES ('slow'), ('big'), ('vector')),
         |toks AS (
         |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |flagged AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bad
         |  FROM toks JOIN bl ON tok = btok GROUP BY doc_id),
         |per_doc AS (
         |  SELECT d.lang, d.doc_id, COALESCE(f.n_bad, 0) AS n_bad
         |  FROM documents d LEFT JOIN flagged f ON d.doc_id = f.doc_id)
         |SELECT lang,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN n_bad > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         |  CAST(arg_max(doc_id, n_bad * 4294967296 - doc_id) AS BIGINT) AS worst_doc,
         |  CAST(max(n_bad) AS BIGINT) AS worst_n_bad,
         |  CAST(sum(CASE WHEN n_bad > 0 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS flag_rate
         |FROM per_doc GROUP BY lang ORDER BY lang""".stripMargin)),

    // PII detection/redaction — the scrubbing half of the safety stage
    // (q_blocklist_filter is the table-driven half): email, phone, and
    // IPv4 patterns counted and redacted per document, reported per
    // language. The fixture's synthetic text carries no natural PII, so
    // the query first INJECTS deterministic PII derived from doc_id
    // (~20% of docs get an email, ~14% a phone, ~9% an IP — identical
    // string arithmetic on both engines) — the machinery being proven is
    // the pattern set, global redaction, and exact removed-character
    // accounting, all of which DuckDB recomputes bit-for-bit. Patterns
    // stay in the Java-regex ∩ RE2 common subset (no lookaround, no
    // backrefs, ASCII classes) so both engines match identically; at
    // 100 TB this is a pure narrow scan until the tiny per-lang
    // aggregate — zero pre-agg shuffles, and the regexes are codegen'd
    // (functions.regexp_count/regexp_replace, no UDFs).
    Q("q_pii_redact",
      (s, d) => {
        val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val PhonePat = "\\d{3}[-.]\\d{3}[-.]\\d{4}"
        val IpPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
        val inj = Tables.documents(s, d).select(col("doc_id"), col("lang"),
          concat(
            col("text"),
            when(col("doc_id") % 5 === 0,
              concat(lit(" contact user"), col("doc_id").cast("string"),
                lit("@example.com now"))).otherwise(lit("")),
            when(col("doc_id") % 7 === 0,
              concat(lit(" call 555-867-"),
                lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
              .otherwise(lit("")),
            when(col("doc_id") % 11 === 0,
              concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
                lit(".1 today"))).otherwise(lit(""))).as("t"))
        val cnt = inj.select(col("lang"),
          regexp_count(col("t"), lit(EmailPat)).as("n_email"),
          regexp_count(col("t"), lit(PhonePat)).as("n_phone"),
          regexp_count(col("t"), lit(IpPat)).as("n_ip"),
          (length(col("t")) - length(
            regexp_replace(regexp_replace(regexp_replace(col("t"),
              EmailPat, "<EMAIL>"),
              PhonePat, "<PHONE>"),
              IpPat, "<IP>"))).as("removed"))
        cnt.groupBy(col("lang")).agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("n_email") + col("n_phone") + col("n_ip") > 0, 1L)
              .otherwise(0L)).as("n_flagged"),
            sum(col("n_email")).cast("long").as("n_emails"),
            sum(col("n_phone")).cast("long").as("n_phones"),
            sum(col("n_ip")).cast("long").as("n_ips"),
            sum(col("removed")).cast("long").as("chars_removed"))
          .orderBy(col("lang"))
      },
      Some("""WITH inj AS (
         |  SELECT doc_id, lang,
         |    text ||
         |    CASE WHEN doc_id % 5 = 0
         |      THEN ' contact user' || doc_id || '@example.com now' ELSE '' END ||
         |    CASE WHEN doc_id % 7 = 0
         |      THEN ' call 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |      ELSE '' END ||
         |    CASE WHEN doc_id % 11 = 0
         |      THEN ' from 10.0.' || doc_id % 256 || '.1 today' ELSE '' END AS t
         |  FROM documents),
         |cnt AS (
         |  SELECT lang,
         |    length(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
         |    length(regexp_extract_all(t, '\d{3}[-.]\d{3}[-.]\d{4}')) AS n_phone,
         |    length(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
         |    length(t) - length(
         |      regexp_replace(regexp_replace(regexp_replace(t,
         |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |        '\d{3}[-.]\d{3}[-.]\d{4}', '<PHONE>', 'g'),
         |        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS removed
         |  FROM inj)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN n_email + n_phone + n_ip > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         |  CAST(sum(n_email) AS BIGINT) AS n_emails,
         |  CAST(sum(n_phone) AS BIGINT) AS n_phones,
         |  CAST(sum(n_ip) AS BIGINT) AS n_ips,
         |  CAST(sum(removed) AS BIGINT) AS chars_removed
         |FROM cnt GROUP BY lang ORDER BY lang""".stripMargin)),

    // k-anonymity audit — the privacy gate next to q_pii_redact: PII
    // redaction removes DIRECT identifiers; k-anonymity measures the
    // QUASI-identifier risk that remains (Sweeney 2002: a record is
    // re-identifiable when its attribute combination is shared by < k
    // records). Equivalence classes over (lang, source, n_chars/100);
    // classes below k = 5 are the rows a release would have to suppress
    // or generalize (the fixture spreads from 160/592 at-risk classes at
    // sf0.1 to nearly all at sf0.001 — sparser data IS the risk). Scale
    // shape: one map-side-combinable groupBy on the quasi-identifier
    // key; the audit table is class-count-sized, never row-sized.
    Q("q_kanonymity",
      (s, d) => {
        val K = 5L
        Tables.documents(s, d)
          .groupBy(col("lang"), col("source"),
            (col("n_chars") / 100).cast("long").as("chars_bucket"))
          .agg(count(lit(1)).as("class_size"))
          .withColumn("at_risk", (col("class_size") < K).cast("long"))
          .orderBy(col("lang"), col("source"), col("chars_bucket"))
      },
      Some("""SELECT lang, source,
         |  CAST(n_chars // 100 AS BIGINT) AS chars_bucket,
         |  CAST(count(*) AS BIGINT) AS class_size,
         |  CAST(CASE WHEN count(*) < 5 THEN 1 ELSE 0 END AS BIGINT) AS at_risk
         |FROM documents GROUP BY lang, source, n_chars // 100
         |ORDER BY lang, source, chars_bucket""".stripMargin)),

    // l-diversity audit (Machanavajjhala et al. 2007) — the second privacy
    // lens: k-anonymity bounds class SIZE, but a large class whose
    // sensitive attribute is HOMOGENEOUS still leaks it (the homogeneity
    // attack). Per quasi-identifier class (order month x priority) over
    // the released orders table, l = the number of distinct sensitive
    // values (order status); classes with l < 2 reveal every member's
    // status outright. Pure exact counting (count + countDistinct per
    // class), so parity is trivial. Scale shape: one map-side-combinable
    // groupBy on the quasi-identifier key (countDistinct expands to a
    // two-level aggregate on (class, status) — both keyed, never
    // row-fanning); the audit table is class-count-sized (~400 rows).
    Q("q_l_diversity",
      (s, d) => {
        val L = 2L
        Tables.orders(s, d)
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
            col("o_orderpriority").as("prio"))
          .agg(count(lit(1)).as("class_size"),
            countDistinct(col("o_orderstatus")).as("l_distinct"))
          .withColumn("at_risk", (col("l_distinct") < L).cast("long"))
          .orderBy(col("month"), col("prio"))
      },
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month,
         |  o_orderpriority AS prio,
         |  CAST(count(*) AS BIGINT) AS class_size,
         |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS l_distinct,
         |  CAST(CASE WHEN count(DISTINCT o_orderstatus) < 2
         |    THEN 1 ELSE 0 END AS BIGINT) AS at_risk
         |FROM orders GROUP BY 1, 2
         |ORDER BY month, prio""".stripMargin)),

    // t-closeness audit (Li et al. 2007) — the THIRD privacy lens,
    // completing k-anonymity (class size) and l-diversity (distinct
    // sensitive values): a class can be large AND diverse yet still leak
    // if its sensitive DISTRIBUTION differs from the global one (the
    // skewness attack). Per quasi-identifier class (month x priority),
    // the total-variation distance between the class's status
    // distribution and the global status distribution — the paper's EMD
    // with unit ground distance over a categorical domain. EXACT
    // integers end to end: per observed (class, status) the numerator
    // term |ncv*N - nv*nc| over the common denominator nc*N, statuses
    // ABSENT from a class contribute (N - sum_observed nv)*nc in one
    // closed form (|0*N - nv*nc| summed over the missing v), products
    // through DECIMAL(38,0)/HUGEINT, one scaled integral division by
    // 2*nc*N. The fixture honestly flags most classes at t=0.2: TPC-H
    // order status is nearly a function of order DATE, so the month
    // quasi-identifier is intrinsically disclosive — exactly what a
    // t-closeness audit exists to surface. Scale shape: two keyed
    // aggregates + a status-sized broadcast join; the audit table is
    // class-count-sized.
    Q("q_t_closeness",
      (s, d) => {
        val T9 = 200000000L // t = 0.2 on the 1e9 grid
        val byCS = Tables.orders(s, d)
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
            col("o_orderpriority").as("prio"),
            col("o_orderstatus").as("status"))
          .agg(count(lit(1)).as("ncv"))
        val byClass = byCS.groupBy(col("month"), col("prio"))
          .agg(sum(col("ncv")).as("nc"))
        val byStatus = byCS.groupBy(col("status")).agg(sum(col("ncv")).as("nv"))
        val total = byStatus.agg(sum(col("nv")).as("nn"))
        val terms = byCS
          .join(byClass, Seq("month", "prio"))
          .join(broadcast(byStatus), Seq("status"))
          .crossJoin(broadcast(total))
          .select(col("month"), col("prio"), col("nc"), col("nn"), col("nv"),
            abs(expr("CAST(ncv AS DECIMAL(38,0)) * nn") -
              expr("CAST(nv AS DECIMAL(38,0)) * nc")).as("term"))
        terms.groupBy(col("month"), col("prio"))
          .agg(min(col("nc")).as("nc"), min(col("nn")).as("nn"),
            sum(col("term")).as("t_obs"), sum(col("nv")).as("nv_obs"))
          .withColumn("tnum",
            col("t_obs") +
              expr("(nn - nv_obs) * CAST(nc AS DECIMAL(38,0))"))
          .withColumn("t9",
            expr("CAST(tnum AS DECIMAL(38,0)) * 1000000000 div " +
              "(2 * CAST(nc AS DECIMAL(38,0)) * nn)"))
          .select(col("month"), col("prio"), col("nc").as("class_size"),
            (col("t9").cast("double") / lit(1e9)).as("t_dist"),
            (col("t9") > lit(T9)).cast("long").as("exceeds_t"))
          .orderBy(col("month"), col("prio"))
      },
      Some("""WITH cs AS (
         |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         |    o_orderpriority AS prio, o_orderstatus AS status,
         |    CAST(count(*) AS BIGINT) AS ncv
         |  FROM orders GROUP BY 1, 2, 3),
         |cl AS (SELECT month, prio, CAST(sum(ncv) AS BIGINT) AS nc
         |       FROM cs GROUP BY 1, 2),
         |st AS (SELECT status, CAST(sum(ncv) AS BIGINT) AS nv
         |       FROM cs GROUP BY 1),
         |tot AS (SELECT CAST(sum(nv) AS BIGINT) AS nn FROM st),
         |terms AS (
         |  SELECT cs.month, cs.prio, cl.nc, tot.nn, st.nv,
         |    abs(CAST(cs.ncv AS HUGEINT) * tot.nn
         |      - CAST(st.nv AS HUGEINT) * cl.nc) AS term
         |  FROM cs
         |  JOIN cl ON cs.month = cl.month AND cs.prio = cl.prio
         |  JOIN st ON cs.status = st.status
         |  CROSS JOIN tot),
         |agg AS (
         |  SELECT month, prio, min(nc) AS nc, min(nn) AS nn,
         |    sum(term) AS t_obs, CAST(sum(nv) AS BIGINT) AS nv_obs
         |  FROM terms GROUP BY 1, 2),
         |fin AS (
         |  SELECT month, prio, nc,
         |    (t_obs + (nn - nv_obs) * CAST(nc AS HUGEINT)) * 1000000000
         |      // (2 * CAST(nc AS HUGEINT) * nn) AS t9
         |  FROM agg)
         |SELECT month, prio, nc AS class_size,
         |  CAST(t9 AS DOUBLE) / 1e9 AS t_dist,
         |  CAST(CASE WHEN t9 > 200000000 THEN 1 ELSE 0 END AS BIGINT)
         |    AS exceeds_t
         |FROM fin ORDER BY month, prio""".stripMargin)),

    // Differentially-private release counts — the publishable companion
    // of the k-anonymity audit: per-language document counts with
    // Laplace(1/eps) noise via the inverse CDF, eps = 1. The noise draw
    // is SEEDED (md5 of the release key -> an exact (j+0.5)/P rational
    // in (0,1)), so the released table is deterministic and auditable —
    // how production DP releases pin their noise for reproducibility
    // (the seed, not the noise, is the secret at release time). The
    // noisy value snaps to the 1e-9 grid through the floor-scaling
    // closure (ln() is the one irrational in the chain; the P43/floor
    // pattern of the recall queries makes the grid tie-free on both
    // engines). Scale shape: the release is GROUP-count-sized — the
    // only corpus-scale work is the underlying groupBy count.
    Q("q_dp_counts",
      (s, d) => {
        val P = 1000000007L
        val u = ((graft.functions.TextOps.md5Prefix60(
          concat(lit("dp:"), col("lang"))) % lit(P)).cast("double") + 0.5) /
          lit(P.toDouble)
        val noise = when(u < 0.5, log(u * 2.0))
          .otherwise(-log((lit(1.0) - u) * 2.0))
        Tables.documents(s, d)
          .groupBy(col("lang")).agg(count(lit(1)).as("n"))
          .select(col("lang"),
            (floor((col("n").cast("double") + noise) * 1e9) / 1e9)
              .as("noisy_count"))
          .orderBy(col("lang"))
      },
      Some {
        val uh = graft.OracleSql.hexToLong("md5('dp:' || lang)", 1, 15)
        val u = s"((($uh % 1000000007) + 0.5) / 1000000007.0)"
        s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang)
           |SELECT lang,
           |  floor((CAST(n AS DOUBLE) +
           |    CASE WHEN $u < 0.5 THEN ln($u * 2.0)
           |         ELSE -ln((1.0 - $u) * 2.0) END) * 1e9) / 1e9 AS noisy_count
           |FROM c ORDER BY lang""".stripMargin
      }),

    // Sequence packing — the shard-assembly step between curation and
    // training: documents are concatenated in a deterministic order and
    // split into fixed token-budget bins (B=2048), a doc landing in the
    // bin where its running total starts. Reports bins, fill factor and
    // the worst overflow per language. Scale shape: packing is
    // PARTITION-LOCAL by construction (here per lang; a 100 TB run packs
    // per (split, shard) exactly like this) — the window is partitioned,
    // never global, and everything after the narrow token count is
    // integer-exact, so the one double (fill) divides identically on
    // both engines.
    Q("q_pack_bins",
      (s, d) => {
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val dd = Tables.documents(s, d).select(col("doc_id"), col("lang"),
          size(array_remove(split(col("text"), " "), ""))
            .cast("long").as("n_tok"))
        val c = dd.withColumn("cum_prev",
          sum(col("n_tok")).over(w) - col("n_tok"))
        val pb = c.withColumn("bin", expr(s"cum_prev div $PackB"))
          .groupBy(col("lang"), col("bin"))
          .agg(sum(col("n_tok")).as("bin_toks"))
        pb.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_bins"),
            sum(col("bin_toks")).cast("long").as("total_tokens"),
            max(col("bin_toks")).as("max_bin_tokens"))
          .select(col("lang"), col("n_bins"), col("total_tokens"),
            col("max_bin_tokens"),
            (col("total_tokens").cast("double") /
              (col("n_bins").cast("double") * lit(PackB.toDouble))).as("fill"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH d AS (
         |  SELECT doc_id, lang,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok
         |  FROM documents),
         |c AS (
         |  SELECT lang, doc_id, n_tok,
         |    sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS cum_prev
         |  FROM d),
         |pb AS (
         |  SELECT lang, cum_prev // $PackB AS bin, CAST(sum(n_tok) AS BIGINT) AS bin_toks
         |  FROM c GROUP BY lang, bin)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_bins,
         |  CAST(sum(bin_toks) AS BIGINT) AS total_tokens,
         |  CAST(max(bin_toks) AS BIGINT) AS max_bin_tokens,
         |  CAST(sum(bin_toks) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * ${PackB}.0) AS fill
         |FROM pb GROUP BY lang ORDER BY lang""".stripMargin)),

    // Mixture rebalancing — distribution-aware sampling to a TARGET
    // mixture (uniform across languages) under a global 40% budget:
    // per-lang quota = budget * total / k, keep rate = min(1, quota/n),
    // membership by the same salted md5-mod used for splits/samples (a
    // doc's mixture fate is independent of its split). The fixture's
    // lang skew (en ~2.7x de at sf0.001) makes the rates genuinely
    // non-uniform. Scale shape: one tiny per-lang aggregate broadcast
    // back over a narrow scan — no corpus shuffle at all.
    Q("q_mixture_rebalance",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val sct = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
        val tot = sct.agg(sum(col("n")).cast("long").as("total"),
          count(lit(1)).as("k"))
        val r = sct.crossJoin(broadcast(tot))
          .select(col("lang"), col("n"),
            least(lit(1.0), lit(MixBudget) * col("total") / col("k") / col("n"))
              .as("rate"))
        docs.withColumn("b", bucket("mix:", 10000))
          .join(broadcast(r), "lang")
          .groupBy(col("lang"), col("n"), col("rate"))
          .agg(sum(when(col("b") < floor(col("rate") * lit(10000.0)), 1L)
            .otherwise(0L)).cast("long").as("n_kept"))
          .select(col("lang"), col("n").as("n_docs"), col("rate"), col("n_kept"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH sct AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
         |tot AS (
         |  SELECT CAST(sum(n) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS k
         |  FROM sct),
         |r AS (
         |  SELECT sct.lang, sct.n,
         |    LEAST(1.0, CAST($MixBudget AS DOUBLE) * tot.total / tot.k / sct.n) AS rate
         |  FROM sct, tot),
         |kept AS (
         |  SELECT d.lang,
         |    CAST(sum(CASE WHEN ${bucketSql("mix:", 10000)} < floor(r.rate * 10000.0)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |  FROM documents d JOIN r ON d.lang = r.lang
         |  GROUP BY d.lang)
         |SELECT r.lang, r.n AS n_docs, r.rate, k.n_kept
         |FROM r JOIN kept k ON r.lang = k.lang ORDER BY r.lang""".stripMargin)),

    // Mixture diversity indices — the MEASUREMENT companion to
    // q_mixture_rebalance's resampling: per language, how concentrated
    // is the SOURCE mix feeding the corpus? Shannon entropy (nats) of
    // the within-lang source distribution plus the Simpson collision
    // index (the probability two random docs share a source — the
    // quantity a dedup/contamination budget actually cares about).
    // Simpson is EXACT end to end: num = sum c_s(c_s-1) and
    // den = n(n-1) in DECIMAL(38,0)/HUGEINT (SF100-safe), one
    // remainder-subtraction integral division to the e9 grid, nullif
    // guard on single-doc groups (where the engines' div-by-zero
    // semantics diverge). Shannon follows the q_jsd transcendental
    // discipline: per-term p*ln(p) with pinned op order, floor-snapped
    // to the 2^43 grid, order-independent DECIMAL sum (single-source
    // langs land on H = 0 exactly via ln 1 = 0).
    // Scale shape: ONE map-side-combinable (lang, source) aggregate;
    // everything after is grid-sized. At 100 TB the diversity audit
    // costs one scan.
    Q("q_diversity",
      (s, d) => {
        val P43 = 8796093022208.0
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val bySrc = Tables.documents(s, d)
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("c"))
        val byLang = bySrc.groupBy(col("lang"))
          .agg(sum(col("c")).as("n"), count(lit(1)).as("n_sources"))
        val p = col("c").cast("double") / col("n").cast("double")
        val terms = bySrc.join(byLang, "lang")
          .withColumn("t43", floor((p * log(p)) * lit(P43)).cast(dec))
          .withColumn("coll", col("c").cast(dec) * (col("c") - lit(1L)))
        val agg = terms.groupBy(col("lang"), col("n"), col("n_sources"))
          .agg(sum(col("t43")).cast(dec).as("st43"),
            sum(col("coll")).cast(dec).as("num"))
        val den = nullif(col("n").cast(dec) * (col("n") - lit(1L)),
          lit(0).cast(dec))
        val sn = (col("num") * lit(1000000000L)).cast(dec)
        agg
          .withColumn("shannon_nats",
            -(col("st43").cast("double")) / lit(P43))
          .withColumn("simpson_e9",
            ((sn - sn % den) / den).cast(dec).cast("long"))
          .select(col("lang"), col("n").as("n_docs"), col("n_sources"),
            col("shannon_nats"), col("simpson_e9"),
            (col("simpson_e9") / lit(1e9)).as("simpson"))
          .orderBy(col("lang"))
      },
      Some("""WITH bs AS (
         |  SELECT lang, source, CAST(count(*) AS BIGINT) AS c
         |  FROM documents GROUP BY 1, 2),
         |bl AS (
         |  SELECT lang, CAST(sum(c) AS BIGINT) AS n,
         |    CAST(count(*) AS BIGINT) AS n_sources
         |  FROM bs GROUP BY 1),
         |t AS (
         |  SELECT bs.lang, bl.n, bl.n_sources,
         |    CAST(floor(((CAST(bs.c AS DOUBLE) / CAST(bl.n AS DOUBLE))
         |      * ln(CAST(bs.c AS DOUBLE) / CAST(bl.n AS DOUBLE)))
         |      * 8796093022208.0) AS HUGEINT) AS t43,
         |    CAST(bs.c AS HUGEINT) * (bs.c - 1) AS coll
         |  FROM bs JOIN bl USING (lang)),
         |a AS (
         |  SELECT lang, n, n_sources,
         |    CAST(-sum(t43) AS DOUBLE) / 8796093022208.0 AS shannon_nats,
         |    sum(coll) AS num
         |  FROM t GROUP BY 1, 2, 3)
         |SELECT lang, n AS n_docs, n_sources, shannon_nats,
         |  CAST((num * 1000000000)
         |    // nullif(CAST(n AS HUGEINT) * (n - 1), 0) AS BIGINT)
         |    AS simpson_e9,
         |  CAST((num * 1000000000)
         |    // nullif(CAST(n AS HUGEINT) * (n - 1), 0) AS BIGINT) / 1e9
         |    AS simpson
         |FROM a ORDER BY lang""".stripMargin)),

    // Overlapping chunk windows — the retrieval/embedding prep step: a
    // doc becomes ceil-spaced windows of W=32 tokens at stride S=16
    // (50% overlap), the chunk table every RAG/embedding pipeline
    // materializes before batch-encoding. The chunk rows themselves are
    // produced (doc, chunk k, start k*S, length min(W, n_tok - k*S));
    // the registry row aggregates them per language with an exact
    // redundancy factor (chunked tokens / raw tokens — the storage
    // multiplier the overlap costs). Scale shape: chunking is a narrow
    // explode over an integer sequence (no shuffle until the per-lang
    // agg), and chunk counts are closed-form integer arithmetic —
    // identical on both engines.
    Q("q_chunk_windows",
      (s, d) => {
        val dd = Tables.documents(s, d).select(col("doc_id"), col("lang"),
          size(array_remove(split(col("text"), " "), ""))
            .cast("long").as("n_tok"))
        val ch = dd.select(col("doc_id"), col("lang"), col("n_tok"),
          explode(sequence(lit(0L),
            expr(s"(greatest(n_tok - $ChunkS, 1) + ${ChunkS - 1}) div $ChunkS - 1")))
            .as("k"))
        val c2 = ch.select(col("lang"), col("n_tok"), col("k"),
          least(lit(ChunkW.toLong), col("n_tok") - col("k") * ChunkS)
            .as("chunk_len"))
        c2.groupBy(col("lang")).agg(
            sum(when(col("k") === 0, 1L).otherwise(0L)).as("n_docs"),
            count(lit(1)).as("n_chunks"),
            sum(col("chunk_len")).cast("long").as("sum_chunk_tokens"),
            max(col("k") + 1).as("max_chunks_per_doc"),
            sum(when(col("k") === 0, col("n_tok")).otherwise(0L))
              .cast("long").as("raw_tokens"))
          .select(col("lang"), col("n_docs"), col("n_chunks"),
            col("sum_chunk_tokens"), col("max_chunks_per_doc"),
            (col("sum_chunk_tokens").cast("double") /
              col("raw_tokens").cast("double")).as("redundancy"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH d AS (
         |  SELECT doc_id, lang,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok
         |  FROM documents),
         |ch AS (
         |  SELECT doc_id, lang, n_tok,
         |    unnest(generate_series(0,
         |      (greatest(n_tok - $ChunkS, 1) + ${ChunkS - 1}) // $ChunkS - 1)) AS k
         |  FROM d),
         |c2 AS (
         |  SELECT lang, n_tok, k,
         |    least(CAST($ChunkW AS BIGINT), n_tok - k*$ChunkS) AS chunk_len
         |  FROM ch),
         |agg AS (
         |  SELECT lang,
         |    CAST(sum(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
         |    CAST(count(*) AS BIGINT) AS n_chunks,
         |    CAST(sum(chunk_len) AS BIGINT) AS sum_chunk_tokens,
         |    CAST(max(k + 1) AS BIGINT) AS max_chunks_per_doc,
         |    CAST(sum(CASE WHEN k = 0 THEN n_tok ELSE 0 END) AS BIGINT) AS raw_tokens
         |  FROM c2 GROUP BY lang)
         |SELECT lang, n_docs, n_chunks, sum_chunk_tokens, max_chunks_per_doc,
         |  CAST(sum_chunk_tokens AS DOUBLE) / CAST(raw_tokens AS DOUBLE) AS redundancy
         |FROM agg ORDER BY lang""".stripMargin)),

    // Model-based quality gate — a trained linear classifier (the
    // fasttext-style quality scorer every corpus build runs) applied as
    // PURE Catalyst arithmetic: hashed bag-of-words features (md5-mod
    // into D=64 buckets), INTEGER weights shipped as an array literal,
    // per-doc margin = sum of weights over token occurrences. Inference
    // is a narrow codegen'd projection — no UDF, no model server, no
    // shuffle before the per-doc aggregate — and because the weights
    // are integers the whole score path is BIGINT-exact (the one
    // division happens at reporting). The weights here are a seeded
    // stand-in (Knuth-hash formula); a real model's quantized weights
    // drop in without changing the plan.
    Q("q_quality_classifier",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
        val sc = toks
          .select(col("doc_id"), col("lang"),
            element_at(lit(QualityWeights),
              (graft.functions.TextOps.md5Prefix60(col("tok")) % QualityD)
                .cast("int") + 1).as("w"))
          .groupBy(col("doc_id"), col("lang"))
          .agg(sum(col("w")).cast("long").as("score"))
        sc.groupBy(col("lang")).agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_flagged"),
            (sum(col("score")).cast("double") / lit(1000.0) / count(lit(1)))
              .as("mean_margin"))
          .orderBy(col("lang"))
      },
      Some {
        val wlist = QualityWeights.mkString("[", ",", "]")
        s"""WITH toks AS (
           |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
           |  FROM documents),
           |sc AS (
           |  SELECT doc_id, lang,
           |    CAST(sum($wlist[${graft.OracleSql.hexToLong("md5(tok)", 1, 15)}
           |      % $QualityD + 1]) AS BIGINT) AS score
           |  FROM toks WHERE tok <> '' GROUP BY doc_id, lang)
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           |  CAST(sum(score) AS DOUBLE) / 1000.0 / count(*) AS mean_margin
           |FROM sc GROUP BY lang ORDER BY lang""".stripMargin
      }),

    // Repetition-quality gate (the Gopher/Rae-et-al repetition rules,
    // token-level): per language, how many documents exceed either the
    // modal-2-gram-fraction or the duplicated-3-gram-fraction threshold,
    // plus the exact mean of both signals. The per-document statistics are
    // ONE codegen'd map-side pass (RepStatsExpr — no token explode, no
    // (doc, gram) shuffle anywhere); the only exchange is the final
    // per-language aggregate, so the gate costs a single scan at 100 TB.
    // Thresholds flag ~20% of the synthetic corpus at every SF
    // (measured: p90 top2_frac ~0.067, p95 dup3_frac ~0.022).
    Q("q_repetition_filter",
      (s, d) => {
        val f = Tables.documents(s, d)
          .select(col("lang"), split(col("text"), " ").as("t"))
          .filter(size(col("t")) >= 3)
          .select(col("lang"), graft.functions.TextOps.repStats(col("t")).as("r"))
          .select(col("lang"),
            (col("r").getItem(0).cast("double") /
              col("r").getItem(1).cast("double")).as("top2_frac"),
            (col("r").getItem(2).cast("double") /
              col("r").getItem(3).cast("double")).as("dup3_frac"))
        f.groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum((col("top2_frac") > RepTop2Max ||
              col("dup3_frac") > RepDup3Max).cast("long")).as("n_flagged"),
            H.dmean(col("top2_frac")).as("mean_top2_frac"),
            H.dmean(col("dup3_frac")).as("mean_dup3_frac"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH d AS (
         |  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
         |  WHERE len(string_split(text, ' ')) >= 3),
         |g2 AS (
         |  SELECT doc_id, t[i] || ' ' || t[i+1] AS g, count(*) AS cnt
         |  FROM (SELECT doc_id, unnest(generate_series(1, len(t)-1)) AS i, t FROM d)
         |  GROUP BY doc_id, g),
         |m2 AS (SELECT doc_id, max(cnt) AS top2, sum(cnt) AS n2 FROM g2 GROUP BY doc_id),
         |g3 AS (
         |  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g, count(*) AS cnt
         |  FROM (SELECT doc_id, unnest(generate_series(1, len(t)-2)) AS i, t FROM d)
         |  GROUP BY doc_id, g),
         |m3 AS (
         |  SELECT doc_id, sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup3,
         |    sum(cnt) AS n3 FROM g3 GROUP BY doc_id),
         |f AS (
         |  SELECT d.lang,
         |    CAST(m2.top2 AS DOUBLE)/CAST(m2.n2 AS DOUBLE) AS top2_frac,
         |    CAST(m3.dup3 AS DOUBLE)/CAST(m3.n3 AS DOUBLE) AS dup3_frac
         |  FROM d JOIN m2 USING(doc_id) JOIN m3 USING(doc_id))
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN top2_frac > $RepTop2Max OR dup3_frac > $RepDup3Max
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         |  CAST(sum(CAST(top2_frac AS DECIMAL(25,12))) AS DOUBLE)/count(*) AS mean_top2_frac,
         |  CAST(sum(CAST(dup3_frac AS DECIMAL(25,12))) AS DOUBLE)/count(*) AS mean_dup3_frac
         |FROM f GROUP BY lang ORDER BY lang""".stripMargin)),

    // Hybrid retrieval: reciprocal-rank fusion (Cormack/Clarke/Buettcher,
    // SIGIR 2009) of a BM25 keyword ranking and an embedding-cosine
    // ranking, per query. Five hybrid queries, each with its own term
    // pair and its own query vector (embedding of vec_id = qid), over the
    // universe of documents that carry an embedding (doc_id = vec_id).
    // rrf(d) = 1/(K + rank_bm25(d)) + 1/(K + rank_vec(d)), K = 60,
    // missing-list contributions are 0. Ranks are exact integers, so the
    // fused score is bitwise-reproducible in both engines.
    //
    // Scale shape: the BM25 side is the q_bm25 plan (narrow per-term tf
    // projection, 1-row stats broadcast, no token explode) stacked to 5
    // queries in ONE scan; both rankings use TopKAgg (bounded per-
    // partition state, O(depth) rows past the shuffle) — no corpus-sized
    // window sort anywhere. The fusion join touches <= 5 x 60 rows/side.
    Q("q_rrf_fusion",
      (s, d) => {
        val qterms = RrfQueries
        val dterms = qterms.flatMap(_._2).distinct.sorted
        val docs = Tables.documents(s, d)
        val emb = Tables.embeddings(s, d)
        val uni = docs.join(emb.select(col("vec_id").as("doc_id")), "doc_id")
        // one codegen'd pass for all 10 per-term tfs (see q_bm25)
        val base = uni.select(col("doc_id"), split(col("text"), " ").as("t"))
          .select(col("doc_id"), size(col("t")).cast("double").as("dl"),
            graft.functions.TextOps.termCounts(col("t"), dterms).as("tc"))
          .select(Seq(col("doc_id"), col("dl")) ++
            dterms.zipWithIndex.map { case (tm, i) =>
              element_at(col("tc"), i + 1).cast("double").as(s"tf_$tm") }: _*)
        val stats = base.agg(
          count(lit(1)).cast("double").as("n_docs"),
          Seq(sum(col("dl").cast("long")).as("sum_dl")) ++
            dterms.map(tm =>
              sum((col(s"tf_$tm") > 0).cast("long")).cast("double").as(s"df_$tm")): _*)
        def sc(tm: String) =
          log(lit(1.0) +
              (col("n_docs") - col(s"df_$tm") + lit(0.5)) / (col(s"df_$tm") + lit(0.5))) *
            ((col(s"tf_$tm") * lit(2.2)) /
              (col(s"tf_$tm") + lit(1.2) *
                (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") /
                  (col("sum_dl").cast("double") / col("n_docs")))))
        val wide = base.crossJoin(broadcast(stats))
          .select(Seq(col("doc_id")) ++ qterms.flatMap { case (qid, ts) =>
            val t2 = ts.sorted
            Seq(round(t2.foldLeft(lit(0.0))((a, tm) => a + sc(tm)), 9).as(s"s_$qid"),
              t2.map(tm => col(s"tf_$tm") > 0).reduce(_ || _).as(s"h_$qid"))
          }: _*)
        val bm = wide.selectExpr("doc_id",
            s"stack(${qterms.size}, " +
              qterms.map { case (q, _) => s"CAST($q AS BIGINT), s_$q, h_$q" }
                .mkString(", ") + ") AS (qid, bscore, has)")
          .filter(col("has"))
        val br = bm.groupBy(col("qid"))
          .agg(graft.functions.VectorOps.topK(col("bscore"), col("doc_id"), RrfDepth).as("top"))
          .select(col("qid"), posexplode(col("top")).as(Seq("i", "t")))
          .select(col("qid"), col("t.vec_id").as("doc_id"), (col("i") + 1).as("rb"))
        val qv = emb.filter(col("vec_id") < qterms.size)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val ue = emb.join(uni.select(col("doc_id")), col("vec_id") === col("doc_id"))
          .select(col("doc_id"), col("embedding"))
        val vr = ue.join(broadcast(qv), col("doc_id") =!= col("qid"))
          .select(col("qid"), col("doc_id"),
            graft.functions.VectorOps.cosineFloat(col("qe"), col("embedding")).as("vscore"))
          .groupBy(col("qid"))
          .agg(graft.functions.VectorOps.topK(col("vscore"), col("doc_id"), RrfDepth).as("top"))
          .select(col("qid"), posexplode(col("top")).as(Seq("i", "t")))
          .select(col("qid"), col("t.vec_id").as("doc_id"), (col("i") + 1).as("rv"))
        val fused = br.join(vr, Seq("qid", "doc_id"), "full_outer")
          .select(col("qid"), col("doc_id"),
            coalesce(col("rb"), lit(0)).cast("long").as("bm25_rank"),
            coalesce(col("rv"), lit(0)).cast("long").as("vec_rank"),
            (coalesce(lit(1.0) / (lit(RrfK) + col("rb")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(RrfK) + col("rv")), lit(0.0))).as("rrf"))
        val wf = Window.partitionBy(col("qid")).orderBy(col("rrf").desc, col("doc_id"))
        fused.withColumn("rn", row_number().over(wf)).filter(col("rn") <= RrfTopN)
          .select(col("qid"), col("doc_id"), col("bm25_rank"), col("vec_rank"), col("rrf"))
          .orderBy(col("qid"), col("rrf").desc, col("doc_id"))
      },
      Some {
        val qtVals = RrfQueries.flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }
          .mkString(", ")
        s"""WITH qt(qid, tok) AS (VALUES $qtVals),
           |u AS (
           |  SELECT d.doc_id, string_split(d.text, ' ') AS t
           |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
           |stats AS (
           |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
           |    CAST(sum(len(t)) AS BIGINT) AS sum_dl FROM u),
           |tf AS (
           |  SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
           |  FROM (SELECT doc_id, unnest(t) AS tok FROM u)
           |  WHERE tok IN (SELECT DISTINCT tok FROM qt) GROUP BY doc_id, tok),
           |df AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
           |scored AS (
           |  SELECT q.qid, f.doc_id, f.tok,
           |    ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) *
           |      ((f.tf * 2.2) /
           |        (f.tf + 1.2 * (1.0 - 0.75 + 0.75 * CAST(len(u.t) AS DOUBLE) /
           |          (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))) AS sc
           |  FROM qt q
           |  JOIN tf f ON f.tok = q.tok
           |  JOIN df ON f.tok = df.tok
           |  JOIN u ON f.doc_id = u.doc_id
           |  CROSS JOIN stats s),
           |bm AS (
           |  SELECT qid, doc_id,
           |    round(list_reduce(list_prepend(CAST(0 AS DOUBLE), list(sc ORDER BY tok)),
           |      (a, b) -> a + b), 9) AS bscore
           |  FROM scored GROUP BY qid, doc_id),
           |br AS (
           |  SELECT qid, doc_id, rn AS rb FROM (
           |    SELECT qid, doc_id,
           |      row_number() OVER (PARTITION BY qid ORDER BY bscore DESC, doc_id) AS rn
           |    FROM bm) WHERE rn <= $RrfDepth),
           |qq AS (
           |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
           |  WHERE vec_id < ${RrfQueries.size}),
           |ue AS (
           |  SELECT e.vec_id AS doc_id, e.embedding
           |  FROM embeddings e JOIN u ON u.doc_id = e.vec_id),
           |vsc AS (
           |  SELECT qq.qid, ue.doc_id,
           |    ${OracleSql.floatCos("qq.qe", "ue.embedding")} AS vscore
           |  FROM qq JOIN ue ON ue.doc_id <> qq.qid),
           |vr AS (
           |  SELECT qid, doc_id, rn AS rv FROM (
           |    SELECT qid, doc_id,
           |      row_number() OVER (PARTITION BY qid ORDER BY vscore DESC, doc_id) AS rn
           |    FROM vsc) WHERE rn <= $RrfDepth),
           |fused AS (
           |  SELECT COALESCE(br.qid, vr.qid) AS qid,
           |    COALESCE(br.doc_id, vr.doc_id) AS doc_id,
           |    COALESCE(br.rb, 0) AS bm25_rank, COALESCE(vr.rv, 0) AS vec_rank,
           |    COALESCE(1.0/($RrfK + br.rb), 0.0) +
           |      COALESCE(1.0/($RrfK + vr.rv), 0.0) AS rrf
           |  FROM br FULL OUTER JOIN vr
           |    ON br.qid = vr.qid AND br.doc_id = vr.doc_id)
           |SELECT CAST(qid AS BIGINT) AS qid, CAST(doc_id AS BIGINT) AS doc_id,
           |  CAST(bm25_rank AS BIGINT) AS bm25_rank,
           |  CAST(vec_rank AS BIGINT) AS vec_rank, rrf
           |FROM (
           |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS rn
           |  FROM fused) WHERE rn <= $RrfTopN
           |ORDER BY qid, rrf DESC, doc_id""".stripMargin
      }),

    // Best-passage extraction (the RAG snippet step downstream of
    // BM25/RRF document ranking): per document, the PassW-token window
    // with the most query-term hits, scored with a RANGE-frame count
    // over term-hit positions — two-pointer window density as one
    // declarative window spec. The generator's output is filtered to
    // MATCHING tokens before the only doc-key shuffle, so the exchange
    // carries hits (3 terms' occurrences), never the token stream; the
    // best-window argmax reuses the same doc-key partitioning, and the
    // snippet materializes from a final doc-key join on the <= 20
    // winners. All-integer scores + list slicing keep both engines
    // hash-exact.
    Q("q_best_passage",
      (s, d) => {
        val ts = terms
        val dd = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("t"))
        val hits = dd
          .select(col("doc_id"), posexplode(col("t")).as(Seq("p0", "tok")))
          .filter(col("tok").isin(ts: _*))
          .select(col("doc_id"), (col("p0") + 1).as("pos"))
        val wRange = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          .rangeBetween(Window.currentRow, PassW - 1)
        val win = hits.withColumn("n_hits", count(lit(1)).over(wRange))
        val wBest = Window.partitionBy(col("doc_id"))
          .orderBy(col("n_hits").desc, col("pos"))
        val best = win.withColumn("rn", row_number().over(wBest))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("pos").as("win_start"), col("n_hits"))
        best.join(dd, "doc_id")
          .select(col("doc_id"), col("win_start"), col("n_hits"),
            array_join(slice(col("t"), col("win_start"), lit(PassW)), " ").as("snippet"))
          .orderBy(col("n_hits").desc, col("doc_id"))
          .limit(20)
      },
      Some(s"""WITH d AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |hits AS (
         |  SELECT doc_id, i AS pos
         |  FROM (SELECT doc_id, unnest(generate_series(1, len(t))) AS i, t FROM d)
         |  WHERE t[i] IN $termsSql),
         |win AS (
         |  SELECT doc_id, pos,
         |    CAST(count(*) OVER (PARTITION BY doc_id ORDER BY pos
         |      RANGE BETWEEN CURRENT ROW AND ${PassW - 1} FOLLOWING) AS BIGINT) AS n_hits
         |  FROM hits),
         |best AS (
         |  SELECT doc_id, pos AS win_start, n_hits FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY doc_id ORDER BY n_hits DESC, pos) AS rn
         |    FROM win) WHERE rn = 1)
         |SELECT b.doc_id, b.win_start, b.n_hits,
         |  array_to_string(d.t[b.win_start : b.win_start + ${PassW - 1}], ' ') AS snippet
         |FROM best b JOIN d USING (doc_id)
         |ORDER BY n_hits DESC, doc_id LIMIT 20""".stripMargin)),

    // CCNet-style language-model quality banding (Wenzek et al., LREC
    // 2020): score every document's perplexity proxy under a reference
    // LM, then band the corpus head / middle / tail for curation. The
    // "LM" is restated at fixture scale as a hashed token-bigram add-one
    // model trained on the clean reference slice (lang='en', the DSIR
    // target convention): P(cur|prev) ~ (c[h2(prev,cur) % B] + 1) /
    // (c[h1(prev) % B] + B) over B=2048 buckets, per-doc score = mean
    // -ln P over bigram positions. Scale shape (the q_dsir_select
    // pattern): the corpus bigram stream is ONE narrow codegen'd pass
    // (GramHashExpr k=1/k=2 + posexplode; the context hash is an
    // element_at on the position, no (doc,pos) join); the entire model
    // is 2xB counters that BROADCAST back for scoring at any corpus
    // size; the reference mean is a 1-row broadcast; banding thresholds
    // derive from it (head <= rm, middle <= 1.03*rm), so no corpus-wide
    // sort or percentile pass. ln() operands are single counts —
    // round(,9) absorbs the few-ulp engine divergence, per-doc and
    // per-band means are decimal-routed, so every band and mean
    // hash-matches bit-for-bit.
    Q("q_lm_score",
      (s, d) => {
        import graft.functions.TextOps
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), split(col("text"), " ").as("t"))
          .filter(size(col("t")) >= 2)
        // zip (context, bigram) hash arrays BEFORE exploding so each
        // exploded row carries two longs — carrying the full h1 array
        // through the Generate and element_at-ing per position was
        // O(len^2) bytes per doc (measured 5.8s -> the staged zip runs
        // the family at DSIR speed). The stream feeds three subtrees
        // (two model counts + scoring), so stage it once
        // (localCheckpoint, the prefixJoin pattern; at 1000 executors a
        // reliable checkpoint/staging write is the durable variant).
        val pos = toks.select(col("doc_id"), col("lang"),
            explode(arrays_zip(
              slice(TextOps.gramHashes(col("t"), 1), lit(1), size(col("t")) - 1),
              TextOps.gramHashes(col("t"), 2))).as("u"))
          .select(col("doc_id"), col("lang"),
            (col("u.0") % LmB).as("bc"),
            (col("u.1") % LmB).as("bb"))
          .localCheckpoint()
        val ref = pos.filter(col("lang") === "en")
        val cb = ref.groupBy(col("bb")).agg(count(lit(1)).as("cbc"))
        val cu = ref.groupBy(col("bc")).agg(count(lit(1)).as("cuc"))
        val sc = pos.join(broadcast(cb), Seq("bb"), "left")
          .join(broadcast(cu), Seq("bc"), "left")
          .select(col("doc_id"), col("lang"),
            round(log((coalesce(col("cuc"), lit(0L)) + LmB).cast("double")) -
              log((coalesce(col("cbc"), lit(0L)) + 1).cast("double")), 9)
              .as("term"))
        // per-doc and reference means are re-aggregated at the next
        // level, so both snap to a 1e-9 grid the DECIMAL(25,12) cast is
        // exact on. The snap is FLOOR-scaling (the P43 pattern), not
        // round(,9): a grid-sum/count quotient can land exactly on a
        // .5e-9 rounding tie, where Spark's exact-expansion HALF_UP and
        // DuckDB's float rounding go opposite ways — floor of the same
        // double bits is tie-free and identical on both engines.
        val doc = sc.groupBy(col("doc_id"), col("lang"))
          .agg((floor(H.dsum12(col("term")) / count(lit(1)) * lit(1e9))
            .cast("double") / lit(1e9)).as("nll"))
        val rm = doc.filter(col("lang") === "en")
          .agg((floor(H.dsum12(col("nll")) / count(lit(1)) * lit(1e9))
            .cast("double") / lit(1e9)).as("rm"))
        doc.join(rm)
          .select(col("lang"),
            when(col("nll") <= col("rm"), "head")
              .when(col("nll") <= col("rm") * lit(1.03), "middle")
              .otherwise("tail").as("band"),
            col("nll"))
          .groupBy(col("lang"), col("band"))
          .agg(count(lit(1)).as("n_docs"),
            (H.dsum12(col("nll")) / count(lit(1))).as("mean_nll"))
          .orderBy(col("lang"), col("band"))
      },
      Some(s"""WITH tt AS (
         |  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
         |  WHERE len(string_split(text, ' ')) >= 2),
         |upos AS (
         |  SELECT doc_id, lang,
         |    unnest(list_transform(generate_series(1, len(t) - 1),
         |      i -> struct_pack(bc := (CAST((strpos('0123456789abcdef', substr(md5(t[i]), 1, 1)) - 1) * 72057594037927936 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i]), 2, 1)) - 1) * 4503599627370496 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i]), 3, 1)) - 1) * 281474976710656 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i]), 4, 1)) - 1) * 17592186044416 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i]), 5, 1)) - 1) * 1099511627776 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i]), 6, 1)) - 1) * 68719476736 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i]), 7, 1)) - 1) * 4294967296 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i]), 8, 1)) - 1) * 268435456 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i]), 9, 1)) - 1) * 16777216 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i]), 10, 1)) - 1) * 1048576 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i]), 11, 1)) - 1) * 65536 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i]), 12, 1)) - 1) * 4096 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i]), 13, 1)) - 1) * 256 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i]), 14, 1)) - 1) * 16 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i]), 15, 1)) - 1) * 1 AS BIGINT)) % $LmB,
         |                       bb := (CAST((strpos('0123456789abcdef', substr(md5(t[i] || ' ' || t[i+1]), 1, 1)) - 1) * 72057594037927936 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i] || ' ' || t[i+1]), 2, 1)) - 1) * 4503599627370496 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i] || ' ' || t[i+1]), 3, 1)) - 1) * 281474976710656 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i] || ' ' || t[i+1]), 4, 1)) - 1) * 17592186044416 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i] || ' ' || t[i+1]), 5, 1)) - 1) * 1099511627776 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i] || ' ' || t[i+1]), 6, 1)) - 1) * 68719476736 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i] || ' ' || t[i+1]), 7, 1)) - 1) * 4294967296 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i] || ' ' || t[i+1]), 8, 1)) - 1) * 268435456 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i] || ' ' || t[i+1]), 9, 1)) - 1) * 16777216 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i] || ' ' || t[i+1]), 10, 1)) - 1) * 1048576 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i] || ' ' || t[i+1]), 11, 1)) - 1) * 65536 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i] || ' ' || t[i+1]), 12, 1)) - 1) * 4096 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i] || ' ' || t[i+1]), 13, 1)) - 1) * 256 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i] || ' ' || t[i+1]), 14, 1)) - 1) * 16 AS BIGINT) + CAST((strpos('0123456789abcdef', substr(md5(t[i] || ' ' || t[i+1]), 15, 1)) - 1) * 1 AS BIGINT)) % $LmB))) AS u
         |  FROM tt),
         |pos AS (SELECT doc_id, lang, u.bc AS bc, u.bb AS bb FROM upos),
         |cb AS (SELECT bb, CAST(count(*) AS BIGINT) AS cbc FROM pos WHERE lang = 'en' GROUP BY 1),
         |cu AS (SELECT bc, CAST(count(*) AS BIGINT) AS cuc FROM pos WHERE lang = 'en' GROUP BY 1),
         |sc AS (
         |  SELECT pos.doc_id, pos.lang,
         |    round(ln(CAST(COALESCE(cu.cuc, 0) + $LmB AS DOUBLE)) -
         |          ln(CAST(COALESCE(cb.cbc, 0) + 1 AS DOUBLE)), 9) AS term
         |  FROM pos LEFT JOIN cb ON cb.bb = pos.bb LEFT JOIN cu ON cu.bc = pos.bc),
         |doc AS (
         |  SELECT doc_id, lang,
         |    floor(CAST(sum(CAST(term AS DECIMAL(25,12))) AS DOUBLE)/count(*) * 1e9)/1e9 AS nll
         |  FROM sc GROUP BY 1, 2),
         |rm AS (
         |  SELECT floor(CAST(sum(CAST(nll AS DECIMAL(25,12))) AS DOUBLE)/count(*) * 1e9)/1e9 AS rm
         |  FROM doc WHERE lang = 'en')
         |SELECT lang,
         |  CASE WHEN nll <= rm THEN 'head'
         |       WHEN nll <= rm * 1.03 THEN 'middle'
         |       ELSE 'tail' END AS band,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CAST(nll AS DECIMAL(25,12))) AS DOUBLE)/count(*) AS mean_nll
         |FROM doc, rm
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin))
  )

  /** q_lm_score: hashed-bigram LM bucket count (the whole model is 2 x
    * LmB counters) and the middle/tail band threshold multiplier on the
    * reference mean nll. */
  final val LmB = 2048

  /** q_repetition_filter thresholds: a doc is flagged when its modal
    * consecutive 2-gram covers more than RepTop2Max of 2-gram positions,
    * or duplicated 3-grams cover more than RepDup3Max of 3-gram
    * positions. Set just above the synthetic corpus's p90/p95 so the
    * gate discriminates (~20% flagged at every SF) without flagging
    * everything. */
  final val RepTop2Max = 0.06
  final val RepDup3Max = 0.02

  /** q_chunk_windows: window width / stride in tokens (50% overlap). */
  final val ChunkW = 32
  final val ChunkS = 16


  /** q_pack_bins: tokens per bin (a 2k training context). */
  final val PackB = 2048

  /** q_mixture_rebalance: global sampling budget (fraction of corpus). */
  final val MixBudget = 0.4
}
