package graft.ops

import graft.{OracleSql, Q, Tables}
import graft.functions.VectorOps
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, HashingTF, MinHashLSH}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MLlib-backed batch indexing (BASELINE.json "spark_approach": MLlib for
  * batch indexing, DataFrame for metadata):
  *
  *  - q_ivf_kmeans: a real IVF index — KMeans (seeded) learns the coarse
  *    quantizer, vectors are assigned to cells, queries probe only their
  *    cell. Cluster ids are engine-specific => no SQL oracle (driver
  *    records the rows-only check); structure + recall are asserted in
  *    ScalaTest.
  *  - q_mllib_minhash: MLlib MinHashLSH near-dup join over token sets —
  *    the library twin of the hand-rolled q_minhash_lsh.
  *  - q_ann_recall: recall@3 of the sign-bucket LSH against the exact
  *    brute-force top-3 — fully deterministic, oracle-checked; the metric
  *    one would monitor when tuning bucket bits at scale.
  */
object MLQueries {

  /** q_calibration affine clamp: p = clamp(score + CalShift, 0,
    * CalRange)/CalRange (margins measured in [-23k, +16k] across SFs, so
    * the clamp bites only the tails); label = n_chars > CalLabelChars
    * (the corpus median is ~300 — a balanced ground truth). Declared
    * BEFORE `all`: the oracle strings interpolate eagerly at object init. */
  final val CalShift = 20000L
  final val CalRange = 40000
  final val CalLabelChars = 300

  val all: Seq[Q] = Seq(

    // Oracle closure: KMeans cell assignments are engine-specific, so the
    // registry row reduces the IVF result to invariants DuckDB can state
    // independently: the query count, completeness (3 results per query),
    // a recall@3-vs-exact floor, and an exact companion — the mean of the
    // brute-force top-3 scores, summed via the 2^43 floor trick (exact
    // integer DECIMAL sum => order-independent, bitwise equal across
    // engines; see q_centroids). A clustering/probe regression drops
    // recall below the floor and fails the hash-match. The raw per-query
    // result stays available as `ivfTop3` (structure + recall asserted in
    // MLSpec).
    Q("q_ivf_kmeans",
      (s, d) => {
        val ivf = ivfTop3(s, d)
        val emb = Tables.embeddings(s, d)
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val sc = q.join(emb.select(col("vec_id"), col("embedding")),
            col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            VectorOps.cosineFloat(col("qe"), col("embedding")).as("score"))
        val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
        val exact = sc.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        val P43 = 8796093022208.0 // 2^43
        val exactAgg = exact.agg(
          count(lit(1)).as("n_exact"),
          (sum(floor(col("score") * lit(P43))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .cast("double") / lit(P43) / count(lit(1))).as("exact_mean_top3"))
        val hits = exact.select(col("qid"), col("vec_id"))
          .join(ivf.select(col("qid"), col("vec_id")), Seq("qid", "vec_id"), "left_semi")
          .agg(count(lit(1)).as("nhit"))
        ivf.agg(countDistinct(col("qid")).as("n_queries"),
            count(lit(1)).as("n_results"))
          .crossJoin(hits).crossJoin(exactAgg)
          .select(col("n_queries"),
            (col("n_results") === col("n_exact")).cast("long").as("results_complete"),
            (col("nhit").cast("double") / col("n_exact").cast("double")
              >= lit(IvfRecallFloor)).cast("long").as("recall_ok"),
            col("exact_mean_top3"))
      },
      Some {
        val w = "row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id)"
        s"""WITH qq AS (
           |  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
           |sc AS (
           |  SELECT qq.qid, e.vec_id, ${OracleSql.floatCos("qq.qe", "e.embedding")} AS score
           |  FROM qq JOIN embeddings e ON e.vec_id <> qq.qid),
           |exact AS (
           |  SELECT qid, vec_id, score FROM (
           |    SELECT qid, vec_id, score, $w AS rn FROM sc) t WHERE rn <= 3)
           |SELECT CAST(5 AS BIGINT) AS n_queries,
           |  CAST(1 AS BIGINT) AS results_complete,
           |  CAST(1 AS BIGINT) AS recall_ok,
           |  CAST(sum(CAST(floor(score * 8796093022208.0) AS DECIMAL(38,0))) AS DOUBLE)
           |    / 8796093022208.0 / count(*) AS exact_mean_top3
           |FROM exact""".stripMargin
      }),

    // Oracle closure: the MinHashLSH candidate set is hash-seed-specific,
    // so the registry row reduces it to invariants: the exact count of
    // true near-dup pairs (trigram-shingle jaccard >= 0.8 — the same
    // truth set q_ngram_jaccard oracle-checks) and `all_true_found` — the
    // LSH join must cover every true pair (approxSimilarityJoin
    // post-filters candidates by exact key distance, so any miss is a
    // candidate-generation failure). DuckDB recomputes the truth count
    // and states 1 for coverage. Raw pairs stay available as
    // `mllibMinhashPairs` (superset property asserted in MLSpec).
    Q("q_mllib_minhash",
      (s, d) => {
        val found = mllibMinhashPairs(s, d).select(col("doc_a"), col("doc_b"))
        val shh = TextQueries.tokenized(s, d)
          .select(col("doc_id"), explode(TextQueries.shingleArray(col("t"))).as("sh"))
          .select(col("doc_id"), graft.functions.TextOps.md5Prefix60(col("sh")).as("shh"))
        val sizes = shh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val truePairs = shh.select(col("doc_id").as("doc_a"), col("shh"))
          .join(shh.select(col("doc_id").as("doc_b"), col("shh")), "shh")
          .filter(col("doc_a") < col("doc_b"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("inter"))
          .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
          .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
          .filter(col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")) >= lit(0.8))
          .select(col("doc_a"), col("doc_b"))
        val missed = truePairs.join(found, Seq("doc_a", "doc_b"), "left_anti")
          .agg(count(lit(1)).as("n_missed"))
        truePairs.agg(count(lit(1)).as("n_true_pairs"))
          .crossJoin(missed)
          .select(col("n_true_pairs"),
            (col("n_missed") === 0).cast("long").as("all_true_found"))
      },
      Some(s"""WITH ${TextQueries.shinglesCte},
         |shh AS (SELECT doc_id, ${OracleSql.hexToLong("md5(sh)", 1, 15)} AS shh FROM sh),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS inter
         |  FROM shh a JOIN shh b ON a.shh = b.shh AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM shh GROUP BY doc_id),
         |tp AS (
         |  SELECT doc_a, doc_b FROM pairs
         |  JOIN sizes sa ON doc_a = sa.doc_id
         |  JOIN sizes sb ON doc_b = sb.doc_id
         |  WHERE CAST(inter AS DOUBLE)/(sa.n + sb.n - inter) >= 0.8)
         |SELECT CAST(count(*) AS BIGINT) AS n_true_pairs,
         |  CAST(1 AS BIGINT) AS all_true_found
         |FROM tp""".stripMargin)),

    // Oracle closure for the MLlib euclidean-LSH twin
    // (BucketedRandomProjectionLSH — the second MLlib LSH family from
    // SURVEY §7 M4, next to MinHashLSH): per-query approxNearestNeighbors
    // results are hash-seed-specific, so the registry row reduces them to
    // invariants — completeness (3 results per query), a recall@3 floor
    // vs the exact euclidean top-3, and an exact companion the oracle
    // recomputes (mean exact top-3 distance, 2^43 floor trick => exact
    // DECIMAL sum, order-independent). Raw neighbors stay available as
    // `brpTop3` (MLSpec asserts structure + recall).
    Q("q_mllib_brp",
      (s, d) => {
        val brp = brpTop3(s, d)
        val emb = Tables.embeddings(s, d)
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val dist = {
          val diff2 = zip_with(col("qe"), col("embedding"),
            (x, y) => (x.cast("double") - y.cast("double")) *
              (x.cast("double") - y.cast("double")))
          sqrt(aggregate(diff2, lit(0.0), (acc, v) => acc + v))
        }
        val sc = q.join(emb.select(col("vec_id"), col("embedding")),
            col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), dist.as("dist"))
        val w = Window.partitionBy(col("qid")).orderBy(col("dist").asc, col("vec_id"))
        val exact = sc.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        val P43 = 8796093022208.0 // 2^43
        val exactAgg = exact.agg(
          count(lit(1)).as("n_exact"),
          (sum(floor(col("dist") * lit(P43))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .cast("double") / lit(P43) / count(lit(1))).as("exact_mean_top3_dist"))
        val hits = exact.select(col("qid"), col("vec_id"))
          .join(brp.select(col("qid"), col("vec_id")), Seq("qid", "vec_id"), "left_semi")
          .agg(count(lit(1)).as("nhit"))
        brp.agg(countDistinct(col("qid")).as("n_queries"),
            count(lit(1)).as("n_results"))
          .crossJoin(hits).crossJoin(exactAgg)
          .select(col("n_queries"),
            (col("n_results") === col("n_exact")).cast("long").as("results_complete"),
            (col("nhit").cast("double") / col("n_exact").cast("double")
              >= lit(BrpRecallFloor)).cast("long").as("recall_ok"),
            col("exact_mean_top3_dist"))
      },
      Some {
        val dSql = "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
          "list_transform(list_zip(qq.qe, e.embedding), " +
          "p -> (CAST(p[1] AS DOUBLE)-CAST(p[2] AS DOUBLE))*(CAST(p[1] AS DOUBLE)-CAST(p[2] AS DOUBLE)))), (a,x) -> a+x))"
        s"""WITH qq AS (
           |  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
           |sc AS (
           |  SELECT qq.qid, e.vec_id, $dSql AS dist
           |  FROM qq JOIN embeddings e ON e.vec_id <> qq.qid),
           |exact AS (
           |  SELECT qid, vec_id, dist FROM (
           |    SELECT qid, vec_id, dist,
           |      row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rn
           |    FROM sc) t WHERE rn <= 3)
           |SELECT CAST(5 AS BIGINT) AS n_queries,
           |  CAST(1 AS BIGINT) AS results_complete,
           |  CAST(1 AS BIGINT) AS recall_ok,
           |  CAST(sum(CAST(floor(dist * 8796093022208.0) AS DECIMAL(38,0))) AS DOUBLE)
           |    / 8796093022208.0 / count(*) AS exact_mean_top3_dist
           |FROM exact""".stripMargin
      }),

    // Dimensionality reduction — the embedding-pipeline step the index
    // tiers sit downstream of (reduce 64 -> 8 dims before IVF/PQ/LSH).
    // MLlib PCA (SVD over the covariance); oracle closure via the
    // variance-decomposition identity: the components themselves are
    // engine-specific, but (a) explainedVariance is a PROPORTION vector
    // whose top-K sum has a probeable floor, (b) P^T P = I is structural
    // (checked driver-side on the K x K gram of the loadings), and
    // (c) the TOTAL per-dim variance is exactly recomputable by DuckDB
    // through the 2^43 DECIMAL quantization with identical double op
    // order — the exact companion that anchors the hash-match.
    Q("q_pca_reduce",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val model = new org.apache.spark.ml.feature.PCA()
          .setInputCol("fv").setOutputCol("proj").setK(PcaK)
          .fit(emb.select(array_to_vector(col("embedding")).as("fv")))
        val explained = model.explainedVariance.toArray.sum
        val pc = model.pc
        var maxDev = 0.0
        var a = 0
        while (a < PcaK) {
          var b = 0
          while (b < PcaK) {
            var dot = 0.0
            var i = 0
            while (i < pc.numRows) { dot += pc(i, a) * pc(i, b); i += 1 }
            val target = if (a == b) 1.0 else 0.0
            maxDev = math.max(maxDev, math.abs(dot - target))
            b += 1
          }
          a += 1
        }
        val P43 = 8796093022208.0
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val perDim = emb
          .select(posexplode(col("embedding")).as(Seq("i", "x")))
          .groupBy(col("i"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("x").cast("double") * lit(P43)).cast(dec))
              .cast("double").as("s1"),
            sum(floor(col("x").cast("double") * col("x").cast("double") * lit(P43))
              .cast(dec)).cast("double").as("s2"))
          .select((((col("s2") / lit(P43)) -
            (col("s1") / lit(P43)) * (col("s1") / lit(P43)) / col("n")) /
            (col("n") - 1)).as("v"))
        perDim.agg(
            (sum(floor(col("v") * lit(P43)).cast(dec)).cast("double") / lit(P43))
              .as("total_var"))
          .select(lit(PcaK.toLong).as("n_components"),
            lit(if (explained >= PcaExplainedFloor) 1L else 0L).as("explained_ok"),
            lit(if (maxDev < 1e-9) 1L else 0L).as("orthonormal_ok"),
            col("total_var"))
      },
      Some {
        val P = "8796093022208.0"
        s"""WITH cm AS (
           |  SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding) AS x
           |  FROM embeddings),
           |per AS (
           |  SELECT i, count(*) AS n,
           |    CAST(sum(CAST(floor(CAST(x AS DOUBLE) * $P) AS DECIMAL(38,0))) AS DOUBLE) AS s1,
           |    CAST(sum(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * $P) AS DECIMAL(38,0))) AS DOUBLE) AS s2
           |  FROM cm GROUP BY i),
           |v AS (
           |  SELECT ((s2 / $P) - (s1 / $P) * (s1 / $P) / n) / (n - 1) AS v FROM per)
           |SELECT CAST($PcaK AS BIGINT) AS n_components,
           |  CAST(1 AS BIGINT) AS explained_ok,
           |  CAST(1 AS BIGINT) AS orthonormal_ok,
           |  CAST(sum(CAST(floor(v * $P) AS DECIMAL(38,0))) AS DOUBLE) / $P AS total_var
           |FROM v""".stripMargin
      }),

    // Mutual-information feature ranking — the filter-method feature
    // selection between raw features (embedding dims) and the label:
    // MI(sign(dim_i); label) = sum over the 2 x |labels| cells of
    // p(s,l) * ln(p(s,l)/(p(s)p(l))). Every probability is an exact
    // count ratio, the ln argument is one double division of exact
    // integer products (identical operand order on both engines), and
    // the per-dim CELL SUM routes through the 2^43 floor/DECIMAL fold —
    // order-independent, so the 20-cell sum needs no ordering contract.
    // Scale shape: ONE corpus-scale explode into a (dim, sign, label)
    // count (map-side combinable, 128 x 2 x 10 cells), then everything
    // is cell-table-sized; the top-10 is a TakeOrdered over 128 rows.
    Q("q_feature_mi",
      (s, d) => {
        val P43 = 8796093022208.0
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val emb = Tables.embeddings(s, d)
        val cells = emb
          .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
          .select(col("label"), col("pos"),
            (col("x") >= 0f).cast("long").as("sgn"))
        val joint = cells.groupBy(col("pos"), col("sgn"), col("label"))
          .agg(count(lit(1)).as("njl"))
        val margS = cells.groupBy(col("pos"), col("sgn"))
          .agg(count(lit(1)).as("ns"))
        val margL = cells.filter(col("pos") === 0)
          .groupBy(col("label")).agg(count(lit(1)).as("nl"))
        val total = margL.agg(sum(col("nl")).as("nn"))
        val term = (col("njl").cast("double") / col("nn").cast("double")) *
          log((col("njl").cast("double") * col("nn").cast("double")) /
            (col("ns").cast("double") * col("nl").cast("double")))
        joint.join(margS, Seq("pos", "sgn"))
          .join(broadcast(margL), "label")
          .crossJoin(broadcast(total))
          .groupBy(col("pos"))
          .agg((sum(floor(term * lit(P43)).cast(dec)).cast("double") / lit(P43))
            .as("mi"))
          .select(col("pos").cast("long").as("pos"), col("mi"))
          .orderBy(col("mi").desc, col("pos"))
          .limit(10)
      },
      Some {
        val P = "8796093022208.0"
        val term = "(CAST(njl AS DOUBLE) / CAST(nn AS DOUBLE)) * " +
          "ln((CAST(njl AS DOUBLE) * CAST(nn AS DOUBLE)) / " +
          "(CAST(ns AS DOUBLE) * CAST(nl AS DOUBLE)))"
        s"""WITH cells AS (
           |  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
           |    CASE WHEN unnest(embedding) >= 0 THEN 1 ELSE 0 END AS sgn
           |  FROM embeddings),
           |joint AS (SELECT pos, sgn, label, count(*) AS njl
           |  FROM cells GROUP BY pos, sgn, label),
           |margs AS (SELECT pos, sgn, count(*) AS ns
           |  FROM cells GROUP BY pos, sgn),
           |margl AS (SELECT label, count(*) AS nl
           |  FROM cells WHERE pos = 0 GROUP BY label),
           |total AS (SELECT CAST(sum(nl) AS BIGINT) AS nn FROM margl)
           |SELECT CAST(j.pos AS BIGINT) AS pos,
           |  CAST(sum(CAST(floor($term * $P) AS DECIMAL(38,0))) AS DOUBLE) / $P AS mi
           |FROM joint j JOIN margs m USING (pos, sgn)
           |JOIN margl l USING (label) CROSS JOIN total
           |GROUP BY j.pos ORDER BY mi DESC, pos LIMIT 10""".stripMargin
      }),

    // Oracle closure: ALS factors are seed- and partitioning-specific
    // (the normal-equation accumulation order follows the block layout),
    // so the registry row reduces model-based CF to invariants DuckDB
    // states independently: the exact ratings-matrix shape (n_users /
    // n_items / n_ratings and the BIGINT rating mass — all replayed),
    // factor-table completeness (every user and item received a rank-4
    // factor), and a training-fit floor: RMSE on the training ratings
    // must undercut 0.6x the constant-mean baseline RMSE (measured by
    // tools/AlsProbe: ratio 0.32/0.32/0.36 across the three SFs against
    // baselines ~14.5 — the floor has ~2x headroom and a broken fit
    // reverts to ~1.0). Trains on a 1-year slice so
    // the fit cost stays bounded on the bench sweep; q_item_cf is the
    // NEIGHBORHOOD-method companion (exact, oracle-bitwise), this is the
    // MODEL-based one (library parity, invariant-gated) — the two
    // classic CF families side by side.
    Q("q_mllib_als",
      (s, d) => {
        val ratings = Tables.orders(s, d)
          .filter(year(col("o_orderdate")) === 1998)
          .select(col("o_orderkey"), col("o_custkey"))
          .join(Tables.lineitem(s, d)
            .select(col("l_orderkey"), col("l_partkey"), col("l_quantity")),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_custkey").cast("int").as("user"),
            col("l_partkey").cast("int").as("item"))
          .agg(sum(floor(col("l_quantity")).cast("long")).as("qty"))
          .select(col("user"), col("item"), col("qty"),
            col("qty").cast("float").as("rating"))
          .cache()
        val als = new org.apache.spark.ml.recommendation.ALS()
          .setRank(4).setMaxIter(5).setRegParam(0.1).setSeed(7L)
          .setUserCol("user").setItemCol("item").setRatingCol("rating")
          .setColdStartStrategy("drop")
        val model = als.fit(ratings)
        val pred = model.transform(ratings)
          .select(col("rating").cast("double").as("r"),
            col("prediction").cast("double").as("p"))
        val rmse = math.sqrt(pred
          .agg(avg((col("r") - col("p")) * (col("r") - col("p"))))
          .head.getDouble(0)) // 1-row bounded driver value
        val mu = ratings.agg(avg(col("rating"))).head.getDouble(0)
        val base = math.sqrt(ratings
          .agg(avg((col("rating") - mu) * (col("rating") - mu)))
          .head.getDouble(0)) // constant-mean baseline RMSE (1-row)
        val nUsers = model.userFactors.count()
        val nItems = model.itemFactors.count()
        val dimsOk = model.rank == 4
        val out = ratings.agg(
            countDistinct(col("user")).as("n_users"),
            countDistinct(col("item")).as("n_items"),
            count(lit(1)).as("n_ratings"),
            sum(col("qty")).as("rating_mass"))
          .select(col("n_users"), col("n_items"), col("n_ratings"),
            col("rating_mass"),
            (lit(rmse) <= lit(0.6) * lit(base) && lit(dimsOk))
              .cast("long").as("fit_ok"),
            (col("n_users") === nUsers && col("n_items") === nItems)
              .cast("long").as("factors_complete"))
        out.collect() // force before unpersist
        ratings.unpersist()
        out
      },
      Some("""WITH r AS (
         |  SELECT o.o_custkey AS u, l.l_partkey AS i,
         |    CAST(sum(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT)
         |      AS qty
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         |  WHERE year(o.o_orderdate) = 1998
         |  GROUP BY 1, 2)
         |SELECT CAST(count(DISTINCT u) AS BIGINT) AS n_users,
         |  CAST(count(DISTINCT i) AS BIGINT) AS n_items,
         |  CAST(count(*) AS BIGINT) AS n_ratings,
         |  CAST(sum(qty) AS BIGINT) AS rating_mass,
         |  CAST(1 AS BIGINT) AS fit_ok,
         |  CAST(1 AS BIGINT) AS factors_complete
         |FROM r""".stripMargin)),

    annRecallQuery("q_ann_recall", multiProbe = false),

    // Multi-probe LSH: probe the query's bucket AND its four 1-bit
    // neighbors — the standard recall/cost knob (recall rises, candidates
    // stay ~5/16 of the corpus instead of all of it).
    annRecallQuery("q_ann_recall_multiprobe", multiProbe = true),

    rpRecallQuery,

    // Calibration audit (reliability diagram + ECE) of the
    // q_quality_classifier margin against a ground-truth label — the
    // model-eval step AFTER q_eval_metrics's precision/recall: a
    // classifier whose threshold gates a curation pipeline must also be
    // CALIBRATED, or its scores cannot be traded off against other
    // signals (Guo et al., ICML 2017). The margin is mapped to a
    // probability by the fixed affine clamp p = clamp(score+20000,
    // 0, 40000)/40000 and binned into 10 equal-width bins ENTIRELY in
    // integer arithmetic (bin = clamped div 4000); the label is the
    // long-doc indicator n_chars > 300. Per bin: count, mean predicted p,
    // positive fraction, |gap|; plus the expected calibration error.
    //
    // Everything is exact: ECE = sum_b (n_b/N)*|avg_pred_b - frac_pos_b|
    // algebraically collapses to sum_b |sum_k_b - 40000*pos_b| /
    // (40000*N) — ONE BIGINT aggregate numerator, two IEEE divisions at
    // display, no double ever summed. The reported per-bin doubles are
    // single divisions of exactly-cast integers (bitwise across engines).
    // Scale shape: one token-explode scan into a doc-keyed aggregate
    // (the classifier pass itself), then a 10-row bin aggregate and a
    // 1-row ECE broadcast back onto it — audit cost is the inference
    // pass, the calibration table is O(bins) regardless of corpus size.
    Q("q_calibration",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"),
            explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
        val sc = toks
          .select(col("doc_id"), col("n_chars"),
            element_at(lit(PipelineQueries.QualityWeights),
              (graft.functions.TextOps.md5Prefix60(col("tok"))
                % PipelineQueries.QualityD).cast("int") + 1).as("w"))
          .groupBy(col("doc_id"), col("n_chars"))
          .agg(sum(col("w")).cast("long").as("score"))
        val rows = sc.select(
          least(greatest(col("score") + lit(CalShift), lit(0L)),
            lit(CalRange)).as("k"),
          when(col("n_chars") > CalLabelChars, 1L).otherwise(0L).as("pos"))
        val bins = rows
          .groupBy(least(expr(s"k div ${CalRange / 10}"), lit(9L)).as("bin"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
            sum(col("pos")).as("n_pos"))
        val tot = bins.agg(
          sum(col("n")).as("nn"),
          sum(abs(col("sum_k") - lit(CalRange.toLong) * col("n_pos")))
            .as("err_num"))
          .select((col("err_num").cast("double") / lit(CalRange.toDouble) /
            col("nn").cast("double")).as("ece"))
        bins.crossJoin(tot)
          .select(col("bin"), col("n"),
            (col("sum_k").cast("double") / lit(CalRange.toDouble) /
              col("n").cast("double")).as("avg_pred"),
            (col("n_pos").cast("double") / col("n").cast("double"))
              .as("frac_pos"),
            abs(col("sum_k").cast("double") / lit(CalRange.toDouble) /
              col("n").cast("double") -
              col("n_pos").cast("double") / col("n").cast("double"))
              .as("gap"),
            col("ece"))
          .orderBy(col("bin"))
      },
      Some {
        val wlist = PipelineQueries.QualityWeights.mkString("[", ",", "]")
        val binW = CalRange / 10
        s"""WITH toks AS (
           |  SELECT doc_id, n_chars, unnest(string_split(text, ' ')) AS tok
           |  FROM documents),
           |sc AS (
           |  SELECT doc_id, n_chars,
           |    CAST(sum($wlist[${graft.OracleSql.hexToLong("md5(tok)", 1, 15)}
           |      % ${PipelineQueries.QualityD} + 1]) AS BIGINT) AS score
           |  FROM toks WHERE tok <> '' GROUP BY doc_id, n_chars),
           |rows_ AS (
           |  SELECT LEAST(GREATEST(score + $CalShift, 0), $CalRange) AS k,
           |    CASE WHEN n_chars > $CalLabelChars THEN 1 ELSE 0 END AS pos
           |  FROM sc),
           |bins AS (
           |  SELECT LEAST(k // $binW, 9) AS bin,
           |    CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(k) AS BIGINT) AS sum_k,
           |    CAST(sum(pos) AS BIGINT) AS n_pos
           |  FROM rows_ GROUP BY 1),
           |tot AS (
           |  SELECT CAST(sum(abs(sum_k - $CalRange * n_pos)) AS DOUBLE)
           |    / $CalRange.0 / CAST(sum(n) AS DOUBLE) AS ece
           |  FROM bins)
           |SELECT CAST(bin AS BIGINT) AS bin, n,
           |  CAST(sum_k AS DOUBLE) / $CalRange.0 / CAST(n AS DOUBLE) AS avg_pred,
           |  CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos,
           |  abs(CAST(sum_k AS DOUBLE) / $CalRange.0 / CAST(n AS DOUBLE)
           |    - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)) AS gap,
           |  ece
           |FROM bins, tot ORDER BY bin""".stripMargin
      })
  )

  /** q_pca_reduce: components kept (64 -> 8). */
  final val PcaK = 8

  /** Explained-variance-proportion floor for the top PcaK components,
    * stated by the q_pca_reduce oracle invariant. On iid Gaussian data the
    * covariance spectrum is Marchenko-Pastur-flat — the WORST case for
    * PCA — so the top 8 of 64 proportions sum to barely above 8/64.
    * Measured (tools/PcaProbe, one fit per SF): 0.2035 / 0.2049 / 0.1598
    * at sf0.001 / 0.01 / 0.1. Floor sits ~20% under the weakest; a real
    * clustered corpus concentrates variance and clears it trivially. */
  final val PcaExplainedFloor = 0.13

  /** recall@3 floor stated by the q_ivf_kmeans oracle invariant. Measured
    * single-probe IVF (8 cells, probe 1) recall on the near-random Gaussian
    * fixture (the adversarial case for coarse quantizers — see AnnTune
    * notes): 0.53 at sf0.001, 0.27 at sf0.01 (tools/IvfProbe). Random cell
    * assignment would score ~1/8 = 0.125; 0.2 sits between broken and
    * working at every fixture SF, so the invariant catches a
    * clustering/probe regression without being SF-brittle. `final` so the
    * eager oracle construction in `val all` sees the constant-folded value. */
  final val IvfRecallFloor = 0.2

  /** Raw IVF result: top-3 within-cell neighbors per query (qid, vec_id,
    * score, rn). KMeans (seeded) learns the coarse quantizer, vectors are
    * assigned to cells, queries probe only their own cell — the batch
    * index-build + probe shape of a real IVF index. Cell ids are
    * engine-specific, so the registry row (q_ivf_kmeans) reduces this to
    * oracle-checkable invariants; MLSpec asserts structure + recall here. */
  def ivfTop3(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .withColumn("fv", array_to_vector(col("embedding")))
    val km = new KMeans().setK(8).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("fv").setPredictionCol("cell")
    val model = km.fit(emb)
    val assigned = model.transform(emb)
      .select(col("vec_id"), col("embedding"), col("cell"))
    val queries = assigned.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("cell"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
    queries.join(assigned, "cell")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        VectorOps.cosineFloat(col("qe"), col("embedding")).as("score"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy(col("qid"), col("rn"))
  }

  /** recall@3 floor stated by the q_mllib_brp oracle invariant. Measured
    * (tools/BrpProbe) on the near-random Gaussian fixture: 0.933 at
    * sf0.001/sf0.01, 1.000 at sf0.1 — approxNearestNeighbors widens its
    * hash-distance threshold adaptively, so recall stays high even on
    * LSH-adversarial data. Random top-3 would score ~3/n < 0.01; 0.2
    * separates broken from working at every fixture SF with >4x margin.
    * `final` so the eager oracle construction in `val all` sees the
    * constant-folded value. */
  final val BrpRecallFloor = 0.2

  /** Raw MLlib BucketedRandomProjectionLSH top-3 euclidean neighbors per
    * query (qid, vec_id, dist) — the euclidean-LSH twin of `ivfTop3`.
    * approxNearestNeighbors post-ranks candidates by EXACT key distance,
    * so any rank error vs brute force is a candidate-generation miss. */
  def brpTop3(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .withColumn("fv", array_to_vector(col("embedding")))
      .select(col("vec_id"), col("fv"))
    val brp = new BucketedRandomProjectionLSH()
      .setInputCol("fv").setOutputCol("sig")
      .setNumHashTables(4).setBucketLength(2.0).setSeed(42L)
    val model = brp.fit(emb)
    val keys = emb.filter(col("vec_id") < 5).collect()
    keys.map { r =>
      val qid = r.getLong(0)
      val key = r.getAs[org.apache.spark.ml.linalg.Vector](1)
      model.approxNearestNeighbors(emb.filter(col("vec_id") =!= qid), key, 3, "dist")
        .select(lit(qid).as("qid"), col("vec_id"), col("dist"))
    }.reduce(_ unionByName _)
  }

  /** Raw MLlib MinHashLSH near-dup pairs (doc_a, doc_b, dist) — the
    * library twin of the hand-rolled q_minhash_lsh. Candidate pairs are
    * hash-seed-specific, so the registry row (q_mllib_minhash) reduces
    * this to oracle-checkable invariants; MLSpec asserts the superset
    * property here. */
  def mllibMinhashPairs(s: SparkSession, d: String): DataFrame = {
    // Shingle (word trigram) sets, not unigram sets: the fixture vocab
    // is 31 words, so unigram sets collide across most pairs (an
    // all-pairs blowup); trigram space is ~vocab^3 and behaves like a
    // real corpus.
    val docs = TextQueries.tokenized(s, d)
      .select(col("doc_id"), TextQueries.shingleArray(col("t")).as("toks"))
    // HashingTF, not CountVectorizer: no driver-side vocabulary fit (a
    // collect of the whole shingle vocab — a non-starter at 100 TB) and
    // no model broadcast; the fixed 2^18 feature space feeds MinHashLSH
    // identically well for set signatures.
    // Cache the TF vectors: approxSimilarityJoin(tf, tf) evaluates both
    // sides of the self-join, and without a cache each side re-runs the
    // tokenize -> shingle -> hash pipeline (an index-build artifact,
    // persisted exactly like a real LSH index would be).
    val tf = new HashingTF().setInputCol("toks").setOutputCol("tf")
      .setBinary(true).setNumFeatures(1 << 18)
      .transform(docs).select(col("doc_id"), col("tf"))
      .persist()
    // 4 OR'd tables (MLlib MinHashLSH only OR-amplifies; it cannot do
    // AND-banding, so its candidate volume on this collision-heavy
    // fixture is inherently larger than the hand-rolled 4x2-band
    // q_minhash_lsh — the cost difference is the point of comparison).
    // Table count is coverage-validated per fixture SF with
    // tools/MinhashCoverageProbe: 2 tables MISS 4 of the 256 true
    // jaccard>=0.8 pairs at sf0.1 (the all_true_found invariant is a
    // stated oracle constant, so a single miss is a hash-gate failure);
    // 3 tables cover every SF, 4 adds a table of margin.
    val mh = new MinHashLSH().setInputCol("tf").setOutputCol("sig")
      .setNumHashTables(4).setSeed(42L)
    val model = mh.fit(tf)
    // jaccard DISTANCE threshold 0.2 => shingle-set similarity >= 0.8
    val joined = model.approxSimilarityJoin(tf, tf, 0.2, "dist")
      .select(col("datasetA.doc_id").as("doc_a"),
        col("datasetB.doc_id").as("doc_b"), col("dist"))
      .filter(col("doc_a") < col("doc_b"))
      .orderBy(col("doc_a"), col("doc_b"))
    // materialize, then release the TF cache — without this every bench
    // rep leaks cached blocks for the session's lifetime
    val out = joined.localCheckpoint(true)
    tf.unpersist()
    out
  }

  // ---- random-hyperplane LSH (seeded), the high-recall configuration ----
  //
  // The 4 axis hyperplanes of q_ann_recall top out at recall 0.53 even
  // multi-probed. This is the tuned general configuration: RpTables=8
  // independent sign-LSH tables of RpBits=6 seeded random hyperplanes,
  // probed at hamming<=1 (base bucket + all 6 one-bit flips per table).
  // Chosen from the AnnTune sweep on the fixture (tools/AnnTune.scala) —
  // the corpus is near-random Gaussian (max neighbor cosine ~0.39, the
  // adversarial case for cosine LSH), and this point still reaches
  // recall@3 = 0.93 while touching ~60% of the corpus; tighter configs
  // (8 bits) fall to 0.67 recall. On a clustered real corpus the same
  // structure gives far lower candidate fractions.
  //
  // Scale shape: candidates come from an EQUI-JOIN on (table, bucket)
  // after exploding each query into its 8x7 probe keys — never an n^2
  // product or an OR-of-equalities cross join. The hyperplanes are
  // deterministic literal arrays (seed 1234), so the DuckDB oracle states
  // bit-identical projections: both engines left-fold the same doubles,
  // so every sign bit — and therefore every bucket — matches exactly.
  // final literal vals: constant-folded at compile time, so they are safe
  // to read from `val all`'s eager oracle-SQL construction above even
  // though that runs before this object's field initializers (a plain
  // `private val` here would still be 0 at that point and silently emit
  // an empty hyperplane list into the oracle)
  final val RpBits = 6
  final val RpTables = 8
  final val RpDim = 64
  private lazy val rpPlanes: Array[Array[Array[Double]]] = {
    val rng = new scala.util.Random(1234)
    Array.fill(RpTables)(Array.fill(RpBits)(Array.fill(RpDim)(rng.nextGaussian())))
  }

  private def rpRecallQuery: Q = {
    // (the declarative aggregate(zip_with) fold this kernel replaces lives
    // on as the parity reference in SimdSpec "sign_buckets kernel equals
    // the aggregate(zip_with) fold bitwise")

    Q("q_ann_recall_rp",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        // bucket signatures in ONE codegen'd pass (SignBucketsExpr) — the
        // declarative twin (48 aggregate(zip_with) folds, `bucketT`) stays
        // as the spec'd reference; both are bitwise-equal (SimdSpec).
        // Materialized because corpus rows AND probe rows both read it.
        val flat = new Array[Double](RpTables * RpBits * RpDim)
        for (t <- 0 until RpTables; j <- 0 until RpBits; i <- 0 until RpDim)
          flat((t * RpBits + j) * RpDim + i) = rpPlanes(t)(j)(i)
        val withB = emb.select(col("vec_id"), col("embedding"),
          VectorOps.signBuckets(col("embedding"), flat, RpTables, RpBits).as("bs"))
          .localCheckpoint(true)
        val corpusRows = withB
          .select(col("vec_id"), posexplode(col("bs")).as(Seq("t", "bucket")))
        val probeRows = withB.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), posexplode(col("bs")).as(Seq("t", "qb")))
          .select(col("qid"), col("t"), explode(array(
            col("qb") +: (0 until RpBits).map(j => col("qb").bitwiseXOR(lit(1 << j))): _*))
            .as("bucket"))
        val cand = probeRows.join(corpusRows, Seq("t", "bucket"))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id")).distinct()

        val q = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val sc = q.join(emb.select(col("vec_id"), col("embedding")),
            col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            VectorOps.cosineFloat(col("qe"), col("embedding")).as("score"))
        val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
        val exact = sc.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3).select(col("qid"), col("vec_id"))
        val approx = sc.join(cand, Seq("qid", "vec_id"), "left_semi")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3).select(col("qid"), col("vec_id"))
        val hits = exact.join(approx, Seq("qid", "vec_id"), "left_semi")
          .agg(count(lit(1)).as("nhit"))
        val ncand = cand.agg(count(lit(1)).as("ncand"))
        val ntot = emb.agg(count(lit(1)).as("n"))
        hits.crossJoin(ncand).crossJoin(ntot)
          .select(
            (col("nhit").cast("double") / lit(30.0)).as("recall_at_3"),
            (col("ncand").cast("double") / (lit(10.0) * (col("n") - 1).cast("double")))
              .as("cand_frac"))
      },
      Some {
        def dotSql(p: Array[Double]): String = {
          val lits = p.map(java.lang.Double.toString).mkString("[", ", ", "]")
          s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(list_zip(embedding, $lits), p -> CAST(p[1] AS DOUBLE)*p[2])), (a,x) -> a+x)"
        }
        def bucketSql(t: Int): String =
          (0 until RpBits).map(j =>
            s"(CASE WHEN ${dotSql(rpPlanes(t)(j))} >= 0 THEN ${1 << j} ELSE 0 END)")
            .mkString(" + ")
        val bsList = (0 until RpTables).map(bucketSql).mkString("[", ",\n    ", "]")
        val probeList = ("qb" +: (0 until RpBits).map(j => s"xor(qb, ${1 << j})"))
          .mkString("[", ", ", "]")
        s"""WITH wb AS (
           |  SELECT vec_id, embedding, $bsList AS bs
           |  FROM embeddings),
           |cr AS (
           |  SELECT vec_id, generate_subscripts(bs, 1) AS t, unnest(bs) AS bucket FROM wb),
           |pr0 AS (SELECT vec_id AS qid, t, bucket AS qb FROM cr WHERE vec_id < 10),
           |pr AS (SELECT qid, t, unnest($probeList) AS bucket FROM pr0),
           |cand AS (
           |  SELECT DISTINCT pr.qid, cr.vec_id
           |  FROM pr JOIN cr ON cr.t = pr.t AND cr.bucket = pr.bucket
           |  WHERE cr.vec_id <> pr.qid),
           |qq AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
           |sc AS (
           |  SELECT qq.qid, e.vec_id, ${OracleSql.floatCos("qq.qe", "e.embedding")} AS score
           |  FROM qq JOIN embeddings e ON e.vec_id <> qq.qid),
           |exact AS (
           |  SELECT qid, vec_id FROM (
           |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
           |    FROM sc) t WHERE rn <= 3),
           |approx AS (
           |  SELECT qid, vec_id FROM (
           |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
           |    FROM sc WHERE EXISTS (
           |      SELECT 1 FROM cand c WHERE c.qid = sc.qid AND c.vec_id = sc.vec_id)) t
           |  WHERE rn <= 3)
           |SELECT
           |  (SELECT CAST(count(*) AS DOUBLE) FROM exact WHERE EXISTS (
           |     SELECT 1 FROM approx a WHERE a.qid = exact.qid AND a.vec_id = exact.vec_id)) / 30.0 AS recall_at_3,
           |  (SELECT CAST(count(*) AS DOUBLE) FROM cand)
           |    / (10.0 * ((SELECT count(*) FROM embeddings) - 1)) AS cand_frac""".stripMargin
      })
  }

  /** recall@3 of sign-bucket LSH (optionally multi-probe, hamming<=1
    * buckets) vs the exact brute-force top-3 — deterministic, oracled. */
  private def annRecallQuery(name: String, multiProbe: Boolean): Q = {

    // flip bit i (1-based char position) of a 4-char '0'/'1' bucket string
    def flip(b: org.apache.spark.sql.Column, i: Int) = concat(
      substring(b, 1, i - 1),
      when(substring(b, i, 1) === "1", lit("0")).otherwise(lit("1")),
      substring(b, i + 1, 4 - i))
    def flipSql(b: String, i: Int) =
      s"substr($b, 1, ${i - 1}) || (CASE WHEN substr($b, $i, 1) = '1' THEN '0' ELSE '1' END) || substr($b, ${i + 1}, ${4 - i})"

    def matchCond(qb: org.apache.spark.sql.Column, vb: org.apache.spark.sql.Column) =
      if (!multiProbe) vb === qb
      else (1 to 4).foldLeft(vb === qb)((acc, i) => acc || vb === flip(qb, i))
    def matchSql(qb: String, vb: String) =
      if (!multiProbe) s"$vb = $qb"
      else ((s"$vb = $qb") +: (1 to 4).map(i => s"$vb = ${flipSql(qb, i)}")).mkString("(", " OR ", ")")

    Q(name,
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val scored = queries.join(emb.select(col("vec_id"), col("embedding")),
            col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            VectorOps.cosineFloat(col("qe"), col("embedding")).as("score"),
            SimilarityQueries.bucket(col("qe")).as("qb"),
            SimilarityQueries.bucket(col("embedding")).as("vb"))
        val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
        val exact = scored
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
          .select(col("qid"), col("vec_id"))
        val approx = scored.filter(matchCond(col("qb"), col("vb")))
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
          .select(col("qid"), col("vec_id"))
        exact.join(approx, Seq("qid", "vec_id"), "left_semi")
          .agg((count(lit(1)).cast("double") /
            lit(10 * 3).cast("double")).as("recall_at_3"))
      },
      Some {
        val qb = Seq(1, 17, 33, 49)
          .map(i => s"(CASE WHEN qe[$i] >= 0 THEN '1' ELSE '0' END)").mkString(" || ")
        val vb = Seq(1, 17, 33, 49)
          .map(i => s"(CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END)").mkString(" || ")
        s"""WITH qq AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
           |sc AS (
           |  SELECT qq.qid, e.vec_id, ${OracleSql.floatCos("qq.qe", "e.embedding")} AS score,
           |    $qb AS qb, $vb AS vb
           |  FROM qq JOIN embeddings e ON e.vec_id <> qq.qid),
           |exact AS (
           |  SELECT qid, vec_id FROM (
           |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
           |    FROM sc) t WHERE rn <= 3),
           |approx AS (
           |  SELECT qid, vec_id FROM (
           |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
           |    FROM sc WHERE ${matchSql("qb", "vb")}) t WHERE rn <= 3)
           |SELECT CAST(count(*) AS DOUBLE) / CAST(30 AS DOUBLE) AS recall_at_3
           |FROM exact WHERE EXISTS (
           |  SELECT 1 FROM approx a WHERE a.qid = exact.qid AND a.vec_id = exact.vec_id)""".stripMargin
      })
  }
}
