package graft.ops

import graft.{OracleSql, Q, Tables}
import graft.functions.{VectorKernels, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the compression step BEYOND int8 scalar
  * quantization on the 100 TB residency path. The reference engine stores
  * int8 rows (pythonvectordb.py:102-127: 1 byte/component, 4x over f32);
  * PQ codes each dim/M-component subspace as one byte against a trained
  * codebook, taking a dim-D float vector from 4*D bytes to M bytes (the
  * dim-64 testdata -> 32x; dim 128 -> 64x), and
  * scores compressed rows with an ADC lookup table — m table reads per row,
  * no per-row float math. This is the standard IVF-PQ residency design
  * (Jegou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011; same structure as FAISS's IndexPQ).
  *
  * Spark-first training: Lloyd's iterations run as ONE distributed job per
  * iteration covering ALL M subspaces — `posexplode` of the normalized
  * vector keyed by (subspace, component) + a codegen'd `PqAssignExpr` pass
  * for assignments, then a single groupBy((sub, code, component)).avg
  * shuffle yields every centroid component at once. No M-sequential
  * model fits; the per-iteration collect is the M*K*subdim centroid matrix
  * (2 KiB here), the same driver-side footprint MLlib KMeans uses for its
  * centers. Training reads a deterministic hash-ordered sample capped at
  * `TrainCap` rows — at 100 TB codebooks are trained on a sample by
  * design, never the full corpus.
  *
  * Oracle closure (q_pq_recall): the codebook is data-trained, so the
  * registry row reduces the PQ result to invariants DuckDB states
  * independently (the q_ivf_kmeans pattern): query count, completeness,
  * a recall@3-vs-exact floor (ADC top-CandK candidates, exact-rescored),
  * the constant compression ratio, and the exact brute-force mean-top3
  * companion summed via the 2^43 floor trick. A codebook/encode/ADC
  * regression drops recall below the floor and fails the hash-match.
  * Structure + recall are additionally asserted in PqSpec.
  */
object PqQueries {

  /** Subspaces: one code byte per dim/M components (the dim-64 testdata
    * -> 8-component subspaces). */
  final val M = 8

  /** Centroids per subspace (fits one byte with headroom; K=16 keeps the
    * codebook trainable at the smallest SF's 500-vector corpus). */
  final val K = 16

  final val Iters = 8
  final val TrainCap = 4096

  /** ADC candidates rescored exactly per query before taking top-3. */
  final val CandK = 128

  /** recall@3 floor stated by the q_pq_recall oracle invariant. Measured
    * (tools/PqProbe, M=8 K=16 CandK=128, hash-ordered init, 8 iterations,
    * order-independent means => bit-deterministic training) on the
    * near-random Gaussian fixture: 0.933 at sf0.001, 0.933 at sf0.01,
    * 0.700 at sf0.1 — the floor sits >= 6 hits (of 30) below the weakest
    * SF. Random high-dim data is PQ-adversarial (subspace distances
    * concentrate); on a clustered real corpus the same codebook budget
    * recalls far higher. */
  final val PqRecallFloor = 0.5

  /** Train the flat [(sub*K + c)*subdim + i] codebook with distributed
    * Lloyd's over a deterministic sample. Empty clusters keep their
    * previous centroid (the standard guard). */
  def trainCodebook(spark: SparkSession, dir: String): Array[Double] =
    trainCodebookOn(Tables.embeddings(spark, dir))

  /** As trainCodebook, over any (vec_id, embedding) DataFrame — shared
    * with the at-rest IVF-PQ index (store/IvfPqIndex.scala). */
  def trainCodebookOn(emb: DataFrame): Array[Double] = {
    require(!emb.isEmpty, "PQ training requires a non-empty embeddings corpus")
    val dim = emb.select(size(col("embedding")).as("n")).head().getInt(0)
    require(dim % M == 0, s"dim $dim not divisible by M=$M")
    val subdim = dim / M

    val sample = emb
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(TrainCap)
      .select(col("embedding"))
      .cache()

    // init: the first K sampled vectors' normalized subvectors seed every
    // subspace (deterministic — hash order, not a random seed).
    val seedRows = sample.limit(K).collect()
    require(seedRows.length == K,
      s"PQ training needs at least $K vectors, got ${seedRows.length}")
    var cb = new Array[Double](M * K * subdim)
    seedRows.zipWithIndex.foreach { case (r, c) =>
      val nv = VectorKernels.normalizeD(
        r.getSeq[Float](0).toArray)
      var sub = 0
      while (sub < M) {
        System.arraycopy(nv, sub * subdim, cb, (sub * K + c) * subdim, subdim)
        sub += 1
      }
    }

    var it = 0
    while (it < Iters) {
      // one job: every (subspace, centroid, component) mean at once
      val means = sample
        .select(
          posexplode(VectorOps.normalize(col("embedding"))).as(Seq("i", "x")),
          VectorOps.pqAssign(col("embedding"), cb, M, K).as("cs"))
        .select(
          (col("i") / subdim).cast("int").as("sub"),
          (col("i") % subdim).cast("int").as("d"),
          col("x"),
          col("cs").getItem((col("i") / subdim).cast("int")).as("c"))
        .groupBy(col("sub"), col("c"), col("d"))
        // order-independent exact mean (the 2^43 floor trick, see Q.scala
        // parity rules): plain avg(double) depends on partial-merge
        // arrival order, which would make the trained codebook — and so
        // the oracle-gated recall — wobble across runs.
        .agg((sum(floor(col("x") * lit(8796093022208.0))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("double") / lit(8796093022208.0) / count(lit(1))).as("mu"))
        .collect() // bounded: <= M*K*subdim rows (2048 here)
      val next = cb.clone()
      means.foreach { r =>
        next((r.getInt(0) * K + r.getInt(1)) * subdim + r.getInt(2)) =
          r.getDouble(3)
      }
      cb = next
      it += 1
    }
    sample.unpersist()
    cb
  }

  /** ADC top-CandK candidates per query (vec_id < 10), exact-rescored,
    * top-3 — the raw PQ search result (asserted in PqSpec). The corpus
    * side carries only (vec_id, M-byte codes); queries broadcast with
    * their LUTs; TopKAgg keeps the post-scan shuffle at O(CandK) rows per
    * (query x partition). */
  def pqTop3(spark: SparkSession, dir: String): DataFrame = {
    val cb = trainCodebook(spark, dir)
    pqTop3WithCodebook(spark, dir, cb)
  }

  private[ops] def pqTop3WithCodebook(
      spark: SparkSession, dir: String, cb: Array[Double]): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val codes = emb.select(col("vec_id"),
      VectorOps.pqEncode(col("embedding"), cb, M, K).as("codes"))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"),
        VectorOps.pqLut(col("embedding"), cb, M, K).as("lut"))
    val cand = codes
      .join(broadcast(queries), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        VectorOps.pqAdc(col("codes"), col("lut"), K).as("adc"))
      .groupBy(col("qid"))
      .agg(VectorOps.topK(col("adc"), col("vec_id"), CandK).as("top"))
      .select(col("qid"), explode(col("top")).as("t"))
      .select(col("qid"), col("t.vec_id").as("vec_id"))
    // exact rescore of the candidate set only
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val rescored = cand
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("vec_id"),
        VectorOps.cosineFloat(col("qe"), col("embedding")).as("score"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
    rescored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("qid"), col("vec_id"), col("score"))
  }

  val all: Seq[Q] = Seq(
    Q("q_pq_recall",
      (s, d) => {
        val approx = pqTop3(s, d).select(col("qid"), col("vec_id"))
        val emb = Tables.embeddings(s, d)
        val dim = emb.select(size(col("embedding")).as("n")).head().getInt(0)
        val q = emb.filter(col("vec_id") < 10)
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
          .join(approx, Seq("qid", "vec_id"), "left_semi")
          .agg(count(lit(1)).as("nhit"))
        val nres = approx.agg(
          countDistinct(col("qid")).as("n_queries"),
          count(lit(1)).as("n_results"))
        nres.crossJoin(hits).crossJoin(exactAgg)
          .select(col("n_queries"),
            (col("n_results") === col("n_exact")).cast("long").as("results_complete"),
            (col("nhit").cast("double") / col("n_exact").cast("double")
              >= lit(PqRecallFloor)).cast("long").as("recall_ok"),
            lit(dim * 4L / M).as("compression_x"),
            col("exact_mean_top3"))
      },
      Some {
        val w = "row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id)"
        s"""WITH qq AS (
           |  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
           |sc AS (
           |  SELECT qq.qid, e.vec_id, ${OracleSql.floatCos("qq.qe", "e.embedding")} AS score
           |  FROM qq JOIN embeddings e ON e.vec_id <> qq.qid),
           |exact AS (
           |  SELECT qid, vec_id, score FROM (
           |    SELECT qid, vec_id, score, $w AS rn FROM sc) t WHERE rn <= 3)
           |SELECT CAST(10 AS BIGINT) AS n_queries,
           |  CAST(1 AS BIGINT) AS results_complete,
           |  CAST(1 AS BIGINT) AS recall_ok,
           |  CAST((SELECT len(embedding) FROM embeddings LIMIT 1) * 4 / $M AS BIGINT)
           |    AS compression_x,
           |  CAST(sum(CAST(floor(score * 8796093022208.0) AS DECIMAL(38,0))) AS DOUBLE)
           |    / 8796093022208.0 / count(*) AS exact_mean_top3
           |FROM exact""".stripMargin
      }))
}
