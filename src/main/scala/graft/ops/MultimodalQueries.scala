package graft.ops

import graft.{OracleSql, Q, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata; decode/feature-extract runs as a distributed
  * projection over the binary column.
  *
  * Real image decode lives in Multimodal.decode (javax.imageio — PNG/BMP/
  * JPEG/GIF, exercised by MultimodalSpec on real PNG bytes). The ORACLE-
  * GATED queries below featurize the fixtures' text-as-bytes payloads, so
  * they use a deterministic md5-derived pseudo-feature (`fakeFeature`)
  * that DuckDB can restate exactly; the Spark-side plumbing — binary
  * column, schema, partition-parallel featurization, oracle check — is
  * identical to the real-codec path (same shape as mapPartitions decode).
  */
object MultimodalQueries {

  /** STUB decode: deterministic pseudo-feature j from the payload digest
    * (hex nibble window scaled to [0, 1]). Real systems: image decode +
    * model forward pass here. */
  private def fakeFeature(payloadText: org.apache.spark.sql.Column, j: Int) =
    (conv(substring(md5(payloadText), 1 + 4 * j, 4), 16, 10).cast("long")
      .cast("double") / lit(65535.0)).as(s"f$j")

  val all: Seq[Q] = Seq(
    Q("q_multimodal_feat",
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("doc_id") < 100)
          // binary payload column: the "media blob" (here: utf8 bytes).
          .withColumn("payload", encode(col("text"), "UTF-8"))
        docs.select(
          col("doc_id"),
          octet_length(col("text")).cast("long").as("payload_len"),
          fakeFeature(col("text"), 0), fakeFeature(col("text"), 1),
          fakeFeature(col("text"), 2), fakeFeature(col("text"), 3))
          .orderBy(col("doc_id"))
      },
      Some {
        val feats = (0 until 4).map { j =>
          s"CAST(${OracleSql.hexToLong("h", 1 + 4 * j, 4)} AS DOUBLE)/65535.0 AS f$j"
        }.mkString(",\n  ")
        s"""WITH hh AS (
           |  SELECT doc_id, strlen(text) AS plen, md5(text) AS h
           |  FROM documents WHERE doc_id < 100)
           |SELECT doc_id, CAST(plen AS BIGINT) AS payload_len,
           |  $feats
           |FROM hh ORDER BY doc_id""".stripMargin
      }),

    // Frame sampling over the binary payload (video-style): split into
    // 16-byte frames, keep every 2nd, fingerprint the sampled stream.
    // Pure Catalyst (Multimodal.sampleFrames) — narrow, no UDF, no
    // shuffle before the final ORDER BY. The oracle rebuilds the same
    // sampled byte stream with substr arithmetic (payloads are ASCII
    // here, so string and binary slicing agree byte-for-byte).
    Q("q_frame_sample",
      (s, d) => {
        val FRAME = 16
        val STRIDE = 2
        val docs = Tables.documents(s, d).filter(col("doc_id") < 100)
          .withColumn("payload", encode(col("text"), "UTF-8"))
        docs
          .withColumn("frames",
            Multimodal.sampleFrames(col("payload"), FRAME, STRIDE))
          .withColumn("sampled",
            aggregate(col("frames"), lit(Array.emptyByteArray),
              (acc, f) => concat(acc, f)))
          .select(col("doc_id"),
            size(col("frames")).cast("long").as("n_frames"),
            octet_length(col("sampled")).cast("long").as("sampled_len"),
            md5(col("sampled")).as("fp"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH f AS (
         |  SELECT doc_id, text,
         |    CASE WHEN strlen(text) = 0 THEN CAST([] AS VARCHAR[])
         |    ELSE list_transform(
         |      generate_series(0, CAST((strlen(text) - 1) // 32 AS INTEGER)),
         |      i -> substr(text, i * 32 + 1, 16)) END AS frames
         |  FROM documents WHERE doc_id < 100)
         |SELECT doc_id,
         |  CAST(len(frames) AS BIGINT) AS n_frames,
         |  CAST(strlen(array_to_string(frames, '')) AS BIGINT) AS sampled_len,
         |  md5(array_to_string(frames, '')) AS fp
         |FROM f ORDER BY doc_id""".stripMargin)),

    // Image near-dup (perceptual-hash dedup — the everyday 100 TB
    // multimodal operation): 63-bit linearized dHash per payload
    // (MediaKernels; codegen'd DHash63Expr, one narrow pass), Hamming-LSH
    // candidates via an EQUI-JOIN on 3 x 21-bit hash bands (hashes within
    // Hamming distance <= 2 are GUARANTEED to share a clean band by
    // pigeonhole; farther pairs probabilistically — the oracle replays the
    // same bands, so the gate is exact regardless of LSH recall), then an
    // exact popcount confirm at <= 4 of 63. This is q_simhash's band
    // machinery restated over the pixel domain: on real images the
    // luminance grid comes from the ImageIO decode (Multimodal.lumGrid8x8,
    // pinned on real PNG bytes in MultimodalSpec); the oracle-gated run
    // uses the byte-slice luminance fallback, whose integer sums DuckDB
    // replays exactly (ASCII payloads, so ord == byte). Scale shape: the
    // band join is the LSH bucket equi-join (never all-pairs); candidate
    // volume on THIS fixture is inflated by the low-entropy vocabulary
    // (byte-sum profiles collide more than real-image grids do — measured
    // 214 candidates at 500 docs, 20.2k at 5000), and the confirm filter
    // is a codegen'd scalar on the joined rows.
    Q("q_image_neardup",
      (s, d) => {
        val BANDS = 3
        val BAND_BITS = 21
        val MASK = (1L << BAND_BITS) - 1
        val TH = 4
        val hashed = Tables.documents(s, d)
          .filter(octet_length(col("text")) >= 64)
          .select(col("doc_id"),
            graft.functions.TextOps.dhash63(encode(col("text"), "UTF-8"))
              .as("dhash"))
        val bands = hashed.select(col("doc_id"), col("dhash"),
          explode(array((0 until BANDS).map(b =>
            struct(lit(b).as("band"),
              shiftright(col("dhash"), b * BAND_BITS).bitwiseAND(lit(MASK))
                .as("bv"))): _*)).as("x"))
          .select(col("doc_id"), col("dhash"), col("x.band"), col("x.bv"))
        val rhs = bands.select(col("doc_id").as("doc_b"), col("dhash").as("hb"),
          col("band").as("band2"), col("bv").as("bv2"))
        bands.join(rhs, col("band") === col("band2") &&
            col("bv") === col("bv2") && col("doc_id") < col("doc_b"))
          .select(col("doc_id").as("doc_a"), col("doc_b"),
            col("dhash").as("ha"), col("hb"))
          .distinct()
          .withColumn("hamming",
            bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
          .filter(col("hamming") <= TH)
          .select(col("doc_a"), col("doc_b"), col("hamming"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""WITH d AS (
         |  SELECT doc_id, text, strlen(text) AS L FROM documents
         |  WHERE strlen(text) >= 64),
         |cell AS (SELECT doc_id, text, L, i
         |  FROM d, (SELECT unnest(range(0, 64)) AS i) r),
         |lum AS (
         |  SELECT doc_id, i,
         |    CAST(list_sum(list_transform(
         |      range((i*L)//64 + 1, ((i+1)*L)//64 + 1),
         |      p -> ord(substr(text, CAST(p AS INTEGER), 1)))) AS BIGINT) AS lum
         |  FROM cell),
         |bits AS (
         |  SELECT a.doc_id, a.i AS j,
         |    CASE WHEN a.lum > b.lum THEN 1 ELSE 0 END AS bit
         |  FROM lum a JOIN lum b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
         |h AS (
         |  SELECT doc_id,
         |    CAST(sum(bit * CAST(power(2, j) AS BIGINT)) AS BIGINT) AS dhash
         |  FROM bits GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, dhash, j AS band,
         |    (dhash // CAST(power(2, j*21) AS BIGINT)) % 2097152 AS bv
         |  FROM h, (SELECT unnest(range(0, 3)) AS j) r),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.dhash AS ha, b.dhash AS hb
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(ha, hb)) <= 4
         |ORDER BY doc_a, doc_b""".stripMargin)),

    // Cross-modal retrieval join (SURVEY §7 M4 "multimodal join"): batch
    // kNN over the embedding corpus for 5 query vectors, enriched with the
    // matching documents' metadata (doc_id = vec_id, 1:1 in the fixtures).
    // Scale shape: 5 query vectors broadcast; TopKAgg shuffles m x k rows
    // (not m x n); the 15-row result broadcasts into the documents join.
    Q("q_search_enrich",
      (s, d) => {
        import graft.functions.VectorOps
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), VectorOps.quantizeInt8(col("embedding")).as("q"))
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("q").as("qq"))
        val top = emb.crossJoin(broadcast(queries))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            VectorOps.cosineInt8(col("q"), col("qq")).as("score"))
          .groupBy(col("qid"))
          .agg(VectorOps.topK(col("score"), col("vec_id"), 3).as("tk"))
          .select(col("qid"), explode(col("tk")).as("t"))
          .select(col("qid"), col("t.vec_id").as("vec_id"), col("t.score").as("score"))
        top.join(Tables.documents(s, d)
            .select(col("doc_id"), col("lang"), col("n_chars")),
          col("vec_id") === col("doc_id"))
          .select(col("qid"), col("vec_id"), col("score"), col("lang"), col("n_chars"))
          .orderBy(col("qid"), col("score").desc, col("vec_id"))
      },
      Some(s"""WITH ${OracleSql.quantizeCte},
         |qs AS (SELECT vec_id AS qid, q AS qq FROM qv WHERE vec_id < 5),
         |scored AS (
         |  SELECT qs.qid, v.vec_id, ${OracleSql.int8Cos("v.q", "qs.qq")} AS score
         |  FROM qv v CROSS JOIN qs WHERE v.vec_id <> qs.qid),
         |top AS (
         |  SELECT qid, vec_id, score FROM (
         |    SELECT qid, vec_id, score,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY score DESC, vec_id) AS rn
         |    FROM scored) t
         |  WHERE rn <= 3)
         |SELECT qid, top.vec_id, score, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars
         |FROM top JOIN documents d ON top.vec_id = d.doc_id
         |ORDER BY qid, score DESC, top.vec_id""".stripMargin))
  )
}
