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

  /** The dHash band join's CANDIDATE pair set (doc_a, doc_b, ha, hb) —
    * distinct pairs sharing any of the 3 x 21-bit bands, BEFORE the exact
    * Hamming confirm. Exposed separately so tools/DhashBandProbe can
    * track candidate volume across SFs (the band join is the stage a
    * fixture change could quietly blow up). */
  private[graft] def dhashCandidates(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val BANDS = 3
    val BAND_BITS = 21
    val MASK = (1L << BAND_BITS) - 1
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
  }

  /** q_image_neardup's confirmed pair set (doc_a, doc_b, ha, hb): dHash
    * per payload, 3x21-bit Hamming-LSH band equi-join, exact popcount
    * confirm at <= 4 of 63 — shared with q_image_clusters. */
  private def dhashPairs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val TH = 4
    dhashCandidates(s, d)
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= TH)
  }

  /** The shared DuckDB CTE chain producing the same confirmed `pairs`
    * table (doc_a, doc_b) — the exact integer replay of [[dhashPairs]]. */
  private def dhashPairsCtes: String =
    """d AS (
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
      |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
      |pairs AS (
      |  SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
      |  FROM cand WHERE bit_count(xor(ha, hb)) <= 4)""".stripMargin

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
    // Image quality gating (blur/blank detection) — the per-asset filter
    // a multimodal curation pass runs BEFORE embedding or dedup: a flat
    // (low-contrast) luminance grid means a blank, uniform or
    // heavily-blurred image that adds no training signal. Contrast is the
    // exact integer grid variance (64*sum(lum^2) - sum(lum)^2 over the
    // same 64-cell byte-slice luminance profile q_image_neardup hashes);
    // the flat flag is the LENGTH-INVARIANT relative test
    // sl^2 > 200 * vs (a coefficient-of-variation cut — absolute variance
    // would conflate asset size with flatness), thresholded where the
    // probed ratio distribution (p5 6.5, median ~70, p99 ~300, stable
    // across SFs) marks ~5% of assets. On real images the grid comes from
    // Multimodal.lumGrid8x8 (MultimodalSpec pins PNG decode); the gated
    // run uses the byte-slice fallback DuckDB replays exactly. Scale
    // shape: one narrow CODEGEN'D per-doc projection (GridStatsExpr —
    // per-doc O(bytes) inside WholeStageCodegen), then a source-sized
    // aggregate.
    Q("q_image_quality",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .filter(length(col("text")) >= 64)
        docs
          // ONE codegen'd pass per payload (GridStatsExpr fuses the
          // 64-cell grid build with its sum/sum-of-squares fold) — the
          // round-12 replacement for an interpreted per-character SQL
          // HOF; payloads are ASCII so utf8 bytes == the oracle's chars.
          .withColumn("gs",
            graft.functions.TextOps.gridStats(encode(col("text"), "UTF-8")))
          .withColumn("sl", col("gs").getItem(0))
          .withColumn("ss", col("gs").getItem(1))
          .withColumn("vs", lit(64L) * col("ss") - col("sl") * col("sl"))
          .withColumn("flat",
            (col("sl") * col("sl") > lit(200L) * col("vs")).cast("long"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_images"), sum(col("flat")).as("n_flat"),
            sum(col("vs")).as("sum_contrast"), max(col("vs")).as("max_contrast"))
          .orderBy(col("source"))
      },
      Some("""WITH d AS (
         |  SELECT doc_id, source, text, strlen(text) AS L
         |  FROM documents WHERE strlen(text) >= 64),
         |cell AS (SELECT doc_id, source, text, L, i
         |  FROM d, (SELECT unnest(range(0, 64)) AS i) r),
         |lum AS (
         |  SELECT doc_id, source, i,
         |    CAST(list_sum(list_transform(
         |      range((i*L)//64 + 1, ((i+1)*L)//64 + 1),
         |      p -> ord(substr(text, CAST(p AS INTEGER), 1)))) AS BIGINT)
         |      AS lum
         |  FROM cell),
         |g AS (
         |  SELECT doc_id, source,
         |    CAST(64*sum(lum*lum) - sum(lum)*sum(lum) AS BIGINT) AS vs,
         |    CAST(sum(lum) AS BIGINT) AS sl
         |  FROM lum GROUP BY 1, 2)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_images,
         |  CAST(sum(CASE WHEN sl*sl > 200*vs THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_flat,
         |  CAST(sum(vs) AS BIGINT) AS sum_contrast,
         |  max(vs) AS max_contrast
         |FROM g GROUP BY source ORDER BY source""".stripMargin)),

    // Audio energy segmentation (VAD-lite) — the AUDIO-modality operator
    // beside the image (dHash/quality) and video (frame/scene) tiers:
    // treat the payload as fixed-rate samples, compute per-frame energy
    // (sum of squared 32-centered samples over 64-byte frames — exact
    // BIGINTs), threshold at 300000 (probed: frame energies span
    // 272k-339k with median ~307k at every SF, so the cut genuinely
    // alternates), and count ACTIVE SEGMENTS as runs of consecutive
    // active frames via a per-doc lag — the silence-split step an audio
    // curation pass runs before transcription. Real audio rides the same
    // plumbing with PCM decode in place of the byte read; the gated run
    // uses bytes DuckDB replays exactly. Scale shape: the frame
    // expansion is a narrow per-doc explode (bounded by payload size),
    // the run-count window partitions by doc over frame index (bounded
    // per doc), then one doc-sized aggregate.
    Q("q_audio_segments",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .filter(col("doc_id") < 100 && length(col("text")) >= 128)
        // per-frame energies in ONE codegen'd pass (FrameEnergiesExpr:
        // 64-byte full frames, 32-centered squared samples), then a
        // narrow posexplode — replaces the round-11 interpreted
        // sequence+aggregate HOF pair (the q_image_quality lesson).
        val frames = docs
          .select(col("doc_id"),
            posexplode(graft.functions.TextOps.frameEnergies(
              encode(col("text"), "UTF-8"), frameLen = 64, center = 32))
              .as(Seq("fi", "e")))
          .withColumn("fi", col("fi").cast("long"))
          .withColumn("active", (col("e") >= 300000L).cast("long"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("fi"))
        frames
          .withColumn("pa", lag(col("active"), 1, 0L).over(w))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_frames"),
            sum(col("active")).as("n_active"),
            sum(when(col("active") === 1L && col("pa") === 0L, 1L)
              .otherwise(0L)).as("n_segments"),
            sum(col("e")).as("total_energy"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
         |  SELECT doc_id, text, strlen(text) AS L
         |  FROM documents WHERE doc_id < 100 AND strlen(text) >= 128),
         |fr AS (
         |  SELECT doc_id, i AS fi,
         |    CAST(list_sum(list_transform(range(i*64 + 1, (i+1)*64 + 1),
         |      p -> (ord(substr(text, CAST(p AS INTEGER), 1)) - 32) *
         |           (ord(substr(text, CAST(p AS INTEGER), 1)) - 32)))
         |      AS BIGINT) AS e
         |  FROM d, LATERAL (SELECT unnest(range(0,
         |    CAST(L // 64 AS INTEGER))) AS i) r),
         |fa AS (
         |  SELECT doc_id, fi, e,
         |    CASE WHEN e >= 300000 THEN 1 ELSE 0 END AS active,
         |    coalesce(lag(CASE WHEN e >= 300000 THEN 1 ELSE 0 END, 1)
         |      OVER (PARTITION BY doc_id ORDER BY fi), 0) AS pa
         |  FROM fr)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
         |  CAST(sum(active) AS BIGINT) AS n_active,
         |  CAST(sum(CASE WHEN active = 1 AND pa = 0 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_segments,
         |  CAST(sum(e) AS BIGINT) AS total_energy
         |FROM fa GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("q_image_neardup",
      (s, d) => dhashPairs(s, d)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
        .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH $dhashPairsCtes
         |SELECT doc_a, doc_b, hamming FROM pairs
         |ORDER BY doc_a, doc_b""".stripMargin)),

    // Cluster roll-up of the image near-dup graph — q_dedup_components
    // restated over the pixel domain (one keeper per perceptual cluster
    // is what a 100 TB image-dedup pass actually emits): connected
    // components over the confirmed dHash pairs via distributed
    // min-label propagation (one equi-join + min-aggregate per round,
    // lineage cut by eager localCheckpoints, O(diameter) rounds —
    // measured 8 at sf0.1 over 875 nodes / 53 clusters, capped at 30
    // with a loud failure, the componentLabels contract). The oracle is
    // the recursive-CTE ground truth over the SAME pair table. Label =
    // min doc_id in the component = the cluster keeper.
    Q("q_image_clusters",
      (s, d) => {
        def ckpt(df: org.apache.spark.sql.DataFrame) = df.localCheckpoint(true)
        val pairs = ckpt(dhashPairs(s, d).select(col("doc_a"), col("doc_b")))
        val edges = ckpt(pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
          .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst"))))
        // Min-label propagation (GraphOps.propagationLabels — the shared
        // fixpoint helper; the oracle's recursive CTE is method-
        // independent). The pointer-jumping variant (doublingLabels) was
        // MEASURED here and rejected: QTime min-of-4 at sf0.1 is 3.53 s
        // for propagation vs 4.36 s for doubling — halving the rounds
        // (8 -> 4) does not pay for the extra label(label) shortcut join
        // every round on this small-diameter pair graph. Doubling wins
        // on high-diameter graphs (chains), which perceptual-hash
        // near-dup clusters are not; q_cc_doubling keeps the doubling
        // demonstration where the diameter argument actually applies.
        val (labels, _) = GraphOps.propagationLabels(edges, maxIter = 30)
        labels.groupBy(col("label").as("component"))
          .agg(count(lit(1)).as("size"), max(col("doc_id")).as("max_doc"))
          .orderBy(col("component"))
      },
      Some(s"""WITH RECURSIVE $dhashPairsCtes,
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(doc, label) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.doc),
         |lab AS (SELECT doc, min(label) AS label FROM reach GROUP BY doc)
         |SELECT CAST(label AS BIGINT) AS component,
         |  CAST(count(*) AS BIGINT) AS size,
         |  CAST(max(doc) AS BIGINT) AS max_doc
         |FROM lab GROUP BY label ORDER BY component""".stripMargin)),

    // Frame-level dedup across payloads — "the same clip embedded in
    // different videos": every payload splits into fixed 16-byte frames
    // (ALL frames, unlike q_frame_sample's strided sampling), each frame
    // fingerprints (md5), and a frame whose fingerprint occurs in >= 2
    // DISTINCT payloads is shared content. Scale shape: one narrow
    // explode (frames per row = len/16, bounded by payload size), one
    // map-side-combinable groupBy on the fingerprint — shingle dedup
    // over the media-frame domain; at 100 TB the fingerprint groupBy is
    // the only corpus-scale shuffle, and the n_docs >= 2 filter runs
    // inside the aggregate's output, never materializing singletons
    // downstream. The oracle replays the identical substr arithmetic
    // (ASCII payloads, so string and binary slicing agree).
    Q("q_frame_dedup",
      (s, d) => {
        val FRAME = 16
        val docs = Tables.documents(s, d)
          .filter(octet_length(col("text")) >= FRAME)
        docs.select(col("doc_id"),
            explode(transform(
              sequence(lit(0),
                floor(octet_length(col("text")) / FRAME).cast("int") - 1),
              i => md5(col("text").substr(i * FRAME + 1, lit(FRAME))))).as("fp"))
          .groupBy(col("fp"))
          .agg(count(lit(1)).as("n_occ"),
            countDistinct(col("doc_id")).as("n_docs"),
            min(col("doc_id")).as("first_doc"))
          .filter(col("n_docs") >= 2)
          .orderBy(col("fp"))
      },
      Some("""WITH fr AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(0, CAST(strlen(text) // 16 AS INTEGER)),
         |      i -> md5(substr(text, CAST(i*16 + 1 AS INTEGER), 16)))) AS fp
         |  FROM documents WHERE strlen(text) >= 16)
         |SELECT fp, CAST(count(*) AS BIGINT) AS n_occ,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(min(doc_id) AS BIGINT) AS first_doc
         |FROM fr GROUP BY fp HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY fp""".stripMargin)),

    // Shot-boundary (scene-cut) detection — the video segmentation
    // primitive between frame sampling (q_frame_sample) and frame-level
    // dedup (q_frame_dedup): find where consecutive frames CHANGE. Each
    // 16-byte frame featurizes to a 4-block byte-sum profile (codegen'd
    // BlockSumsExpr — an averaged statistic, like a pixel histogram, so
    // small perturbations move the profile slightly instead of
    // rerandomizing it); a cut fires where the exact L1 distance between
    // consecutive profiles exceeds 300 (the ~97th percentile of the
    // fixture's consecutive-frame diffs — probed, not guessed). Scenes =
    // runs between cuts via a running cut-count. Scale shape: ONE narrow
    // codegen'd pass per frame, then doc-keyed window + aggregation —
    // per-doc work is frame-count-bounded and the shuffle is frame-rows
    // keyed by doc, exactly how a real video pipeline shards (one video's
    // frames co-located, videos parallel). Integer arithmetic end to end,
    // so DuckDB replays the detector bit-exactly.
    Q("q_scene_cuts",
      (s, d) => {
        val FRAME = 16
        val TAU = 300L
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, d)
          .filter(octet_length(col("text")) >= 2 * FRAME)
        val fr = docs.select(col("doc_id"),
          posexplode(transform(
            sequence(lit(0),
              floor(octet_length(col("text")) / FRAME).cast("int") - 1),
            i => graft.functions.TextOps.blockSums(
              encode(col("text").substr(i * FRAME + 1, lit(FRAME)), "UTF-8"),
              blocks = 4))).as(Seq("fidx", "prof")))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("fidx"))
        val cuts = fr
          .withColumn("pp", lag(col("prof"), 1).over(w))
          .withColumn("cut",
            when(col("pp").isNull, 0L).otherwise(
              when(graft.functions.TextOps.l1Dist(col("prof"), col("pp")) > TAU,
                1L).otherwise(0L)))
          .withColumn("sid", sum(col("cut")).over(w))
        cuts.groupBy(col("doc_id"), col("sid"))
          .agg(count(lit(1)).as("flen"))
          .groupBy(col("doc_id"))
          .agg(sum(col("flen")).as("n_frames"),
            (count(lit(1)) - 1).as("n_cuts"),
            count(lit(1)).as("n_scenes"),
            max(col("flen")).as("longest_scene"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
         |  SELECT doc_id, text, strlen(text) AS L FROM documents
         |  WHERE strlen(text) >= 32),
         |fr AS (
         |  SELECT doc_id, unnest(list_transform(range(0, CAST(L // 16 AS INTEGER)),
         |    i -> struct_pack(fidx := CAST(i AS BIGINT),
         |      f := substr(text, CAST(i*16 + 1 AS INTEGER), 16)))) AS e
         |  FROM d),
         |prof AS (
         |  SELECT doc_id, e.fidx AS fidx,
         |    list_transform(range(0, 4), q -> CAST(list_sum(list_transform(
         |      range(1, 5), j -> ord(substr(e.f, CAST(q*4 + j AS INTEGER), 1))))
         |      AS BIGINT)) AS p
         |  FROM fr),
         |lagd AS (
         |  SELECT doc_id, fidx, p,
         |    lag(p) OVER (PARTITION BY doc_id ORDER BY fidx) AS pp FROM prof),
         |cuts AS (
         |  SELECT doc_id, fidx,
         |    CASE WHEN pp IS NULL THEN 0
         |         WHEN list_sum(list_transform(range(1, 5),
         |           k -> abs(p[CAST(k AS INTEGER)] - pp[CAST(k AS INTEGER)]))) > 300
         |           THEN 1
         |         ELSE 0 END AS cut
         |  FROM lagd),
         |sids AS (
         |  SELECT doc_id, fidx,
         |    sum(cut) OVER (PARTITION BY doc_id ORDER BY fidx) AS sid FROM cuts),
         |scenes AS (
         |  SELECT doc_id, sid, count(*) AS flen FROM sids GROUP BY doc_id, sid)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |  CAST(sum(flen) AS BIGINT) AS n_frames,
         |  CAST(count(*) - 1 AS BIGINT) AS n_cuts,
         |  CAST(count(*) AS BIGINT) AS n_scenes,
         |  CAST(max(flen) AS BIGINT) AS longest_scene
         |FROM scenes GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // The composed multimodal curation funnel — the image pillars wired
    // together the way a real 100 TB media-curation run executes them
    // (q_curation_funnel's composition discipline over the pixel domain):
    // per SOURCE, assets in -> perceptual near-dup pruning (the dHash
    // band join; pruned = any asset pairing with a smaller doc_id, the
    // first-seen-wins keeper rule an LSH dedup pass applies without
    // materializing full components) -> quality gate on the survivors
    // (the q_image_quality flat/contrast cut, codegen'd GridStatsExpr)
    // -> kept, plus an exact integer retention rate (kept*1000 div in —
    // identical truncating division on both engines). Scale shape: ONE
    // narrow codegen'd featurization pass, the band equi-join (never
    // all-pairs), a broadcast-sized anti-set join, one source-keyed
    // aggregate. The oracle recomputes every stage end-to-end from the
    // shared pair CTEs.
    Q("q_media_funnel",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .filter(length(col("text")) >= 64)
          .withColumn("gs",
            graft.functions.TextOps.gridStats(encode(col("text"), "UTF-8")))
          .withColumn("sl", col("gs").getItem(0))
          .withColumn("vs",
            lit(64L) * col("gs").getItem(1) - col("sl") * col("sl"))
          .withColumn("flat",
            (col("sl") * col("sl") > lit(200L) * col("vs")).cast("long"))
          .select(col("doc_id"), col("source"), col("flat"))
        val pruned = dhashPairs(s, d)
          .select(col("doc_b").as("doc_id")).distinct()
          .withColumn("isdup", lit(1L))
        docs.join(pruned, Seq("doc_id"), "left_outer")
          .na.fill(0L, Seq("isdup"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_in"),
            sum(col("isdup")).as("n_neardup_pruned"),
            sum(when(col("isdup") === 0L && col("flat") === 1L, 1L)
              .otherwise(0L)).as("n_flat_pruned"),
            sum(when(col("isdup") === 0L && col("flat") === 0L, 1L)
              .otherwise(0L)).as("n_kept"))
          .withColumn("kept_permille",
            expr("n_kept * 1000L div n_in"))
          .orderBy(col("source"))
      },
      Some(s"""WITH $dhashPairsCtes,
         |g AS (
         |  SELECT doc_id,
         |    CAST(64*sum(lum*lum) - sum(lum)*sum(lum) AS BIGINT) AS vs,
         |    CAST(sum(lum) AS BIGINT) AS sl
         |  FROM lum GROUP BY 1),
         |pruned AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
         |f AS (
         |  SELECT g.doc_id, doc.source,
         |    CASE WHEN g.sl*g.sl > 200*g.vs THEN 1 ELSE 0 END AS flat,
         |    CASE WHEN p.doc_id IS NOT NULL THEN 1 ELSE 0 END AS isdup
         |  FROM g JOIN documents doc ON g.doc_id = doc.doc_id
         |  LEFT JOIN pruned p ON g.doc_id = p.doc_id),
         |agg AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_in,
         |    CAST(sum(isdup) AS BIGINT) AS n_neardup_pruned,
         |    CAST(sum(CASE WHEN isdup = 0 AND flat = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_flat_pruned,
         |    CAST(sum(CASE WHEN isdup = 0 AND flat = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_kept
         |  FROM f GROUP BY source)
         |SELECT source, n_in, n_neardup_pruned, n_flat_pruned, n_kept,
         |  CAST(n_kept * 1000 // n_in AS BIGINT) AS kept_permille
         |FROM agg ORDER BY source""".stripMargin)),

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
