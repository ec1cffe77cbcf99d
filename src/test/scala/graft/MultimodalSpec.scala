package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payload columns through the batched decode
  * (real javax.imageio for PNG/BMP/JPEG, deterministic byte-histogram
  * fallback for undecodable payloads) and frame sampling paths. */
class MultimodalSpec extends SparkSpec {

  test("decodeBatch produces typed features for every payload") {
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id").as("id"), encode(col("text"), "UTF-8").as("payload"))
    val feats = Multimodal.decodeBatch(docs)
    assert(feats.count() == docs.count())
    val r = feats.orderBy("doc_id").collect().head
    assert(r.getSeq[Float](4).length == 16)
    // histogram sums to ~1
    val s = r.getSeq[Float](4).sum
    assert(math.abs(s - 1f) < 1e-3)
    assert(r.getAs[Int]("channels") == 3)
  }

  test("decode is deterministic (same payload -> same features)") {
    val a = Multimodal.decode("hello world".getBytes)
    val b = Multimodal.decode("hello world".getBytes)
    assert(a.feature.toSeq == b.feature.toSeq && a.width == b.width)
  }

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if ((x + y) % 2 == 0) 0xffffff else 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decode reads REAL PNG bytes: true dimensions, channels, luminance histogram") {
    val payload = pngBytes(20, 12)
    val f = Multimodal.decode(payload)
    assert(f.width == 20 && f.height == 12)
    assert(f.channels == 3)
    // checkerboard: half the pixels pure white (lum 255 -> bin 15),
    // half pure black (lum 0 -> bin 0)
    assert(math.abs(f.feature(0) - 0.5f) < 1e-6f)
    assert(math.abs(f.feature(15) - 0.5f) < 1e-6f)
    assert(math.abs(f.feature.sum - 1f) < 1e-5f)
  }

  test("decodeBatch decodes PNG payloads distributedly alongside fallback rows") {
    import spark.implicits._
    val rows = Seq(
      (1L, pngBytes(8, 8)),
      (2L, "not an image".getBytes)).toDF("id", "payload")
    val out = Multimodal.decodeBatch(rows).collect().sortBy(_.getLong(0))
    assert(out(0).getAs[Int]("width") == 8 && out(0).getAs[Int]("height") == 8)
    assert(out(1).getAs[Int]("channels") == 3) // fallback path still typed
  }

  test("sampleFrames slices the payload at the right offsets") {
    import spark.implicits._
    val df = Seq(("a" * 100)).toDF("s")
      .select(encode(col("s"), "UTF-8").as("payload"))
    val frames = df.select(Multimodal.sampleFrames(col("payload"), frameBytes = 10, stride = 2).as("f"))
      .collect().head.getSeq[Array[Byte]](0)
    assert(frames.nonEmpty)
    assert(frames.head.length == 10)
  }

  test("sampleFrames: empty payload yields ZERO frames (oracle-pinned edge)") {
    // Pins the empty-payload semantics on the Spark side; the q_frame_sample
    // DuckDB oracle carries a matching CASE WHEN strlen=0 guard (DuckDB //
    // truncates toward zero, so it would otherwise emit ONE empty frame).
    import spark.implicits._
    val df = Seq("").toDF("s").select(encode(col("s"), "UTF-8").as("payload"))
    val frames = df.select(Multimodal.sampleFrames(col("payload"), frameBytes = 16, stride = 2).as("f"))
      .collect().head.getSeq[Array[Byte]](0)
    assert(frames.isEmpty)
  }

  test("resizeStub decimates deterministically") {
    val in = (0 until 100).map(_.toByte).toArray
    val out = Multimodal.resizeStub(in, 4)
    assert(out.length == 25)
    assert(out(1) == 4.toByte && out(24) == 96.toByte)
  }

  test("resize scales a REAL PNG to the target dims and re-decodes") {
    val resized = Multimodal.resize(pngBytes(20, 12), 10, 6)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(back != null, "resized payload is not a decodable image")
    assert(back.getWidth == 10 && back.getHeight == 6)
    // upscale works too
    val up = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.resize(pngBytes(8, 8), 32, 16)))
    assert(up.getWidth == 32 && up.getHeight == 16)
  }

  test("resize preserves solid color (bilinear of a constant is constant)") {
    val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, 0x336699)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.resize(bos.toByteArray, 4, 4)))
    for (y <- 0 until 4; x <- 0 until 4)
      assert((back.getRGB(x, y) & 0xffffff) == 0x336699, s"pixel ($x,$y) drifted")
  }

  /** Gradient PNG with an optional perturbation hook — the perceptual-hash
    * fixture (a checkerboard's block-averaged luminance is constant, which
    * would degenerate every dHash bit to 0). */
  private def gradientPng(w: Int, h: Int,
      perturb: (Int, Int, Int) => Int = (_, _, rgb) => rgb): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = ((x * 7 + y * 13) % 256)
      img.setRGB(x, y, perturb(x, y, (v << 16) | (v << 8) | v))
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dHash pins REAL PNG bytes: perturbed copy near, different image far") {
    val base = gradientPng(64, 48)
    val h0 = Multimodal.dHash(base)
    // deterministic
    assert(h0 == Multimodal.dHash(gradientPng(64, 48)))
    // a few flipped pixels barely move the block-averaged luminance
    val perturbed = gradientPng(64, 48,
      (x, y, rgb) => if (x == 3 && y < 4) 0xffffff else rgb)
    assert(hamming(h0, Multimodal.dHash(perturbed)) <= 4,
      "small perturbation must stay within the near-dup confirm threshold")
    // a structurally different image lands far away
    val other = gradientPng(64, 48, (x, y, _) => {
      val v = (x * 31 + y * 3 + 128) % 256; (v << 16) | (v << 8) | v
    })
    assert(hamming(h0, Multimodal.dHash(other)) > 10)
  }

  test("dHash survives a REAL resize (the classic perceptual-hash property)") {
    val base = gradientPng(64, 48)
    val resized = Multimodal.resize(base, 32, 24)
    assert(hamming(Multimodal.dHash(base), Multimodal.dHash(resized)) <= 6,
      "a resized copy must hash near its original")
  }

  test("dHash routes undecodable payloads through the byte-slice fallback") {
    val payload = ("x" * 200).getBytes
    assert(Multimodal.dHash(payload) ==
      graft.functions.MediaKernels.byteDHash63(payload))
    // grid comes from the REAL decode for images: differs from byte path
    val png = gradientPng(64, 48)
    assert(Multimodal.lumGrid8x8(png).isDefined)
    assert(Multimodal.lumGrid8x8(("not an image" * 10).getBytes).isEmpty)
  }

  test("byteLumGrid/packDHash integer semantics (the oracle's arithmetic)") {
    // 128 'a's then 128 'b's, 4 bytes per cell: first 32 cells sum
    // 4*97 = 388, last 32 sum 4*98 = 392.
    val payload = (("a" * 128) + ("b" * 128)).getBytes
    val grid = graft.functions.MediaKernels.byteLumGrid(payload)
    assert(grid.length == 64)
    assert(grid.take(32).forall(_ == 388L) && grid.drop(32).forall(_ == 392L))
    // monotonically non-decreasing grid -> no lum(j) > lum(j+1) -> hash 0
    assert(graft.functions.MediaKernels.packDHash(grid) == 0L)
    // reversed payload: single descending step at cell 31 -> bit 31 only
    val rev = (("b" * 128) + ("a" * 128)).getBytes
    assert(graft.functions.MediaKernels.byteDHash63(rev) == (1L << 31))
  }

  test("byteBlockSums slices exactly and l1Dist guards length (no silent prefix)") {
    val k = graft.functions.MediaKernels
    // 16 bytes, 4 blocks -> exact 4-byte quarters
    val fr = Array.tabulate[Byte](16)(i => (i + 1).toByte)
    assert(k.byteBlockSums(fr, 4).toSeq == Seq(10L, 26L, 42L, 58L))
    // unsigned byte semantics: 0xff counts as 255, not -1
    assert(k.byteBlockSums(Array.fill[Byte](4)(0xff.toByte), 2).toSeq == Seq(510L, 510L))
    assert(k.l1Dist(Array(1L, 5L), Array(4L, 2L)) == 6L)
    val ex = intercept[IllegalArgumentException] {
      k.l1Dist(Array(1L), Array(1L, 2L))
    }
    assert(ex.getMessage.contains("length mismatch"))
  }

  test("gridStats fuses byteLumGrid's sum/sum-of-squares exactly") {
    val k = graft.functions.MediaKernels
    for (payload <- Seq(
        (("a" * 128) + ("b" * 128)).getBytes,
        "the quick brown fox jumps over the lazy dog padded to >= 64 chars!!".getBytes,
        Array.tabulate[Byte](200)(i => (i * 37 + 11).toByte))) {
      val grid = k.byteLumGrid(payload)
      val Array(sl, ss) = k.gridStats(payload)
      assert(sl == grid.sum, "sl must equal the grid sum")
      assert(ss == grid.map(x => x * x).sum, "ss must equal the grid sum of squares")
    }
  }

  test("frameEnergies: full frames only, centered unsigned squares") {
    val k = graft.functions.MediaKernels
    // 10 bytes, frameLen 4 -> 2 full frames, trailing 2 bytes dropped
    val p = Array.tabulate[Byte](10)(i => (i + 30).toByte)
    val es = k.frameEnergies(p, frameLen = 4, center = 32)
    assert(es.length == 2)
    // naive replay
    def naive(f: Int) = (0 until 4).map { j =>
      val d = (p(f * 4 + j) & 0xff) - 32; d.toLong * d
    }.sum
    assert(es.toSeq == Seq(naive(0), naive(1)))
    // unsigned semantics: 0xff counts as 255 -> (255-32)^2 per sample
    val hi = k.frameEnergies(Array.fill[Byte](4)(0xff.toByte), 4, 32)
    assert(hi.toSeq == Seq(4L * 223 * 223))
    // payload shorter than one frame -> zero frames (posexplode-safe)
    assert(k.frameEnergies(Array[Byte](1, 2), 4, 32).isEmpty)
  }

  test("scene-cut detector: constant stream is one scene, abrupt change cuts") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextOps
    import spark.implicits._
    // two synthetic "videos": constant frames vs a hard content switch
    val df = Seq(
      (1L, "a" * 64),            // 4 identical frames -> 0 cuts
      (2L, ("a" * 32) + ("z" * 32))) // frame 2 jumps: |'z'-'a'|*16 = 400 > 300
      .toDF("doc_id", "text")
    val fr = df.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(3)),
        i => TextOps.blockSums(
          encode(col("text").substr(i * 16 + 1, lit(16)), "UTF-8"), 4)))
        .as(Seq("fidx", "prof")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("fidx"))
    val cuts = fr.withColumn("pp", lag(col("prof"), 1).over(w))
      .withColumn("cut", when(col("pp").isNull, 0L).otherwise(
        when(TextOps.l1Dist(col("prof"), col("pp")) > 300, 1L).otherwise(0L)))
      .groupBy("doc_id").agg(sum("cut").as("n_cuts"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(cuts == Seq((1L, 0L), (2L, 1L)))
  }

  test("resize falls back to deterministic decimation for non-image payloads") {
    val in = (0 until 4096).map(_.toByte).toArray
    val a = Multimodal.resize(in, 32, 32) // target 1024 px -> factor 2
    val b = Multimodal.resize(in, 32, 32)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 2048)
    assert(a(1) == 2.toByte) // every-2nd-byte decimation
  }
}
