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

  test("resize falls back to deterministic decimation for non-image payloads") {
    val in = (0 until 4096).map(_.toByte).toArray
    val a = Multimodal.resize(in, 32, 32) // target 1024 px -> factor 2
    val b = Multimodal.resize(in, 32, 32)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 2048)
    assert(a(1) == 2.toByte) // every-2nd-byte decimation
  }
}
