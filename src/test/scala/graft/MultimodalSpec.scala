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
}
