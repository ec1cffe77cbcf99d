package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payload columns through the batched decode
  * and frame sampling paths (decode itself is a documented stub). */
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
    val a = Multimodal.decodeStub("hello world".getBytes)
    val b = Multimodal.decodeStub("hello world".getBytes)
    assert(a.feature.toSeq == b.feature.toSeq && a.width == b.width)
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
