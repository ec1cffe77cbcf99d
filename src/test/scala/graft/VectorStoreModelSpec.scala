package graft

import graft.functions.VectorKernels
import graft.store.VectorStore

/** Model-based randomized test: a random interleaving of add / delete /
  * re-add / compact ops against a driver-side reference model, checking
  * count, membership, and full search ranking after every step. The model
  * scores with the same quantize+cosine kernels, so rankings must match
  * exactly (ties broken by id via the store's deterministic ordering). */
class VectorStoreModelSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 6

  test("random op sequences keep the store equal to the reference model") {
    val rnd = new scala.util.Random(20260812)
    val st = VectorStore.create(spark, dim)
    var model = Map.empty[String, Array[Float]]
    var nextId = 0

    def randVec(): Array[Float] = Array.fill(dim)(rnd.nextGaussian().toFloat)

    def checkSearch(): Unit = {
      val q = randVec()
      val k = 1 + rnd.nextInt(5)
      val got = st.search(q, k).collect()
        .map(r => (r.getAs[String]("id"), r.getAs[Double]("score"))).toSeq
      // the store scores asymmetrically: raw float query vs the
      // dequantized stored vector (reference semantics)
      val expected = model.toSeq
        .map { case (id, v) =>
          (id, VectorKernels.cosineFloatInt8(q, VectorKernels.quantize(v))) }
        .sortBy { case (id, s) => (-s, id) }
        .take(k)
      assert(got == expected,
        s"search mismatch after ${model.size} live rows:\ngot $got\nexp $expected")
    }

    (0 until 18).foreach { step =>
      rnd.nextInt(4) match {
        case 0 => // add a fresh batch
          val n = 1 + rnd.nextInt(4)
          val rows = (0 until n).map { _ =>
            val id = s"v$nextId"; nextId += 1
            id -> randVec()
          }
          st.addVectors(rows.map { case (id, v) =>
            (id, v.toSeq, Map.empty[String, String]) }
            .toDF("id", "embedding", "meta"))
          model ++= rows
        case 1 if model.nonEmpty => // delete a random subset
          val victims = rnd.shuffle(model.keys.toSeq)
            .take(1 + rnd.nextInt(math.min(3, model.size)))
          st.delete(victims)
          model --= victims
        case 2 if model.nonEmpty => // delete + re-add with a NEW vector
          val id = rnd.shuffle(model.keys.toSeq).head
          st.delete(Seq(id))
          val v = randVec()
          st.addVectors(Seq((id, v.toSeq, Map.empty[String, String]))
            .toDF("id", "embedding", "meta"))
          model += (id -> v)
        case 3 => st.compact()
        case _ => // delete on empty store: no-op branch
      }
      assert(st.count == model.size, s"count diverged at step $step")
      if (model.nonEmpty) checkSearch()
    }
    // final deep check: every live id readable, deleted ids absent
    model.keys.foreach(id => assert(st.getVector(id).isDefined, id))
    assert(st.getVector(s"v$nextId").isEmpty)
  }
}
