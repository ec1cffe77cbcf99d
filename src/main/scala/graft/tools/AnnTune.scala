package graft.tools

import graft.{Sessions, Tables}

/** Dev tool: sweep sign-LSH configurations (bits per table x tables x
  * multi-probe count) over the fixture embeddings and print the
  * recall@3 / candidate-fraction frontier. The winning configuration is
  * frozen into q_ann_recall_rp (SimilarityQueries) with seeded literal
  * hyperplanes so the DuckDB oracle can state identical projections.
  *
  * Driver-side math on a collected fixture (n~10^2..10^4) — this is a
  * tuning harness, not a serving path; the production-scale variant of
  * the chosen config is the bucket-equality join in the query itself.
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", appName = "ann-tune", logLevel = "ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, d).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    val byId = emb.toMap
    val n = emb.length
    println(s"n=$n dim=${emb.head._2.length}")

    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }

    val queries = emb.filter(_._1 < 10)
    val exact = queries.map { case (qid, qe) =>
      qid -> emb.filter(_._1 != qid).map { case (id, e) => (id, cos(qe, e)) }
        .sortBy(t => (-t._2, t._1)).take(3).map(_._1).toSet
    }.toMap
    // neighbor-angle context: how hard is this corpus for cosine LSH?
    val topCos = queries.map { case (qid, qe) =>
      emb.filter(_._1 != qid).map { case (_, e) => cos(qe, e) }.max
    }
    println(f"max neighbor cos: min=${topCos.min}%.3f avg=${topCos.sum / topCos.length}%.3f max=${topCos.max}%.3f")

    // probes = 99 means hamming<=1: the base bucket plus ALL b 1-bit flips
    for (b <- Seq(4, 6, 8); l <- Seq(1, 2, 4, 8); probes <- Seq(1, 2, 4, 99)) {
      val rng = new scala.util.Random(1234)
      val planes = Array.fill(l)(Array.fill(b)(Array.fill(emb.head._2.length)(rng.nextGaussian())))
      def dots(e: Array[Float], tb: Int): Array[Double] = planes(tb).map { p =>
        var s = 0.0; var i = 0; while (i < e.length) { s += e(i).toDouble * p(i); i += 1 }; s
      }
      def bucketOf(ds: Array[Double]): Int =
        ds.zipWithIndex.map { case (dd, j) => if (dd >= 0) 1 << j else 0 }.sum
      val tables = (0 until l).map { tb =>
        emb.map { case (id, e) => id -> bucketOf(dots(e, tb)) }
          .groupBy(_._2).map { case (k, v) => k -> v.map(_._1) }
      }
      var recallSum = 0.0; var candSum = 0.0
      for ((qid, qe) <- queries) {
        val cands = scala.collection.mutable.Set[Long]()
        for (tb <- 0 until l) {
          val ds = dots(qe, tb)
          val base = bucketOf(ds)
          // multi-probe order: flip the lowest-|margin| bits first
          val flips = ds.zipWithIndex.sortBy(t => math.abs(t._1)).map(_._2)
          val buckets = base +: flips.take(probes - 1).map(j => base ^ (1 << j))
          buckets.foreach(bk => tables(tb).get(bk).foreach(ids => cands ++= ids.filter(_ != qid)))
        }
        val top3 = cands.toArray.map(id => (id, cos(qe, byId(id))))
          .sortBy(t => (-t._2, t._1)).take(3).map(_._1).toSet
        recallSum += (top3 & exact(qid)).size / 3.0
        candSum += cands.size.toDouble / (n - 1)
      }
      println(f"b=$b L=$l probes=$probes recall=${recallSum / queries.length}%.3f cand_frac=${candSum / queries.length}%.3f")
    }
    spark.stop()
  }
}
