package graft.tools

import graft.{Sessions, Tables}
import graft.functions.VectorKernels

/** Dev tool: tune the sign-LSH candidate generator for q_neardup_pairs.
  *
  * The fixture embeddings are near-random Gaussian (top pair cosine ~0.5),
  * the adversarial case for cosine LSH — so the band structure must be
  * validated EMPIRICALLY: for a grid of (bits per table, tables, seed) this
  * prints whether every brute-force top-K closest pair collides in at
  * least one table (the condition for the LSH+rescore query to be
  * bit-equal to the exhaustive oracle) and the distinct-candidate volume.
  * Coverage is reported for top-20 (the query's k) and top-60 (safety
  * margin: rank-20 score at the next SF could drift into today's 21..60).
  *
  * Driver-side math on collected fixtures (n in 500..2000) — a tuning
  * harness, not a serving path. The frozen winner goes into
  * SimilarityQueries.q_neardup_pairs as seeded literal hyperplanes.
  */
object NeardupProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", appName = "neardup-probe", logLevel = "ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }

    for (d <- dirs) {
      val emb = Tables.embeddings(spark, d).select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
      val n = emb.length
      val dim = emb.head._2.length
      println(s"== $d  n=$n dim=$dim")

      // brute-force top-60 pairs (score desc, id_a, id_b)
      val ranked = (for {
        i <- emb.indices.iterator
        j <- (i + 1) until n
      } yield (emb(i)._1, emb(j)._1, cos(emb(i)._2, emb(j)._2)))
        .toArray.sortBy(t => (-t._3, t._1, t._2))
      println(f"   score@1=${ranked(0)._3}%.4f score@20=${ranked(19)._3}%.4f score@60=${ranked(59)._3}%.4f")

      for {
        bits <- Seq(3, 4)
        tables <- Seq(24, 32, 40, 48)
        seed <- Seq(4242, 777)
      } {
        val rng = new scala.util.Random(seed)
        val planes = Array.fill(tables * bits * dim)(rng.nextGaussian())
        val sigs: Map[Long, Array[Int]] = emb.map { case (id, e) =>
          id -> VectorKernels.signBuckets(e, planes, tables, bits)
        }.toMap
        def collide(a: Long, b: Long): Boolean = {
          val sa = sigs(a); val sb = sigs(b)
          var t = 0
          while (t < tables) { if (sa(t) == sb(t)) return true; t += 1 }
          false
        }
        val miss20 = ranked.take(20).count(p => !collide(p._1, p._2))
        val miss60 = ranked.take(60).count(p => !collide(p._1, p._2))
        // distinct candidate pairs across all tables
        var cand = 0L
        var i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) {
            if (collide(emb(i)._1, emb(j)._1)) cand += 1
            j += 1
          }
          i += 1
        }
        val frac = cand.toDouble / (n.toLong * (n - 1) / 2)
        println(f"   bits=$bits tables=$tables%2d seed=$seed%4d  miss20=$miss20 miss60=$miss60  cand=$cand%7d (${frac * 100}%.1f%% of pairs)")
      }
    }
    spark.stop()
  }
}
