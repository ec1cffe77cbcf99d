package graft

/** MLlib-backed indexing: structure + recall assertions (these operators
  * are rows-only for the oracle — sketches/cluster ids are engine-specific). */
class MLSpec extends SparkSpec {

  test("kmeans IVF returns top-3 per query with descending scores") {
    val rows = ops.MLQueries.ivfTop3(spark, sf001).collect()
    assert(rows.length == 15) // 5 queries x 3
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val scores = rs.sortBy(_.getLong(3)).map(_.getDouble(2)).toSeq
      assert(scores == scores.sorted.reverse)
    }
  }

  test("q_ivf_kmeans registry invariants all hold") {
    val r = SparkEntry.queries("q_ivf_kmeans")(spark, sf001).collect().head
    assert(r.getAs[Long]("n_queries") == 5L)
    assert(r.getAs[Long]("results_complete") == 1L)
    assert(r.getAs[Long]("recall_ok") == 1L)
    assert(r.getAs[Double]("exact_mean_top3") > 0.0)
  }

  test("q_pca_reduce: orthonormal loadings, explained floor, positive variance") {
    val r = SparkEntry.queries("q_pca_reduce")(spark, sf001).collect().head
    assert(r.getAs[Long]("n_components") == ops.MLQueries.PcaK.toLong)
    assert(r.getAs[Long]("explained_ok") == 1L)
    assert(r.getAs[Long]("orthonormal_ok") == 1L)
    assert(r.getAs[Double]("total_var") > 0.0)
  }

  test("q_mllib_brp registry invariants all hold (euclidean-LSH twin)") {
    val r = SparkEntry.queries("q_mllib_brp")(spark, sf001).collect().head
    assert(r.getAs[Long]("n_queries") == 5L)
    assert(r.getAs[Long]("results_complete") == 1L)
    assert(r.getAs[Long]("recall_ok") == 1L)
    assert(r.getAs[Double]("exact_mean_top3_dist") > 0.0)
  }

  test("brp neighbors rank by exact euclidean distance within each query") {
    val rows = ops.MLQueries.brpTop3(spark, sf001).collect()
    assert(rows.length == 15) // 5 queries x 3
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val dists = rs.map(_.getDouble(2)).toSeq
      assert(dists == dists.sorted, s"distances not ascending: $dists")
    }
  }

  test("q_mllib_minhash registry invariants all hold") {
    val r = SparkEntry.queries("q_mllib_minhash")(spark, sf001).collect().head
    assert(r.getAs[Long]("n_true_pairs") > 0L)
    assert(r.getAs[Long]("all_true_found") == 1L)
  }

  test("mllib minhash candidates are a superset of the exact-jaccard>=0.8 pairs") {
    val got = ops.MLQueries.mllibMinhashPairs(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth at the SAME threshold: q_ngram_jaccard = exact trigram-
    // shingle jaccard >= 0.8 (the oracle-checked verify stage). The MLlib
    // LSH join post-filters candidates by exact key distance <= 0.2, so
    // every true positive it generates as a candidate must survive; with
    // the seeded 2-table OR construction all of them are generated on this
    // fixture — a recall-1.0 assertion against the exact result.
    val truePos = SparkEntry.queries("q_ngram_jaccard")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truePos.nonEmpty)
    assert(got.nonEmpty)
    assert(got.forall { case (a, b) => a < b })
    assert(truePos.subsetOf(got),
      s"LSH missed true positives: ${truePos -- got}")
  }

  test("ann recall is measured in (0, 1]") {
    val r = SparkEntry.queries("q_ann_recall")(spark, sf001).collect().head
    val rec = r.getDouble(0)
    assert(rec > 0.0 && rec <= 1.0)
  }

  test("ivf-kmeans recall@3 >= single-probe sign-bucket recall on the same queries") {
    val emb = Tables.embeddings(spark, sf001).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val exact = emb.filter(_._1 < 5).map { case (qid, qe) =>
      qid -> emb.filter(_._1 != qid)
        .map { case (id, e) => (id, graft.functions.VectorKernels.cosineFloat(qe, e)) }
        .sortBy(t => (-t._2, t._1)).take(3).map(_._1).toSet
    }.toMap
    def recallFrom(rows: Array[org.apache.spark.sql.Row]): Double = {
      val got = rows.map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }
      exact.map { case (q, ex) => (got.getOrElse(q, Set.empty[Long]) & ex).size }.sum / 15.0
    }
    val rIvf = recallFrom(ops.MLQueries.ivfTop3(spark, sf001).collect())
    val rBucket = recallFrom(SparkEntry.queries("q_ann_bucket")(spark, sf001).collect())
    assert(rIvf >= rBucket, s"ivf recall $rIvf < sign-bucket recall $rBucket")
  }

  test("seeded random-hyperplane LSH reaches recall@3 >= 0.8 at bounded cost") {
    val r = SparkEntry.queries("q_ann_recall_rp")(spark, sf001).collect().head
    val recall = r.getAs[Double]("recall_at_3")
    val frac = r.getAs[Double]("cand_frac")
    assert(recall >= 0.8, s"recall $recall < 0.8")
    assert(frac < 0.7, s"candidate fraction $frac not < 0.7")
  }
}
