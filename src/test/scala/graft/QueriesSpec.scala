package graft

/** Smoke-level checks for every registered query at sf0.001: runs, has the
  * declared deterministic shape, and key invariants hold. (Bit-exact value
  * checking is the driver's DuckDB oracle gate; locally replicated by
  * tools/compare_oracle.py.) */
class QueriesSpec extends SparkSpec {

  test("every query runs at sf0.001 and yields a schema") {
    SparkEntry.registry.foreach { q =>
      val df = q.fn(spark, sf001)
      assert(df.columns.nonEmpty, q.name)
      assert(df.count() >= 0, q.name)
    }
  }

  test("flagship entry returns >0 rows with self-match score 1.0 first") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 10)
    assert(rows.head.getAs[Long]("vec_id") == 0L)
    assert(rows.head.getAs[Double]("score") == 1.0)
    val scores = rows.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("filtered knn only returns rows matching the predicate") {
    val rows = SparkEntry.queries("q_knn_filtered")(spark, sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("label") == 2))
  }

  test("delete search excludes the deleted ids") {
    val rows = SparkEntry.queries("q_delete_search")(spark, sf001).collect()
    val ids = rows.map(_.getAs[Long]("vec_id")).toSet
    assert(ids.intersect(Set(1L, 3L, 5L, 9L)).isEmpty)
  }

  test("approx percentiles within 1% of the exact interpolated percentiles") {
    val exact = SparkEntry.queries("q_percentiles")(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rows = SparkEntry.queries("q_percentiles_approx")(spark, sf001).collect()
    assert(rows.length == exact.size)
    rows.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      // p_value is the exact interpolated percentile (same as q_percentiles)
      assert(r.getAs[Double]("p_value") == exact(k), s"$k exact companion drifted")
      // within_tol IS the 1% GK accuracy gate, now oracle-stated as 1
      assert(r.getAs[Long]("within_tol") == 1L, s"$k approx out of tolerance")
    }
  }

  test("count-min heavy hitters: sketch never undercounts and stays in the eps bound") {
    val rows = SparkEntry.queries("q_heavy_hitters")(spark, sf001).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_ge_exact") == 1L, s"${r.getString(0)} undercounted")
      assert(r.getAs[Long]("est_within_eps") == 1L, s"${r.getString(0)} out of bound")
    }
    // top-10 ordering is deterministic: cnt desc, token asc
    val pairs = rows.map(r => (r.getLong(1), r.getString(0))).toSeq
    assert(pairs == pairs.sortBy { case (c, t) => (-c, t) })
  }

  test("textrank: 10 keywords, strictly ordered, scores in the PageRank range") {
    val rows = SparkEntry.queries("q_textrank")(spark, sf001).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse)
    // with damping 0.85 every rank sits in ((1-d)/n, 1); the fixture
    // vocabulary is ~50 tokens so the top-10 all beat the uniform 1/n
    scores.foreach(s => assert(s > 0.0 && s < 1.0))
    val n = rows.map(_.getAs[String]("tok")).distinct.length
    assert(n == 10)
  }

  test("bpe: 8 distinct merges with non-increasing frequencies") {
    val rows = SparkEntry.queries("q_bpe_train")(spark, sf001).collect()
    assert(rows.map(_.getAs[Int]("it")).toSeq == (1 to 8))
    val pairs = rows.map(_.getAs[String]("pair")).toSeq
    assert(pairs.distinct.size == 8, "a pair can only be merged once")
    pairs.foreach(p => assert(p.split(" ").length == 2, p))
    // merging (a,b) only removes occurrences of existing pairs and any
    // pair it creates occurs at most as often as (a,b) did — so the
    // picked max frequency never increases across iterations
    val freqs = rows.map(_.getAs[Long]("pair_freq")).toSeq
    assert(freqs == freqs.sorted.reverse, s"not non-increasing: $freqs")
    assert(freqs.last > 0)
  }

  test("pareto front: returned docs are mutually non-dominating") {
    val out = SparkEntry.queries("q_pareto_front")(spark, sf001).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_uniq")))
    assert(out.nonEmpty)
    for {
      a <- out; b <- out
      if a != b && a._1 == b._1
    } assert(!(a._3 >= b._3 && a._2 <= b._2 && (a._3 > b._3 || a._2 < b._2)),
      s"$a dominates $b")
  }

  test("merge upsert: actions partition target+source, books close") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q_merge_upsert")(spark, sf001).collect()
      .map(r => r.getAs[String]("action") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("total_bal")))).toMap
    assert(out.keySet == Set("unchanged", "updated", "inserted"))
    val cust = spark.read.parquet(s"$sf001/customer.parquet")
    val nCust = cust.count()
    assert(out("unchanged")._1 + out("updated")._1 == nCust,
      "every target row lands in exactly one matched/unmatched branch")
    // inserted rows are exactly the mod-3-shifted latest-order keys
    val nShift = spark.read.parquet(s"$sf001/orders.parquet")
      .select(col("o_custkey")).distinct()
      .filter(col("o_custkey") % 3 === 0).count()
    assert(out("inserted")._1 == nShift)
  }

  test("ewma: bounded by the series range, equals the value for 1-order keys") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q_ewma")(spark, sf001).collect()
    assert(out.length == 20)
    val rng = spark.read.parquet(s"$sf001/orders.parquet")
      .groupBy(col("o_custkey")).agg(min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    out.foreach { r =>
      val (k, n, e) = (r.getAs[Long]("o_custkey"),
        r.getAs[Long]("n_orders"), r.getAs[Double]("ewma"))
      val (lo, hi, cnt) = rng(k)
      assert(n == cnt)
      assert(e >= lo && e <= hi, s"ewma out of range for $k")
      if (cnt == 1L) assert(e == lo)
    }
  }

  test("every oracle name corresponds to a registered query") {
    val qnames = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qnames))
  }

  test("every registered query carries an oracle (full board, no rows-only rows)") {
    // the r7 postmortem: a query absent from the board read as green.
    // Lock the denominator: |queries| == |oracleSql| == |registry|, so a
    // query can only leave the board by an explicit registry change, and
    // none degrade to the weaker rows-only check.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries with no oracle: $missing")
    assert(SparkEntry.queries.size == SparkEntry.registry.size)
  }

  test("registry names are unique (a duplicate would silently drop a query)") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicates: ${names.diff(names.distinct).distinct}")
  }

  test("jaccard scores are within (0, 1]") {
    val rows = SparkEntry.queries("q_ngram_jaccard")(spark, sf001).collect()
    assert(rows.forall { r =>
      val j = r.getAs[Double]("jaccard"); j > 0.0 && j <= 1.0
    })
  }

  test("minhash candidates contain the high-jaccard pairs (LSH recall)") {
    val jac = SparkEntry.queries("q_ngram_jaccard")(spark, sf001).collect()
      .filter(_.getAs[Double]("jaccard") >= 0.9)
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val cand = SparkEntry.queries("q_minhash_lsh")(spark, sf001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // 4 bands x 2 rows at J>=0.9: P(miss) = (1-J^2)^4 < 4e-3 per pair;
    // deterministic md5 hashes make this a fixed (not flaky) assertion.
    assert(jac.subsetOf(cand), s"missing: ${jac.diff(cand)}")
  }
}
