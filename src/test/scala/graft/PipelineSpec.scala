package graft

/** Semantic invariants for the dataset-pipeline operators (splits, strata,
  * BM25, TF-IDF). Bit-exact value parity is the DuckDB oracle's job; these
  * assert the statistical/ranking properties that make the operators useful. */
class PipelineSpec extends SparkSpec {

  test("hash split partitions every doc exactly once, near 80/10/10") {
    val rows = SparkEntry.queries("q_hash_split")(spark, sf001).collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    val total = rows.values.sum
    val nTotal = Tables.documents(spark, sf001).count()
    assert(total == nTotal, "splits must cover the corpus exactly once")
    assert(rows.keySet == Set("train", "val", "test"))
    val trainFrac = rows("train").toDouble / total
    assert(trainFrac > 0.65 && trainFrac < 0.95, s"train frac $trainFrac")
  }

  test("hash split is deterministic across invocations") {
    val a = SparkEntry.queries("q_hash_split")(spark, sf001).collect().toSeq
    val b = SparkEntry.queries("q_hash_split")(spark, sf001).collect().toSeq
    assert(a == b)
  }

  test("stratified sample hits every stratum near the 20% target rate") {
    val rows = SparkEntry.queries("q_stratified_sample")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = r.getAs[Long]("n_total")
      val sampled = r.getAs[Long]("n_sampled")
      assert(sampled > 0, s"stratum ${r.getString(0)} empty")
      val rate = sampled.toDouble / total
      // small strata at sf0.001 => wide tolerance; the point is no stratum
      // is skipped and none is wildly off the hash-target rate
      assert(rate > 0.02 && rate < 0.6, s"stratum ${r.getString(0)} rate $rate")
    }
  }

  test("bm25 ranks rare-term docs above common-term-only docs") {
    import org.apache.spark.sql.functions._
    val top = SparkEntry.queries("q_bm25")(spark, sf001).collect()
    assert(top.length == 10)
    val scores = top.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sortBy(-_), "descending by score")
    assert(scores.head > 0)
    // docs containing the rare term 'dup' carry its high idf: the top doc
    // must be one of them whenever any 'dup' doc exists at this sf
    val dupDocs = Tables.documents(spark, sf001)
      .filter(array_contains(split(col("text"), " "), "dup"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    if (dupDocs.nonEmpty)
      assert(dupDocs.contains(top.head.getAs[Long]("doc_id")),
        s"top doc ${top.head.getAs[Long]("doc_id")} lacks the rare term")
  }

  test("funnel stages are monotonically non-increasing") {
    val r = SparkEntry.queries("q_funnel")(spark, sf001).collect().head
    val (users, view, click, purchase) = (r.getAs[Long]("n_users"),
      r.getAs[Long]("n_view"), r.getAs[Long]("n_click_after_view"),
      r.getAs[Long]("n_purchase_after_click"))
    assert(users >= view && view >= click && click >= purchase)
    assert(view > 0, "fixture users must reach stage 1")
  }

  test("decontamination flags every cross-split exact duplicate") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("q_decontaminate")(spark, sf001).collect().head
    val contaminated = r.getAs[Long]("n_contaminated")
    assert(contaminated <= r.getAs[Long]("n_test_docs"))
    // any exact text duplicate (>= 8 tokens) spanning test/train MUST be
    // caught by 8-gram overlap — compute the lower bound independently
    val docs = Tables.documents(spark, sf001)
      .withColumn("b", graft.functions.TextOps.md5Prefix60(
        concat(lit("split:"), col("doc_id").cast("string"))) % 100)
      .withColumn("nt", size(split(col("text"), " ")))
      .filter(col("nt") >= 8)
      .select(col("doc_id"), col("b"), md5(col("text")).as("th"))
    val crossDup = docs.filter(col("b") >= 90).select(col("th")).distinct()
      .join(docs.filter(col("b") < 80).select(col("th")).distinct(), "th")
      .join(docs.filter(col("b") >= 90).select(col("doc_id"), col("th")), "th")
      .select(col("doc_id")).distinct().count()
    assert(contaminated >= crossDup,
      s"decontamination missed exact cross-split dups: $contaminated < $crossDup")
  }

  test("bloom decontamination: no false negatives, doc FP rate in bound") {
    val r = SparkEntry.queries("q_bloom_decontaminate")(spark, sf001).collect().head
    assert(r.getAs[Long]("no_false_negatives") == 1L,
      "Bloom filter missed a truly contaminated doc — structurally impossible unless the probe hashes differently than the build")
    assert(r.getAs[Long]("fp_ok") == 1L, "false-positive doc rate above bound")
    assert(r.getAs[Long]("n_true_contaminated") <= r.getAs[Long]("n_train_docs"))
    // sf0.001 ground truth from tools/BloomProbe: 5 of 399 train docs
    assert(r.getAs[Long]("n_train_docs") == 399L)
    assert(r.getAs[Long]("n_true_contaminated") == 5L)
  }

  test("pii redaction: injection rates honored, every flagged doc removed chars") {
    val rows = SparkEntry.queries("q_pii_redact")(spark, sf001).collect()
    val (docs, flagged, emails, phones, ips, removed) = rows.map(r =>
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_flagged"),
        r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"),
        r.getAs[Long]("n_ips"), r.getAs[Long]("chars_removed")))
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3,
        a._4 + b._4, a._5 + b._5, a._6 + b._6))
    assert(docs == 500L)
    // injection is doc_id-modular: exactly one PII item per qualifying
    // doc_id in 0..499 => 100 emails (%5), 72 phones (%7), 46 IPs (%11)
    assert(emails == 100L)
    assert(phones == 72L)
    assert(ips == 46L)
    // a doc is flagged iff it matched at least one pattern, and every
    // match shrank the text (tokens are shorter than any injected PII)
    assert(flagged > 0L && flagged <= docs && removed > 0L)
  }

  test("pack bins: token accounting closes and fills are sane") {
    val rows = SparkEntry.queries("q_pack_bins")(spark, sf001).collect()
    assert(rows.nonEmpty)
    val totalPacked = rows.map(_.getAs[Long]("total_tokens")).sum
    // packing moves every token of every doc into exactly one bin
    val corpusToks = graft.streaming.StreamHeavyHitters
      .tokens(Tables.documents(spark, sf001), 1).count()
    assert(totalPacked == corpusToks)
    rows.foreach { r =>
      val (bins, total, maxBin, fill) = (r.getAs[Long]("n_bins"),
        r.getAs[Long]("total_tokens"), r.getAs[Long]("max_bin_tokens"),
        r.getAs[Double]("fill"))
      assert(bins >= 1L && total > 0L)
      assert(maxBin * bins >= total)
      // fill is total/(bins*B) by construction; bins never exceed the
      // token range they cover, so fill stays in (0, 1 + maxdoc/B)
      assert(fill > 0.0 && fill <= 1.5)
      assert(bins == total / ops.PipelineQueries.PackB + (
        if (total % ops.PipelineQueries.PackB == 0) 0L else 1L) ||
        fill <= 1.0) // overflowing docs can only reduce the bin count
    }
  }

  test("mixture rebalance: skewed langs get skewed rates, budget roughly met") {
    val rows = SparkEntry.queries("q_mixture_rebalance")(spark, sf001).collect()
    val byLang = rows.map(r => r.getAs[String]("lang") ->
      (r.getAs[Long]("n_docs"), r.getAs[Double]("rate"),
        r.getAs[Long]("n_kept"))).toMap
    // en dominates the fixture -> its keep rate must be the smallest
    val enRate = byLang("en")._2
    byLang.foreach { case (lang, (n, rate, kept)) =>
      assert(rate > 0.0 && rate <= 1.0)
      if (lang != "en") assert(rate > enRate, s"$lang rate $rate !> en $enRate")
      assert(kept <= n)
      // md5-mod sampling tracks the rate (binomial tolerance)
      assert(math.abs(kept - rate * n) <= 0.12 * n + 5,
        s"$lang kept $kept vs expected ${rate * n}")
    }
    val total = byLang.values.map(_._1).sum
    val kept = byLang.values.map(_._3).sum
    assert(math.abs(kept.toDouble / total - ops.PipelineQueries.MixBudget) < 0.08)
  }

  test("chunk windows: 50% overlap costs 1.3-2x storage, doc accounting closes") {
    val rows = SparkEntry.queries("q_chunk_windows")(spark, sf001).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 500L)
    rows.foreach { r =>
      val red = r.getAs[Double]("redundancy")
      // stride W/2 re-covers every token at most twice; > 1.3 means the
      // overlap is actually happening (docs longer than one window)
      assert(red > 1.3 && red < 2.0, s"${r.getAs[String]("lang")}: $red")
      assert(r.getAs[Long]("n_chunks") >= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("max_chunks_per_doc") >= 2L)
    }
  }

  test("quality classifier: deterministic margins, flags within bounds") {
    val a = SparkEntry.queries("q_quality_classifier")(spark, sf001).collect()
    val b = SparkEntry.queries("q_quality_classifier")(spark, sf001).collect()
    assert(a.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSeq ==
      b.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq)
    a.foreach { r =>
      assert(r.getAs[Long]("n_flagged") <= r.getAs[Long]("n_docs"))
      assert(!r.getAs[Double]("mean_margin").isNaN)
    }
    assert(a.map(_.getAs[Long]("n_flagged")).sum > 0L)
  }

  test("keeper accounting closes against the component sizes") {
    val comps = SparkEntry.queries("q_dedup_components")(spark, sf001).collect()
      .map(r => r.getAs[Long]("component") -> r.getAs[Long]("size")).toMap
    val keepers = SparkEntry.queries("q_dedup_keepers")(spark, sf001).collect()
    assert(keepers.map(_.getAs[Long]("component")).toSet == comps.keySet)
    keepers.foreach { r =>
      val c = r.getAs[Long]("component")
      assert(r.getAs[Long]("n_dropped") == comps(c) - 1,
        s"component $c drop count mismatch")
      assert(r.getAs[Long]("keeper") >= c, "keeper must be a member (>= min id)")
    }
  }

  test("substring dedup: spans are window-sized, exact-dup docs fully covered") {
    val out = SparkEntry.queries("q_substring_dedup")(spark, sf001).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_docs_dup"), r.getAs[Long]("n_spans"),
          r.getAs[Long]("dup_tokens"), r.getAs[Long]("max_span_toks")))).toMap
    assert(out.nonEmpty)
    out.foreach { case (lang, (nd, ns, toks, mx)) =>
      assert(ns >= nd, s"$lang: every dup doc has at least one span")
      assert(toks >= 8 * ns, s"$lang: a span covers at least one 8-gram window")
      assert(mx >= 8, lang)
    }
    // a whole-doc exact duplicate (>= 8 tokens) duplicates ALL its windows,
    // so it must be flagged and its full token run is one maximal span
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"),
        size(split(col("text"), " ")).as("n"))
      .filter(col("n") >= 8)
    val dupTexts = docs.groupBy(col("text")).count().filter(col("count") >= 2)
      .select(col("text"))
    val perLang = docs.join(dupTexts, "text").groupBy(col("lang"))
      .agg(count(lit(1)).as("cnt"), max(col("n")).as("mxn")).collect()
    perLang.foreach { r =>
      val (lang, cnt, mxn) =
        (r.getAs[String]("lang"), r.getAs[Long]("cnt"), r.getAs[Int]("mxn"))
      assert(out(lang)._1 >= cnt, s"$lang: exact dups must be span-flagged")
      assert(out(lang)._4 >= mxn, s"$lang: a full-doc dup is one maximal span")
    }
  }

  test("componentLabels cache: memoizes per dir, clear releases every pinned block") {
    import graft.ops.TextQueries
    TextQueries.clearComponentLabels(spark)
    assert(TextQueries.cachedLabelEntries(spark) == 0)
    val l1 = TextQueries.componentLabels(spark, sf001)
    val labeledCount = l1.count()
    assert(TextQueries.cachedLabelEntries(spark) == 1)
    // memoized: a second access returns the same materialized frame
    assert(TextQueries.componentLabels(spark, sf001) eq l1)
    // a second dir builds its own entry
    TextQueries.componentLabels(spark, "/root/testdata/sf0.01")
    assert(TextQueries.cachedLabelEntries(spark) == 2)
    // clear evicts both AND drops every checkpoint block the builds
    // pinned (deterministic release — not ContextCleaner-eventual)
    val entries = TextQueries.labelEntriesFor(spark)
    assert(entries.size == 2 && entries.forall(_.pinned.nonEmpty))
    TextQueries.clearComponentLabels(spark)
    assert(TextQueries.cachedLabelEntries(spark) == 0)
    assert(entries.forall(_.released),
      "checkpoint blocks still in the block store after clearComponentLabels")
    // rebuilding after the clear works (l1 itself is dead — its lineage
    // was truncated by the checkpoint, which is why release is explicit)
    assert(TextQueries.componentLabels(spark, sf001).count() == labeledCount)
  }

  test("tfidf keywords: <=3 ranked terms per doc, ranks contiguous from 1") {
    val rows = SparkEntry.queries("q_tfidf_keywords")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted.toSeq
      assert(ranks == (1L to ranks.length), s"doc $id ranks $ranks")
      assert(ranks.length <= 3)
    }
    assert(rows.forall(_.getAs[Double]("tfidf") >= 0.0))
  }
}
