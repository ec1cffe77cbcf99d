package graft.ops

import graft.{OracleSql, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-pipeline text operators over the `documents` table:
  * exact dedup, canonical token-set dedup, MinHash+LSH near-dup, n-gram
  * Jaccard, SimHash fingerprinting, language-ID heuristic, quality scoring,
  * corpus token stats.
  *
  * Scale design: every operator is expressed as tokenize (narrow explode) ->
  * shuffle on a *hash key* (shingle, minhash band, fingerprint), never an
  * all-pairs product. The only candidate generation mechanism is a
  * bucket-equality shuffle join (LSH banding), which is the 100 TB path:
  * candidates per band ~ collisions, not n^2. Hashes are md5 (identical in
  * Spark and DuckDB), making every stage oracle-checkable bit-for-bit.
  */
object TextQueries {

  /** Per-doc token stream with positions. Spark `split` keeps empty tokens —
    * so does DuckDB string_split; downstream stages filter '' identically. */
  private def toks(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"), col("lang"),
      posexplode(split(col("text"), " ")).as(Seq("i", "tok")))

  /** Distinct word-trigram shingles per doc. Computed as a NARROW
    * higher-order-function projection over the token array (no explode +
    * window shuffle): at 100 TB this is a pure map stage; the only shuffle
    * in the dedup pipeline is the downstream join on the shingle/band key. */
  private def shingles(s: SparkSession, d: String): DataFrame =
    tokenized(s, d)
      .select(col("doc_id"), explode(shingleArray(col("t"))).as("sh"))

  /** (doc_id, t: array<string>) with the token array aliased ONCE — the
    * alias has multiple non-cheap downstream references, so CollapseProject
    * keeps it un-inlined and `split` runs once per row (inlining the split
    * into shingleArray would execute it 5x per row). Rows under 3 tokens
    * are filtered here (a when-guard inside shingleArray would likewise be
    * duplicated into filter + generator). */
  def tokenized(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)

  /** Distinct word-trigram shingle array over a token-array column (assumes
    * >= 3 tokens upstream). Shared by the hand-rolled MinHash pipeline and
    * the MLlib LSH twin (MLQueries). Backed by the codegen'd Shingle3Expr —
    * the former array_distinct(transform(sequence(...))) formulation is
    * semantically identical (KernelPropertiesSpec property-checks the
    * equivalence) but ArrayTransform/ArraySequence are CodegenFallback,
    * which dropped the dedup pipeline's hottest projection out of
    * whole-stage codegen; the kernel took ~20% off the whole
    * minhash/jaccard family (isolated QTime, sf0.1). */
  def shingleArray(t: Column): Column = graft.functions.TextOps.shingle3(t)

  /** Oracle twin of `shingles` (shared with MLQueries' q_mllib_minhash
    * truth-set oracle). */
  private[ops] val shinglesCte: String =
    """toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
      |         generate_subscripts(string_split(text, ' '), 1) AS i
      |  FROM documents),
      |sh0 AS (
      |  SELECT doc_id, tok,
      |    lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY i) AS t2,
      |    lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY i) AS t3
      |  FROM toks),
      |sh AS (
      |  SELECT DISTINCT doc_id, tok || ' ' || t2 || ' ' || t3 AS sh
      |  FROM sh0 WHERE t3 IS NOT NULL)""".stripMargin

  /** MinHash+LSH candidate pairs (doc_a < doc_b), the shared front half of
    * q_minhash_lsh and q_dedup_components. One md5 per shingle; 8 minhash
    * permutations via universal hashing h_j = (h1*(2j+1) + h2*(13+j)) mod p
    * — 8x fewer digest computations than seeded-md5-per-permutation, same
    * LSH guarantees. */
  def minhashPairs(s: SparkSession, d: String): DataFrame = {
    val sh = shingles(s, d)
      .select(col("doc_id"), md5(col("sh")).as("h"))
      // md5 aliased once: CollapseProject keeps non-cheap exprs with
      // multiple downstream references un-inlined => one digest per row
      .select(col("doc_id"),
        conv(substring(col("h"), 1, 8), 16, 10).cast("long").as("h1"),
        conv(substring(col("h"), 9, 8), 16, 10).cast("long").as("h2"))
    val minCols = (0 until 8).map(j =>
      min((col("h1") * (2 * j + 1) + col("h2") * (13 + j)) % 2147483647L).as(s"m$j"))
    val sig = sh.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
    val bands = sig.select(col("doc_id"),
      concat_ws("|", col("m0"), col("m1")).as("b0"),
      concat_ws("|", col("m2"), col("m3")).as("b1"),
      concat_ws("|", col("m4"), col("m5")).as("b2"),
      concat_ws("|", col("m6"), col("m7")).as("b3"))
    (0 until 4).map { k =>
      bands.select(col("doc_id").as("doc_a"), col(s"b$k").as("bk"))
        .join(bands.select(col("doc_id").as("doc_b"), col(s"b$k").as("bk")), "bk")
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"))
    }.reduce(_ union _).distinct()
  }

  /** Connected-component labels over the LSH candidate graph: (doc_id,
    * label) with label = min doc id in the component. Distributed min-label
    * propagation — one equi-join + min-aggregate per round, lineage cut by
    * an eager checkpoint, converging in O(graph diameter) rounds (dup
    * clusters are dense: 2-4 in practice).
    *
    * Memoized per (session, dir, data-mtime): the labels are the shared
    * "index build" output that BOTH q_dedup_components and q_dedup_keepers
    * consume — without the cache, keepers reruns the whole minhash +
    * propagation pipeline. The cached DataFrame is already materialized
    * (eager localCheckpoint), so reuse is a block read, not a recompute.
    * Hygiene (the round-6 advice): entries for stopped sessions are purged
    * on every access; a rewrite of `$d/documents.parquet` changes the
    * mtime component of the key, so the stale entry is evicted (blocks
    * unpersisted) instead of served; `clearComponentLabels` gives callers
    * (Bench, long-lived services) deterministic release of every
    * checkpoint block the build pinned. */
  def componentLabels(s: SparkSession, d: String): DataFrame = {
    // purge entries whose session is gone (their blocks died with it)
    labelsCache.filterInPlace { case ((sess, _, _), _) => !sess.sparkContext.isStopped }
    val key = (s, d, documentsMtime(s, d))
    // a stale same-dir entry (older mtime) is dead weight — release it
    labelsCache.keys.filter(k => k._1 == s && k._2 == d && k != key)
      .foreach(k => labelsCache.remove(k).foreach(_.release()))
    labelsCache.getOrElseUpdate(key, computeComponentLabels(s, d)).df
  }

  /** Deterministically drop every cached label entry (and its pinned
    * checkpoint blocks) for `s` — for benches that want to time the build
    * and services that outlive many datasets. */
  def clearComponentLabels(s: SparkSession): Unit =
    labelsCache.keys.filter(_._1 == s)
      .foreach(k => labelsCache.remove(k).foreach(_.release()))

  /** Count of live cached entries for `s` (spec hook). */
  private[graft] def cachedLabelEntries(s: SparkSession): Int =
    labelsCache.keys.count(_._1 == s)

  /** The live entries for `s` (spec hook — released-state assertions). */
  private[graft] def labelEntriesFor(s: SparkSession): Seq[LabelEntry] =
    labelsCache.collect { case ((sess, _, _), e) if sess == s => e }.toSeq

  private def documentsMtime(s: SparkSession, d: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$d/documents.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    try fs.getFileStatus(p).getModificationTime catch { case _: Exception => 0L }
  }

  /** A built label set plus every checkpoint block the build pinned —
    * `release()` unpersists them all (the ContextCleaner would eventually
    * GC them, but a long-lived session wants determinism). */
  private[graft] final case class LabelEntry(df: DataFrame, pinned: Seq[DataFrame]) {
    def release(): Unit = pinned.foreach { p =>
      p.queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
        case _ =>
      }
    }
    /** True when every pinned checkpoint RDD has been dropped from the
      * block store (spec hook). */
    private[graft] def released: Boolean = pinned.forall { p =>
      p.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.getStorageLevel
      }.forall(_ == org.apache.spark.storage.StorageLevel.NONE)
    }
  }

  private val labelsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, Long), LabelEntry]

  private def computeComponentLabels(s: SparkSession, d: String): LabelEntry = {
    val pinned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def ckpt(df: DataFrame): DataFrame = {
      val out = df.localCheckpoint(true)
      pinned += out
      out
    }
    val pairs = ckpt(minhashPairs(s, d))
    val edges = ckpt(pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst"))))
    var labels = ckpt(edges.select(col("src").as("doc_id")).distinct()
      .withColumn("label", col("doc_id")))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 25) {
      val prop = edges
        .join(labels.select(col("doc_id").as("src"), col("label")), "src")
        .groupBy(col("dst").as("doc_id"))
        .agg(min(col("label")).as("nlabel"))
      val next = ckpt(labels.join(prop, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label")))
      changed = next
        .join(labels.select(col("doc_id"), col("label").as("old")), "doc_id")
        .filter(col("label") =!= col("old")).count()
      labels = next
      iter += 1
    }
    // A silent cap here would emit wrong cluster labels on graphs with
    // diameter > 25 (chain-shaped near-dup runs) — fail instead. Min-label
    // propagation converges in O(diameter) rounds; dup clusters are dense,
    // so hitting 25 means the candidate graph is pathological and needs a
    // doubling/pointer-jumping variant, not a truncated answer.
    require(changed == 0,
      s"component labeling did not converge in $iter rounds ($changed labels still changing)")
    LabelEntry(labels, pinned.toSeq)
  }

  /** Oracle CTE chain: `edges` + recursive `reach` + per-doc min `lab` —
    * the recursive-CTE ground truth for componentLabels. */
  private def componentCtes: String =
    s"""$minhashPairsCtes,
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(doc, label) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.doc),
       |lab AS (SELECT doc, min(label) AS label FROM reach GROUP BY doc)""".stripMargin

  /** Oracle CTE chain producing the same candidate `pairs` table. */
  private def minhashPairsCtes: String =
    s"""$shinglesCte,
       |hh AS (
       |  SELECT doc_id,
       |    ${OracleSql.hexToLong("md5(sh)", 1, 8)} AS h1,
       |    ${OracleSql.hexToLong("md5(sh)", 9, 8)} AS h2
       |  FROM sh),
       |sig AS (
       |  SELECT doc_id,
       |    min((h1*1 + h2*13) % 2147483647) AS m0,
       |    min((h1*3 + h2*14) % 2147483647) AS m1,
       |    min((h1*5 + h2*15) % 2147483647) AS m2,
       |    min((h1*7 + h2*16) % 2147483647) AS m3,
       |    min((h1*9 + h2*17) % 2147483647) AS m4,
       |    min((h1*11 + h2*18) % 2147483647) AS m5,
       |    min((h1*13 + h2*19) % 2147483647) AS m6,
       |    min((h1*15 + h2*20) % 2147483647) AS m7
       |  FROM hh GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, m0 || '|' || m1 AS b0, m2 || '|' || m3 AS b1,
       |         m4 || '|' || m5 AS b2, m6 || '|' || m7 AS b3 FROM sig),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a JOIN bands b ON a.b0 = b.b0 AND a.doc_id < b.doc_id
       |  UNION SELECT a.doc_id, b.doc_id FROM bands a JOIN bands b ON a.b1 = b.b1 AND a.doc_id < b.doc_id
       |  UNION SELECT a.doc_id, b.doc_id FROM bands a JOIN bands b ON a.b2 = b.b2 AND a.doc_id < b.doc_id
       |  UNION SELECT a.doc_id, b.doc_id FROM bands a JOIN bands b ON a.b3 = b.b3 AND a.doc_id < b.doc_id)""".stripMargin

  /** BPE merge count shared by q_bpe_train / q_bpe_apply. */
  final val BpeMerges = 8

  /** Run the BPE training loop: one corpus pass builds the checkpointed
    * word-frequency table; each of the [[BpeMerges]] iterations is a
    * vocab-sized pair aggregate + a 1-row argmax action + a literal
    * replace() on the space-joined symbol representation. Returns the
    * ordered merge table (it, "a b", pair_freq); the checkpoint blocks are
    * released before returning (the result is driver-side rows, nothing
    * distributed retains the lineage). */
  private[graft] def trainBpeMerges(s: SparkSession, d: String)
      : Seq[(Int, String, Long)] = {
    val wf = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 ")).as("r"))
      .localCheckpoint(true)
    var words: DataFrame = wf
    val out = (1 to BpeMerges).map { k =>
      // codegen'd adjacent-pair build (GramsExpr, k=2): the gram string
      // "a b" IS the pair key and the tie-break the struct formulation
      // spelled as concat(a, ' ', b); symbols are split(' ') tokens so
      // the first space is the a/b boundary. n<2 symbol rows yield an
      // empty gram array (the former when(size>=2) guard, built in).
      val best = words
        .select(col("freq"), split(trim(col("r")), " ").as("sy"))
        .select(col("freq"),
          explode(graft.functions.TextOps.grams(col("sy"), 2)).as("g"))
        .groupBy(col("g"))
        .agg(sum(col("freq")).as("f"))
        .orderBy(col("f").desc, col("g").asc)
        .limit(1).collect().head
      val g = best.getAs[String]("g")
      val (a, b, f) = (g.substring(0, g.indexOf(' ')),
        g.substring(g.indexOf(' ') + 1), best.getAs[Long]("f"))
      words = words.select(col("freq"),
        replace(col("r"), lit(s" $a $b "), lit(s" $a$b ")).as("r"))
      (k, s"$a $b", f)
    }
    // merge table computed — release the pinned vocab blocks
    wf.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false)
      case _ =>
    }
    out
  }

  /** Oracle twin of [[trainBpeMerges]]: CTEs `w0` (word-frequency table
    * with the space-joined symbol repr) and, per iteration k, `p$k` (pair
    * frequencies), `b$k` (the argmax merge) and `w$k` (the table after
    * applying it). */
  private val bpeCtes: String = {
    val its = (1 to BpeMerges).map { k =>
      s"""p$k AS (
         |  SELECT s1 || ' ' || s2 AS pair, CAST(sum(freq) AS BIGINT) AS f
         |  FROM (SELECT freq, unnest(sy[1:len(sy)-1]) AS s1,
         |               unnest(sy[2:len(sy)]) AS s2
         |        FROM (SELECT freq, string_split(trim(r), ' ') AS sy
         |              FROM w${k - 1}))
         |  GROUP BY pair),
         |b$k AS (SELECT pair, f FROM p$k ORDER BY f DESC, pair ASC LIMIT 1),
         |w$k AS (
         |  SELECT w.freq,
         |    replace(w.r, ' ' || b.pair || ' ',
         |            ' ' || replace(b.pair, ' ', '') || ' ') AS r
         |  FROM w${k - 1} w, b$k b)""".stripMargin
    }.mkString(",\n")
    s"""w0 AS (
       |  SELECT CAST(count(*) AS BIGINT) AS freq,
       |    ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS r
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE w <> '' GROUP BY w),
       |$its""".stripMargin
  }

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("table", "row", "data"),
    "en" -> Seq("the", "a", "value"),
    "es" -> Seq("query", "join", "scan"),
    "fr" -> Seq("merge", "sort", "group"),
    "zh" -> Seq("spark", "stream", "batch"))

  val all: Seq[Q] = Seq(

    // Exact dedup: corpus-level duplicate-text accounting by content hash.
    Q("q_dedup_exact",
      (s, d) => Tables.documents(s, d)
        .groupBy(md5(col("text")).as("th")).agg(count(lit(1)).as("cnt"))
        .agg(
          sum(col("cnt")).cast("long").as("n_docs"),
          count(lit(1)).as("n_texts"),
          sum(when(col("cnt") > 1, 1).otherwise(0)).cast("long").as("n_dup_groups"),
          sum(when(col("cnt") > 1, col("cnt")).otherwise(0)).cast("long").as("n_dup_docs")),
      Some("""WITH g AS (SELECT md5(text) AS th, count(*) AS cnt FROM documents GROUP BY 1)
         |SELECT CAST(sum(cnt) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_texts,
         |  CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
         |  CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS n_dup_docs
         |FROM g""".stripMargin)),

    // Canonical token-SET dedup: md5 over the sorted distinct token bag.
    Q("q_dedup_set",
      (s, d) => Tables.documents(s, d)
        // codegen'd set fingerprint (SetFpExpr == md5(concat_ws(' ',
        // array_sort(array_distinct(t)))) — TreeSet order is the same
        // byte-wise string comparison array_sort applies)
        .select(col("doc_id"),
          graft.functions.TextOps.setFp(split(col("text"), " ")).as("fp"))
        .groupBy(col("fp"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep_id"))
        .filter(col("n") > 1)
        .orderBy(col("fp")),
      Some("""WITH f AS (
         |  SELECT doc_id,
         |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
         |  FROM documents)
         |SELECT fp, CAST(count(*) AS BIGINT) AS n, CAST(min(doc_id) AS BIGINT) AS keep_id
         |FROM f GROUP BY fp HAVING count(*) > 1 ORDER BY fp""".stripMargin)),

    // MinHash (8 perms via seeded md5) + LSH banding (4 bands x 2 rows):
    // candidate near-dup pairs via band-equality join — the 100 TB dedup path.
    Q("q_minhash_lsh",
      (s, d) => minhashPairs(s, d).orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH $minhashPairsCtes
         |SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b""".stripMargin),
      headline = true),

    // Connected components over the LSH candidate graph — the final step
    // of production dedup (candidate pairs -> duplicate CLUSTERS -> one
    // keeper per cluster). Distributed min-label propagation: each
    // iteration is one equi-join + min-aggregate on doc ids, converging in
    // O(graph diameter) rounds (dup clusters are dense, so 2-4 in
    // practice); lineage is cut per round with an eager checkpoint. The
    // oracle computes the same components with a recursive CTE — engine-
    // independent ground truth for an iterative distributed algorithm.
    Q("q_dedup_components",
      (s, d) => componentLabels(s, d)
        .groupBy(col("label").as("component"))
        .agg(count(lit(1)).as("size"), max(col("doc_id")).as("max_doc"))
        .orderBy(col("component")),
      Some(s"""WITH RECURSIVE $componentCtes
         |SELECT CAST(label AS BIGINT) AS component,
         |  CAST(count(*) AS BIGINT) AS size,
         |  CAST(max(doc) AS BIGINT) AS max_doc
         |FROM lab GROUP BY label ORDER BY component""".stripMargin)),

    // Pointer-jumping (path-doubling) components over the SAME candidate
    // graph — the O(log diameter) answer to chain-shaped duplicate runs
    // where plain propagation needs a round per hop (and fails loudly at
    // its round cap rather than emit wrong labels). Each round adds one
    // node-keyed self-join (`label := label(label)`) on top of the
    // propagation step, at least halving the remaining pointer depth:
    // 2x the per-round shuffle buys exponentially fewer rounds. Same
    // recursive-CTE oracle as q_dedup_components, so the driver gate
    // proves algorithm-equivalence, and GraphOpsSpec pins the round-count
    // separation (64-node chain: 7 doubling rounds vs 64 propagation).
    // At 100 TB: dense dup clusters -> propagation (fewer joins/round);
    // long chains / unknown topology -> doubling (bounded rounds).
    Q("q_cc_doubling",
      (s, d) => {
        val pairs = minhashPairs(s, d).localCheckpoint(true)
        val edges = pairs
          .select(col("doc_a").as("src"), col("doc_b").as("dst"))
          .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
          .localCheckpoint(true)
        val (labels, _) = GraphOps.doublingLabels(edges, maxIter = 12)
        labels.groupBy(col("label").as("component"))
          .agg(count(lit(1)).as("size"), max(col("doc_id")).as("max_doc"))
          .orderBy(col("component"))
      },
      Some(s"""WITH RECURSIVE $componentCtes
         |SELECT CAST(label AS BIGINT) AS component,
         |  CAST(count(*) AS BIGINT) AS size,
         |  CAST(max(doc) AS BIGINT) AS max_doc
         |FROM lab GROUP BY label ORDER BY component""".stripMargin)),

    // Keeper selection — the ACTIONABLE output of the dedup pipeline: one
    // keeper per duplicate cluster (longest text, doc_id tiebreak), every
    // other member a drop. Join of the component labels with the documents
    // table + one per-component argmax; the drop list is what a corpus
    // build actually consumes.
    Q("q_dedup_keepers",
      (s, d) => {
        val labels = componentLabels(s, d)
        val sized = labels.join(
          Tables.documents(s, d).select(col("doc_id"), col("n_chars")), "doc_id")
        sized.groupBy(col("label").as("component"))
          .agg(
            max_by(col("doc_id"), struct(col("n_chars"), -col("doc_id"))).as("keeper"),
            max(col("n_chars")).as("keeper_chars"),
            (count(lit(1)) - 1).as("n_dropped"))
          .orderBy(col("component"))
      },
      Some(s"""WITH RECURSIVE $componentCtes,
         |sized AS (
         |  SELECT lab.doc, lab.label, d.n_chars
         |  FROM lab JOIN documents d ON lab.doc = d.doc_id),
         |ranked AS (
         |  SELECT label, doc, n_chars,
         |    row_number() OVER (PARTITION BY label
         |      ORDER BY n_chars DESC, doc ASC) AS rn,
         |    count(*) OVER (PARTITION BY label) AS sz
         |  FROM sized)
         |SELECT CAST(label AS BIGINT) AS component,
         |  CAST(doc AS BIGINT) AS keeper,
         |  CAST(n_chars AS BIGINT) AS keeper_chars,
         |  CAST(sz - 1 AS BIGINT) AS n_dropped
         |FROM ranked WHERE rn = 1 ORDER BY component""".stripMargin)),

    // Duplicated-substring SPAN detection — the span-level exact dedup
    // between whole-doc dedup (q_dedup_exact) and near-dup (LSH): find
    // the maximal token runs that are literally repeated across >= 2
    // documents (the suffix-array dedup of Lee et al., "Deduplicating
    // Training Data Makes Language Models Better", re-expressed with the
    // distributed primitive that replaces the suffix array at 100 TB: a
    // shuffle on positional 8-gram hashes). Positions whose 8-gram occurs
    // in another doc are duplicated; positions within W-1 of each other
    // cover overlapping windows, so merging at gap <= W-1 yields maximal
    // spans whose covered-token count is exactly max-min+W (the union of
    // overlapping windows is contiguous — no double counting). Scale
    // shape: ONE corpus-scale shuffle (groupBy gram hash — the stand-in
    // for the suffix sort), a semi-join back on the same key (the
    // exchange is identical, so ReusedExchange dedupes it), then a
    // per-doc window on doc-key partitions. Never all-pairs.
    Q("q_substring_dedup",
      (s, d) => {
        val W = 8
        val dd = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), split(col("text"), " ").as("t"))
          .filter(size(col("t")) >= W)
        // codegen'd positional 8-gram hashes (GramHashExpr, non-distinct):
        // posexplode index IS the gram position, hash identical to
        // md5Prefix60 of the space-joined gram the HOF used to build
        val gp = dd.select(col("doc_id"), col("lang"),
          posexplode(graft.functions.TextOps.gramHashes(col("t"), W))
            .as(Seq("pos", "gh")))
        val dup = gp.groupBy(col("gh"))
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2).select(col("gh"))
        val dpos = gp.join(dup, Seq("gh"), "left_semi")
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val spans = dpos
          .withColumn("brk",
            when(col("pos") - lag(col("pos"), 1).over(w) <= W - 1, 0L)
              .otherwise(1L))
          .withColumn("sid", sum(col("brk")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("doc_id"), col("lang"), col("sid"))
          .agg((max(col("pos")) - min(col("pos")) + W).as("span_toks"))
        spans.groupBy(col("lang"))
          .agg(countDistinct(col("doc_id")).as("n_docs_dup"),
            count(lit(1)).as("n_spans"),
            sum(col("span_toks")).cast("long").as("dup_tokens"),
            max(col("span_toks")).cast("long").as("max_span_toks"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH d8 AS (
         |  SELECT doc_id, lang, string_split(text, ' ') AS t
         |  FROM documents WHERE len(string_split(text, ' ')) >= 8),
         |grams AS (
         |  SELECT doc_id, lang, CAST(u.pos AS INTEGER) AS pos,
         |    ${OracleSql.hexToLong("md5(u.g)", 1, 15)} AS gh FROM (
         |    SELECT doc_id, lang,
         |      unnest(list_transform(generate_series(1, len(t) - 7),
         |        i -> {'pos': i - 1, 'g': array_to_string(t[i:i+7], ' ')})) AS u
         |    FROM d8)),
         |dup AS (SELECT gh FROM grams GROUP BY gh
         |        HAVING count(DISTINCT doc_id) >= 2),
         |dp AS (SELECT g.doc_id, g.lang, g.pos
         |       FROM grams g JOIN dup USING (gh)),
         |sp AS (
         |  SELECT doc_id, lang, pos, sum(brk) OVER (
         |      PARTITION BY doc_id ORDER BY pos) AS sid
         |  FROM (
         |    SELECT doc_id, lang, pos,
         |      CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
         |        ORDER BY pos) <= 7 THEN 0 ELSE 1 END AS brk
         |    FROM dp)),
         |spans AS (
         |  SELECT doc_id, lang, sid, max(pos) - min(pos) + 8 AS span_toks
         |  FROM sp GROUP BY doc_id, lang, sid)
         |SELECT lang,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_dup,
         |  CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(span_toks) AS BIGINT) AS dup_tokens,
         |  CAST(max(span_toks) AS BIGINT) AS max_span_toks
         |FROM spans GROUP BY lang ORDER BY lang""".stripMargin)),

    // Corpus-wide top bigrams — the frequency statistics a tokenizer/BPE
    // training run starts from. Narrow bigram projection (no window),
    // one groupBy shuffle, TakeOrderedAndProject for the top-k.
    Q("q_top_ngrams",
      (s, d) => {
        val t = Tables.documents(s, d)
          .select(split(col("text"), " ").as("t"))
          .filter(size(col("t")) >= 2)
        t.select(explode(graft.functions.TextOps.grams(col("t"), 2))
            .as("bigram"))
          .filter(!col("bigram").startsWith(" ") && !col("bigram").endsWith(" "))
          .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bigram"))
          .limit(20)
      },
      Some("""WITH t AS (
         |  SELECT string_split(text, ' ') AS t FROM documents
         |  WHERE len(string_split(text, ' ')) >= 2),
         |bg AS (
         |  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
         |    i -> t[i] || ' ' || t[i+1])) AS bigram
         |  FROM t)
         |SELECT bigram, CAST(count(*) AS BIGINT) AS n
         |FROM bg
         |WHERE bigram NOT LIKE ' %' AND bigram NOT LIKE '% '
         |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin)),

    // Inverted-index construction — the IR-side core operator: per-term
    // posting statistics (df, cf, max within-doc tf) plus the posting-list
    // HEAD (12 smallest doc_ids). Scale shape: shuffle 1 groups on
    // (term, doc) — map-side combinable, bounded rows; shuffle 2 groups on
    // term where the posting head comes from the bounded TopKAgg buffer
    // (k entries per group PER PARTITION on the map side), so a stopword's
    // full df-sized posting list is never materialized in one row — the
    // reason this survives a stopword at 100 TB while a
    // collect_list-then-slice or a per-term window would not. (TopKAgg
    // scores are Double: doc_ids stay exact below 2^53.)
    Q("q_inverted_index",
      (s, d) => {
        val td = toks(s, d).filter(col("tok") =!= "")
          .groupBy(col("tok"), col("doc_id")).agg(count(lit(1)).as("tf"))
        td.groupBy(col("tok"))
          .agg(count(lit(1)).as("df"),
            sum(col("tf")).cast("long").as("cf"),
            max(col("tf")).cast("long").as("max_tf"),
            graft.functions.VectorOps.topK(
              -col("doc_id").cast("double"), col("doc_id"), 12).as("hd"))
          .select(col("tok").as("term"), col("df"), col("cf"), col("max_tf"),
            array_join(transform(col("hd"),
              x => x.getField("vec_id").cast("string")), ",").as("head"))
          .orderBy(col("df").desc, col("term"))
          .limit(10)
      },
      Some("""WITH tk AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |td AS (
         |  SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS tf
         |  FROM tk WHERE tok <> '' GROUP BY tok, doc_id)
         |SELECT tok AS term, CAST(count(*) AS BIGINT) AS df,
         |  CAST(sum(tf) AS BIGINT) AS cf, CAST(max(tf) AS BIGINT) AS max_tf,
         |  array_to_string(list_sort(list(doc_id))[1:12], ',') AS head
         |FROM td GROUP BY tok
         |ORDER BY df DESC, term LIMIT 10""".stripMargin)),

    // Phrase search over the inverted index — the positional-postings
    // consumer: docs containing the exact phrase "table scan", ranked by
    // hit count. Scale shape: the term filter runs BEFORE the one doc-key
    // shuffle, so only the two terms' postings move; per-doc position
    // lists are bounded by doc length; the adjacency intersection is a
    // narrow HOF projection (positions of w1 whose successor position
    // holds w2) — no self-join, no second corpus pass. Distinct words
    // ("table" != "scan") make overlap impossible, so hit counts are
    // well-defined on both engines. All-integer arithmetic.
    Q("q_phrase_search",
      (s, d) => {
        val t = toks(s, d).filter(col("tok").isin("table", "scan"))
        t.groupBy(col("doc_id"), col("lang"))
          .agg(
            sort_array(collect_list(when(col("tok") === "table", col("i"))))
              .as("pa"),
            sort_array(collect_list(when(col("tok") === "scan", col("i"))))
              .as("pb"))
          .select(col("doc_id"), col("lang"),
            size(filter(col("pa"), x => array_contains(col("pb"), x + 1)))
              .cast("long").as("n_hits"),
            element_at(filter(col("pa"),
              x => array_contains(col("pb"), x + 1)), 1)
              .cast("long").as("first_pos"))
          .filter(col("n_hits") > 0)
          .orderBy(col("n_hits").desc, col("doc_id"))
          .limit(10)
      },
      Some("""WITH tk AS (
         |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok,
         |    unnest(generate_series(1, len(string_split(text, ' ')))) AS p
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, lang,
         |    list_sort(list(p) FILTER (WHERE tok = 'table')) AS pa,
         |    list_sort(list(p) FILTER (WHERE tok = 'scan')) AS pb
         |  FROM tk WHERE tok IN ('table', 'scan') GROUP BY doc_id, lang),
         |h AS (
         |  SELECT doc_id, lang,
         |    CAST(len(list_filter(pa, x -> list_contains(pb, x + 1)))
         |      AS BIGINT) AS n_hits,
         |    CAST(list_filter(pa, x -> list_contains(pb, x + 1))[1] - 1
         |      AS BIGINT) AS first_pos
         |  FROM g)
         |SELECT doc_id, lang, n_hits, first_pos FROM h WHERE n_hits > 0
         |ORDER BY n_hits DESC, doc_id LIMIT 10""".stripMargin)),

    // Pareto-frontier curation filter — multi-objective selection: keep
    // the documents not dominated on (vocabulary richness UP, length
    // DOWN), i.e. no other same-lang doc is at least as rich AND at most
    // as long with one strict — the skyline operator, on all-integer
    // coordinates. Scale shape (the reason this is NOT a doc-level
    // window or an all-pairs join): (1) one groupBy doc for the
    // features; (2) collapse to the (lang, n_tokens) GRID keeping max
    // n_uniq — the grid is bounded by distinct document lengths
    // (~10^5 even at 100 TB), independent of corpus size; (3) a prefix
    // window over the BOUNDED grid marks frontier lengths (strictly
    // shorter grid points must all be strictly poorer); (4) an equi-join
    // back tags the frontier docs. The oracle is the independent
    // brute-force NOT EXISTS dominance predicate.
    Q("q_pareto_front",
      (s, d) => {
        val g = toks(s, d).filter(col("tok") =!= "")
          .groupBy(col("doc_id"), col("lang"))
          .agg(count(lit(1)).as("n_tokens"),
            countDistinct(col("tok")).as("n_uniq"))
        val grid = g.groupBy(col("lang"), col("n_tokens"))
          .agg(max(col("n_uniq")).as("u_max"))
        val w = Window.partitionBy(col("lang")).orderBy(col("n_tokens"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val front = grid
          .withColumn("prefix", max(col("u_max")).over(w))
          .filter(col("prefix").isNull || col("u_max") > col("prefix"))
          .select(col("lang"), col("n_tokens"), col("u_max"))
        g.join(front, Seq("lang", "n_tokens"))
          .filter(col("n_uniq") === col("u_max"))
          .select(col("lang"), col("doc_id"), col("n_tokens"), col("n_uniq"))
          .orderBy(col("lang"), col("n_tokens"), col("doc_id"))
      },
      Some("""WITH toks AS (
         |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(count(DISTINCT tok) AS BIGINT) AS n_uniq
         |  FROM toks WHERE tok <> '' GROUP BY doc_id, lang)
         |SELECT lang, doc_id, n_tokens, n_uniq FROM g b
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM g a WHERE a.lang = b.lang
         |    AND a.n_uniq >= b.n_uniq AND a.n_tokens <= b.n_tokens
         |    AND (a.n_uniq > b.n_uniq OR a.n_tokens < b.n_tokens))
         |ORDER BY lang, n_tokens, doc_id""".stripMargin)),

    // BPE merge training — the tokenizer-training loop downstream of
    // q_top_ngrams' statistics (Sennrich et al. 2016), Spark-first. The
    // CORPUS is touched exactly once: explode -> word-frequency groupBy,
    // eagerly checkpointed (vocab-sized — the working set every iteration
    // after this is invariant to corpus size, which is the whole point of
    // training BPE on the frequency table rather than the text). Each of
    // the 8 merge iterations is: adjacent-symbol pairs (narrow zip-explode
    // over the space-joined symbol representation) -> one vocab-sized
    // groupBy -> argmax pair via a 1-row TakeOrdered action (the bounded
    // driver-side pattern bloom sizing also uses) -> a LITERAL
    // non-overlapping left-to-right replace() of ' a b ' with ' ab '
    // (identical strstr-loop semantics in Spark and DuckDB, so the greedy
    // merge application is bit-identical). Ties break on (freq DESC, pair
    // string ASC) — fully deterministic; all frequencies are integers, so
    // the oracle (the same 8 iterations unrolled as chained CTEs)
    // hash-matches exactly.
    Q("q_bpe_train",
      (s, d) => {
        import s.implicits._
        trainBpeMerges(s, d).toDF("it", "pair", "pair_freq")
          .orderBy(col("it"))
      },
      Some {
        val sel = (1 to BpeMerges).map(k =>
          s"SELECT $k AS it, pair, f AS pair_freq FROM b$k")
          .mkString("\nUNION ALL\n")
        s"""WITH $bpeCtes
           |$sel
           |ORDER BY it""".stripMargin
      }),

    // BPE application — the inference half: segment every (lang, word)
    // with the 8 trained merges (the same literal replace() chain the
    // trainer used, so segmentation is bit-identical to the trainer's
    // final state) and report the per-language compression the merges
    // buy: symbols-per-token falls from chars-per-token toward 1. Scale
    // shape: training is the bounded-iteration loop above; application
    // is ONE corpus pass -> per-(lang, word) groupBy -> a NARROW chain
    // of 8 replaces + a length count -> 5-row aggregate. All integer
    // sums; the one division is double-by-double on both engines.
    Q("q_bpe_apply",
      (s, d) => {
        val merges = trainBpeMerges(s, d)
        val wl = Tables.documents(s, d)
          .select(col("lang"), explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
          .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("freq"))
        val r0 = concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 "))
        val r8 = merges.foldLeft(r0) { case (r, (_, pair, _)) =>
          replace(r, lit(s" $pair "), lit(" " + pair.replace(" ", "") + " "))
        }
        wl.select(col("lang"), col("freq"),
            size(split(trim(r8), " ")).cast("long").as("n_sym"),
            length(col("w")).cast("long").as("n_chr"))
          .groupBy(col("lang"))
          .agg(sum(col("freq")).cast("long").as("n_tokens"),
            sum(col("freq") * col("n_chr")).cast("long").as("n_chars"),
            sum(col("freq") * col("n_sym")).cast("long").as("n_syms"))
          .select(col("lang"), col("n_tokens"), col("n_chars"), col("n_syms"),
            (col("n_syms").cast("double") / col("n_tokens").cast("double"))
              .as("syms_per_token"))
          .orderBy(col("lang"))
      },
      Some {
        val applied = (1 to BpeMerges).foldLeft("r") { (acc, k) =>
          s"replace($acc, ' ' || b$k.pair || ' ', ' ' || replace(b$k.pair, ' ', '') || ' ')"
        }
        val bs = (1 to BpeMerges).map(k => s"b$k").mkString(", ")
        s"""WITH $bpeCtes,
           |wl AS (
           |  SELECT lang, w, CAST(count(*) AS BIGINT) AS freq,
           |    ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS r
           |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
           |        FROM documents)
           |  WHERE w <> '' GROUP BY lang, w),
           |app AS (
           |  SELECT lang, freq,
           |    CAST(len(string_split(trim($applied), ' ')) AS BIGINT) AS n_sym,
           |    CAST(strlen(w) AS BIGINT) AS n_chr
           |  FROM wl, $bs),
           |agg AS (
           |  SELECT lang, CAST(sum(freq) AS BIGINT) AS n_tokens,
           |    CAST(sum(freq * n_chr) AS BIGINT) AS n_chars,
           |    CAST(sum(freq * n_sym) AS BIGINT) AS n_syms
           |  FROM app GROUP BY lang)
           |SELECT lang, n_tokens, n_chars, n_syms,
           |  CAST(n_syms AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS syms_per_token
           |FROM agg ORDER BY lang""".stripMargin
      }),

    // Exact n-gram Jaccard >= 0.8 via shingle-equality join (no all-pairs).
    // The join/aggregate key is a 60-bit md5-derived integer, not the
    // shingle string: the shuffles carry 8-byte longs instead of ~25-byte
    // strings. Both engines hash with the same md5 truncation, so results
    // stay bit-identical even in the (astronomically unlikely) event of a
    // 60-bit collision — the collision would be shared.
    // Exact-duplicate classes are collapsed BEFORE the shingle join: docs
    // with identical shingle sets form one class (md5 of the sorted set),
    // the join runs between class REPRESENTATIVES, and class-level results
    // expand back to doc pairs (intra-class pairs are jaccard=1 by
    // construction — emitted group-locally without touching the join).
    // On dup-heavy corpora this is the difference between O(classes^2)
    // and O(docs^2) shingle-join volume: at sf0.1 a 248-doc duplicate
    // class alone would otherwise contribute 248^2/2 x ~50 shingles of
    // join traffic. Result set provably identical to the naive
    // formulation, which the oracle still states.
    Q("q_ngram_jaccard",
      (s, d) => {
        val docSh = tokenized(s, d)
          .select(col("doc_id"), shingleArray(col("t")).as("shs"))
          .select(col("doc_id"), col("shs"),
            // \u0001 separator keeps the fingerprint injective on shingle
            // SETS (an empty separator would let boundary ambiguity merge
            // different sets into one class)
            md5(concat_ws("\u0001", array_sort(col("shs")))).as("cfp"))
          // class identity travels as TWO 60-bit longs (120 bits of the
          // md5: hex chars 1-15 and 16-30) instead of the 32-char hex
          // string: the class-pair intersection aggregate is the single
          // biggest shuffle in the engine (ShuffleAudit: 120 MB of a
          // 222 MB total at sf0.1) and 16 bytes of key vs ~60 roughly
          // halves it. 120 bits keeps collisions negligible at any real
          // class count (10^9 classes -> ~4e-19), and the ca<cb filter
          // only dedups unordered pairs, so any total order on (c1, c2)
          // is valid.
          .select(col("doc_id"), col("shs"),
            conv(substring(col("cfp"), 1, 15), 16, 10).cast("long").as("c1"),
            conv(substring(col("cfp"), 16, 15), 16, 10).cast("long").as("c2"))
        // classes is read by four consumers (shingle explode, two pair-
        // expansion joins, intra-class pairs): materialize the small
        // class table once instead of recomputing the scan+agg per branch
        val classes = docSh.groupBy(col("c1"), col("c2"))
          .agg(sort_array(collect_list(col("doc_id"))).as("docs"),
            first(col("shs")).as("shs"))
          .withColumn("n", size(col("shs")))
          .localCheckpoint(true)
        val classSh = classes
          .select(col("c1"), col("c2"), col("n"), explode(col("shs")).as("sh"))
          .select(col("c1"), col("c2"), col("n"),
            graft.functions.TextOps.md5Prefix60(col("sh")).as("shh"))
        val interPairs = classSh
          .select(col("c1").as("ca1"), col("c2").as("ca2"), col("n").as("na"), col("shh"))
          .join(classSh.select(col("c1").as("cb1"), col("c2").as("cb2"),
            col("n").as("nb"), col("shh")), "shh")
          .filter(col("ca1") < col("cb1") ||
            (col("ca1") === col("cb1") && col("ca2") < col("cb2")))
          .groupBy(col("ca1"), col("ca2"), col("cb1"), col("cb2"), col("na"), col("nb"))
          .agg(count(lit(1)).as("inter"))
          .select(col("ca1"), col("ca2"), col("cb1"), col("cb2"),
            (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
          .filter(col("jaccard") >= 0.8)
          .join(classes.select(col("c1").as("ca1"), col("c2").as("ca2"),
            col("docs").as("docs_a")), Seq("ca1", "ca2"))
          .join(classes.select(col("c1").as("cb1"), col("c2").as("cb2"),
            col("docs").as("docs_b")), Seq("cb1", "cb2"))
          .select(explode(col("docs_a")).as("da"), col("docs_b"), col("jaccard"))
          .select(col("da"), explode(col("docs_b")).as("db"), col("jaccard"))
          .select(least(col("da"), col("db")).as("doc_a"),
            greatest(col("da"), col("db")).as("doc_b"), col("jaccard"))
        val intraPairs = classes.filter(size(col("docs")) > 1)
          .select(posexplode(col("docs")).as(Seq("i", "doc_a")), col("docs"))
          .select(col("doc_a"),
            explode(slice(col("docs"), col("i") + 2, size(col("docs")))).as("doc_b"))
          .select(col("doc_a"), col("doc_b"), lit(1.0).as("jaccard"))
        interPairs.unionByName(intraPairs)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""WITH $shinglesCte,
         |shh AS (SELECT doc_id, ${OracleSql.hexToLong("md5(sh)", 1, 15)} AS shh FROM sh),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS inter
         |  FROM shh a JOIN shh b ON a.shh = b.shh AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM shh GROUP BY doc_id),
         |j AS (
         |  SELECT doc_a, doc_b,
         |    CAST(inter AS DOUBLE)/(sa.n + sb.n - inter) AS jaccard
         |  FROM pairs
         |  JOIN sizes sa ON doc_a = sa.doc_id
         |  JOIN sizes sb ON doc_b = sb.doc_id)
         |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin)),

    // SimHash: 32-bit fingerprint from per-token md5 bit votes. Computed as
    // a NARROW codegen'd kernel per doc (SimHash32Expr: token md5s -> 32
    // bit votes -> fingerprint in one pass): zero shuffles before the final
    // ORDER BY and no per-token array allocations. (Earlier versions: an
    // explode x 32-bit double aggregation — a 32x shuffle blowup — then an
    // interpreted HOF fold that burned CPU on zip_with allocations.)
    // Docs with no non-empty tokens are dropped, matching the oracle's
    // tokset CTE (which loses them at the unnest).
    Q("q_simhash",
      (s, d) => {
        val toksArr = array_distinct(array_remove(split(col("text"), " "), ""))
        Tables.documents(s, d)
          .select(col("doc_id"), toksArr.as("toks"))
          .filter(size(col("toks")) > 0)
          .select(col("doc_id"), graft.functions.TextOps.simhash32(col("toks")).as("simhash"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH tokset AS (
         |  SELECT DISTINCT doc_id, tok FROM
         |    (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
         |  WHERE tok <> ''),
         |h AS (SELECT doc_id, ${OracleSql.hexToLong("md5(tok)", 1, 8)} AS hv FROM tokset),
         |bits AS (
         |  SELECT doc_id, j,
         |    CASE WHEN (hv // CAST(power(2, j) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END AS w
         |  FROM h, (SELECT unnest(range(0, 32)) AS j) r),
         |sig AS (
         |  SELECT doc_id, j, CASE WHEN sum(w) > 0 THEN 1 ELSE 0 END AS bit
         |  FROM bits GROUP BY doc_id, j)
         |SELECT doc_id, CAST(sum(bit * CAST(power(2, j) AS BIGINT)) AS BIGINT) AS simhash
         |FROM sig GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Language-ID heuristic: marker-token votes, argmax with asc tie-break.
    Q("q_lang_id",
      (s, d) => {
        val sumCols = langMarkers.map { case (l, ms) =>
          sum(when(col("tok").isin(ms: _*), 1).otherwise(0)).as(s"s_$l")
        }
        val scored = toks(s, d).groupBy(col("doc_id"), col("lang"))
          .agg(sumCols.head, sumCols.tail: _*)
        val m = greatest(langMarkers.map { case (l, _) => col(s"s_$l") }: _*)
        // first lang (asc order) reaching the max:
        val predCol = langMarkers.map(_._1).foldRight(lit("?")) { (l, els) =>
          when(col(s"s_$l") === m, lit(l)).otherwise(els)
        }
        scored.filter(col("doc_id") < 100)
          .select(col("doc_id"), col("lang"), predCol.as("pred_lang"))
          .orderBy(col("doc_id"))
      },
      Some {
        val sums = langMarkers.map { case (l, ms) =>
          val in = ms.map(m => s"'$m'").mkString(", ")
          s"sum(CASE WHEN tok IN ($in) THEN 1 ELSE 0 END) AS s_$l"
        }.mkString(",\n    ")
        val m = langMarkers.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
        val pred = langMarkers.map(_._1).foldRight("'?'") { (l, els) =>
          s"CASE WHEN s_$l = m THEN '$l' ELSE $els END"
        }
        s"""WITH toks AS (
           |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents),
           |sc AS (
           |  SELECT doc_id, lang,
           |    $sums
           |  FROM toks GROUP BY doc_id, lang),
           |p AS (SELECT doc_id, lang, $m AS m,
           |      s_de, s_en, s_es, s_fr, s_zh FROM sc)
           |SELECT doc_id, lang, $pred AS pred_lang
           |FROM p WHERE doc_id < 100 ORDER BY doc_id""".stripMargin
      }),

    // Classifier evaluation — per-class precision/recall/F1 of the
    // q_lang_id predictor against the corpus's lang ground truth: the
    // model-eval operator every curation classifier (lang-ID, quality
    // gate, safety filter) needs before its threshold ships. The
    // confusion counts are BIGINT-exact aggregates of the SAME argmax
    // scoring q_lang_id pins (over ALL docs, not its display slice);
    // the three ratios divide exact integers in doubles with identical
    // op order, zero-denominator cases pinned to 0.0 on both engines,
    // and floor-scale to the 1e-9 grid. Scale shape: one corpus
    // tokenize + (doc, lang) aggregate — identical to q_lang_id — then
    // everything is class-table-sized (5 rows).
    Q("q_eval_metrics",
      (s, d) => {
        val sumCols = langMarkers.map { case (l, ms) =>
          sum(when(col("tok").isin(ms: _*), 1).otherwise(0)).as(s"s_$l")
        }
        val scored = toks(s, d).groupBy(col("doc_id"), col("lang"))
          .agg(sumCols.head, sumCols.tail: _*)
        val m = greatest(langMarkers.map { case (l, _) => col(s"s_$l") }: _*)
        val predCol = langMarkers.map(_._1).foldRight(lit("?")) { (l, els) =>
          when(col(s"s_$l") === m, lit(l)).otherwise(els)
        }
        val p = scored.select(col("lang"), predCol.as("pred"))
        val base = p.groupBy(col("lang").as("cls"))
          .agg(count(lit(1)).as("n_true"),
            sum(when(col("pred") === col("lang"), 1L).otherwise(0L)).as("tp"))
        val predCnt = p.groupBy(col("pred").as("cls"))
          .agg(count(lit(1)).as("n_pred"))
        val joined = base.join(predCnt, Seq("cls"), "left")
          .select(col("cls"), col("n_true"), col("tp"),
            coalesce(col("n_pred"), lit(0L)).as("n_pred"))
        val prec = when(col("n_pred") === 0, lit(0.0))
          .otherwise(col("tp").cast("double") / col("n_pred").cast("double"))
        val rec = col("tp").cast("double") / col("n_true").cast("double")
        val f1 = when(prec + rec === 0.0, lit(0.0))
          .otherwise(lit(2.0) * prec * rec / (prec + rec))
        joined.select(col("cls"), col("n_true"), col("n_pred"), col("tp"),
            (floor(prec * lit(1e9)) / lit(1e9)).as("precision"),
            (floor(rec * lit(1e9)) / lit(1e9)).as("recall"),
            (floor(f1 * lit(1e9)) / lit(1e9)).as("f1"))
          .orderBy(col("cls"))
      },
      Some {
        val sums = langMarkers.map { case (l, ms) =>
          val in = ms.map(m => s"'$m'").mkString(", ")
          s"sum(CASE WHEN tok IN ($in) THEN 1 ELSE 0 END) AS s_$l"
        }.mkString(",\n    ")
        val m = langMarkers.map { case (l, _) => s"s_$l" }
          .mkString("greatest(", ", ", ")")
        val pred = langMarkers.map(_._1).foldRight("'?'") { (l, els) =>
          s"CASE WHEN s_$l = m THEN '$l' ELSE $els END"
        }
        s"""WITH toks AS (
           |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
           |  FROM documents),
           |sc AS (
           |  SELECT doc_id, lang,
           |    $sums
           |  FROM toks GROUP BY doc_id, lang),
           |p AS (SELECT lang, $pred AS pred FROM (
           |  SELECT doc_id, lang, $m AS m,
           |    s_de, s_en, s_es, s_fr, s_zh FROM sc) t),
           |base AS (
           |  SELECT lang AS cls, CAST(count(*) AS BIGINT) AS n_true,
           |    CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT)
           |      AS tp
           |  FROM p GROUP BY lang),
           |pc AS (SELECT pred AS cls, CAST(count(*) AS BIGINT) AS n_pred
           |       FROM p GROUP BY pred),
           |j AS (
           |  SELECT b.cls, b.n_true, b.tp,
           |    coalesce(pc.n_pred, CAST(0 AS BIGINT)) AS n_pred
           |  FROM base b LEFT JOIN pc USING (cls)),
           |r AS (
           |  SELECT cls, n_true, n_pred, tp,
           |    CASE WHEN n_pred = 0 THEN 0.0
           |      ELSE CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE) END AS p2,
           |    CAST(tp AS DOUBLE) / CAST(n_true AS DOUBLE) AS r2
           |  FROM j)
           |SELECT cls, n_true, n_pred, tp,
           |  floor(p2 * 1e9) / 1e9 AS precision,
           |  floor(r2 * 1e9) / 1e9 AS recall,
           |  floor(CASE WHEN p2 + r2 = 0.0 THEN 0.0
           |    ELSE 2.0 * p2 * r2 / (p2 + r2) END * 1e9) / 1e9 AS f1
           |FROM r ORDER BY cls""".stripMargin
      }),

    // Quality scoring: token counts, uniqueness ratio, composite score.
    Q("q_quality",
      (s, d) => toks(s, d).filter(col("tok") =!= "")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("tok")).as("n_uniq"),
          sum(length(col("tok"))).cast("long").as("sum_len"))
        .select(col("doc_id"), col("n_tokens"), col("n_uniq"),
          (col("n_uniq").cast("double") / col("n_tokens")).as("uniq_ratio"),
          (col("sum_len").cast("double") / col("n_tokens")).as("avg_tok_len"),
          (lit(0.5) * (col("n_uniq").cast("double") / col("n_tokens")) +
            lit(0.5) * least(lit(1.0), col("n_tokens").cast("double") / lit(100.0))).as("quality"))
        .filter(col("doc_id") < 100)
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |g AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(count(DISTINCT tok) AS BIGINT) AS n_uniq,
         |    CAST(sum(strlen(tok)) AS BIGINT) AS sum_len
         |  FROM toks WHERE tok <> '' GROUP BY doc_id)
         |SELECT doc_id, n_tokens, n_uniq,
         |  CAST(n_uniq AS DOUBLE)/n_tokens AS uniq_ratio,
         |  CAST(sum_len AS DOUBLE)/n_tokens AS avg_tok_len,
         |  0.5 * (CAST(n_uniq AS DOUBLE)/n_tokens) +
         |    0.5 * least(1.0, CAST(n_tokens AS DOUBLE)/100.0) AS quality
         |FROM g WHERE doc_id < 100 ORDER BY doc_id""".stripMargin)),

    // Order-sensitive rolling-hash document fingerprint: left fold
    // h = (h*31 + md5_32(tok)) mod p over the token stream — a narrow
    // higher-order-function fold, no shuffle until the final ORDER BY.
    Q("q_rolling_hash",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          aggregate(
            transform(split(col("text"), " "),
              t => conv(substring(md5(t), 1, 8), 16, 10).cast("long")),
            lit(0L),
            (acc, x) => (acc * 31 + x) % 2147483647L).as("rh"))
        .filter(col("doc_id") < 200)
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(string_split(text, ' '),
         |      t -> ${OracleSql.hexToLong("md5(t)", 1, 8)})),
         |    (acc, x) -> (acc*31 + x) % 2147483647) AS rh
         |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin)),

    // BPE-ish token counting: regex pre-tokenizer (word pieces + non-space
    // punctuation) vs whitespace counting, per doc.
    Q("q_token_count",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          size(array_remove(split(col("text"), " "), "")).cast("long").as("ws_tokens"),
          size(regexp_extract_all(col("text"), lit("[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))
            .cast("long").as("bpe_tokens"),
          octet_length(col("text")).cast("long").as("n_bytes"))
        .filter(col("doc_id") < 200)
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
         |  CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS ws_tokens,
         |  CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]', 0)) AS BIGINT) AS bpe_tokens,
         |  CAST(strlen(text) AS BIGINT) AS n_bytes
         |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin)),

    // Corpus token frequencies (top 20).
    Q("q_token_stats",
      (s, d) => toks(s, d).filter(col("tok") =!= "")
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok").asc)
        .limit(20),
      Some("""SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM
         |  (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
         |WHERE tok <> ''
         |GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20""".stripMargin),
      headline = true),

    // Heavy hitters via count-min sketch — the streaming/mergeable
    // frequency summary (Cormode & Muthukrishnan 2005; Spark's built-in
    // count_min_sketch aggregate). At 100 TB the sketch is the ONLY way to
    // track token frequencies without a corpus-wide groupBy: it partial-
    // aggregates map-side into a fixed 2/eps x depth array and merges in
    // one 1-row reduce — no shuffle proportional to vocabulary. The exact
    // top-10 companion exists for the oracle gate (the q_approx_distinct
    // pattern); the sketch invariants are what the query proves:
    // est >= exact (CMS never undercounts — structural) and
    // est - exact <= ceil(eps * total) (the CMS error bound; deterministic
    // here given the fixed seed — validated at all three SFs).
    Q("q_heavy_hitters",
      (s, d) => {
        val t = toks(s, d).filter(col("tok") =!= "")
        val top10 = t.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("tok").asc).limit(10)
        val skBytes = t
          .agg(expr("count_min_sketch(tok, 0.001d, 0.99d, 777)").as("sk"))
          .head().getAs[Array[Byte]](0) // 1-row aggregate (bounded)
        val cms = org.apache.spark.util.sketch.CountMinSketch
          .readFrom(new java.io.ByteArrayInputStream(skBytes))
        val bound = math.ceil(0.001 * cms.totalCount()).toLong
        // 10-row bounded collect: probing a sketch is a point-lookup API
        val rows = top10.collect().toSeq.map { r =>
          val tok = r.getString(0)
          val cnt = r.getLong(1)
          // the SQL aggregate adds strings as UTF-8 bytes; probe the same way
          val est = cms.estimateCount(tok.getBytes("UTF-8"))
          (tok, cnt, if (est >= cnt) 1L else 0L,
            if (est - cnt <= bound) 1L else 0L)
        }
        import s.implicits._
        rows.toDF("tok", "cnt", "est_ge_exact", "est_within_eps")
          .orderBy(col("cnt").desc, col("tok").asc)
      },
      Some("""SELECT tok, CAST(count(*) AS BIGINT) AS cnt,
         |  CAST(1 AS BIGINT) AS est_ge_exact, CAST(1 AS BIGINT) AS est_within_eps
         |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
         |WHERE tok <> ''
         |GROUP BY tok ORDER BY cnt DESC, tok LIMIT 10""".stripMargin)),

    // Repetition-ratio quality gate (a Gopher-style corpus filter signal):
    // 1 - distinct/total tokens per doc; the 20 most repetitive docs.
    // Narrow projection (both counts are HOFs over the token array — no
    // explode, no shuffle before the top-k); all-integer counts + ONE
    // double division keep the oracle bit-exact.
    Q("q_repetition",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          size(array_distinct(split(col("text"), " "))).cast("long").as("n_uniq"))
        .withColumn("rep_ratio",
          (col("n_tok") - col("n_uniq")).cast("double") / col("n_tok").cast("double"))
        .orderBy(col("rep_ratio").desc, col("doc_id"))
        .limit(20),
      Some("""WITH t AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
         |  FROM documents)
         |SELECT doc_id, n_tok, n_uniq,
         |  CAST(n_tok - n_uniq AS DOUBLE) / CAST(n_tok AS DOUBLE) AS rep_ratio
         |FROM t ORDER BY rep_ratio DESC, doc_id LIMIT 20""".stripMargin)),

    // Collocation mining (phrase/merge-rule candidates for tokenizer
    // training): PMI-style lift per adjacent bigram,
    //   lift = (c_xy * N_uni * N_uni) / (N_bi * c_x * c_y)
    // with every product computed in exact BIGINT and ONE double division
    // at the end — transcendental-free (no log), so both engines emit the
    // identical double. Scale shape: two narrow token/bigram projections,
    // two count aggregates, a broadcast-joinable unigram side (vocabulary
    // counts), TakeOrderedAndProject for the top-k.
    Q("q_collocations",
      (s, d) => {
        val tk = toks(s, d).filter(col("tok") =!= "")
        val uni = tk.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        val nUni = tk.agg(count(lit(1)).as("n_uni"))
        val t = Tables.documents(s, d)
          .select(split(col("text"), " ").as("t"))
          .filter(size(col("t")) >= 2)
        // codegen'd bigram strings (GramsExpr) split back into (x, y):
        // tokens come from split(' ') so they contain no spaces, making
        // substring_index exact — and empty tokens round-trip ('' ++ ' b'
        // -> x='', y='b'), then fall to the same non-empty filter
        val bi = t.select(explode(graft.functions.TextOps.grams(col("t"), 2))
            .as("g"))
          .select(substring_index(col("g"), " ", 1).as("x"),
            substring_index(col("g"), " ", -1).as("y"))
          .filter(col("x") =!= "" && col("y") =!= "")
        val cxy = bi.groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
        val nBi = bi.agg(count(lit(1)).as("n_bi"))
        cxy.filter(col("cxy") >= 5)
          .join(uni.select(col("tok").as("x"), col("c").as("cx")), "x")
          .join(uni.select(col("tok").as("y"), col("c").as("cy")), "y")
          .crossJoin(nUni).crossJoin(nBi)
          .select(col("x"), col("y"), col("cxy"), col("cx"), col("cy"),
            ((col("cxy") * col("n_uni") * col("n_uni")).cast("double") /
              (col("n_bi") * col("cx") * col("cy")).cast("double")).as("lift"))
          .orderBy(col("lift").desc, col("x"), col("y"))
          .limit(20)
      },
      Some("""WITH tk AS (
         |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         |tk2 AS (SELECT tok FROM tk WHERE tok <> ''),
         |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tk2 GROUP BY tok),
         |nu AS (SELECT CAST(count(*) AS BIGINT) AS n_uni FROM tk2),
         |tt AS (SELECT string_split(text, ' ') AS t FROM documents
         |       WHERE len(string_split(text, ' ')) >= 2),
         |bi0 AS (
         |  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
         |    i -> {'x': t[i], 'y': t[i+1]})) AS b FROM tt),
         |bi AS (SELECT b.x AS x, b.y AS y FROM bi0 WHERE b.x <> '' AND b.y <> ''),
         |cxy AS (SELECT x, y, CAST(count(*) AS BIGINT) AS cxy FROM bi GROUP BY x, y),
         |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_bi FROM bi)
         |SELECT x, y, cxy, ux.c AS cx, uy.c AS cy,
         |  CAST(cxy * n_uni * n_uni AS DOUBLE) / CAST(n_bi * ux.c * uy.c AS DOUBLE) AS lift
         |FROM cxy
         |JOIN uni ux ON cxy.x = ux.tok
         |JOIN uni uy ON cxy.y = uy.tok
         |CROSS JOIN nu CROSS JOIN nb
         |WHERE cxy >= 5
         |ORDER BY lift DESC, x, y LIMIT 20""".stripMargin)),

    // Vocabulary-growth curve (Heaps' law over ingest order), on the
    // TRIGRAM-shingle vocabulary (the unigram vocab here is 31 words, all
    // seen in the first bucket — degenerate; the n-gram vocabulary is what
    // a tokenizer/BPE merge budget actually tracks): shingles first seen
    // Robust outlier gate — MAD (median absolute deviation) instead of
    // the z-scores of q_anomaly_hours: the data-cleaning statistic that
    // survives the very outliers it hunts. Two passes by nature (the MAD
    // needs the median first): per-lang exact interpolated medians
    // (quantile_cont parity per q_percentiles; the exact percentile
    // buffer is O(docs-per-lang) — q_percentiles_approx documents the
    // bounded-buffer scale path), each joined back as a BROADCAST
    // lang-keyed 5-row table so the corpus side never shuffles. Doc
    // features are a narrow HOF projection (no tokenize explode).
    // Deviations are integer-minus-interpolated-median doubles with
    // identical op order on both engines.
    Q("q_outlier_mad",
      (s, d) => {
        val f = Tables.documents(s, d).select(col("doc_id"), col("lang"),
          size(array_remove(split(col("text"), " "), ""))
            .cast("long").as("nt"))
        val med = f.groupBy(col("lang"))
          .agg(percentile(col("nt"), lit(0.5)).as("med"))
        val dev = f.join(broadcast(med), "lang")
          .select(col("lang"), col("nt"), col("med"),
            abs(col("nt").cast("double") - col("med")).as("dev"))
        val mad = dev.groupBy(col("lang"))
          .agg(percentile(col("dev"), lit(0.5)).as("mad"))
        dev.join(broadcast(mad), "lang")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("med")).as("med_toks"),
            min(col("mad")).as("mad_toks"),
            sum(when(col("dev") > lit(3.0) * col("mad"), 1L).otherwise(0L))
              .cast("long").as("n_outliers"))
          .select(col("lang"), col("n_docs"), col("med_toks"),
            col("mad_toks"), col("n_outliers"),
            (col("n_outliers").cast("double") / col("n_docs").cast("double"))
              .as("outlier_rate"))
          .orderBy(col("lang"))
      },
      Some("""WITH f AS (
         |  SELECT doc_id, lang,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
         |      AS BIGINT) AS nt
         |  FROM documents),
         |m AS (SELECT lang, quantile_cont(nt, 0.5) AS med
         |      FROM f GROUP BY lang),
         |dv AS (
         |  SELECT f.lang, nt, med,
         |    abs(CAST(nt AS DOUBLE) - med) AS dev
         |  FROM f JOIN m USING (lang)),
         |md AS (SELECT lang, quantile_cont(dev, 0.5) AS mad
         |       FROM dv GROUP BY lang)
         |SELECT dv.lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  min(med) AS med_toks, min(mad) AS mad_toks,
         |  CAST(sum(CASE WHEN dev > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_outliers,
         |  CAST(sum(CASE WHEN dev > 3.0 * mad THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS outlier_rate
         |FROM dv JOIN md USING (lang)
         |GROUP BY dv.lang ORDER BY dv.lang""".stripMargin)),

    // Pearson correlation between doc features (length vs vocabulary
    // richness) from BIGINT-exact moments — the q_anomaly_hours pattern
    // extended to the cross-moment: all six sums are integer aggregates
    // (map-side combinable, one shuffle), and the correlation is
    // assembled in doubles with identical op order on both engines. Doc
    // features are narrow HOFs (no explode). At 100 TB the BIGINT
    // products approach 2^63 only when k*Sxy does — route the sums
    // through DECIMAL(38,0) there; the shape is unchanged.
    Q("q_feature_corr",
      (s, d) => {
        val tf = array_remove(split(col("text"), " "), "")
        Tables.documents(s, d)
          .select(col("lang"),
            size(tf).cast("long").as("x"),
            size(array_distinct(tf)).cast("long").as("y"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("k"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"),
            sum(col("x") * col("y")).as("sxy"))
          .select(col("lang"), col("k"), col("sx"), col("sy"),
            ((col("k") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (sqrt((col("k") * col("sxx") - col("sx") * col("sx"))
                  .cast("double"))
                * sqrt((col("k") * col("syy") - col("sy") * col("sy"))
                  .cast("double")))).as("corr_len_uniq"))
          .orderBy(col("lang"))
      },
      Some("""WITH f AS (
         |  SELECT lang,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
         |      AS BIGINT) AS x,
         |    CAST(len(list_distinct(list_filter(string_split(text, ' '),
         |      x -> x <> ''))) AS BIGINT) AS y
         |  FROM documents),
         |mo AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS k,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x*x) AS BIGINT) AS sxx,
         |    CAST(sum(y*y) AS BIGINT) AS syy,
         |    CAST(sum(x*y) AS BIGINT) AS sxy
         |  FROM f GROUP BY lang)
         |SELECT lang, k, sx, sy,
         |  CAST(k*sxy - sx*sy AS DOUBLE)
         |    / (sqrt(CAST(k*sxx - sx*sx AS DOUBLE))
         |       * sqrt(CAST(k*syy - sy*sy AS DOUBLE))) AS corr_len_uniq
         |FROM mo ORDER BY lang""".stripMargin)),

    // per 50-doc bucket + the cumulative vocabulary size. One
    // min-aggregate over (shingle, first_doc), a bucket count, and a
    // running-total window over the handful of bucket rows.
    Q("q_vocab_growth",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("bucket"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        shingles(s, d)
          .groupBy(col("sh")).agg(min(col("doc_id")).as("first_doc"))
          .select((col("first_doc") / 50).cast("long").as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("new_shingles"))
          .withColumn("vocab_cum", sum(col("new_shingles")).over(w).cast("long"))
          .orderBy(col("bucket"))
      },
      Some(s"""WITH $shinglesCte,
         |fd AS (SELECT sh, min(doc_id) AS first_doc FROM sh GROUP BY sh),
         |b AS (SELECT CAST(first_doc // 50 AS BIGINT) AS bucket,
         |             CAST(count(*) AS BIGINT) AS new_shingles
         |      FROM fd GROUP BY 1)
         |SELECT bucket, new_shingles,
         |  CAST(sum(new_shingles) OVER (ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_cum
         |FROM b ORDER BY bucket""".stripMargin)),

    // TextRank keyword centrality — the graph-iteration twin of
    // q_tfidf_keywords (frequency-based) and the second iterative
    // operator beside q_dedup_components: weighted PageRank (d=0.85,
    // 5 iterations) over the symmetric token co-occurrence graph
    // (adjacent-token edges, weight = adjacency count). Scale shape:
    // the graph is VOCABULARY-sized, not corpus-sized — edges come from
    // one narrow explode + one groupBy; each iteration is one equi-join
    // on the source token + one aggregation (the same join-agg round as
    // label propagation); the edge/degree subtrees are identical across
    // all 5 rounds, so Spark dedupes them at runtime via ReusedExchange
    // (no pinned cache blocks). Bit-exact oracle closure for an iterative float
    // computation: every per-edge contribution r*w/wd is computed in
    // the identical op order on both engines and every per-node SUM
    // routes through the 2^43 floor/DECIMAL fold (order-independent
    // exact integers), so each iteration's rank vector — and hence the
    // final top-10 — hash-matches DuckDB's 5 unrolled CTE iterations
    // exactly.
    Q("q_textrank",
      (s, d) => {
        val P43 = 8796093022208.0 // 2^43
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val t = Tables.documents(s, d)
          .select(split(col("text"), " ").as("t"))
          .filter(size(col("t")) >= 2)
        val pairs = t.select(explode(transform(
            sequence(lit(0), size(col("t")) - 2),
            i => struct(element_at(col("t"), i + 1).as("u"),
              element_at(col("t"), i + 2).as("v")))).as("e"))
          .select(col("e.u").as("u"), col("e.v").as("v"))
          .filter(col("u") =!= "" && col("v") =!= "" && col("u") =!= col("v"))
        // no .cache(): the 5 iterations reference identical edge/degree
        // subtrees, which Spark dedupes at runtime via ReusedExchange —
        // same reuse, zero pinned blocks to evict (the labelsCache lesson)
        val edges = pairs.union(pairs.select(col("v"), col("u")))
          .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
        val deg = edges.groupBy(col("u")).agg(sum(col("w")).as("wd"))
        val nodes = edges.select(col("u").as("tok")).distinct()
        val nn = nodes.agg(count(lit(1)).as("c"))
        var rank = nodes.crossJoin(broadcast(nn))
          .select(col("tok"), (lit(1.0) / col("c")).as("r"))
        (1 to TextRankIters).foreach { _ =>
          rank = edges.as("e")
            .join(rank.as("p"), col("e.u") === col("p.tok"))
            .join(deg.as("dg"), col("e.u") === col("dg.u"))
            .crossJoin(broadcast(nn))
            .groupBy(col("e.v"), col("c"))
            .agg(sum(floor(col("p.r") * col("e.w") / col("dg.wd") * lit(P43))
              .cast(dec)).cast("double").as("s"))
            .select(col("v").as("tok"),
              (lit(0.15) / col("c") + lit(0.85) * (col("s") / lit(P43))).as("r"))
        }
        rank.select(col("tok"), col("r").as("score"))
          .orderBy(col("score").desc, col("tok"))
          .limit(10)
      },
      Some {
        val P = "8796093022208.0"
        def iter(prev: String, cur: String): String =
          s"""$cur AS (
             |  SELECT e.v AS tok,
             |    0.15 / nn.c + 0.85 * (CAST(sum(CAST(floor(p.r * e.w / d.wd * $P)
             |      AS DECIMAL(38,0))) AS DOUBLE) / $P) AS r
             |  FROM edges e JOIN $prev p ON e.u = p.tok
             |  JOIN deg d ON e.u = d.u CROSS JOIN nn
             |  GROUP BY e.v, nn.c)"""
        s"""WITH t AS (
           |  SELECT string_split(text, ' ') AS t FROM documents
           |  WHERE len(string_split(text, ' ')) >= 2),
           |adj AS (
           |  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
           |    i -> struct_pack(u := t[i], v := t[i+1]))) AS e FROM t),
           |pairs AS (
           |  SELECT e.u AS u, e.v AS v FROM adj
           |  WHERE e.u <> '' AND e.v <> '' AND e.u <> e.v),
           |edges AS (
           |  SELECT u, v, CAST(count(*) AS BIGINT) AS w FROM
           |    (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs)
           |  GROUP BY u, v),
           |deg AS (SELECT u, CAST(sum(w) AS BIGINT) AS wd FROM edges GROUP BY u),
           |nodes AS (SELECT DISTINCT u AS tok FROM edges),
           |nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM nodes),
           |r0 AS (SELECT tok, 1.0 / nn.c AS r FROM nodes CROSS JOIN nn),
           |${iter("r0", "r1")},
           |${iter("r1", "r2")},
           |${iter("r2", "r3")},
           |${iter("r3", "r4")},
           |${iter("r4", "r5")}
           |SELECT tok, r AS score FROM r5
           |ORDER BY score DESC, tok LIMIT 10""".stripMargin
      })
  )

  /** q_textrank: PageRank iterations (unrolled 1:1 in the oracle SQL). */
  final val TextRankIters = 5
}
