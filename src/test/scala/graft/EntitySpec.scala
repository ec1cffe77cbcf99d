package graft

import graft.ops.EntityQueries
import org.apache.spark.sql.functions._

/** Entity-resolution family (q_fuzzy_join / q_entity_resolve): the
  * symmetric-delete losslessness claim replayed against an independent
  * driver-side brute force, the component labels against a union-find,
  * and the candidate-volume bound that carries the 100 TB argument. */
class EntitySpec extends SparkSpec {

  /** Independent reference: full Wagner–Fischer edit distance (no
    * threshold shortcut, no shared code with the engine path). */
  private def lev(a: String, b: String): Int = {
    val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
        m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    m(a.length)(b.length)
  }

  private lazy val customers: Seq[(Long, Long, String)] =
    Tables.customer(spark, sf001)
      .select(col("c_nationkey").cast("long"), col("c_custkey").cast("long"),
        col("c_name"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

  /** Brute-force within-nation ED<=1 pairs: (cust_a, cust_b, dist). */
  private lazy val brutePairs: Set[(Long, Long, Long)] = (for {
    (na, ca, sa) <- customers
    (nb, cb, sb) <- customers
    if na == nb && ca < cb
    d = lev(sa, sb)
    if d <= EntityQueries.MaxEdits
  } yield (ca, cb, d.toLong)).toSet

  test("q_fuzzy_join equals the brute-force within-block ED<=1 join") {
    val got = SparkEntry.queries("q_fuzzy_join")(spark, sf001)
      .select(col("cust_a"), col("cust_b"), col("edit_dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brutePairs.nonEmpty, "fixture must exercise the operator")
    assert(got === brutePairs)
  }

  test("deletion-variant candidates cover all true pairs and stay far below quadratic") {
    val cand = EntityQueries.candidatePairs(spark, sf001)
      .select(col("cust_a"), col("cust_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brutePairs.forall { case (a, b, _) => cand((a, b)) },
      "losslessness: every true pair must be a candidate")
    // volume bound at sf0.01 (1,500 records): at sf0.001 the 150 names
    // differ in only ~3 digit positions, so variant collisions are
    // fixture-dense (91 of 447); the fraction FALLS as blocks grow —
    // measured 2,196 / 45,238 = 4.9% at sf0.01 and 38,322 / 4.49M =
    // 0.85% at sf0.1 (more varying digits -> fewer shared variants)
    val sf01 = "/root/testdata/sf0.01"
    val nCand = EntityQueries.candidatePairs(spark, sf01).count()
    val blockPairs = Tables.customer(spark, sf01)
      .groupBy(col("c_nationkey")).count()
      .collect().map(r => r.getLong(1) * (r.getLong(1) - 1) / 2).sum
    assert(nCand <= blockPairs / 10,
      s"candidate volume $nCand vs block quadratic $blockPairs — " +
        "the deletion-variant join must prune, not enumerate")
  }

  test("q_entity_resolve labels equal an independent union-find replay") {
    // union-find over the brute-force edges
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    brutePairs.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys
      .groupBy(find)
      .map { case (root, members) => root -> members.size.toLong }
    val got = SparkEntry.queries("q_entity_resolve")(spark, sf001)
      .select(col("entity"), col("n_members"), col("canon_name"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.map(x => x._1 -> x._2).toMap === expected)
    // the canonical record really is the min-key member's name
    val names = customers.map(c => c._2 -> c._3).toMap
    got.foreach { case (entity, _, canon) =>
      assert(names(entity) === canon)
    }
  }

  test("q_golden_record keepers equal a driver survivorship replay") {
    val bal = Tables.customer(spark, sf001)
      .select(col("c_custkey").cast("long"), col("c_acctbal"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reuse the union-find components from the brute-force edges
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    brutePairs.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.groupBy(find).map { case (root, ms) =>
      // survivorship rule: max acctbal, ties to smallest key
      val keeper = ms.minBy(k => (-bal(k), k))
      root -> ((keeper, bal(keeper), ms.size.toLong))
    }
    val got = SparkEntry.queries("q_golden_record")(spark, sf001)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(3), r.getLong(4)))).toMap
    assert(got === expected)
  }

  test("q_calibration bins partition the corpus and ECE matches its definition") {
    val rows = SparkEntry.queries("q_calibration")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    val nDocs = Tables.documents(spark, sf001).count()
    assert(rows.map(_._2).sum === nDocs, "bins must partition the corpus")
    val n = rows.map(_._2).sum.toDouble
    val eceFromBins = rows.map { case (_, nb, _, _, gap, _) => nb / n * gap }.sum
    val ece = rows.head._6
    assert(rows.forall(_._6 === ece), "ECE is one number, replicated")
    assert(math.abs(eceFromBins - ece) < 1e-12,
      s"ECE $ece must equal the bin-weighted gap sum $eceFromBins")
    rows.foreach { case (bin, _, avgPred, fracPos, gap, _) =>
      assert(bin >= 0 && bin <= 9)
      assert(avgPred >= bin / 10.0 - 1e-9 && avgPred <= (bin + 1) / 10.0 + 1e-9,
        s"bin $bin mean prediction $avgPred outside its bin")
      assert(fracPos >= 0.0 && fracPos <= 1.0)
      assert(math.abs(gap - math.abs(avgPred - fracPos)) < 1e-15)
    }
  }
}
