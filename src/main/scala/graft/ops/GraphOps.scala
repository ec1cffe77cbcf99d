package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected-component labeling over a symmetric edge relation
  * `(src, dst)` — the two classic round structures, factored out so queries
  * and specs can compare them on the same graph:
  *
  *  - [[propagationLabels]]: min-label propagation. One equi-join +
  *    min-aggregate per round; converges in O(graph diameter) rounds. The
  *    right default for DENSE near-dup clusters (diameter 2–4), where the
  *    extra work of shortcutting never pays for itself.
  *  - [[doublingLabels]]: pointer jumping (path doubling). Each round runs
  *    the same propagation step and then shortcuts `label := label(label)`
  *    (one self-join of the label table on `label = doc_id`). The label of
  *    a node is always another node of the same component (labels start as
  *    node ids and only ever take a neighbor's min), so the shortcut stays
  *    within the component while at least halving the remaining pointer
  *    depth — O(log diameter) rounds total. This is the answer to
  *    CHAIN-shaped duplicate runs (doc A near-dups B near-dups C …), where
  *    plain propagation needs a round per hop and trips the convergence
  *    guard; see the `require` in `TextQueries.computeComponentLabels`.
  *
  * 100 TB shape (both variants): every round is keyed equi-joins on node
  * ids — never all-pairs; the per-round shuffle is edge-sized (propagation)
  * plus node-sized (the jump), and lineage is cut per round with an eager
  * `localCheckpoint` whose superseded predecessor is unpersisted
  * immediately, so a deep graph cannot accumulate either lineage or blocks.
  * At 1000 executors the same code runs with `checkpoint` on a DFS dir —
  * the round structure is the design, local checkpointing is the test rig.
  */
object GraphOps {

  /** Unpersist the eager-localCheckpoint RDD backing `df` (deterministic
    * release of a superseded round — the ContextCleaner would get there
    * eventually; a long propagation wants the blocks back NOW). */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ =>
    }

  /** Min-label propagation until fixpoint. Returns `((doc_id, label), rounds)`
    * with `label` = min node id of the component. Fails loudly (never a
    * silently wrong answer) if `maxIter` rounds don't converge. */
  def propagationLabels(edges: DataFrame, maxIter: Int): (DataFrame, Int) = {
    val e = edges.select(col("src"), col("dst"))
    var labels = e.select(col("src").as("doc_id")).distinct()
      .withColumn("label", col("doc_id")).localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val prop = e
        .join(labels.select(col("doc_id").as("src"), col("label")), "src")
        .groupBy(col("dst").as("doc_id"))
        .agg(min(col("label")).as("nlabel"))
      val next = labels.join(prop, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .localCheckpoint(true)
      changed = next
        .join(labels.select(col("doc_id"), col("label").as("old")), "doc_id")
        .filter(col("label") =!= col("old")).count()
      releaseCheckpoint(labels)
      labels = next
      iter += 1
    }
    require(changed == 0,
      s"label propagation did not converge in $iter rounds ($changed still changing)")
    (labels, iter)
  }

  /** Pointer-jumping labels until fixpoint: propagation + `label(label)`
    * shortcut per round. Same output contract as [[propagationLabels]] in
    * O(log n) rounds.
    *
    * Each round is STAR HOOKING + FULL path compression (the
    * Shiloach–Vishkin structure): every star — the set of nodes sharing
    * a label, always a star after compression — adopts the minimum
    * neighborhood label seen by ANY of its members (one label-keyed
    * aggregate + join), then `label := min(label, label(label))` repeats
    * until the pointer forest is a star again (node-sized self-joins;
    * pointer depth at least halves per jump). Both halves are necessary,
    * measured on the r16 fuzzy-name graph whose min ids zigzag: a SINGLE
    * jump per round degraded to ~diameter/2 reach (components of ≤190
    * members blew a 16-round cap; 7 rounds for 17-member components),
    * and per-node hooking even with full compression moves only the
    * basin's border node per round (still 7 rounds at 17 members). With
    * star hooking + compression the star graph contracts along every
    * inter-star edge each round — O(log n) rounds on ANY id layout
    * (measured: 3 rounds for the same components, 4 at sf0.1). */
  def doublingLabels(edges: DataFrame, maxIter: Int): (DataFrame, Int) = {
    val e = edges.select(col("src"), col("dst"))
    var labels = e.select(col("src").as("doc_id")).distinct()
      .withColumn("label", col("doc_id")).localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val prop = e
        .join(labels.select(col("doc_id").as("src"), col("label")), "src")
        .groupBy(col("dst").as("doc_id"))
        .agg(min(col("label")).as("nlabel"))
      // STAR hooking: the whole star (every node sharing a label) adopts
      // the min neighborhood-label seen by ANY of its members — per-node
      // hooking would move only the border node and the min would crawl
      // back to one hop per round inside each basin.
      val hooked = labels.join(prop, Seq("doc_id"), "left")
        .select(col("doc_id"), col("label"),
          coalesce(col("nlabel"), col("label")).as("nlabel"))
      val starMin = hooked.groupBy(col("label"))
        .agg(min(col("nlabel")).as("hmin"))
      var comp = hooked.join(starMin, Seq("label"))
        .select(col("doc_id"),
          least(col("label"), least(col("nlabel"), col("hmin"))).as("label"))
        .localCheckpoint(true)
      // compress: label := label(label) to FIXPOINT. Every label value is
      // itself a node id (initial labels are node ids; propagation only
      // moves mins of node ids around), so the self-join hits for every
      // row; coalesce guards the invariant rather than relying on it.
      var moved = 1L
      var jumps = 0
      while (moved > 0 && jumps < maxIter) {
        val parents = comp.select(col("doc_id").as("label"),
          col("label").as("plabel"))
        val jumped = comp.join(parents, Seq("label"), "left")
          .select(col("doc_id"),
            least(col("label"), coalesce(col("plabel"), col("label"))).as("label"))
          .localCheckpoint(true)
        moved = jumped
          .join(comp.select(col("doc_id"), col("label").as("old")), "doc_id")
          .filter(col("label") =!= col("old")).count()
        releaseCheckpoint(comp)
        comp = jumped
        jumps += 1
      }
      require(moved == 0,
        s"path compression did not converge in $jumps jumps")
      changed = comp
        .join(labels.select(col("doc_id"), col("label").as("old")), "doc_id")
        .filter(col("label") =!= col("old")).count()
      releaseCheckpoint(labels)
      labels = comp
      iter += 1
    }
    require(changed == 0,
      s"pointer jumping did not converge in $iter rounds ($changed still changing)")
    (labels, iter)
  }
}
