package graft.tools

import graft.Sessions
import org.apache.spark.sql.functions._

/** Candidate-volume probe for q_dbscan's cell-restricted eps-graph (the
  * DhashBandProbe pattern): the pair join is bounded by sum(cell_i^2),
  * and with ~10 balanced k-means cells the measured plateau is
  * cand/allpairs ~ 0.10 at every SF. The assert bound (0.25) is 2.5x
  * that plateau — above it the coarse cells have lost their pruning
  * power for the current embedding distribution (skewed assignment —
  * one mega-cell approaches the all-pairs join) and the tier needs more
  * cells or spill-assignment before its cost model can be trusted.
  * Also guards the OPERATING POINT: DbscanTau/DbscanMinPts were probed
  * to give non-degenerate cores, multi-point clusters, borders and
  * noise at all three SFs — a fixture change that silently collapses
  * any of those classes fails here LOUDLY, not as a quietly vacuous
  * board row. Emits one SCALE.md-style row per fixture.
  */
object DbscanProbe {

  private val Bound = 0.25

  def main(args: Array[String]): Unit = {
    val spark = Sessions.fromEnv("8", appName = "dbscan-probe")
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
    try {
      sfs.foreach { d =>
        val asg = graft.ops.SimilarityQueries.cellAssignments(spark, d)
        val n = asg.count()
        val candPairs = asg.groupBy(col("cell")).agg(count(lit(1)).as("c"))
          .agg(sum(col("c") * (col("c") - 1) / 2).cast("long")).head().getLong(0)
        val allPairs = n * (n - 1) / 2
        val ratio = candPairs.toDouble / allPairs
        val rows = graft.SparkEntry.queries("q_dbscan")(spark, d).collect()
        val clusters = rows.filter(_.getLong(0) >= 0L)
        val noise = rows.filter(_.getLong(0) == -1L).map(_.getLong(1)).sum
        val nCore = clusters.map(_.getLong(2)).sum
        val nBorder = clusters.map(_.getLong(3)).sum
        println(f"DBSCAN sf=$d n=$n cand_pairs=$candPairs " +
          f"cand_frac=$ratio%.3f clusters=${clusters.length} " +
          f"cores=$nCore borders=$nBorder noise=$noise")
        assert(ratio <= Bound,
          f"dbscan cell join blew up: cand/allpairs = $ratio%.3f > $Bound " +
            s"at $d — the coarse cells no longer prune (skewed " +
            "assignment); add cells or rebalance before trusting the tier")
        assert(clusters.length > 1 && nCore > 0 && nBorder > 0 && noise > 0,
          s"dbscan operating point degenerate at $d: " +
            s"clusters=${clusters.length} cores=$nCore borders=$nBorder " +
            s"noise=$noise — re-probe DbscanTau/DbscanMinPts for this fixture")
      }
    } finally spark.stop()
  }
}
