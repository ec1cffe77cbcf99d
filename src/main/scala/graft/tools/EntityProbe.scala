package graft.tools

import graft.Sessions
import graft.ops.{EntityQueries, GraphOps}
import org.apache.spark.sql.functions._

/** Dev tool: convergence + component structure of the fuzzy-pair graph
  * (q_entity_resolve / q_golden_record). Prints the pointer-jumping and
  * propagation round counts and the component size distribution per SF —
  * the evidence behind CcMaxIter.
  *
  * Usage: runMain graft.tools.EntityProbe [sfDir ...]
  */
object EntityProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
    else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
    val spark = Sessions.fromEnv("16", appName = "graft-entity-probe")
    try {
      dirs.foreach { d =>
        val edges = EntityQueries.fuzzyPairs(spark, d)
          .select(col("cust_a"), col("cust_b")).localCheckpoint(true)
        val nEdges = edges.count()
        val sym = edges.select(col("cust_a").as("src"), col("cust_b").as("dst"))
          .unionAll(edges.select(col("cust_b").as("src"), col("cust_a").as("dst")))
        val (lab, rounds) = GraphOps.doublingLabels(sym, maxIter = 64)
        val sizes = lab.groupBy(col("label")).count()
          .agg(count(lit(1)).as("ncomp"), max(col("count")).as("maxsize"),
            sum(col("count")).as("nodes"))
          .collect()(0)
        println(s"$d edges=$nEdges doubling_rounds=$rounds " +
          s"ncomp=${sizes.getLong(0)} maxsize=${sizes.getLong(1)} " +
          s"nodes=${sizes.getLong(2)}")
      }
    } finally spark.stop()
  }
}
