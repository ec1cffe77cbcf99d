package graft.tools

import org.apache.spark.sql.functions._

/** Doulion p-sweep accuracy probe (round-10 outlook / round-11 item 7):
  * for p in {0.1, 0.3, 0.5} at each fixture SF, run the identical
  * degree-oriented triangle count on a deterministic md5 edge sample
  * (keep iff md5 bucket < p*1000 — the q_triangles_sampled mechanism),
  * scale by 1/p^3, and report the relative error vs the exact count plus
  * the wedge-volume reduction (the shuffle the sampling exists to cut).
  * Feeds the SCALE.md accuracy table. */
object TriSweep {
  def main(args: Array[String]): Unit = {
    val sfs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = graft.Sessions.fromEnv("8", appName = "graft-trisweep")
    println(f"${"sf"}%-22s ${"p"}%4s ${"exact"}%12s ${"estimate"}%14s ${"rel_err"}%8s ${"wedges"}%12s ${"wedge_x"}%8s")
    sfs.foreach { d =>
      val edges = graft.ops.ExtendedQueries.basketEdges(spark, d)
      val exactRow = graft.ops.ExtendedQueries.triangleStats(edges).head()
      val exact = exactRow.getAs[Long]("n_triangles")
      val exactWedges = exactRow.getAs[Long]("n_wedges")
      Seq(100, 300, 500).foreach { th =>
        val p = th / 1000.0
        val keep = graft.functions.TextOps.md5Prefix60(
          concat(lit("tri:"), col("a").cast("string"), lit(":"),
            col("b").cast("string"))) % 1000 < th
        val row = graft.ops.ExtendedQueries.triangleStats(edges.filter(keep)).head()
        val tri = row.getAs[Long]("n_triangles")
        val wedges = row.getAs[Long]("n_wedges")
        val est = tri / (p * p * p)
        val err = if (exact == 0) 0.0 else est / exact - 1.0
        println(f"$d%-22s $p%4.1f $exact%12d $est%14.1f ${err * 100}%+7.1f%% $wedges%12d ${exactWedges.toDouble / math.max(1, wedges)}%7.1fx")
      }
      edges.unpersist()
    }
    spark.stop()
  }
}
