package graft

import graft.functions.VectorOps
import graft.store.IvfIndex
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The at-rest IVF layout claim, proven locally: a probe's cell predicate
  * is a PARTITION filter on the hive-partitioned index, so the scan lists
  * and reads only the probed cells' files — nprobe/num_cells of the
  * corpus — and the probe result equals an exact scan restricted to the
  * same cells. */
class IvfAtRestSpec extends SparkSpec {

  private lazy val indexPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("ivf-at-rest").toString
    IvfIndex.build(Tables.embeddings(spark, sf001), dir)
    dir
  }

  private def fileScan(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    df.collect()
    val p = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    p.collectLeaves().collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail(s"no file scan in plan:\n$p"))
  }

  test("build partitions the corpus by cell, covering every vector once") {
    val data = spark.read.parquet(s"$indexPath/data")
    assert(data.count() == Tables.embeddings(spark, sf001).count())
    assert(data.select("vec_id").distinct().count() == data.count())
    assert(data.schema.fieldNames.contains("cell"))
    // multiple cells exist, so pruning below is meaningful
    assert(data.select("cell").distinct().count() >= 5)
  }

  test("probe scans ONLY the probed cells' partitions (partition pruning)") {
    val query = Tables.embeddings(spark, sf001).filter(col("vec_id") === 0)
      .select("embedding").collect().head.getSeq[Float](0).toArray
    val totalCells = spark.read.parquet(s"$indexPath/data")
      .select("cell").distinct().count()

    val probe1 = IvfIndex.probe(spark, indexPath, query, k = 3, nprobe = 1)
    val scan1 = fileScan(probe1)
    assert(scan1.toString.contains("PartitionFilters"),
      s"cell predicate missing from scan:\n$scan1")
    assert(scan1.selectedPartitions.partitionCount == 1,
      s"expected 1 partition read, got ${scan1.selectedPartitions.partitionCount} of $totalCells")

    val probe2 = IvfIndex.probe(spark, indexPath, query, k = 3, nprobe = 3)
    assert(fileScan(probe2).selectedPartitions.partitionCount == 3)
  }

  test("probe result equals the exact scan restricted to the probed cells") {
    val query = Tables.embeddings(spark, sf001).filter(col("vec_id") === 1)
      .select("embedding").collect().head.getSeq[Float](0).toArray
    val cells = IvfIndex.probedCells(spark, indexPath, query, nprobe = 2)
    val expected = spark.read.parquet(s"$indexPath/data")
      .filter(col("cell").isin(cells: _*))
      .select(col("vec_id"),
        VectorOps.cosineFloat(typedLit(query), col("embedding")).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(5).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = IvfIndex.probe(spark, indexPath, query, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expected)
    // self-match: vec_id 1 lives in its own nearest cell, so it tops its probe
    assert(got.head._1 == 1L && math.abs(got.head._2 - 1.0) < 1e-12)
  }
}
