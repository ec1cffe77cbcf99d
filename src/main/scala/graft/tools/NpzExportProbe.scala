package graft.tools

import graft.Sessions
import graft.store.VectorStore

/** Dev tool: import the numpy-written fixture, re-export it with
  * VectorStore.exportNpz, and print the output path — feed that to
  * tools/check_npz_export.py, which replicates the reference engine's
  * load steps with real numpy against our emitted bytes. */
object NpzExportProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4", appName = "npz-export-probe", logLevel = "ERROR")
    val out = if (args.nonEmpty) args(0) else "/tmp/graft_export.npz"
    // fixture: the committed real-numpy save (src/test/resources)
    val st = VectorStore.importNpz(spark, "src/test/resources/ref_store.npz")
    st.exportNpz(out)
    println(s"EXPORTED $out count=${st.count} dim=${st.dim}")
    // second export with per-row metadata so the nested-dict pickle path
    // (Pickle.strMapDictArray) is exercised end-to-end
    import org.apache.spark.sql.functions._
    val st2 = VectorStore.create(spark, 8)
    val rows = spark.range(6)
      .withColumn("embedding",
        transform(sequence(lit(0), lit(7)), i => (col("id") + i).cast("float")))
      .withColumn("meta", map(lit("g"), (col("id") % 3).cast("string")))
      .select(concat(lit("vec_"), col("id")).as("id"), col("embedding"), col("meta"))
    st2.addVectors(rows)
    st2.exportNpz(out + ".meta.npz")
    println(s"EXPORTED ${out}.meta.npz count=${st2.count}")
    spark.stop()
  }
}
