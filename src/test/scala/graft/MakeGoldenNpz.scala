package graft

import graft.store.VectorStore
import org.apache.spark.sql.SparkSession

/** One-shot generator for the committed golden export fixture
  * (`src/test/resources/golden_export.npz`): import the numpy-written
  * reference fixture, re-export with `VectorStore.exportNpz`, and write
  * the result to test resources. The output was validated ONCE with real
  * numpy via `python3 tools/check_npz_export.py` (replicating the
  * reference's load steps, pythonvectordb.py:600-630); NpzImportSpec then
  * pins the exporter to it STRUCTURALLY (per-entry npy payload bytes —
  * zip timestamps vary per run, npy payloads must not), so a byte-level
  * pickle/npy regression fails `sbt test` instead of shipping silently.
  *
  * Rerun (only when the export format intentionally changes):
  *   sbt "Test/runMain graft.MakeGoldenNpz"
  *   python3 tools/check_npz_export.py src/test/resources/golden_export.npz
  */
object MakeGoldenNpz {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("golden-npz")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      val fixture = java.io.File.createTempFile("ref_store", ".npz")
      fixture.deleteOnExit()
      val in = getClass.getResourceAsStream("/ref_store.npz")
      try java.nio.file.Files.write(fixture.toPath, in.readAllBytes())
      finally in.close()
      val st = VectorStore.importNpz(spark, fixture.getAbsolutePath)
      st.exportNpz("src/test/resources/golden_export.npz")
      println(s"wrote golden_export.npz (count=${st.count}, dim=${st.dim})")
    } finally spark.stop()
  }
}
