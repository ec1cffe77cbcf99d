package graft.streaming

import org.apache.spark.sql.DataFrame

/** Staging writer for the FileStreamSource-based batch-equivalence twins.
  *
  * The twins split a fixture into micro-batches by writing part-files into
  * one watched directory and rely on the file source processing them in
  * write order. FileStreamSource orders new files by MODIFICATION TIME, so
  * an mtime tie on a coarse-granularity filesystem could process batch 2
  * first — making every batch-1 row late, silently dropped by the
  * watermark, and the "streamed == batch prefix fold" equivalence wrong.
  * `appendOrdered` removes the race: after each batch's write it stamps the
  * batch's fresh files with a strictly increasing mtime (one minute apart,
  * anchored in the near past so the source's max-file-age window is never
  * at risk), so trigger order is guaranteed on any filesystem.
  */
object Staged {
  def appendOrdered(dir: String, batches: DataFrame*): Unit = {
    val d = new java.io.File(dir)
    // _SUCCESS / .crc sidecars are hidden to the file source; only stamp
    // the data files it will actually list.
    def dataFiles(): Set[java.io.File] =
      Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
        .toSet
    val base = System.currentTimeMillis() - (batches.size + 1) * 60000L
    var seen = dataFiles()
    batches.zipWithIndex.foreach { case (b, i) =>
      b.coalesce(1).write.mode("append").parquet(dir)
      val fresh = dataFiles() -- seen
      fresh.foreach { f =>
        if (!f.setLastModified(base + i * 60000L))
          throw new IllegalStateException(
            s"could not stamp micro-batch order on $f")
      }
      seen ++= fresh
    }
  }
}
