package graft

import org.apache.spark.sql.SparkSession

/** Local smoke: drives SparkEntry.entry exactly as the driver's t1 check
  * does (rows > 0 on sf0.001). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4", appName = "graft-smoke")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.show(10, truncate = false)

    // VectorStore facade end-to-end: ingest the sf0.001 embeddings fixture,
    // search, delete, save/load.
    import org.apache.spark.sql.functions._
    val st = store.VectorStore.create(spark, 64)
    st.addVectors(Tables.embeddings(spark, "/root/testdata/sf0.001").select(
      concat(lit("vec_"), col("vec_id")).as("id"),
      col("embedding"),
      map(lit("label"), col("label").cast("string")).as("meta")))
    println(s"STORE_COUNT=${st.count}")
    val q = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") === 0).select("embedding")
      .collect().head.getSeq[Float](0).toArray
    st.search(q, 5).show(truncate = false)
    st.delete(Seq("vec_0"))
    val top = st.search(q, 1).collect().head
    println(s"AFTER_DELETE_TOP=${top.getAs[String]("id")}")
    val dir = java.nio.file.Files.createTempDirectory("smoke_store").toString
    st.save(dir)
    val re = store.VectorStore.load(spark, dir)
    println(s"RELOADED_COUNT=${re.count}")

    // Streaming ingest smoke.
    val sc = streaming.EventsStream.runOnce(spark, "/root/testdata/sf0.001", "smoke_ev").count()
    println(s"STREAM_WINDOWS=$sc")

    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
