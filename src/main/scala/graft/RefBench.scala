package graft

import graft.functions.{VectorKernels, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Reference-protocol benchmark (SURVEY.md §2.3 B1-B6, BASELINE.md):
  * dim-128 float32 vectors, corpus sizes 1k/5k/10k/50k/100k, k=10,
  * 10 warm-ups + 100 timed searches — the workload behind the reference's
  * published ~1,100 QPS at 50k vectors (README.md:24).
  *
  * Two search modes are reported:
  *  - `seq`: 100 sequential one-query jobs (the reference's loop shape;
  *    Spark pays per-job scheduling, so this measures latency)
  *  - `batch`: the same 100 queries in ONE pass (q_knn_batch shape) —
  *    the Spark-native serving pattern; QPS = 100 / wall.
  * Corpus is quantized once and cached (analog of the reference holding
  * its int8 matrix in memory).
  */
object RefBench {

  def mkCorpus(spark: SparkSession, n: Int, dim: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until n).map { i =>
      (i.toLong, Array.fill(dim)((rnd.nextGaussian()).toFloat))
    }
    rows.toDF("vec_id", "embedding")
      .repartition(32)
      .select(col("vec_id"), VectorOps.quantizeInt8(col("embedding")).as("q"))
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.fromEnv("32", appName = "graft-refbench", logLevel = "ERROR")
    val dim = 128
    val k = 10
    val sizes = Seq(1000, 5000, 10000, 50000, 100000)
    val results = sizes.map { n =>
      val corpus = mkCorpus(spark, n, dim).persist(StorageLevel.MEMORY_ONLY)
      corpus.count() // materialize (B1 analog: insert+quantize)
      import spark.implicits._
      val embDf = {
        val rnd2 = new scala.util.Random(42)
        (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd2.nextGaussian().toFloat)))
          .toDF("vec_id", "embedding")
      }
      val index = graft.store.QuantizedIndex
        .build(embDf, dim, numBlocks = 32).persist()
      index.count // materialize the packed blocks
      val rnd = new scala.util.Random(7)
      val queries = (0 until 100).map(i =>
        (i.toLong, VectorKernels.quantize(Array.fill(dim)(rnd.nextGaussian().toFloat)))).toArray

      // warm-up x10 (matches benchmark_suite.py:109-117)
      (0 until 10).foreach { _ =>
        corpus.select(col("vec_id"), VectorOps.cosineInt8(col("q"), lit(queries.head._2)).as("score"))
          .orderBy(col("score").desc, col("vec_id")).limit(k).collect()
        index.search(Array(queries.head), k)
      }
      // sequential: 100 single-query jobs (declarative DataFrame path)
      val t0 = System.nanoTime()
      queries.foreach { case (_, qv) =>
        corpus.select(col("vec_id"), VectorOps.cosineInt8(col("q"), lit(qv)).as("score"))
          .orderBy(col("score").desc, col("vec_id")).limit(k).collect()
      }
      val seqSec = (System.nanoTime() - t0) / 1e9

      // sequential on the packed index: 100 single-query jobs
      val t2 = System.nanoTime()
      queries.foreach(q => index.search(Array(q), k))
      val idxSeqSec = (System.nanoTime() - t2) / 1e9

      // driver-local replica: the in-process serving tier (the reference's
      // own operating mode) — 100 sequential searches, no job scheduling
      val local = index.toLocal
      local.search(queries.head._2, k) // warm
      val t3 = System.nanoTime()
      queries.foreach(q => local.search(q._2, k))
      val localSeqSec = (System.nanoTime() - t3) / 1e9
      // B3 memory accounting (benchmark_suite.py:141-160)
      val bytesPerVec = index.estimatedBytes.toDouble / n

      // batched: all 100 queries in ONE job over the packed index
      val t1 = System.nanoTime()
      index.search(queries, k)
      val batchSec = (System.nanoTime() - t1) / 1e9
      corpus.unpersist()
      index.unpersist()
      (n, seqSec, idxSeqSec, batchSec, localSeqSec, bytesPerVec)
    }
    val json = results.map { case (n, s, is, b, ls, bpv) =>
      f"""{"corpus":$n,"df_seq_qps":${100.0 / s}%.1f,"idx_seq_qps":${100.0 / is}%.1f,"local_seq_qps":${100.0 / ls}%.1f,"local_seq_ms":${ls * 10}%.2f,"batch_qps":${100.0 / b}%.1f,"batch_ms":${b * 10}%.2f,"bytes_per_vec":$bpv%.0f}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"ref_search_protocol","dim":$dim,"k":$k,"queries":100,"baseline_qps_50k":1100,"results":$json}""")

    // B1 insert throughput: batch sizes 1/10/100/1k/10k (benchmark_suite.py:56)
    // = validate + normalize + quantize + materialize.
    import spark.implicits._
    val insertJson = Seq(1, 10, 100, 1000, 10000).map { bs =>
      val rnd = new scala.util.Random(1)
      val df = (0 until bs).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
        .toDF("vec_id", "embedding")
      val t0 = System.nanoTime()
      df.select(col("vec_id"), VectorOps.quantizeInt8(col("embedding")).as("q"))
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      f"""{"batch":$bs,"vec_per_s":${bs / sec}%.0f}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"ref_insert_protocol","results":$insertJson}""")

    // B4 concurrency: 10 threads x 50 queries on 10k vectors
    // (benchmark_suite.py:197-224) against the shared packed index.
    {
      val embDf = {
        val rnd = new scala.util.Random(42)
        (0 until 10000).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
          .toDF("vec_id", "embedding")
      }
      val index = graft.store.QuantizedIndex.build(embDf, dim, 32).persist()
      index.count
      val rnd = new scala.util.Random(7)
      val qs = (0 until 10).map(t => (0 until 50).map(i =>
        (i.toLong, VectorKernels.quantize(Array.fill(dim)(rnd.nextGaussian().toFloat)))).toArray)
      index.search(qs.head, k) // warm
      val t0 = System.nanoTime()
      val threads = qs.map { tq =>
        val th = new Thread(() => tq.grouped(10).foreach(g => index.search(g, k)))
        th.start(); th
      }
      threads.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9

      // same protocol on the in-process serving replica: overlapping
      // callers scan on their own threads (see LocalIndex concurrency
      // model), so aggregate QPS scales with cores instead of
      // serializing behind the reference's RLock
      val local = index.toLocal
      qs.head.take(10).foreach(q => local.search(q._2, k)) // warm
      val tl = System.nanoTime()
      val lthreads = qs.map { tq =>
        val th = new Thread(() => tq.foreach(q => local.search(q._2, k)))
        th.start(); th
      }
      lthreads.foreach(_.join())
      val lsec = (System.nanoTime() - tl) / 1e9
      index.unpersist()
      println(f"""{"metric":"ref_concurrent_protocol","threads":10,"queries":500,"agg_qps":${500 / sec}%.0f,"local_agg_qps":${500 / lsec}%.0f}""")
    }

    // B5 lazy deletion + B6 save/load on a 10k-vector store
    // (benchmark_suite.py:244-272, 290-329).
    {
      val st = graft.store.VectorStore.create(spark, dim)
      val rnd = new scala.util.Random(3)
      val rows = (0 until 10000).map(i =>
        (s"vec_$i", Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq, Map("index" -> i.toString)))
        .toDF("id", "embedding", "meta")
      val tIns = System.nanoTime()
      st.addVectors(rows)
      st.count
      val insSec = (System.nanoTime() - tIns) / 1e9
      val tDel = System.nanoTime()
      st.delete((0 until 500).map(i => s"vec_$i"))
      val delSec = (System.nanoTime() - tDel) / 1e9
      val dir = java.nio.file.Files.createTempDirectory("refbench_store").toString
      val tSave = System.nanoTime()
      st.save(dir)
      val saveSec = (System.nanoTime() - tSave) / 1e9
      val tLoad = System.nanoTime()
      val re = graft.store.VectorStore.load(spark, dir)
      val n = re.count
      val loadSec = (System.nanoTime() - tLoad) / 1e9
      println(f"""{"metric":"ref_store_protocol","insert_10k_s":$insSec%.2f,"delete_500_s":$delSec%.2f,"save_s":$saveSec%.2f,"load_s":$loadSec%.2f,"reloaded":$n}""")
    }
    spark.stop()
  }
}
