package graft.store

import graft.functions.VectorOps
import graft.ops.PqQueries
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ AT REST — the two residency levers composed (the FAISS IVFPQ
  * design; Jegou et al. 2011): IvfIndex's hive-partitioned coarse cells
  * bound WHAT a probe reads (nprobe/num_cells of the files, pruned at
  * listing time), and PQ codes bound HOW BIG each read row is (M bytes vs
  * 4*dim — the dim-64 testdata compresses 32x). A 100 TB float corpus
  * becomes ~3 TB of cell-partitioned code files; one probe touches
  * nprobe/num_cells of THAT.
  *
  * Layout under `path`:
  *   data/cell=K/  — parquet (vec_id, codes binary)    [M bytes per row]
  *   centroids/    — parquet (cell, centroid)          [coarse quantizer]
  *   codebook/     — parquet (idx, v) flat PQ codebook [M*K*subdim rows]
  *
  * Probing is two-stage, both stages cheap by construction:
  *   1. ADC scan of the probed cells: per-query LUT (pqLut) broadcast,
  *      each row scored with M table reads (pqAdc) — no float math, no
  *      full-vector deserialization;
  *   2. optional exact rescore of the ADC top-candK against the caller's
  *      float corpus — a candK-row id equi-join, the standard
  *      refine step when float vectors are still available elsewhere.
  *
  * The PQ codebook is trained once at build time on the build corpus and
  * FROZEN — like IvfIndex.append's centroids, the production maintenance
  * contract: appends encode against the saved codebook, periodic rebuilds
  * refresh it.
  */
object IvfPqIndex {

  /** Coarse cells + PQ codes + both sidecars. `emb` needs
    * (vec_id, label, embedding) — cells are per-label means, matching
    * IvfIndex so the two layouts are directly comparable. */
  def build(emb: DataFrame, path: String): Unit = {
    require(!emb.isEmpty, "IvfPqIndex.build: empty corpus — nothing to index")
    val spark = emb.sparkSession
    val cb = PqQueries.trainCodebookOn(emb)
    writeCodebook(spark, cb, path)

    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val cent = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("x").cast("double")).as("c"))
      .groupBy(col("label"))
      .agg(map_from_entries(collect_list(struct(col("pos"), col("c")))).as("cm"))
      .select(col("label").cast("int").as("cell"),
        transform(sequence(lit(0), lit(dim - 1)), i => element_at(col("cm"), i)).as("centroid"))
    require(cent.filter(col("cell").isNull).isEmpty,
      "IvfPqIndex.build: non-integer label produced a null cell id")
    cent.write.mode("overwrite").parquet(s"$path/centroids")
    assignEncodeWrite(emb, cent, cb, path, SaveMode.Overwrite)
  }

  /** Incremental append: encode against the FROZEN saved codebook, assign
    * against the frozen centroids, append to cell partitions (existing
    * files untouched — same contract as IvfIndex.append). */
  def append(emb: DataFrame, path: String): Unit = {
    if (emb.isEmpty) return
    val spark = emb.sparkSession
    val cent = spark.read.parquet(s"$path/centroids")
    val cb = readCodebook(spark, path)
    assignEncodeWrite(emb, cent, cb, path, SaveMode.Append)
  }

  /** ADC probe: rank centroids, scan ONLY the top-`nprobe` cells' code
    * files (partition filter), score each row via the broadcast LUT —
    * approximate top-k, no float vector ever read. */
  def probe(spark: SparkSession, path: String, query: Array[Float],
            k: Int, nprobe: Int): DataFrame = {
    val cb = readCodebook(spark, path)
    val cells = probedCells(spark, path, query, nprobe)
    val lut = graft.functions.VectorKernels.pqLut(query, cb, PqQueries.M, PqQueries.K)
    spark.read.parquet(s"$path/data")
      .filter(col("cell").isin(cells: _*))
      .select(col("vec_id"),
        VectorOps.pqAdc(col("codes"), typedLit(lut), PqQueries.K).as("adc"))
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(k)
  }

  /** Two-stage probe: ADC top-`candK` from the probed cells, then exact
    * cosine rescore against `floats` (vec_id, embedding) — a candK-row
    * equi-join — and the exact top-k of that. With candK >= the probed
    * cells' row count this EQUALS the cell-restricted exact search. */
  def probeRescored(spark: SparkSession, path: String, query: Array[Float],
                    floats: DataFrame, k: Int, candK: Int, nprobe: Int): DataFrame = {
    val cand = probe(spark, path, query, candK, nprobe).select("vec_id")
    cand.join(floats.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("vec_id"),
        VectorOps.cosineFloat(typedLit(query), col("embedding")).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** The query's top-`nprobe` cells by centroid cosine (sidecar-sized). */
  def probedCells(spark: SparkSession, path: String, query: Array[Float],
                  nprobe: Int): Seq[Int] =
    spark.read.parquet(s"$path/centroids")
      .select(col("cell"),
        VectorOps.cosineFloat(typedLit(query), col("centroid").cast("array<float>")).as("cs"))
      .orderBy(col("cs").desc, col("cell"))
      .limit(nprobe)
      .collect().map(_.getInt(0)).toSeq

  private def assignEncodeWrite(emb: DataFrame, cent: DataFrame,
                                cb: Array[Double], path: String,
                                mode: SaveMode): Unit = {
    val cosQC = {
      val dot = aggregate(zip_with(col("embedding"), col("centroid"),
        (x, c) => x.cast("double") * c), lit(0.0), (a, x) => a + x)
      val na = aggregate(transform(col("embedding"),
        x => x.cast("double") * x.cast("double")), lit(0.0), (a, x) => a + x)
      val nb = aggregate(transform(col("centroid"), c => c * c),
        lit(0.0), (a, x) => a + x)
      when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot / (sqrt(na) * sqrt(nb)))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cs").desc, col("cell").asc)
    emb.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("embedding"), col("cell"), cosQC.as("cs"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"),
        VectorOps.pqEncode(col("embedding"), cb, PqQueries.M, PqQueries.K).as("codes"),
        col("cell"))
      .write.mode(mode).partitionBy("cell").parquet(s"$path/data")
  }

  private def writeCodebook(spark: SparkSession, cb: Array[Double], path: String): Unit = {
    import spark.implicits._
    cb.toSeq.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("idx", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
  }

  private def readCodebook(spark: SparkSession, path: String): Array[Double] = {
    val rows = spark.read.parquet(s"$path/codebook")
      .orderBy(col("idx")).collect() // M*K*subdim rows — sidecar-sized
    rows.map(_.getDouble(1))
  }
}
