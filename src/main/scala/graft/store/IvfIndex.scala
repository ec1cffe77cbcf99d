package graft.store

import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF index AT REST: the build pass assigns every vector to its nearest
  * coarse centroid and writes the corpus hive-partitioned by cell
  * (`.../data/cell=K/...`), plus a small centroids sidecar. A probe then
  * ranks centroids against the query and reads ONLY its `nprobe` cells —
  * the `cell` predicate is a PARTITION filter, so pruning happens at file
  * listing time and scan volume is nprobe/num_cells of the corpus.
  *
  * This is the at-rest analog of q_ivf_search's in-flight cell equi-join
  * (ops/SimilarityQueries.scala): same index structure, but persisted, so
  * repeated probes pay no assignment pass. At 100 TB the layout is the
  * point — a query-time filter on a partition column never touches the
  * other cells' files (IvfAtRestSpec asserts the scan's selected
  * partition count). Coarse centroids are per-label means, the same
  * quantizer the in-flight query uses; swap in k-means centroids without
  * changing the layout.
  */
object IvfIndex {

  /** Per-label mean centroids with the null-cell guard — the coarse
    * quantizer shared by this index and IvfPqIndex. `emb` needs
    * (label, embedding). */
  private[store] def labelCentroids(emb: DataFrame, caller: String): DataFrame = {
    require(!emb.isEmpty, s"$caller: empty corpus — nothing to index")
    // derive dim from the data instead of assuming the fixture's 64
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val cent = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("x").cast("double")).as("c"))
      .groupBy(col("label"))
      .agg(map_from_entries(collect_list(struct(col("pos"), col("c")))).as("cm"))
      .select(col("label").cast("int").as("cell"),
        transform(sequence(lit(0), lit(dim - 1)), i => element_at(col("cm"), i)).as("centroid"))
    // a null cell (label not castable to int) would silently drop its
    // vectors from every probe — fail the build instead
    require(cent.filter(col("cell").isNull).isEmpty,
      s"$caller: non-integer label produced a null cell id")
    cent
  }

  /** Assignment + partitioned write. `emb` needs (vec_id, label, embedding). */
  def build(emb: DataFrame, path: String): Unit = {
    val cent = labelCentroids(emb, "IvfIndex.build")
    assignAndWrite(emb, cent, path, SaveMode.Overwrite)
    cent.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Incremental maintenance: assign `emb` against the SAVED centroids
    * sidecar (frozen at build time — the production contract of IVF
    * append) and add the rows to their cell partitions with a partitioned
    * APPEND. Existing cell files are never rewritten; cost is the
    * O(|new| x num_cells) assignment plus the new rows' write — not a
    * corpus rebuild. Periodic `build` refreshes the centroids when drift
    * accumulates. Caller appends NEW vec_ids; ids are not deduplicated. */
  def append(emb: DataFrame, path: String): Unit = {
    if (emb.isEmpty) return
    val spark = emb.sparkSession
    val cent = spark.read.parquet(s"$path/centroids")
    assignAndWrite(emb, cent, path, SaveMode.Append)
  }

  /** Nearest-centroid assignment (broadcast centroids, deterministic
    * cell-id tie-break): (vec_id, embedding, cell) — shared with
    * IvfPqIndex, which projects codes before its write. */
  private[store] def assignCells(emb: DataFrame, cent: DataFrame): DataFrame = {
    val cosQC = {
      val dot = aggregate(zip_with(col("embedding"), col("centroid"),
        (x, c) => x.cast("double") * c), lit(0.0), (a, x) => a + x)
      val na = aggregate(transform(col("embedding"),
        x => x.cast("double") * x.cast("double")), lit(0.0), (a, x) => a + x)
      val nb = aggregate(transform(col("centroid"), c => c * c),
        lit(0.0), (a, x) => a + x)
      when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot / (sqrt(na) * sqrt(nb)))
    }
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cs").desc, col("cell").asc)
    emb.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("embedding"), col("cell"), cosQC.as("cs"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cell"))
  }

  /** assignCells + hive-partitioned write of (vec_id, embedding). */
  private def assignAndWrite(emb: DataFrame, cent: DataFrame,
                             path: String, mode: SaveMode): Unit =
    assignCells(emb, cent)
      .write.mode(mode).partitionBy("cell").parquet(s"$path/data")

  /** Rank centroids against the query (the sidecar is num_cells rows —
    * tiny by construction), then scan only the top-`nprobe` cells. */
  def probe(spark: SparkSession, path: String, query: Array[Float],
            k: Int, nprobe: Int): DataFrame = {
    val cells = probedCells(spark, path, query, nprobe)
    spark.read.parquet(s"$path/data")
      .filter(col("cell").isin(cells: _*))
      .select(col("vec_id"),
        VectorOps.cosineFloat(typedLit(query), col("embedding")).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** The query's top-`nprobe` cells by centroid cosine. */
  def probedCells(spark: SparkSession, path: String, query: Array[Float],
                  nprobe: Int): Seq[Int] =
    spark.read.parquet(s"$path/centroids")
      .select(col("cell"),
        VectorOps.cosineFloat(typedLit(query), col("centroid").cast("array<float>")).as("cs"))
      .orderBy(col("cs").desc, col("cell"))
      .limit(nprobe)
      .collect().map(_.getInt(0)).toSeq
}
