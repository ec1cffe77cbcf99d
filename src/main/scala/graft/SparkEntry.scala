package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is one operator from SURVEY.md §2 (or a
  * BASELINE.json north-star extension); `oracleSql` is its DuckDB twin run
  * by the driver on the same parquet tables. Column names/types and row
  * ordering are deterministic on both sides (see Q.scala parity rules).
  */
object SparkEntry {

  val registry: Seq[Q] =
    VectorQueries.all ++ RelationalQueries.all ++ TextQueries.all ++
      SimilarityQueries.all ++ MultimodalQueries.all ++ ExtendedQueries.all ++
      MLQueries.all ++ PipelineQueries.all ++ PqQueries.all ++
      LayoutQueries.all ++ SelectionQueries.all ++ RecoQueries.all ++
      EntityQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * int8-quantized cosine top-10 (the reference's hot path, SURVEY.md §3 E1). */
  def entry(spark: SparkSession): DataFrame =
    VectorQueries.knnInt8(spark, "/root/testdata/sf0.001", qid = 0L, k = 10)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
