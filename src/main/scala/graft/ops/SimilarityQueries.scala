package graft.ops

import graft.{OracleSql, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Similarity-search operators over the embedding corpus:
  *  - brute-force closest-pairs (the exact baseline, analog of the
  *    reference's exhaustive scan, pythonvectordb.py:25-67);
  *  - sign-bit LSH bucketing (random-hyperplane family restricted to axis
  *    hyperplanes) as the scale path: candidates come from a bucket-equality
  *    shuffle join instead of an n^2 product.
  */
object SimilarityQueries {

  /** 4-bit sign bucket over fixed dimensions — a deterministic cosine-LSH. */
  private def bucket(e: Column): Column =
    concat(Seq(1, 17, 33, 49).map(i =>
      when(element_at(e, i) >= 0, lit("1")).otherwise(lit("0"))): _*)

  private def bucketSql(e: String): String =
    Seq(1, 17, 33, 49)
      .map(i => s"(CASE WHEN $e[$i] >= 0 THEN '1' ELSE '0' END)")
      .mkString(" || ")

  val all: Seq[Q] = Seq(

    // Exact top-20 closest float-cosine pairs (brute force baseline).
    Q("q_neardup_pairs",
      (s, d) => {
        val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
        val a = e.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
        val b = e.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
        a.crossJoin(b).filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            VectorOps.cosineFloat(col("ea"), col("eb")).as("score"))
          .orderBy(col("score").desc, col("id_a"), col("id_b"))
          .limit(20)
      },
      Some(s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${OracleSql.floatCos("a.embedding", "b.embedding")} AS score
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |ORDER BY score DESC, id_a, id_b
         |LIMIT 20""".stripMargin),
      headline = true),

    // ANN via sign-bucket LSH: per-query top-3 within the query's bucket.
    Q("q_ann_bucket",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"), bucket(col("embedding")).as("bucket"))
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("bucket"))
        val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
        q.join(e, "bucket")
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            VectorOps.cosineFloat(col("qe"), col("embedding")).as("score"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .orderBy(col("qid"), col("rn"))
      },
      Some(s"""WITH b AS (
         |  SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qe, bucket FROM b WHERE vec_id < 5),
         |cand AS (
         |  SELECT q.qid, b.vec_id, ${OracleSql.floatCos("q.qe", "b.embedding")} AS score
         |  FROM q JOIN b USING (bucket) WHERE b.vec_id <> q.qid),
         |r AS (
         |  SELECT qid, vec_id, score,
         |    CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS BIGINT) AS rn
         |  FROM cand)
         |SELECT qid, vec_id, score, rn FROM r WHERE rn <= 3 ORDER BY qid, rn""".stripMargin))
  )
}
