package graft.tools

import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Measures the ALS training-fit RMSE vs the constant-mean baseline per
  * SF — the probe behind q_mllib_als's fit floor (probe-the-domain rule). */
object AlsProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.fromEnv("8", appName = "als-probe")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val d = s"/root/testdata/sf$sf"
      val ratings = Tables.orders(spark, d)
        .filter(year(col("o_orderdate")) === 1998)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(spark, d)
          .select(col("l_orderkey"), col("l_partkey"), col("l_quantity")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey").cast("int").as("user"),
          col("l_partkey").cast("int").as("item"))
        .agg(sum(floor(col("l_quantity")).cast("long")).cast("float").as("rating"))
        .cache()
      val t0 = System.nanoTime()
      val model = new org.apache.spark.ml.recommendation.ALS()
        .setRank(4).setMaxIter(5).setRegParam(0.1).setSeed(7L)
        .setUserCol("user").setItemCol("item").setRatingCol("rating")
        .setColdStartStrategy("drop").fit(ratings)
      val fitSec = (System.nanoTime() - t0) / 1e9
      val pred = model.transform(ratings)
        .select(col("rating").cast("double").as("r"),
          col("prediction").cast("double").as("p"))
      val rmse = math.sqrt(pred.agg(avg((col("r") - col("p")) * (col("r") - col("p")))).head.getDouble(0))
      val stats = ratings.agg(avg(col("rating")).as("mu"),
        count(lit(1)).as("n")).head
      val mu = stats.getDouble(0)
      val base = math.sqrt(ratings
        .agg(avg((col("rating") - mu) * (col("rating") - mu))).head.getDouble(0))
      println(f"SF=$sf n=${stats.getLong(1)} rmse=$rmse%.4f baseline=$base%.4f ratio=${rmse / base}%.4f fit=${fitSec}%.1fs")
      ratings.unpersist()
    }
    spark.stop()
  }
}
