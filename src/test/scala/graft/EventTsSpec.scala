package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regression guard for the r7→r8 fixture breakage: the events `ts` column
  * has shipped as parquet TIMESTAMP(NANOS) (read as nanos-long under the
  * session's nanosAsLong=true), as timestamp[us] without isAdjustedToUTC
  * (read as TIMESTAMP_NTZ), and could legitimately arrive as plain
  * TIMESTAMP. `Tables.normalizeEventTs` must map all three to the SAME
  * TimestampType instants so epoch conversions (unix_micros, window())
  * never hit an analysis-time datatype mismatch again. */
class EventTsSpec extends SparkSpec {

  private val epochUs = 1700000000123456L // 2023-11-14T22:13:20.123456Z

  test("normalizeEventTs: nanos-long, NTZ, and TIMESTAMP inputs agree") {
    // nanos-as-long representation (what nanosAsLong=true yields)
    val longDf = spark.createDataFrame(
      java.util.List.of(Row(java.lang.Long.valueOf(epochUs * 1000L))),
      StructType(Seq(StructField("ts", LongType))))
    // NTZ representation (what parquet timestamp[us] yields in Spark 4);
    // the session is pinned UTC so the local instant IS the UTC instant
    val ntzDf = spark.createDataFrame(
      java.util.List.of(Row(java.time.LocalDateTime.ofEpochSecond(
        epochUs / 1000000L, (epochUs % 1000000L).toInt * 1000,
        java.time.ZoneOffset.UTC))),
      StructType(Seq(StructField("ts", TimestampNTZType))))
    // plain TIMESTAMP representation
    val tsDf = spark.createDataFrame(
      java.util.List.of(Row(java.time.Instant.ofEpochSecond(
        epochUs / 1000000L, (epochUs % 1000000L).toInt * 1000))),
      StructType(Seq(StructField("ts", TimestampType))))

    val results = Seq(longDf, ntzDf, tsDf).map { df =>
      val norm = Tables.normalizeEventTs(df)
      assert(norm.schema("ts").dataType == TimestampType)
      norm.select(unix_micros(col("ts"))).collect().head.getLong(0)
    }
    assert(results == Seq(epochUs, epochUs, epochUs))
  }

  test("the real fixture normalizes to TimestampType with sane event times") {
    val ev = Tables.events(spark, sf001)
    assert(ev.schema("ts").dataType == TimestampType)
    // guards the silent 1000x shift: the fixture's events must live in
    // a plausible year, not near the epoch
    val yr = ev.select(min(year(col("ts"))), max(year(col("ts"))))
      .collect().head
    assert(yr.getInt(0) >= 2000 && yr.getInt(1) <= 2100,
      s"event years ${yr.getInt(0)}..${yr.getInt(1)} look shifted")
    // and the streaming tier sees the same instants as the batch path
    val stream = graft.streaming.EventsStream.normalize(
      spark.read.schema(
        graft.streaming.EventsStream.rawSchema(spark, sf001))
        .parquet(s"$sf001/events.parquet"))
    val a = ev.agg(sum(unix_micros(col("ts")))).collect().head.getLong(0)
    val b = stream.agg(sum(unix_micros(col("ts")))).collect().head.getLong(0)
    assert(a == b, "batch and streaming ts normalization diverge")
  }
}
