package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column processing: media as opaque `binary` payloads with
  * typed metadata, decoded/featurized in partition-sized batches — the
  * Scala analog of a Pandas `mapInPandas` batch UDF. The batching shape is
  * what matters at scale: one decoder init per partition (codecs/models are
  * expensive to construct), rows streamed through it, features emitted as
  * typed columns.
  *
  * The decode itself is a clearly-marked STUB (this container has no image/
  * audio codecs): `decodeStub` derives a deterministic byte histogram +
  * fake embedding from the payload. A production build replaces ONLY the
  * body of `decodeStub` with e.g. JPEG decode + model forward.
  */
object Multimodal {

  final case class MediaFeatures(
      width: Int, height: Int, channels: Int, feature: Array[Float])

  /** STUB decoder — deterministic fake: dimensions from payload length,
    * features from a byte histogram. Replace with a real codec call. */
  def decodeStub(payload: Array[Byte]): MediaFeatures = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) % 16) += 1f
      i += 1
    }
    val n = math.max(1, payload.length).toFloat
    var j = 0
    while (j < 16) { hist(j) /= n; j += 1 }
    MediaFeatures(
      width = 64 + (payload.length % 64),
      height = 64 + ((payload.length / 64) % 64),
      channels = 3,
      feature = hist)
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Batched decode: (id: long, payload: binary) -> typed feature columns.
    * One decoder per partition; narrow (no shuffle). */
  def decodeBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val out = df.select(col("id").cast("long"), col("payload")).rdd
      .mapPartitions { it =>
        // production: initialize the codec/model ONCE here
        it.map { r =>
          val f = decodeStub(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), f.width, f.height, f.channels, f.feature.toSeq)
        }
      }
    spark.createDataFrame(out, featureSchema)
  }

  /** STUB resize: decimate the payload by `factor` (every factor-th byte)
    * — stands in for image resize; deterministic, shape-preserving
    * plumbing (binary -> binary projection). A real build swaps the byte
    * loop for a codec resize. */
  def resizeStub(payload: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((payload.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = payload(i * factor); i += 1 }
    out
  }

  /** Frame sampling over a multimodal payload: split the binary into
    * fixed-size "frames" and keep every `stride`-th — pure Catalyst
    * (narrow), showing binary-column slicing without a UDF.
    *
    * Zero-length payloads yield an EMPTY frame list, by explicit guard on
    * BOTH sides of the oracle pair: here via the `when(octet_length = 0)`
    * branch (Spark's `sequence(0, -1)` counts DOWN rather than returning
    * empty, so phantom frames would appear without it), and in the
    * q_frame_sample DuckDB oracle via a matching `CASE WHEN strlen = 0`
    * (DuckDB `//` truncates toward zero, so (0-1)//step = 0 would emit one
    * empty frame without the guard). */
  def sampleFrames(payload: org.apache.spark.sql.Column,
                   frameBytes: Int, stride: Int): org.apache.spark.sql.Column = {
    val step = frameBytes * stride
    when(octet_length(payload) === 0, array().cast("array<binary>"))
      .otherwise(transform(
        sequence(lit(0), floor((octet_length(payload) - 1) / lit(step)).cast("int")),
        i => substring(payload, (i * step + 1).cast("int"), lit(frameBytes))))
  }
}
