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
  * The decode is REAL for the formats the JDK ships codecs for
  * (`javax.imageio`: PNG, BMP, JPEG, GIF): true width/height/channels and
  * a 16-bin luminance histogram feature. Payloads ImageIO cannot decode
  * (the fixtures' text-as-bytes blobs, unknown containers) fall back to a
  * deterministic byte-histogram featurization so the pipeline still emits
  * a typed row per input — mirroring production pipelines, which route
  * undecodable media to a default feature rather than failing the job.
  */
object Multimodal {

  final case class MediaFeatures(
      width: Int, height: Int, channels: Int, feature: Array[Float])

  /** Real image decode via the JDK's ImageIO (PNG/BMP/JPEG/GIF): true
    * dimensions + channel count from the raster, feature = 16-bin
    * luminance histogram (ITU-R BT.601 weights), normalized to sum 1.
    * Returns None for payloads no registered codec accepts. */
  def decodeImage(payload: Array[Byte]): Option[MediaFeatures] = {
    if (payload.length == 0) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val channels = img.getRaster.getNumBands
      val hist = new Array[Float](16)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
            114 * (rgb & 0xff)) / 1000
          hist(lum >> 4) += 1f
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toFloat
      var j = 0
      while (j < 16) { hist(j) /= n; j += 1 }
      Some(MediaFeatures(w, h, channels, hist))
    }
  }

  /** 8x8 block-averaged luminance grid from a REAL image decode (the
    * perceptual-hash front end): ImageIO decode, BT.601 integer luminance
    * per pixel, mean over each of the 64 blocks (block edges at
    * floor(k*dim/8), so any image size >= 8x8 works). Returns None when
    * no registered codec accepts the payload. Row-major, so
    * MediaKernels.packDHash linearizes it into the same 63-bit dHash the
    * byte-slice fallback uses. */
  def lumGrid8x8(payload: Array[Byte]): Option[Array[Long]] = {
    if (payload.length == 0) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null || img.getWidth < 8 || img.getHeight < 8) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val sums = new Array[Long](64)
      val counts = new Array[Long](64)
      var y = 0
      while (y < h) {
        val by = y * 8 / h
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
            114 * (rgb & 0xff)) / 1000
          val c = by * 8 + x * 8 / w
          sums(c) += lum
          counts(c) += 1
          x += 1
        }
        y += 1
      }
      val out = new Array[Long](64)
      var j = 0
      while (j < 64) { out(j) = sums(j) / math.max(1L, counts(j)); j += 1 }
      Some(out)
    }
  }

  /** Perceptual hash of a media payload: 63-bit linearized dHash over the
    * real decoded 8x8 luminance grid when a codec accepts the payload,
    * over the byte-slice luminance fallback otherwise — the same routing
    * contract as [[decode]] (undecodable media still fingerprints
    * deterministically instead of failing the job). */
  def dHash(payload: Array[Byte]): Long =
    graft.functions.MediaKernels.packDHash(
      lumGrid8x8(payload).getOrElse(
        graft.functions.MediaKernels.byteLumGrid(payload)))

  /** Fallback featurization for undecodable payloads: deterministic byte
    * histogram, pseudo-dimensions from the payload length (kept from the
    * former stub so non-image fixtures keep their pinned outputs). */
  def decodeFallback(payload: Array[Byte]): MediaFeatures = {
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

  /** Decode: real ImageIO decode when a codec accepts the payload, the
    * deterministic fallback otherwise. */
  def decode(payload: Array[Byte]): MediaFeatures =
    decodeImage(payload).getOrElse(decodeFallback(payload))

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
        // one ImageIO codec registry lookup per JVM; heavier decoders
        // (models, native codecs) would initialize ONCE here
        it.map { r =>
          val f = decode(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), f.width, f.height, f.channels, f.feature.toSeq)
        }
      }
    spark.createDataFrame(out, featureSchema)
  }

  /** REAL image resize for codec-decodable payloads: decode, scale to
    * (targetW, targetH) with bilinear interpolation, re-encode as PNG
    * (lossless, so the resized image re-decodes to exactly the drawn
    * pixels). Scaling draws through a synchronous Graphics2D pass —
    * `Image.getScaledInstance` produces asynchronously-computed images
    * that can re-encode incomplete under a null ImageObserver. Payloads
    * no codec accepts fall back to byte decimation sized to a comparable
    * reduction — undecodable media still flows through the pipeline as a
    * binary -> binary projection. */
  def resize(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    require(targetW > 0 && targetH > 0, s"bad target ${targetW}x$targetH")
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) {
      val inLen = math.max(1, payload.length)
      val factor = math.max(1, math.round(math.sqrt(
        inLen.toDouble / math.max(1, targetW * targetH))).toInt)
      resizeStub(payload, factor)
    } else {
      val out = new java.awt.image.BufferedImage(
        targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, targetW, targetH, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** Byte-decimation resize (every factor-th byte) — the fallback for
    * payloads no codec accepts; deterministic, shape-preserving plumbing
    * (binary -> binary projection). */
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
