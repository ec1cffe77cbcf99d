package graft.store

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.ZipInputStream

/** Minimal `.npz` / `.npy` reader for migrating data out of the reference
  * engine, whose ONLY persistence format is `np.savez_compressed`
  * (pythonvectordb.py:557-582: a zip of one `.npy` per array).
  *
  * Supports exactly what that layout needs: v1/v2 `.npy` headers, int8
  * matrices (`|i1`), little-endian integer scalars (`<i4`/`<i8`), and
  * fixed-width unicode string arrays (`<Uk`, UTF-32LE). Object-dtype
  * entries (`|O` — numpy-PICKLED python dicts: `id_to_index`, `metadata`)
  * are surfaced as raw bytes and deliberately NOT deserialized: parsing
  * pickle is out of scope, `id_to_index` is redundant (rebuilt from row
  * order, as the reference's own load does, pythonvectordb.py:640), and
  * schemaless metadata has no lossless Spark mapping without it.
  */
object Npz {

  final case class Npy(descr: String, fortranOrder: Boolean,
                       shape: Seq[Int], data: Array[Byte])

  /** Zip entry name (without `.npy`) -> parsed array. */
  def read(bytes: Array[Byte]): Map[String, Npy] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Npy]
    var e = zin.getNextEntry
    while (e != null) {
      val name = e.getName.stripSuffix(".npy")
      out += name -> parseNpy(zin.readAllBytes())
      e = zin.getNextEntry
    }
    zin.close()
    out.result()
  }

  def parseNpy(b: Array[Byte]): Npy = {
    require(b.length > 10 && (b(0) & 0xff) == 0x93 &&
      new String(b, 1, 5, "US-ASCII") == "NUMPY", "not an .npy payload")
    val major = b(6) & 0xff
    val (headerLen, headerOff) =
      if (major == 1)
        (ByteBuffer.wrap(b, 8, 2).order(ByteOrder.LITTLE_ENDIAN).getShort.toInt & 0xffff, 10)
      else
        (ByteBuffer.wrap(b, 8, 4).order(ByteOrder.LITTLE_ENDIAN).getInt, 12)
    val header = new String(b, headerOff, headerLen, "US-ASCII")
    val descr = "'descr'\\s*:\\s*'([^']+)'".r.findFirstMatchIn(header)
      .map(_.group(1)).getOrElse(sys.error(s"no descr in npy header: $header"))
    val fortran = "'fortran_order'\\s*:\\s*(True|False)".r.findFirstMatchIn(header)
      .exists(_.group(1) == "True")
    val shape = "'shape'\\s*:\\s*\\(([^)]*)\\)".r.findFirstMatchIn(header)
      .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq)
      .getOrElse(sys.error(s"no shape in npy header: $header"))
    Npy(descr, fortran, shape, java.util.Arrays.copyOfRange(b, headerOff + headerLen, b.length))
  }

  /** `<i4`/`<i8` 0-d scalar. */
  def longScalar(a: Npy): Long = {
    require(a.shape.isEmpty, s"expected scalar, got shape ${a.shape}")
    val buf = ByteBuffer.wrap(a.data).order(ByteOrder.LITTLE_ENDIAN)
    a.descr match {
      case "<i8" => buf.getLong
      case "<i4" => buf.getInt.toLong
      case d => sys.error(s"unsupported scalar dtype $d")
    }
  }

  /** `|i1` matrix, C-order: row i = data[i*cols until (i+1)*cols]. */
  def int8Matrix(a: Npy): (Int, Int, Array[Byte]) = {
    require(a.descr == "|i1", s"expected int8 matrix, got ${a.descr}")
    require(!a.fortranOrder, "fortran-order matrices unsupported")
    require(a.shape.length == 2, s"expected 2-d, got ${a.shape}")
    require(a.data.length == a.shape.head * a.shape(1),
      s"payload ${a.data.length} != ${a.shape.head}x${a.shape(1)}")
    (a.shape.head, a.shape(1), a.data)
  }

  // ---------------------------------------------------------------- write

  /** npy v1 payload: magic + header dict + raw data. */
  private def npyBytes(descr: String, shape: Seq[Int], data: Array[Byte]): Array[Byte] = {
    val shapeStr = shape match {
      case Seq() => "()"
      case Seq(n) => s"($n,)"
      case s => s.mkString("(", ", ", ")")
    }
    val header0 = s"{'descr': '$descr', 'fortran_order': False, 'shape': $shapeStr, }"
    // pad with spaces + trailing \n so magic+len+header is 64-aligned
    val pad = (64 - (10 + header0.length + 1) % 64) % 64
    val header = header0 + (" " * pad) + "\n"
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x93); out.write("NUMPY".getBytes("US-ASCII"))
    out.write(1); out.write(0)
    out.write(header.length & 0xff); out.write((header.length >> 8) & 0xff)
    out.write(header.getBytes("US-ASCII"))
    out.write(data)
    out.toByteArray
  }

  def int8MatrixBytes(rows: Int, cols: Int, data: Array[Byte]): Array[Byte] = {
    require(data.length == rows * cols)
    npyBytes("|i1", Seq(rows, cols), data)
  }

  def longScalarBytes(v: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v)
    npyBytes("<i8", Seq(), b.array())
  }

  // <Uk widths count CODE POINTS (UTF-32 elements), not UTF-16 chars:
  // String.length over-counts by 1 per surrogate pair, which would declare
  // a payload longer than the UTF-32LE bytes actually written.
  private def cp(s: String): Int = s.codePointCount(0, s.length)

  def stringScalarBytes(s: String): Array[Byte] =
    npyBytes(s"<U${math.max(1, cp(s))}",
      Seq(), java.util.Arrays.copyOf(s.getBytes("UTF-32LE"), math.max(1, cp(s)) * 4))

  def stringArrayBytes(xs: Array[String]): Array[Byte] = {
    val k = math.max(1, xs.map(cp).maxOption.getOrElse(1))
    val out = new Array[Byte](xs.length * k * 4)
    xs.zipWithIndex.foreach { case (s, i) =>
      val b = s.getBytes("UTF-32LE")
      System.arraycopy(b, 0, out, i * k * 4, b.length) // rest stays NUL
    }
    npyBytes(s"<U$k", Seq(xs.length), out)
  }

  /** Object-dtype npy: the pickled 0-d ndarray shell numpy itself writes
    * (np.savez of a python dict), so `np.load(..., allow_pickle=True)
    * [name].item()` — the reference's own load steps
    * (pythonvectordb.py:611-612) — unwraps it. */
  def objectScalarBytes(picklePayload: Array[Byte]): Array[Byte] =
    npyBytes("|O", Seq(), picklePayload)

  /** Write entries (name -> npy payload) as a compressed npz zip. */
  def writeZip(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (name, bytes) =>
      z.putNextEntry(new java.util.zip.ZipEntry(s"$name.npy"))
      z.write(bytes)
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  /** `<Uk` fixed-width UTF-32LE string array (numpy str_ dtype). */
  def stringArray(a: Npy): Array[String] = {
    val k = a.descr match {
      case s if s.startsWith("<U") => s.drop(2).toInt
      case d => sys.error(s"expected <U string dtype, got $d")
    }
    require(a.shape.length <= 1, s"expected 1-d strings, got ${a.shape}")
    val n = a.shape.headOption.getOrElse(1)
    require(a.data.length == n * k * 4,
      s"payload ${a.data.length} != $n x $k x 4")
    Array.tabulate(n) { i =>
      // each element: k UTF-32LE code points, NUL-padded
      val s = new String(a.data, i * k * 4, k * 4, "UTF-32LE")
      val cut = s.indexOf('\u0000')
      if (cut >= 0) s.substring(0, cut) else s
    }
  }
}
