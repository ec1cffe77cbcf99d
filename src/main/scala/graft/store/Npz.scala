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
