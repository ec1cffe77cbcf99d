package graft.store

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Minimal pickle (protocol 2) EMITTER for the two object payloads the
  * reference's `.npz` save format carries (pythonvectordb.py:572-582):
  * `id_to_index` (dict str -> int) and `metadata` (dict str -> dict
  * str -> str). Emits the exact 0-d numpy object-array shell
  * `pickle.dumps(np.asanyarray(d), 2)` produces — GLOBAL
  * numpy.core.multiarray._reconstruct + ndarray BUILD with a dtype('O')
  * state — minus the optional BINPUT memo opcodes (nothing back-refs
  * them), so `np.load(..., allow_pickle=True)[k].item()` unwraps the
  * dict the same way the reference's own load does
  * (pythonvectordb.py:611-612). Write-only: the reader side stays out of
  * scope by design (parsing arbitrary pickle needs Python semantics; the
  * import path documents the skip).
  */
object Pickle {

  private def global(out: ByteArrayOutputStream, module: String, name: String): Unit = {
    out.write('c')
    out.write(s"$module\n$name\n".getBytes(StandardCharsets.US_ASCII))
  }

  private def binUnicode(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    out.write('X')
    out.write(b.length & 0xff); out.write((b.length >> 8) & 0xff)
    out.write((b.length >> 16) & 0xff); out.write((b.length >> 24) & 0xff)
    out.write(b)
  }

  private def binInt(out: ByteArrayOutputStream, v: Int): Unit =
    if (v >= 0 && v < 256) { out.write('K'); out.write(v) }
    else {
      out.write('J')
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }

  /** The ndarray shell around one pickled python value (emitted by `body`). */
  private def objectArray(body: ByteArrayOutputStream => Unit): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(0x80); o.write(2) // PROTO 2
    global(o, "numpy.core.multiarray", "_reconstruct")
    global(o, "numpy", "ndarray")
    binInt(o, 0); o.write(0x85) // (0,) TUPLE1
    global(o, "_codecs", "encode")
    binUnicode(o, "b"); binUnicode(o, "latin1"); o.write(0x86) // TUPLE2
    o.write('R') // b'b'
    o.write(0x87); o.write('R') // _reconstruct(ndarray, (0,), b'b')
    o.write('(') // MARK: ndarray.__setstate__ tuple
    binInt(o, 1) // version
    o.write(')') // shape ()
    global(o, "numpy", "dtype")
    binUnicode(o, "O8"); o.write(0x89); o.write(0x88); o.write(0x87); o.write('R')
    o.write('(') // MARK: dtype state
    binInt(o, 3); binUnicode(o, "|")
    o.write('N'); o.write('N'); o.write('N')
    binInt(o, -1); binInt(o, -1); binInt(o, 63)
    o.write('t') // TUPLE (dtype state)
    o.write('b') // BUILD dtype
    o.write(0x89) // fortran_order False
    o.write(']') // EMPTY_LIST (object buffer)
    body(o) // ... the one element
    o.write('a') // APPEND
    o.write('t') // TUPLE (setstate)
    o.write('b') // BUILD ndarray
    o.write('.') // STOP
    o.toByteArray
  }

  private def emitStrIntDict(o: ByteArrayOutputStream, d: Seq[(String, Int)]): Unit = {
    o.write('}') // EMPTY_DICT
    if (d.nonEmpty) {
      o.write('(')
      d.foreach { case (k, v) => binUnicode(o, k); binInt(o, v) }
      o.write('u') // SETITEMS
    }
  }

  private def emitStrStrDict(o: ByteArrayOutputStream, d: Seq[(String, String)]): Unit = {
    o.write('}')
    if (d.nonEmpty) {
      o.write('(')
      d.foreach { case (k, v) => binUnicode(o, k); binUnicode(o, v) }
      o.write('u')
    }
  }

  /** np.asanyarray({str: int}) — the reference's `id_to_index`. */
  def strIntDictArray(d: Seq[(String, Int)]): Array[Byte] =
    objectArray(o => emitStrIntDict(o, d))

  /** np.asanyarray({str: {str: str}}) — the reference's `metadata`. */
  def strMapDictArray(d: Seq[(String, Seq[(String, String)])]): Array[Byte] =
    objectArray { o =>
      o.write('}')
      if (d.nonEmpty) {
        o.write('(')
        d.foreach { case (k, m) => binUnicode(o, k); emitStrStrDict(o, m) }
        o.write('u')
      }
    }
}
