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
  * (pythonvectordb.py:611-612).
  *
  * The READ direction (`dictFromObjectArray`) is a bounded stack-machine
  * over the opcode subset pickle protocols 2-4 actually use for the
  * reference's two payload shapes (dict str->int, dict str->{str->Any
  * scalar}) wrapped in numpy's 0-d object-array shell: PROTO/FRAME,
  * GLOBAL/STACK_GLOBAL, memo put/get, dict/list/tuple construction,
  * unicode/bytes/int/bool/none literals, REDUCE/BUILD/STOP. Python
  * callables are never executed — REDUCE/BUILD produce inert nodes and
  * the payload dict is pulled out of the ndarray __setstate__ buffer.
  * Anything outside that subset fails loudly (no silent data loss).
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

  // ---------------------------------------------------------------- read

  /** Inert stand-ins for python objects the VM never executes. */
  final case class Global(module: String, name: String)
  final case class Reduce(callable: Any, args: Any)
  final case class Built(obj: Any, state: Any)
  private val Mark = new AnyRef { override def toString = "MARK" }

  /** Evaluate one pickle stream to a Scala value tree. Dicts become
    * LinkedHashMap, lists ArrayBuffer, tuples Vector; GLOBAL/REDUCE/BUILD
    * become the inert nodes above. Unknown opcodes fail loudly. */
  def parse(bytes: Array[Byte]): Any = {
    import scala.collection.mutable
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val stack = mutable.ArrayBuffer.empty[Any]
    val memo = mutable.Map.empty[Int, Any]
    def push(v: Any): Unit = stack += v
    def pop(): Any = { val v = stack.last; stack.dropRightInPlace(1); v }
    def popToMark(): Seq[Any] = {
      val i = stack.lastIndexOf(Mark)
      require(i >= 0, "pickle: no MARK on stack")
      val items = stack.slice(i + 1, stack.length).toSeq
      stack.dropRightInPlace(stack.length - i)
      items
    }
    def u8() = buf.get() & 0xff
    def str(n: Int, cs: String) = {
      val b = new Array[Byte](n); buf.get(b); new String(b, cs)
    }
    def line(): String = {
      val sb = new StringBuilder
      var c = buf.get()
      while (c != '\n') { sb.append(c.toChar); c = buf.get() }
      sb.toString
    }
    def setItems(pairs: Seq[Any]): Unit = {
      require(pairs.length % 2 == 0, "pickle: odd SETITEMS count")
      val d = stack.last.asInstanceOf[mutable.LinkedHashMap[Any, Any]]
      pairs.grouped(2).foreach { case Seq(k, v) => d(k) = v }
    }
    while (true) {
      (buf.get() & 0xff) match {
        case 0x80 => buf.get() // PROTO
        case 0x95 => buf.getLong // FRAME (proto 4): length hint, ignore
        case 'c' => push(Global(line(), line())) // GLOBAL
        case 0x93 => // STACK_GLOBAL
          val name = pop().asInstanceOf[String]; val mod = pop().asInstanceOf[String]
          push(Global(mod, name))
        case 'q' => memo(u8()) = stack.last // BINPUT
        case 'r' => memo(buf.getInt) = stack.last // LONG_BINPUT
        case 0x94 => memo(memo.size) = stack.last // MEMOIZE
        case 'h' => push(memo(u8())) // BINGET
        case 'j' => push(memo(buf.getInt)) // LONG_BINGET
        case '(' => push(Mark)
        case '}' => push(mutable.LinkedHashMap.empty[Any, Any])
        case ']' => push(mutable.ArrayBuffer.empty[Any])
        case ')' => push(Vector.empty[Any])
        case 'u' => setItems(popToMark()) // SETITEMS
        case 's' => val v = pop(); val k = pop(); setItems(Seq(k, v)) // SETITEM
        case 'a' => // APPEND
          val v = pop(); stack.last.asInstanceOf[mutable.ArrayBuffer[Any]] += v
        case 'e' => // APPENDS
          val vs = popToMark()
          stack.last.asInstanceOf[mutable.ArrayBuffer[Any]] ++= vs
        case 'X' => push(str(buf.getInt, "UTF-8")) // BINUNICODE
        case 0x8c => push(str(u8(), "UTF-8")) // SHORT_BINUNICODE
        case 'B' => { val n = buf.getInt; val b = new Array[Byte](n); buf.get(b); push(b) } // BINBYTES
        case 'C' => { val n = u8(); val b = new Array[Byte](n); buf.get(b); push(b) } // SHORT_BINBYTES
        case 'U' => push(str(u8(), "ISO-8859-1")) // SHORT_BINSTRING (proto≤2)
        case 'K' => push(u8()) // BININT1
        case 'M' => push(buf.getShort & 0xffff) // BININT2
        case 'J' => push(buf.getInt) // BININT
        case 0x8a => // LONG1: n-byte little-endian signed
          val n = u8(); val b = new Array[Byte](n); buf.get(b)
          push(if (n == 0) 0L
               else BigInt(b.reverse).longValue) // reverse -> big-endian for BigInt
        case 'G' => push(java.lang.Double.longBitsToDouble( // BINFLOAT (big-endian)
          java.nio.ByteBuffer.wrap({ val b = new Array[Byte](8); buf.get(b); b }).getLong))
        case 'N' => push(null)
        case 0x88 => push(true) // NEWTRUE
        case 0x89 => push(false) // NEWFALSE
        case 0x85 => push(Vector(pop())) // TUPLE1
        case 0x86 => val b = pop(); val a = pop(); push(Vector(a, b)) // TUPLE2
        case 0x87 => val c = pop(); val b = pop(); val a = pop(); push(Vector(a, b, c)) // TUPLE3
        case 't' => push(popToMark().toVector) // TUPLE
        case 'R' => val args = pop(); push(Reduce(pop(), args)) // REDUCE (never executed)
        case 'b' => val state = pop(); push(Built(pop(), state)) // BUILD (inert)
        case '.' => return pop() // STOP
        case op => sys.error(f"pickle: unsupported opcode 0x$op%02x at ${buf.position() - 1} " +
          "(not a reference-engine save payload)")
      }
    }
    sys.error("pickle: unreachable")
  }

  /** Unwrap `pickle.dumps(np.asanyarray(dict))` — the shell numpy writes
    * for object entries in an `.npz` (and the shell `objectArray` above
    * emits) — and return the payload dict. The dict sits in the ndarray
    * `__setstate__` object buffer; it is found by depth-first search so
    * memo back-references and protocol differences (2 vs 3/4) don't
    * matter. */
  def dictFromObjectArray(bytes: Array[Byte]): Map[String, Any] = {
    def find(x: Any): Option[scala.collection.mutable.LinkedHashMap[Any, Any]] = x match {
      case d: scala.collection.mutable.LinkedHashMap[Any @unchecked, Any @unchecked] => Some(d)
      case Built(obj, state) => find(state).orElse(find(obj))
      case Reduce(c, args) => find(args).orElse(find(c))
      case s: scala.collection.Seq[Any @unchecked] =>
        s.iterator.flatMap(find(_).iterator).nextOption()
      case _ => None
    }
    val root = parse(bytes)
    val d = find(root).getOrElse(
      sys.error("pickle: no dict payload found in object-array shell"))
    d.iterator.map { case (k, v) =>
      require(k.isInstanceOf[String], s"pickle: non-string dict key $k")
      k.asInstanceOf[String] -> v
    }.toMap
  }

  /** Python `str()` of the scalar types the reference can carry in a
    * metadata value — the lossy-but-documented mapping into the store's
    * map<string,string> `meta` column. */
  def pyStr(v: Any): String = v match {
    case null => "None"
    case true => "True"
    case false => "False"
    case s: String => s
    case b: Array[Byte] => new String(b, "ISO-8859-1")
    case d: Double => if (d == d.floor && !d.isInfinite && math.abs(d) < 1e16)
      s"${d.toLong}.0" else d.toString
    case other => other.toString
  }
}
