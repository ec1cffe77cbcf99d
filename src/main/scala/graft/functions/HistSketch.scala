package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Deterministic mergeable quantile sketch: a fixed-grid histogram.
  *
  * The re-aggregation design next to q_hll_merge's HLL tier, with one
  * deliberate difference: HLL union is LOSSY across sketch mode
  * transitions (measured there — merged != direct while both stay in the
  * error bound), whereas fixed-grid histogram merge is bitwise LOSSLESS
  * (counts add), so the oracle gate can demand EXACT equality of
  * merged-vs-direct rank bins instead of a closeness band. The price is a
  * value-space error bound (one bin width) instead of HLL's relative
  * bound, and a pre-pass for the [lo, hi] domain. At 100 TB: partials are
  * a few KB per group (sparse-encoded), map-side-combinable, and months
  * re-aggregate from daily partials without rescanning days.
  *
  * Wire format (sparse): int nbins, int npairs, then (int bin,
  * long count) pairs — a day touching b bins costs 8 + 12b bytes.
  */
object HistSketchKernels {

  def serialize(counts: Array[Long]): Array[Byte] = {
    var nz = 0
    var i = 0
    while (i < counts.length) { if (counts(i) != 0L) nz += 1; i += 1 }
    val bb = ByteBuffer.allocate(8 + nz * 12)
    bb.putInt(counts.length).putInt(nz)
    i = 0
    while (i < counts.length) {
      if (counts(i) != 0L) { bb.putInt(i); bb.putLong(counts(i)) }
      i += 1
    }
    bb.array()
  }

  /** Adds `bytes` into `acc` (resizing from the sentinel empty buffer). */
  def mergeInto(acc: Array[Long], bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val nbins = bb.getInt()
    val target =
      if (acc.length == nbins) acc
      else {
        require(acc.isEmpty, s"histogram width mismatch: ${acc.length} vs $nbins")
        new Array[Long](nbins)
      }
    val nz = bb.getInt()
    var j = 0
    while (j < nz) {
      val bin = bb.getInt()
      target(bin) += bb.getLong()
      j += 1
    }
    target
  }

  /** 0-based bin holding the q = num/den quantile by the ceil-rank rule
    * (target rank = ceil(q*N) in 1..N, integer-exact); -1 on an empty
    * sketch. DuckDB replays this from GROUP BY counts + a running sum. */
  def rankBin(bytes: Array[Byte], num: Long, den: Long): Long = {
    val bb = ByteBuffer.wrap(bytes)
    bb.getInt() // nbins
    val nz = bb.getInt()
    val bins = new Array[Int](nz)
    val cnts = new Array[Long](nz)
    var total = 0L
    var j = 0
    while (j < nz) {
      bins(j) = bb.getInt(); cnts(j) = bb.getLong(); total += cnts(j); j += 1
    }
    if (total == 0L) return -1L
    val targetRank = (total * num + den - 1L) / den
    // pairs were written in ascending bin order
    var cum = 0L
    j = 0
    while (j < nz) {
      cum += cnts(j)
      if (cum >= targetRank) return bins(j).toLong
      j += 1
    }
    bins(nz - 1).toLong
  }

  private def sparse(bytes: Array[Byte]): (Array[Int], Array[Long], Long) = {
    val bb = ByteBuffer.wrap(bytes)
    bb.getInt() // nbins
    val nz = bb.getInt()
    val bins = new Array[Int](nz)
    val cnts = new Array[Long](nz)
    var total = 0L
    var j = 0
    while (j < nz) {
      bins(j) = bb.getInt(); cnts(j) = bb.getLong(); total += cnts(j); j += 1
    }
    (bins, cnts, total)
  }

  /** KS sup-norm between two same-grid sketches, e9-scaled: the exact
    * integer walk of q_ks_test (ExtendedQueries) lifted onto sketch bin
    * counts — D_num = max over the UNION of occupied bins of
    * |cumL*nR - cumR*nL| (the empirical CDF difference only changes at
    * mass points), returned as trunc(D_num * 1e9 / (nL*nR)) via BigInt
    * (the product overflows a long). -1 if either sketch is empty. */
  def ksE9(live: Array[Byte], ref: Array[Byte]): Long = {
    val (lb, lc, nL) = sparse(live)
    val (rb, rc, nR) = sparse(ref)
    if (nL == 0L || nR == 0L) return -1L
    var i = 0; var j = 0
    var cumL = 0L; var cumR = 0L
    var dNum = 0L
    while (i < lb.length || j < rb.length) {
      val bi = if (i < lb.length) lb(i) else Int.MaxValue
      val bj = if (j < rb.length) rb(j) else Int.MaxValue
      if (bi <= bj) { cumL += lc(i); i += 1 }
      if (bj <= bi) { cumR += rc(j); j += 1 }
      val d = math.abs(cumL * nR - cumR * nL) // |sums| <= nL*nR <= 2^62 for corpora < 2^31 rows each
      if (d > dNum) dNum = d
    }
    (BigInt(dNum) * 1000000000L / (BigInt(nL) * nR)).toLong
  }

  /** Jensen-Shannon divergence (nats) between two same-grid sketches,
    * e9-scaled: q_jsd's P43 snap-sum discipline lifted onto sketch bin
    * counts — per occupied union bin, p = lc/nL, q = rc/nR,
    * m = (p+q)/2, t = [lc>0] p*ln(p/m)*0.5 + [rc>0] q*ln(q/m)*0.5 (the
    * exact operation order of ExtendedQueries q_jsd, so zero cells
    * contribute exact 0 and JSD stays finite on disjoint supports);
    * the bin terms are floor-snapped to the 2^43 grid and summed as
    * integers (order-independent), then one BigInt integral division
    * rescales the snap-sum to e9. trunc((sum floor(t*2^43)) * 1e9 /
    * 2^43) — deterministic across partitionings and trigger splits.
    * -1 if either sketch is empty. */
  def jsdE9(live: Array[Byte], ref: Array[Byte]): Long = {
    val (lb, lc, nL) = sparse(live)
    val (rb, rc, nR) = sparse(ref)
    if (nL == 0L || nR == 0L) return -1L
    val P43 = 8796093022208.0
    var snap = 0L // |terms| <= ln2 * 2^43 * nbins — safe in a long
    var i = 0; var j = 0
    while (i < lb.length || j < rb.length) {
      val bi = if (i < lb.length) lb(i) else Int.MaxValue
      val bj = if (j < rb.length) rb(j) else Int.MaxValue
      var cl = 0L; var cr = 0L
      if (bi <= bj) { cl = lc(i); i += 1 }
      if (bj <= bi) { cr = rc(j); j += 1 }
      val p = cl.toDouble / nL
      val q = cr.toDouble / nR
      val m = (p + q) / 2.0
      val t = (if (cl == 0L) 0.0 else p * math.log(p / m)) * 0.5 +
        (if (cr == 0L) 0.0 else q * math.log(q / m)) * 0.5
      snap += math.floor(t * P43).toLong
    }
    (BigInt(snap) * 1000000000L / 8796093022208L).toLong
  }

  /** Wasserstein-1 between two same-grid sketches in BIN units,
    * e9-scaled: q_wasserstein's exact gap-weighted CDF-difference
    * integral on the union grid — W_num = sum over consecutive occupied
    * union bins of |cumL*nR - cumR*nL| * gap, returned as
    * trunc(W_num * 1e9 / (nL*nR)) via BigInt. Multiply by the armed bin
    * width for value units. -1 if either sketch is empty. */
  def w1E9(live: Array[Byte], ref: Array[Byte]): Long = {
    val (lb, lc, nL) = sparse(live)
    val (rb, rc, nR) = sparse(ref)
    if (nL == 0L || nR == 0L) return -1L
    var i = 0; var j = 0
    var cumL = 0L; var cumR = 0L
    var wNum = BigInt(0)
    var prevBin = -1
    while (i < lb.length || j < rb.length) {
      val bi = if (i < lb.length) lb(i) else Int.MaxValue
      val bj = if (j < rb.length) rb(j) else Int.MaxValue
      val b = math.min(bi, bj)
      if (prevBin >= 0 && b > prevBin)
        wNum += BigInt(math.abs(cumL * nR - cumR * nL)) * (b - prevBin)
      if (bi <= bj) { cumL += lc(i); i += 1 }
      if (bj <= bi) { cumR += rc(j); j += 1 }
      prevBin = b
    }
    (wNum * 1000000000L / (BigInt(nL) * nR)).toLong
  }
}

/** `hist_agg(bin, nbins)`: binary histogram sketch of 0-based bin indices
  * (rows outside [0, nbins) are ignored, like null inputs). */
case class HistAgg(
    binExpr: Expression,
    nbins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(binExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hist_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nbins)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val b = binExpr.eval(input)
    if (b != null) {
      val bin = b.asInstanceOf[Long]
      if (bin >= 0L && bin < nbins) buf(bin.toInt) += 1L
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = HistSketchKernels.serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    HistSketchKernels.serialize(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    HistSketchKernels.mergeInto(Array.emptyLongArray, bytes)

  override def withNewMutableAggBufferOffset(o: Int): HistAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HistAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HistAgg =
    copy(binExpr = c(0))
}

/** `hist_merge(sketch)`: re-aggregates binary histogram sketches by count
  * addition — bitwise lossless, so merged partials equal a direct build. */
case class HistMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hist_merge"

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val b = child.eval(input)
    if (b == null) buf
    else HistSketchKernels.mergeInto(buf, b.asInstanceOf[Array[Byte]])
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    if (buf.isEmpty) other
    else if (other.isEmpty) buf
    else {
      // mirror mergeInto's width guard: adding by index up to buf.length
      // would silently DROP the extra bins of a wider partial (and AIOOBE
      // on a narrower one) — a mixed-nbins misuse must fail loudly.
      require(buf.length == other.length,
        s"histogram width mismatch: ${buf.length} vs ${other.length}")
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

  override def eval(buf: Array[Long]): Any = HistSketchKernels.serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    HistSketchKernels.serialize(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    HistSketchKernels.mergeInto(Array.emptyLongArray, bytes)

  override def withNewMutableAggBufferOffset(o: Int): HistMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HistMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HistMergeAgg =
    copy(child = c(0))
}

/** binary x (num, den) -> bigint: the 0-based bin of the num/den quantile
  * under the integer ceil-rank rule; -1 on an empty sketch. Codegen'd via
  * the static kernel, same as the vector expressions. */
case class HistRankBinExpr(left: Expression, right: Expression, den: Long)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "hist_rank_bin"

  override def nullSafeEval(sketch: Any, num: Any): Any =
    HistSketchKernels.rankBin(sketch.asInstanceOf[Array[Byte]],
      num.asInstanceOf[Long], den)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, n) =>
      s"graft.functions.HistSketchKernels.rankBin($s, $n, ${den}L)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): HistRankBinExpr =
    copy(left = l, right = r)
}

/** binary x binary -> bigint: e9-scaled KS sup-norm between two same-grid
  * sketches (live vs armed reference). Codegen'd via the static kernel. */
case class HistKsE9Expr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "hist_ks_e9"

  override def nullSafeEval(live: Any, ref: Any): Any =
    HistSketchKernels.ksE9(live.asInstanceOf[Array[Byte]],
      ref.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.HistSketchKernels.ksE9($l, $r)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): HistKsE9Expr =
    copy(left = l, right = r)
}

/** binary x binary -> bigint: e9-scaled Jensen-Shannon divergence (nats)
  * between two same-grid sketches. Codegen'd via the static kernel. */
case class HistJsdE9Expr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "hist_jsd_e9"

  override def nullSafeEval(live: Any, ref: Any): Any =
    HistSketchKernels.jsdE9(live.asInstanceOf[Array[Byte]],
      ref.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.HistSketchKernels.jsdE9($l, $r)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): HistJsdE9Expr =
    copy(left = l, right = r)
}

/** binary x binary -> bigint: e9-scaled W1 (bin units) between two
  * same-grid sketches. Codegen'd via the static kernel. */
case class HistW1E9Expr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "hist_w1_e9"

  override def nullSafeEval(live: Any, ref: Any): Any =
    HistSketchKernels.w1E9(live.asInstanceOf[Array[Byte]],
      ref.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.HistSketchKernels.w1E9($l, $r)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): HistW1E9Expr =
    copy(left = l, right = r)
}

/** Column wrappers (same bridge style as VectorOps). */
object HistOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.lit
  import org.apache.spark.sql.graft.bridge

  private def c(e: Expression): Column = bridge.column(e)
  private def e(col: Column): Expression = bridge.expression(col)

  def histAgg(bin: Column, nbins: Int): Column =
    c(HistAgg(e(bin), nbins).toAggregateExpression())

  def histMerge(sketch: Column): Column =
    c(HistMergeAgg(e(sketch)).toAggregateExpression())

  def histRankBin(sketch: Column, num: Long, den: Long): Column =
    c(HistRankBinExpr(e(sketch), e(lit(num)), den))

  def histKsE9(live: Column, ref: Column): Column =
    c(HistKsE9Expr(e(live), e(ref)))

  def histW1E9(live: Column, ref: Column): Column =
    c(HistW1E9Expr(e(live), e(ref)))

  def histJsdE9(live: Column, ref: Column): Column =
    c(HistJsdE9Expr(e(live), e(ref)))
}
