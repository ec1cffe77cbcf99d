package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text-fingerprint expressions (see TextKernels): stay inside
  * WholeStageCodegen, replacing interpreted higher-order-function folds. */

private[functions] object TextTypeCheck {
  def stringArray(e: Expression, fn: String): TypeCheckResult = e.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn requires array<string>, got ${other.catalogString}")
  }
  def string(e: Expression, fn: String): TypeCheckResult = e.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn requires string, got ${other.catalogString}")
  }
}

/** array<string> -> bigint: 32-bit SimHash of a token set (md5 bit votes). */
case class SimHash32Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextTypeCheck.stringArray(child, prettyName)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash32"

  override def nullSafeEval(v: Any): Any =
    TextKernels.simhash32(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simhash32($c)")

  override protected def withNewChildInternal(c: Expression): SimHash32Expr =
    copy(child = c)
}

/** array<string> -> array<string>: distinct word-trigram shingles, first-
  * occurrence order (the codegen twin of array_distinct(transform(
  * sequence(...), concat_ws))) — see TextKernels.shingle3). */
case class Shingle3Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextTypeCheck.stringArray(child, prettyName)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle3"

  override def nullSafeEval(v: Any): Any =
    TextKernels.shingle3(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.shingle3($c)")

  override protected def withNewChildInternal(c: Expression): Shingle3Expr =
    copy(child = c)
}

/** array<string> -> array<bigint>: 60-bit md5 k-gram hashes — the codegen
  * twin of `transform(sequence(0, n-k), i -> md5_prefix60(concat_ws(' ',
  * t[i+1..i+k])))`, optionally wrapped in array_distinct (dedup BY HASH,
  * first-occurrence order). The parametric generalization of the
  * Shingle3Expr repair to every corpus-wide gram builder (decontamination
  * 8-grams, prefix-join 5-grams, DSIR/substring-dedup grams). */
case class GramHashExpr(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression {
  require(k >= 1, s"gram width must be >= 1, got $k")
  override def checkInputDataTypes(): TypeCheckResult =
    TextTypeCheck.stringArray(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String =
    if (distinct) s"gram_hash${k}_distinct" else s"gram_hash$k"

  override def nullSafeEval(v: Any): Any =
    TextKernels.gramHash(v.asInstanceOf[ArrayData], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.gramHash($c, $k, $distinct)")

  override protected def withNewChildInternal(c: Expression): GramHashExpr =
    copy(child = c)
}

/** array<string> -> array<string>: all-position space-joined k-grams — the
  * codegen twin of `transform(sequence(0, n-k), i -> concat_ws(' ',
  * t[i+1..i+k]))`, for consumers whose OUTPUT is the gram text. */
case class GramsExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"gram width must be >= 1, got $k")
  override def checkInputDataTypes(): TypeCheckResult =
    TextTypeCheck.stringArray(child, prettyName)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"grams$k"

  override def nullSafeEval(v: Any): Any =
    TextKernels.grams(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.grams($c, $k)")

  override protected def withNewChildInternal(c: Expression): GramsExpr =
    copy(child = c)
}

/** array<string> -> array<bigint>: occurrence count of each literal term
  * (element i == size(filter(t, x -> x = terms(i)))) — one pass over the
  * token array instead of k interpreted ArrayFilter projections. */
case class TermCountsExpr(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  require(terms.nonEmpty, "termCounts requires at least one term")
  override def checkInputDataTypes(): TypeCheckResult =
    TextTypeCheck.stringArray(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"term_counts${terms.size}"

  @transient private lazy val termU8: Array[UTF8String] =
    terms.map(UTF8String.fromString).toArray

  override def nullSafeEval(v: Any): Any =
    TextKernels.termCounts(v.asInstanceOf[ArrayData], termU8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("terms", termU8,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.termCounts($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): TermCountsExpr =
    copy(child = c)
}

/** array<string> -> string: md5 hex of the space-joined sorted-distinct
  * token SET — the codegen twin of md5(concat_ws(' ',
  * array_sort(array_distinct(t)))), the order-insensitive document
  * fingerprint (set-semantics dedup). */
case class SetFpExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextTypeCheck.stringArray(child, prettyName)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "set_fp"

  override def nullSafeEval(v: Any): Any =
    TextKernels.setFp(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.setFp($c)")

  override protected def withNewChildInternal(c: Expression): SetFpExpr =
    copy(child = c)
}

/** string -> bigint: first 60 bits of md5 (compact shuffle key). */
case class Md5Prefix60Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextTypeCheck.string(child, prettyName)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_prefix60"

  override def nullSafeEval(v: Any): Any =
    TextKernels.md5Prefix60(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.md5Prefix60($c)")

  override protected def withNewChildInternal(c: Expression): Md5Prefix60Expr =
    copy(child = c)
}

/** array<string> -> array<bigint> [top2, n2, dup3, n3]: token-level
  * repetition statistics (modal-2-gram count, duplicated-3-gram position
  * count — see TextKernels.repStats). Map-side per-row metrics: the whole
  * repetition-quality gate needs zero shuffles before its final tiny
  * per-language aggregate. */
case class RepStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextTypeCheck.stringArray(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rep_stats"

  override def nullSafeEval(v: Any): Any =
    TextKernels.repStats(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.repStats($c)")

  override protected def withNewChildInternal(c: Expression): RepStatsExpr =
    copy(child = c)
}

/** bigint -> boolean: membership probe against a Bloom filter baked in as
  * a reference object (Spark's own org.apache.spark.util.sketch
  * BloomFilter — the engine-native mergeable set sketch, same family the
  * optimizer injects as runtime join filters). No false negatives;
  * false-positive rate set at build time. Codegen'd so the probe stays
  * inside WholeStageCodegen — the broadcast-sketch scan pattern. */
case class BloomMightContainExpr(child: Expression,
    filter: org.apache.spark.util.sketch.BloomFilter)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${other.catalogString}")
  }
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", filter,
      "org.apache.spark.util.sketch.BloomFilter")
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContainExpr =
    copy(child = c)
}
