package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.bridge

/** Column-level text-fingerprint API backed by codegen'd expressions
  * (TextExpressions.scala). */
object TextOps {

  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    bridge.column(e)
  private def e(col: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    bridge.expression(col)

  /** array<string> -> bigint: 32-bit SimHash (md5 bit votes, one pass). */
  def simhash32(toks: Column): Column = c(SimHash32Expr(e(toks)))

  /** array<string> -> array<string>: distinct word-trigram shingles. */
  def shingle3(toks: Column): Column = c(Shingle3Expr(e(toks)))

  /** array<string> -> array<bigint>: 60-bit k-gram hashes, all positions
    * in order (== transform(sequence(0, n-k), i -> md5Prefix60(gram_i))). */
  def gramHashes(toks: Column, k: Int): Column =
    c(GramHashExpr(e(toks), k, distinct = false))

  /** array<string> -> array<bigint>: DISTINCT 60-bit k-gram hashes,
    * first-occurrence order (== array_distinct of gramHashes). */
  def gramHashesDistinct(toks: Column, k: Int): Column =
    c(GramHashExpr(e(toks), k, distinct = true))

  /** array<string> -> array<string>: all-position space-joined k-grams. */
  def grams(toks: Column, k: Int): Column = c(GramsExpr(e(toks), k))

  /** array<string> -> string: md5 hex of the sorted-distinct token SET
    * (order-insensitive document fingerprint). */
  def setFp(toks: Column): Column = c(SetFpExpr(e(toks)))

  /** array<string> -> array<bigint>: per-literal-term occurrence counts
    * (one pass; element i counts terms(i)). */
  def termCounts(toks: Column, terms: Seq[String]): Column =
    c(TermCountsExpr(e(toks), terms))

  /** string -> bigint: first 60 bits of md5, ==
    * conv(substring(md5(s),1,15),16,10) — a compact long shuffle key. */
  def md5Prefix60(s: Column): Column = c(Md5Prefix60Expr(e(s)))

  /** binary -> bigint: 63-bit linearized dHash over the byte-slice
    * luminance grid (perceptual near-dup fingerprint — MediaKernels). */
  def dhash63(payload: Column): Column = c(DHash63Expr(e(payload)))

  /** array<string> -> array<bigint> [top2, n2, dup3, n3]: one-pass token
    * repetition statistics (Gopher-style repetition quality signals). */
  def repStats(toks: Column): Column = c(RepStatsExpr(e(toks)))

  /** binary -> array<bigint>: per-block unsigned-byte sums over `blocks`
    * equal slices — the per-frame profile of the scene-cut detector. */
  def blockSums(payload: Column, blocks: Int): Column =
    c(BlockSumsExpr(e(payload), blocks))

  /** (array<bigint>, array<bigint>) -> bigint exact L1 distance. */
  def l1Dist(a: Column, b: Column): Column = c(L1DistExpr(e(a), e(b)))

  /** binary -> array<bigint> [sl, ss]: fused sum / sum-of-squares of the
    * 64-cell luminance grid — the image-quality contrast statistic. */
  def gridStats(payload: Column): Column = c(GridStatsExpr(e(payload)))

  /** binary -> array<bigint>: per-frame centered squared-sample energies
    * over consecutive full `frameLen`-byte frames (VAD-lite feature). */
  def frameEnergies(payload: Column, frameLen: Int, center: Int): Column =
    c(FrameEnergiesExpr(e(payload), frameLen, center))

  /** bigint -> boolean: probe a (broadcast-sized) Bloom filter — the
    * codegen'd membership scan for sketch-side decontamination/blocklists. */
  def bloomMightContain(key: Column,
      filter: org.apache.spark.util.sketch.BloomFilter): Column =
    c(BloomMightContainExpr(e(key), filter))
}
