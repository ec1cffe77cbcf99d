package graft.ops

import graft.{Q, Tables}
import graft.functions.LayoutOps
import org.apache.spark.sql.functions._

/** Data-layout operators: the write-side lever that decides how much a
  * 100 TB table's reads can SKIP. Sorting/bucketing by one column makes
  * that column's file-level min/max ranges tight and every other
  * column's ranges full-width; a z-order (Morton) curve interleaves the
  * bits of two columns so a contiguous range of the curve is a small
  * axis-aligned rectangle — BOTH dimensions get usably tight file
  * ranges, which is what lets a scan prune files for point/range
  * predicates on either column (the clustering strategy behind
  * multi-dimensional data skipping in modern lakehouse formats).
  *
  * q_zorder_layout measures exactly that trade on orders
  * (o_custkey x o_orderdate): normalize both dims to a 16-bit grid with
  * exact integer math, assign each row to a "file" three ways — date
  * prefix, custkey prefix, z-value prefix (256 files each) — and sum
  * per-file (max - min + 1) ranges per dimension. The sum IS the
  * expected number of grid cells a uniformly-placed point predicate
  * scans (scan amplification): the linear layouts are near-perfect on
  * their own column and full-width on the other; z-order is within ~16x
  * of perfect on BOTH (vs 256x-full-width), so its worst-dimension sum
  * is an order of magnitude under either linear layout's.
  *
  * Scale shape: one pass — the 1-row min/max bounds broadcast, the
  * normalize + interleave are narrow codegen'd projections, stack
  * triples rows (3 layouts) before ONE groupBy shuffle whose output is
  * at most 3 x 256 file rows. At 100 TB the same plan holds: bounds
  * from table stats, per-file aggregation over the z-prefix, no global
  * sort anywhere (fixed-width z-range cells, not fixed-count files —
  * the same contract as a z-ordered writer's file split points).
  */
object LayoutQueries {

  /** Grid bits per dimension (16 -> 32-bit z-values). */
  final val GridBits = 16

  /** File-prefix bits: top 8 z-bits -> 256 z-cells (a 16x16 grid);
    * the linear layouts shift (GridBits - 8) for the same file count. */
  final val FilePrefixBits = 8

  val all: Seq[Q] = Seq(
    Q("q_zorder_layout",
      (s, d) => {
        val o = Tables.orders(s, d)
        val b = o.agg(
          min("o_custkey").as("minc"), max("o_custkey").as("maxc"),
          min("o_orderdate").as("mind"), max("o_orderdate").as("maxd"))
        // Exact-integer grid normalization: ((v - min) * 2^16) div span.
        // All terms non-negative and < 2^40 => identical BIGINT division
        // on both engines (DuckDB // in the oracle).
        val n = o.crossJoin(broadcast(b)).select(
          expr(s"((o_custkey - minc) * ${1 << GridBits}) div (maxc - minc + 1)")
            .as("xc"),
          expr(s"(cast(datediff(o_orderdate, mind) as bigint) * ${1 << GridBits}) " +
            "div (cast(datediff(maxd, mind) as bigint) + 1)").as("xd"))
        val z = n.withColumn("zval",
          LayoutOps.zorder2(col("xc"), col("xd"), GridBits))
        val linShift = GridBits - FilePrefixBits
        val zShift = 2 * GridBits - FilePrefixBits
        val f = z.select(
          expr(s"stack(3, 'cust', shiftright(xc, $linShift), " +
            s"'date', shiftright(xd, $linShift), " +
            s"'zorder', shiftright(zval, $zShift)) as (layout, f)"),
          col("xc"), col("xd"))
        val pf = f.groupBy("layout", "f").agg(
          min("xc").as("mic"), max("xc").as("mac"),
          min("xd").as("mid"), max("xd").as("mad"),
          count(lit(1)).as("c"))
        pf.groupBy("layout").agg(
            count(lit(1)).as("n_files"),
            sum("c").as("n_rows"),
            sum(col("mac") - col("mic") + 1).as("sum_cust_range"),
            sum(col("mad") - col("mid") + 1).as("sum_date_range"))
          .orderBy("layout")
      },
      Some {
        val g = 1 << GridBits
        val linShift = GridBits - FilePrefixBits
        val zShift = 2 * GridBits - FilePrefixBits
        s"""WITH b AS (
           |  SELECT min(o_custkey) AS minc, max(o_custkey) AS maxc,
           |         min(o_orderdate) AS mind, max(o_orderdate) AS maxd
           |  FROM orders),
           |n AS (
           |  SELECT ((o_custkey - b.minc) * $g) // (b.maxc - b.minc + 1) AS xc,
           |         (date_diff('day', b.mind, o_orderdate) * $g) //
           |           (date_diff('day', b.mind, b.maxd) + 1) AS xd
           |  FROM orders, b),
           |z AS (
           |  SELECT xc, xd,
           |    (SELECT CAST(sum(
           |       (((xc >> CAST(i AS INT)) & 1) << CAST(2*i AS INT)) |
           |       (((xd >> CAST(i AS INT)) & 1) << CAST(2*i+1 AS INT))) AS BIGINT)
           |     FROM generate_series(0, ${GridBits - 1}) t(i)) AS zval
           |  FROM n),
           |f AS (
           |  SELECT 'cust' AS layout, xc >> $linShift AS f, xc, xd FROM z
           |  UNION ALL SELECT 'date', xd >> $linShift, xc, xd FROM z
           |  UNION ALL SELECT 'zorder', zval >> $zShift, xc, xd FROM z),
           |pf AS (
           |  SELECT layout, f, min(xc) AS mic, max(xc) AS mac,
           |         min(xd) AS mid, max(xd) AS mad, count(*) AS c
           |  FROM f GROUP BY layout, f)
           |SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
           |  CAST(sum(c) AS BIGINT) AS n_rows,
           |  CAST(sum(mac - mic + 1) AS BIGINT) AS sum_cust_range,
           |  CAST(sum(mad - mid + 1) AS BIGINT) AS sum_date_range
           |FROM pf GROUP BY layout ORDER BY layout""".stripMargin
      })
  )
}
