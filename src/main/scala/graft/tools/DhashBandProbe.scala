package graft.tools

import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Fixture-independence probe for the perceptual-hash tier: the dHash
  * band equi-join's candidate volume is VOCABULARY-inflated on the text
  * fixtures (byte-sum luminance profiles collide more than real-image
  * grids do — r11 finding: 214 candidates at 500 docs, ~20k at 5000), and
  * that inflation is quadratic-shaped (cand/doc^2 roughly constant). This
  * probe tracks cand/doc^2 per SF so a fixture change that quietly
  * explodes the band join gets caught LOUDLY instead of surfacing as an
  * unexplained q_image_neardup/q_media_funnel slowdown.
  *
  * The assert bound (cand/doc^2 <= 3e-3) is ~3.5x the measured fixture
  * plateau (~8.5e-4): a real-image corpus sits far below it, and
  * anything above it means the 3x21-bit banding has lost its pruning
  * power for the current payload distribution — redesign (more bands,
  * wider band bits, or a pre-filter) before trusting the tier's bench
  * numbers. Emits one SCALE.md-style row per fixture.
  */
object DhashBandProbe {

  private val Bound = 3e-3

  def main(args: Array[String]): Unit = {
    val spark = Sessions.fromEnv("8", appName = "dhash-band-probe")
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
    try {
      sfs.foreach { d =>
        val nDocs = Tables.documents(spark, d)
          .filter(octet_length(col("text")) >= 64).count()
        val cand = graft.ops.MultimodalQueries.dhashCandidates(spark, d)
        val nCand = cand.count()
        val nConfirmed = cand
          .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= 4).count()
        val ratio = nCand.toDouble / (nDocs.toDouble * nDocs)
        println(f"DHASH_BAND sf=$d docs=$nDocs candidates=$nCand " +
          f"confirmed=$nConfirmed cand_per_doc2=$ratio%.2e")
        assert(ratio <= Bound,
          f"dHash band join blew up: cand/doc^2 = $ratio%.2e > $Bound%.0e " +
            s"at $d ($nCand candidates for $nDocs docs) — the banding no " +
            "longer prunes on this payload distribution; add bands/widen " +
            "band bits or pre-filter before trusting the perceptual tier")
      }
    } finally spark.stop()
  }
}
