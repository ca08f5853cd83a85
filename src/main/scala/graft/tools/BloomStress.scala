package graft.tools

import org.apache.spark.sql.functions._

/** Diagnostic: the decontamination crossover (not part of the driver
  * contract — records the measured evidence for ARCHITECTURE).
  *
  * The gate-scale A/B showed the Bloom path LOSING to the broadcast-exact
  * path at a tiny eval set (2.4 s vs 2.0 s at sf0.1) — this tool measures
  * the regime the operator is built for: a synthetic 1e6-doc corpus with
  * an eval set of 20% of it (~5M distinct shingles — far past comfortable
  * broadcast), timing [[graft.pipeline.TextDedup.decontaminate]] (exact
  * join) against [[graft.pipeline.TextDedup.decontaminateBloom]] (scan
  * probe + sliver join). Purged counts must agree — same operator, two
  * plans. Local[32] shuffles through memory, so the join saving
  * UNDERSTATES the cluster case where the avoided shuffle is network.
  *
  * Usage: runMain graft.tools.BloomStress [docs]
  */
object BloomStress {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = graft.Bench.session()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"BLOOMSTRESS $label sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }
    // 30 pseudo-random words per doc from a 200k vocab — ~28 trigram
    // shingles per doc, essentially all distinct across docs
    val corpus = spark.range(nDocs).select(col("id"),
      concat_ws(" ", transform(sequence(lit(0), lit(29)), i =>
        format_string("w%07d",
          pmod(xxhash64(col("id"), i), lit(200000L))))).as("text"))
      .localCheckpoint(true) // generation cost out of both measurements
    val evalDf = corpus.filter(col("id") % 5 === 0).select(col("text"))
    val exact = time("exact_broadcast_join")(
      graft.pipeline.TextDedup.decontaminate(
        corpus, "id", "text", evalDf, "text").count())
    val bloom = time("bloom_prefilter")(
      graft.pipeline.TextDedup.decontaminateBloom(
        corpus, "id", "text", evalDf, "text",
        expectedEvalShingles = 8L * 1024 * 1024).count())
    println(s"BLOOMSTRESS survivors exact=$exact bloom=$bloom agree=${exact == bloom}")
    spark.stop()
  }
}
