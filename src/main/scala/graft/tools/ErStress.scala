package graft.tools

import org.apache.spark.sql.functions._

/** Diagnostic: fuzzy entity resolution one order up (not part of the
  * driver contract — records the measured evidence for ARCHITECTURE).
  *
  * Generates `rows` synthetic entity names, corrupts one character of
  * each deterministically, and times (a) the direct [[graft.pipeline
  * .EntityResolution.fuzzyJoin]] at k=1 and (b) the production split —
  * [[graft.pipeline.EntityResolution.variantIndex]] built once and an
  * intake batch matched against it — plus the match count, so the
  * deletion-neighborhood shapes carry measured numbers at 1e6 names
  * (19M variant rows per side), not just the 15k-row gate scale.
  *
  * Usage: runMain graft.tools.ErStress [rows]
  */
object ErStress {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = graft.Bench.session()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"ERSTRESS $label sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }
    val clean = spark.range(rows).select(col("id"),
      format_string("Entity#%09d", col("id")).as("nm"))
    val p = lit(1) + col("id") % length(col("nm"))
    val dirty = clean.select((col("id") + 100000000L).as("did"),
      concat(substr(col("nm"), lit(1), p - 1), lit("x"),
        substr(col("nm"), p + 1, length(col("nm")))).as("dnm"))
    val n1 = time("fuzzy_join_direct")(
      graft.pipeline.EntityResolution.fuzzyJoin(
        clean, "id", "nm", dirty, "did", "dnm", 1).count())
    println(s"ERSTRESS direct_matches=$n1")
    val dir = java.nio.file.Files.createTempDirectory("erstress").toString
    time("variant_index_build_persist")(
      graft.pipeline.EntityResolution.variantIndex(clean, "id", "nm")
        .write.parquet(s"$dir/idx"))
    val idx = spark.read.parquet(s"$dir/idx")
    val n2 = time("match_against_persisted_index")(
      graft.pipeline.EntityResolution.matchAgainstIndex(
        dirty, "did", "dnm", idx, "id", 1).count())
    println(s"ERSTRESS indexed_matches=$n2")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
