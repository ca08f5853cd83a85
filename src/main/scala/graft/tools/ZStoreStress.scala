package graft.tools

import graft.pipeline.Layout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Diagnostic: INCREMENTAL z-store maintenance cost at scale (not part of
  * the driver contract — records the touched-range-only numbers for
  * ARCHITECTURE). Builds a z-ordered manifest store over `rows` synthetic
  * facts, then times three maintenance shapes:
  *
  *   1. a z-CONFINED append (both keys in a small range — the
  *      time-correlated intake case): must re-cluster only the files
  *      whose z-range the batch touches;
  *   2. a SCATTERED append (uniform keys): honestly approaches a full
  *      rewrite — the shape the confined path exists to avoid;
  *   3. the FULL re-layout of the grown table — the cost every append
  *      would pay without the manifest.
  *
  * Usage: runMain graft.tools.ZStoreStress [rows] [batch]
  */
object ZStoreStress {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val batch = args.lift(1).map(_.toLong).getOrElse(100000L)
    val spark = graft.Bench.session()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"ZSTORESTRESS $label sec=${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }
    def frame(n: Long, offset: Long): DataFrame =
      spark.range(offset, offset + n).select(col("id"),
        pmod(hash(col("id")), lit(1024)).cast("long").as("a"),
        pmod(hash(col("id") * 3), lit(1024)).cast("long").as("b"),
        (col("id") % 97).cast("double").as("value"))
    val zc = Seq(col("a"), col("b"))
    val dir = java.nio.file.Files.createTempDirectory("zstorestress").toString

    val base = frame(rows, 0)
    time(s"build_${rows}")(Layout.zorderWrite(spark, dir, base, zc,
      bits = 10, numFiles = 64))

    // 1. confined batch: a, b < 32 → z < 1024 of ~2^20 — the tail-files case
    val confined = frame(batch, rows)
      .withColumn("a", col("a") % 32).withColumn("b", col("b") % 32)
    val st1 = time(s"append_confined_$batch")(
      Layout.zorderAppend(spark, dir, confined, zc, bits = 10))
    println(s"ZSTORESTRESS confined rewritten=${st1.rewrittenFiles.size} " +
      s"untouched=${st1.untouchedFiles.size} new=${st1.newFiles.size}")

    // 2. scattered batch: uniform keys — touches nearly every file
    val scattered = frame(batch, rows + batch)
    val st2 = time(s"append_scattered_$batch")(
      Layout.zorderAppend(spark, dir, scattered, zc, bits = 10))
    println(s"ZSTORESTRESS scattered rewritten=${st2.rewrittenFiles.size} " +
      s"untouched=${st2.untouchedFiles.size} new=${st2.newFiles.size}")

    // 3. the cost incremental maintenance avoids: full re-layout of the
    // grown table into a fresh store
    val dir2 = java.nio.file.Files.createTempDirectory("zstorestress2").toString
    val grown = Layout.zorderRead(spark, dir).drop("__z")
    time("full_relayout")(Layout.zorderWrite(spark, dir2, grown, zc,
      bits = 10, numFiles = 64))

    val total = Layout.zorderRead(spark, dir).count()
    println(s"ZSTORESTRESS rows_final=$total expected=${rows + 2 * batch}")
    spark.stop()
  }
}
