package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering so parquet
  * min/max footer stats prune on EVERY interleaved dimension, not just the
  * leading sort key of a lexicographic layout.
  *
  * Why this matters at 100 TB: a corpus range-partitioned on one key
  * answers that key's predicates with file skipping but full-scans on all
  * others. Interleaving the key bits makes each range-partitioned file
  * cover a small hyper-rectangle of the key space, so `col_i BETWEEN …`
  * prunes files for EVERY participating column — the layout trick behind
  * Delta/Iceberg `ZORDER BY`, built here from codegen'd builtins only
  * (`shiftright`/`bitwiseAND`/`shiftleft`/`bitwiseOR` unrolled at plan
  * build — no UDF, no custom expression needed).
  *
  * ≙ reference has no storage-layout control (its facts live in an
  * in-memory dict); this extends the training-data suite (SURVEY §2.16)
  * on the bucketed/partitioned-backing axis (`sources/FactSources`).
  */
object Layout {

  /** Morton code: interleave the low `bits` bits of each (non-negative,
    * integral) column — bit `i` of column `j` lands at position
    * `i * cols.size + j`. Caller quantizes doubles/strings to integer
    * ranks first (floor, bucket id, dictionary rank). Total
    * `bits * cols.size` must fit a signed long. Values above `2^bits - 1`
    * are masked (high bits ignored) — size `bits` to the real domain.
    */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits * dims must fit a signed long, got $bits * ${cols.size}")
    val d = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * d + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** The same Morton code as ANSI SQL over the given column expressions —
    * kept next to [[zValue]] so engine and oracle interleave identically
    * by construction.
    */
  def zValueSql(cols: Seq[String], bits: Int = 16): String = {
    val d = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield s"((($c >> $i) & 1) << ${i * d + j})"
    terms.mkString(" | ")
  }

  /** Z-order the frame for writing: range-partition on the Morton code
    * into `numFiles` output splits and sort within each, so every written
    * file covers a contiguous z-range = a small hyper-rectangle in the
    * original key space. One shuffle (the range exchange samples bounds
    * itself); append `.write` downstream. The `__z` column is retained so
    * writers can also PARTITION BY a z prefix if directory-level pruning
    * is wanted on top of footer stats.
    */
  def zorderLayout(df: DataFrame, cols: Seq[Column], bits: Int = 16,
      numFiles: Int = 0): DataFrame = {
    val withZ = df.withColumn("__z", zValue(cols, bits))
    val parted =
      if (numFiles > 0) withZ.repartitionByRange(numFiles, col("__z"))
      else withZ.repartitionByRange(col("__z"))
    parted.sortWithinPartitions(col("__z"))
  }
}
