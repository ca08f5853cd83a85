package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * stratified sampling (language/source mixing) and per-stratum quality
  * selection. Both are single-pass shapes — the sampler is a pure codegen'd
  * filter (no shuffle, no RNG state), the selector one window shuffle on the
  * stratum key — so they scale linearly with corpus size.
  */
object Curation {

  /** Deterministic stratified sampling: a row is kept iff the first 4 hex
    * digits of `md5(id + ":" + salt)` fall lexicographically below the
    * stratum's threshold, `floor(rate · 65536)` as zero-padded lowercase hex
    * (rate ≥ 1.0 → "g", which every hex digit sorts below → keep all; rate
    * granularity 1/65536). No RNG state and no shuffle: the same
    * (id, salt, rates) selects the same subset at any cluster size or
    * partitioning — reproducible training mixes, re-runnable incrementally.
    * Changing `salt` draws an independent sample.
    *
    * Rates are per stratum VALUE (e.g. "en" -> 1.0, "zh" -> 0.25);
    * unlisted strata use `defaultRate`.
    */
  def sampleStratified(df: DataFrame, idCol: Column, stratumCol: Column,
      rates: Map[String, Double], defaultRate: Double, salt: String): DataFrame = {
    def thr(r: Double): String =
      if (r >= 1.0) "g" else f"${math.max(0.0, math.floor(r * 65536)).toInt}%04x"
    val thrCol = rates.foldLeft(lit(thr(defaultRate))) { case (acc, (k, r)) =>
      when(stratumCol === k, lit(thr(r))).otherwise(acc)
    }
    df.filter(substring(md5(concat(idCol.cast("string"), lit(":" + salt))), 1, 4) < thrCol)
  }

  /** Per-stratum quality selection: the k best rows of each stratum by
    * `scoreCol`, ties broken by id for determinism. One shuffle on the
    * stratum key; with a bounded stratum count and k, AQE handles skew and
    * the window never materializes more than a partition.
    *
    * Output contract: the result carries a `rank` column (1 = best in
    * stratum). The input must not already have one — silently overwriting a
    * caller's column would corrupt it, so that is rejected loudly.
    */
  def topKPerStratum(df: DataFrame, idCol: Column, stratumCol: Column,
      scoreCol: Column, k: Int): DataFrame = {
    require(!df.columns.contains("rank"),
      "topKPerStratum emits a `rank` output column; rename the input's `rank` first")
    val w = Window.partitionBy(stratumCol).orderBy(scoreCol.desc, idCol.asc)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
