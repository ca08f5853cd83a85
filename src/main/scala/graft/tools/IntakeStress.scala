package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Diagnostic: near-dup intake-filter timings at scale (not part of the
  * driver contract — records the `dropCorpusNearDups` serving numbers for
  * ARCHITECTURE). Builds a synthetic corpus of `corpusRows` documents with
  * a planted dup rate, indexes it ONCE (`nearDupIndex`), then times
  * admission of `batchRows`-doc intake batches — the per-micro-batch cost
  * of `Streaming.nearDupNovelStream` — against the in-memory index and
  * against the bucketed-by-`bh` persisted index (the 100 TB layout, where
  * the candidate probe joins bucket-to-bucket instead of shuffling the
  * corpus index).
  *
  * Usage: runMain graft.tools.IntakeStress [corpusRows] [batchRows]
  */
object IntakeStress {
  def main(args: Array[String]): Unit = {
    val corpusRows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val batchRows = args.lift(1).map(_.toLong).getOrElse(10000L)
    val spark = graft.Bench.session()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"INTAKESTRESS $label sec=${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }
    // 12 words per doc, drawn deterministically from a 50k-word vocabulary
    def words(baseId: Column, order: Seq[Int]): Column =
      concat_ws(" ", order.map(i =>
        concat(lit("w"), pmod(xxhash64(baseId * 31 + i), lit(50000)))): _*)
    // every 10th corpus doc reuses doc (id−5)'s words → a realistic,
    // dup-rich index (~10% internal repeats)
    val corpusBase = when(pmod(col("id"), lit(10)) === 0 && col("id") >= 5,
      col("id") - 5).otherwise(col("id"))
    val corpus = spark.range(corpusRows).select(col("id").as("doc_id"),
      words(corpusBase, 0 until 12).as("text")).localCheckpoint(true)
    // intake: even rows novel, odd rows a corpus doc's words REORDERED
    // (word-set Jaccard 1.0 → must be dropped)
    val intake = spark.range(batchRows).select(
      (col("id") + corpusRows * 2).as("doc_id"),
      when(pmod(col("id"), lit(2)) === 0,
        words(col("id") + corpusRows * 2, 0 until 12))
        .otherwise(words(pmod(col("id"), lit(corpusRows)), 11 to 0 by -1))
        .as("text")).localCheckpoint(true)

    val (idxB, idxW) = graft.pipeline.TextDedup.nearDupIndex(corpus, "doc_id", "text")
    val (bm, wm) = time("index_build_materialize") {
      val b = idxB.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val w = idxW.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      b.count(); w.count(); (b, w)
    }
    def admit(b: DataFrame, w: DataFrame, label: String): Unit = {
      val admitted = time(label)(graft.pipeline.TextDedup
        .dropCorpusNearDups(intake, "doc_id", "text", b, w).count())
      println(s"INTAKESTRESS ${label}_admitted=$admitted of $batchRows")
    }
    admit(bm, wm, "admit_inmemory_cold")
    admit(bm, wm, "admit_inmemory_warm")

    // the persisted layout: bands bucketed by bh (the probe key), words a
    // plain table — what a serving deployment reads every micro-batch
    spark.sql("DROP TABLE IF EXISTS intake_idx_bands")
    spark.sql("DROP TABLE IF EXISTS intake_idx_words")
    time("index_persist_bucketed") {
      bm.write.mode("overwrite").bucketBy(64, "bh").sortBy("bh")
        .format("parquet").saveAsTable("intake_idx_bands")
      wm.write.mode("overwrite").format("parquet").saveAsTable("intake_idx_words")
    }
    bm.unpersist(true); wm.unpersist(true)
    val (bt, wt) = (spark.table("intake_idx_bands"), spark.table("intake_idx_words"))
    admit(bt, wt, "admit_bucketed_cold")
    admit(bt, wt, "admit_bucketed_warm")
    spark.stop()
  }
}
