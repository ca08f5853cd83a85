package graft.tools

import graft.pipeline.TextDedup
import org.apache.spark.sql.functions._

/** Diagnostic: variable-length exact-substring dedup at scale (not part
  * of the driver contract — records the k-gram-tiling numbers for
  * ARCHITECTURE). Synthesizes `docs` documents of ~100 zipfy words where
  * every 7th document embeds a verbatim span copied from a donor
  * template (variable length 8–40 words), then times [[TextDedup
  * .duplicateRuns]] (detection) and [[TextDedup.dedupSubstrings]]
  * (purge + reassembly) and sanity-checks that planted spans are found.
  *
  * Usage: runMain graft.tools.SubstringStress [docs]
  */
object SubstringStress {
  def main(args: Array[String]): Unit = {
    val docs = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = graft.Bench.session()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SUBSTRINGSTRESS $label sec=${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }
    // ~100 zipfy words per doc (word w_(h%4096) with square-skew), plus a
    // planted verbatim span: every 7th doc appends words [0, len) of the
    // SHARED template where len = 8 + doc_id % 33 — variable-length
    // repeats with thousands of copies per length class
    val template = (0 until 40).map(i => s"t$i")
    val body = transform(sequence(lit(0), lit(99)),
      i => concat(lit("w"), pmod(hash(col("id") * 131 + i), lit(64))
        * pmod(hash(col("id") * 31 + i), lit(64))))
    val planted = when(col("id") % 7 === 0,
      concat(lit(" "), array_join(slice(
        array(template.map(lit): _*), lit(1), (col("id") % 33 + 8).cast("int")), " ")))
      .otherwise(lit(""))
    val corpus = spark.range(docs).select(col("id").as("doc_id"),
      concat(array_join(body, " "), planted).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"SUBSTRINGSTRESS corpus=${corpus.count()} docs")

    // warmup: the first heavy codegen'd query rides the JIT slope (first
    // cold run measured ~8x its steady state) — burn it untimed
    TextDedup.dedupSubstrings(corpus, "doc_id", "text", minWords = 5).count()
    // NOT persisted: caching compiles the plan with AQE off, which demotes
    // the grams⋈canon broadcast to a full sort-merge of the gram stream —
    // measured 6× slower; the aggregate below collects both counts at once
    val runs = TextDedup.duplicateRuns(corpus, "doc_id", "text", minWords = 5)
    val (nRuns, planted7) = time("duplicate_runs") {
      val r = runs.agg(count(lit(1)),
        count(when(col("doc_id") % 7 === 0, 1))).head()
      (r.getLong(0), r.getLong(1))
    }
    println(s"SUBSTRINGSTRESS runs=$nRuns on_planted_docs=$planted7")
    require(planted7 >= docs / 7 / 2,
      "most planted docs must carry a detected run")

    val cleaned = TextDedup.dedupSubstrings(corpus, "doc_id", "text", minWords = 5)
    val nClean = time("dedup_substrings_recompute")(cleaned.count())
    println(s"SUBSTRINGSTRESS cleaned_docs=$nClean")
    // the production split: detection once (persisted), purge from the
    // precomputed runs — the purge pass alone is word-explode + anti-join
    val runsP = runs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    runsP.count()
    val nClean2 = time("dedup_substrings_from_runs")(
      TextDedup.dedupSubstringsWithRuns(corpus, "doc_id", "text", runsP).count())
    println(s"SUBSTRINGSTRESS cleaned_docs_from_runs=$nClean2")
    spark.stop()
  }
}
