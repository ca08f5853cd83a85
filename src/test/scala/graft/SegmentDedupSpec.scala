package graft

import graft.pipeline.TextDedup
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-window segment operators: segmentation shape, corpus-wide
  * keep-first segment dedup ([[TextDedup.dedupSegments]]) and
  * frequency-threshold boilerplate scrub ([[TextDedup.scrubBoilerplate]]),
  * against hand-computed fixtures.
  */
class SegmentDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def segMap(rows: Seq[(Long, String)], segWords: Int) =
    TextDedup.segments(rows.toDF("doc_id", "text"), "doc_id", "text", segWords)
      .as[(Long, Int, String)].collect().toSeq.sorted

  test("segmentation: fixed windows, short tail, single-word doc") {
    assert(segMap(Seq((1L, "a b c d e")), 2) ==
      Seq((1L, 0, "a b"), (1L, 1, "c d"), (1L, 2, "e")))
    assert(segMap(Seq((2L, "solo")), 3) == Seq((2L, 0, "solo")))
  }

  test("dedupSegments keeps first occurrence corpus-wide and in-doc") {
    val docs = Seq(
      (1L, "a b c d e f"), // keeps everything (first owner of "a b", "c d")
      (2L, "a b c d x y"), // "a b"/"c d" are later dups -> only "x y" left
      (3L, "p q p q"),     // in-doc repeat -> second "p q" removed
      (4L, "a b c d")      // every segment a later dup -> doc dropped
    ).toDF("doc_id", "text")
    val out = TextDedup.dedupSegments(docs, "doc_id", "text", segWords = 2)
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a b c d e f", 2L -> "x y", 3L -> "p q"))
  }

  test("scrubBoilerplate drops every occurrence above maxFreq") {
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d x y"),
      (3L, "a b z z")
    ).toDF("doc_id", "text")
    // segWords=2, maxFreq=2: "a b" occurs 3x -> scrubbed everywhere;
    // "c d" occurs 2x -> kept (threshold is strict >)
    val out = TextDedup.scrubBoilerplate(docs, "doc_id", "text",
      segWords = 2, maxFreq = 2)
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "c d e f", 2L -> "c d x y", 3L -> "z z"))
    // maxFreq=1: "c d" goes too; doc whose text was all boilerplate drops
    val strict = TextDedup.scrubBoilerplate(docs, "doc_id", "text",
      segWords = 2, maxFreq = 1)
      .as[(Long, String)].collect().toMap
    assert(strict == Map(1L -> "e f", 2L -> "x y", 3L -> "z z"))
  }

  test("reassembly order is segment order even with many segments") {
    // 40 distinct 1-word segments: collect_list arrival order is shuffle-
    // dependent; array_sort(struct(seg_idx, _)) must restore text order
    val text = (0 until 40).map(i => s"w$i").mkString(" ")
    val out = TextDedup.dedupSegments(
      Seq((7L, text)).toDF("doc_id", "text"), "doc_id", "text", segWords = 1)
      .as[(Long, String)].collect().toMap
    assert(out == Map(7L -> text))
  }
}
