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

  test("property: identity on an all-unique corpus; drop accounting exact") {
    val rnd = new scala.util.Random(42)
    // globally unique words -> every segment unique -> dedup is identity
    var word = 0
    val unique = (1L to 30L).map { id =>
      id -> (0 until (3 + rnd.nextInt(12))).map { _ => word += 1; s"u$word" }
        .mkString(" ")
    }
    val uniqueDf = unique.toDF("doc_id", "text")
    assert(TextDedup.dedupSegments(uniqueDf, "doc_id", "text", segWords = 3)
      .as[(Long, String)].collect().toMap == unique.toMap)
    assert(TextDedup.scrubBoilerplate(uniqueDf, "doc_id", "text",
      segWords = 3, maxFreq = 1)
      .as[(Long, String)].collect().toMap == unique.toMap)

    // random corpus over a tiny vocab (heavy repeats): the operator must
    // equal a driver-side keep-first oracle computed from its own
    // segmentation grain
    val noisy = (1L to 50L).map { id =>
      id -> (0 until (4 + rnd.nextInt(20))).map(_ => s"v${rnd.nextInt(6)}")
        .mkString(" ")
    }
    val noisyDf = noisy.toDF("doc_id", "text")
    val segs = TextDedup.segments(noisyDf, "doc_id", "text", 2)
      .as[(Long, Int, String)].collect().toSeq
    val keeper: Map[String, (Long, Int)] = segs.groupBy(_._3)
      .map { case (s, occ) => s -> occ.map(o => (o._1, o._2)).min }
    val expected = segs
      .filter(o => keeper(o._3) == ((o._1, o._2)))
      .groupBy(_._1)
      .map { case (id, survivors) =>
        id -> survivors.sortBy(_._2).map(_._3).mkString(" ") }
    assert(TextDedup.dedupSegments(noisyDf, "doc_id", "text", 2)
      .as[(Long, String)].collect().toMap == expected)
    // frequency table accounts for every occurrence
    val freqs = TextDedup.segmentFrequencies(noisyDf, "doc_id", "text", 2)
      .as[(String, Long)].collect().toMap
    assert(freqs.values.sum == segs.length)
    assert(freqs.keySet == segs.map(_._3).toSet)
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

  test("duplicateRuns finds maximal variable-length repeats (cross-doc and in-doc)") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),       // canonical owner — no runs
      (2L, "x y a b c d e f g z"),       // shares 7-word span at wpos 2..8
      (3L, "p q r s t u p q r s t u"),   // in-doc repeat of a 6-word span
      (4L, "one two three four")         // < minWords: no grams, no runs
    ).toDF("doc_id", "text")
    val runs = TextDedup.duplicateRuns(docs, "doc_id", "text", minWords = 5)
      .as[(Long, Int, Int)].collect().toSet
    // doc 2: covered grams at 2,3,4 merge to [2, 9) — the true maximal
    // extent of the shared "a b c d e f g", unaligned to any fixed window
    // doc 3: second "p q r s t u" covers grams 6,7 → run [6, 12)
    assert(runs == Set((2L, 2, 7), (3L, 6, 6)),
      s"expected the two planted maximal runs, got $runs")
  }

  test("dedupSubstrings removes covered runs, keeps canonical text whole") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x y a b c d e f g z"),
      (3L, "p q r s t u p q r s t u"),
      (4L, "one two three four")
    ).toDF("doc_id", "text")
    val out = TextDedup.dedupSubstrings(docs, "doc_id", "text", minWords = 5)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "a b c d e f g h i j", "canonical doc untouched")
    assert(out(2L) == "x y z", "the whole shared span is removed, not fragments")
    assert(out(3L) == "p q r s t u", "in-doc repeat collapses to one copy")
    assert(out(4L) == "one two three four", "short docs pass through")
  }

  test("purgeNearDupsPriority keeps the best cluster member, not min-id") {
    import org.apache.spark.sql.functions.{col, length}
    // docs 1/2/3 are word-level near-dups (Jaccard >= 0.9 on word sets);
    // doc 2 is the LONGEST (repeated words change length, not the set);
    // doc 9 is an unrelated singleton and must survive untouched
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa kappa kappa"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (9L, "completely different words nothing shared here at all")
    ).toDF("doc_id", "text")
    val byPriority = TextDedup.purgeNearDupsPriority(docs, "doc_id", "text",
      -length(col("text")).cast("long"), 64, 16, 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(byPriority == Set(2L, 9L),
      s"longest member (2) must be the keeper, got $byPriority")
    val byMinId = TextDedup.purgeNearDups(docs, "doc_id", "text", 64, 16, 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(byMinId == Set(1L, 9L), "min-id canonical keeps doc 1 — the rules differ")
  }

  test("dedupSubstringsWithRuns(precomputed) equals the composed operator") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x y a b c d e f g z"),
      (3L, "p q r s t u p q r s t u")
    ).toDF("doc_id", "text")
    val runs = TextDedup.duplicateRuns(docs, "doc_id", "text", minWords = 5)
    val viaRuns = TextDedup.dedupSubstringsWithRuns(docs, "doc_id", "text", runs)
      .as[(Long, String)].collect().toMap
    val composed = TextDedup.dedupSubstrings(docs, "doc_id", "text", minWords = 5)
      .as[(Long, String)].collect().toMap
    assert(viaRuns == composed,
      "the detection-once production split must purge identically")
  }

  test("duplicateRuns: adjacent distinct repeats merge into one covered run") {
    // doc 12 contains doc 10's span immediately followed by doc 11's span:
    // two different canonical sources, but the covered windows tile
    // contiguously and must merge into ONE maximal run
    val docs = Seq(
      (10L, "a1 a2 a3 a4 a5"),
      (11L, "b1 b2 b3 b4 b5"),
      (12L, "w1 a1 a2 a3 a4 a5 b1 b2 b3 b4 b5 w2")
    ).toDF("doc_id", "text")
    val runs = TextDedup.duplicateRuns(docs, "doc_id", "text", minWords = 5)
      .as[(Long, Int, Int)].collect().toSet
    assert(runs == Set((12L, 1, 10)),
      s"adjacent covered spans must merge to a single [1, 11) run, got $runs")
  }
}
