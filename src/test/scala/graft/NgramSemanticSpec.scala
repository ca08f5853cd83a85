package graft

import graft.pipeline.{Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 additions: LM-prep n-gram count tables (raw + Kneser–Ney
  * continuation counts) and embedding-space eval-set decontamination.
  */
class NgramSemanticSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toyDocs = Seq(
    (1L, "a b c"),
    (2L, "x b c"),
    (3L, "a b d"),
    (4L, "b c a b c"),
    (5L, "solo")).toDF("doc_id", "text")

  test("ngramCounts equals driver-side sliding-window counts") {
    val texts = toyDocs.select("text").as[String].collect()
    for (n <- 1 to 3) {
      val expected = texts.flatMap(_.split(" ").sliding(n).filter(_.length == n)
          .map(_.mkString(" ")))
        .groupBy(identity).map { case (g, xs) => (g, xs.length.toLong) }
      val got = TextAnalysis.ngramCounts(toyDocs, n, "text", 100)
        .as[(String, Long)].collect()
      assert(got.toMap == expected, s"order $n")
      // deterministic ordering: cnt desc, gram asc
      assert(got.sortBy { case (g, c) => (-c, g) }.toSeq == got.toSeq)
    }
  }

  test("docs shorter than n contribute nothing (no null/empty grams)") {
    val got = TextAnalysis.ngramCounts(toyDocs.filter(col("doc_id") === 5), 3)
      .collect()
    assert(got.isEmpty)
  }

  test("continuationCounts = distinct left extensions per suffix") {
    // "b c" is seen after a, x, a, (doc4: "a b c" window + "b c a" start)
    //   doc1 a[b c]; doc2 x[b c]; doc4 a[b c] and the leading [b c a] has
    //   no left for its own first window, but "c a" gains left 'b'
    val got = TextAnalysis.continuationCounts(toyDocs, 3, "text", 100)
      .as[(String, Long)].collect().toMap
    assert(got("b c") == 2L) // lefts {a, x} — repeats collapse
    assert(got("b d") == 1L) // left {a}
    assert(got("c a") == 1L) // left {b} (doc4)
    assert(got("a b") == 1L) // left {c} (doc4: "c a b")
  }

  test("ngram/continuation plans are scan + aggregate — no join") {
    for (df <- Seq(TextAnalysis.ngramCounts(toyDocs, 3),
        TextAnalysis.continuationCounts(toyDocs, 3))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), s"n-gram counting must not join:\n$plan")
    }
  }

  test("bpeTrain reproduces the hand-computed merge sequence") {
    // word counts: "abab"×2, "ab"×1
    //   pairs: (a,b) = 2·2 + 1 = 5, (b,a) = 2 → merge 1 = (a,b) @ 5
    //   then words [ab,ab]×2, [ab]×1 → (ab,ab) = 2 → merge 2 @ 2
    //   then no adjacent pairs remain → loop stops early
    val df = Seq((1L, "abab abab ab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(df, "text", nMerges = 10)
    assert(merges == Seq((1, "a", "b", 5L), (2, "ab", "ab", 2L)))
    // ties break lexicographically on the pair
    val tie = Seq((1L, "xy ab")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrain(tie, "text", 1).head == ((1, "a", "b", 1L)))
    // wordCap bounds the trained table deterministically (top words by
    // count, word tie-break): with cap 1 only "abab" (count 2) trains
    val capped = TextAnalysis.bpeTrain(df, "text", 10, wordCap = 1)
    assert(capped.head == ((1, "a", "b", 4L)))
  }

  test("bpeEncode reproduces the training-end segmentation and handles OOV") {
    val df = Seq((1L, "abab abab ab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(df, "text", 10)
    val enc = TextAnalysis.bpeEncode(df, merges)
      .as[(Long, Seq[String])].collect().toMap
    // training end state: "abab" → [abab], "ab" → [ab]
    assert(enc(1L) == Seq("abab", "abab", "ab"))
    // out-of-vocabulary word: known merges apply, the rest stays chars
    val oov = TextAnalysis.bpeEncode(
      Seq((2L, "abc ba")).toDF("doc_id", "text"), merges)
      .as[(Long, Seq[String])].collect().toMap
    assert(oov(2L) == Seq("ab", "c", "b", "a"))
    // losslessness on the real corpus head
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    val m2 = TextAnalysis.bpeTrain(d, "text", 15)
    val ok = TextAnalysis.bpeEncode(d, m2)
      .join(d, "doc_id")
      .select((concat_ws("", col("tokens")) ===
        regexp_replace(col("text"), " ", "")).as("l"))
      .as[Boolean].collect()
    assert(ok.nonEmpty && ok.forall(identity))
  }

  test("bpeTrainBytes merges UTF-8 byte symbols; encode/decode is byte-lossless") {
    // "ab" in bytes: 0x61 0x62 → symbols U+0161 U+0162; the hand-computed
    // merge sequence mirrors the char-level spec but over byte symbols
    val df = Seq((1L, "abab abab ab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrainBytes(df, "text", nMerges = 10)
    val a = "š"; val b = "Ţ"
    assert(merges == Seq((1, a, b, 5L), (2, a + b, a + b, 2L)))
    val enc = TextAnalysis.bpeEncodeBytes(df, merges)
      .as[(Long, Seq[String])].collect().toMap
    assert(enc(1L).map(t => TextAnalysis.bpeBytesDecode(Seq(t))) ==
      Seq("abab", "abab", "ab"))
    // arbitrary Unicode round-trips with ZERO training exposure: emoji
    // (4-byte UTF-8), CJK (3-byte), combining marks — all unseen, all
    // fall back to byte symbols and decode byte-exactly
    val exotic = "café 🙂🚀 你好 és"
    val out = TextAnalysis.bpeEncodeBytes(
      Seq((2L, exotic)).toDF("doc_id", "text"), merges)
      .as[(Long, Seq[String])].collect().toMap
    assert(TextAnalysis.bpeBytesDecode(out(2L)) ==
      exotic.split(" ").mkString(""), "byte fallback must be lossless on " +
      "emoji/CJK/combining marks the trainer never saw")
    // every token is byte-decodable (closed 256-symbol base vocabulary)
    out(2L).foreach(t => TextAnalysis.bpeBytesDecode(Seq(t)))
  }

  test("byte BPE merges may cross codepoint boundaries; decode still reassembles") {
    // train on repeated emoji so merges form INSIDE the 4-byte sequence
    val df = Seq((1L, "🙂🙂 🙂")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrainBytes(df, "text", nMerges = 5)
    assert(merges.nonEmpty, "byte pairs inside the emoji must merge")
    val out = TextAnalysis.bpeEncodeBytes(df, merges)
      .as[(Long, Seq[String])].collect().toMap
    assert(TextAnalysis.bpeBytesDecode(out(1L)) == "🙂🙂🙂")
  }

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toDF("vec_id", "embedding")

  test("decontaminateSemantic purges exactly the above-threshold corpus rows") {
    val evalSet = vecs(100L -> Seq(1.0, 0.0), 101L -> Seq(0.0, 1.0))
    val corpus = vecs(
      1L -> Seq(0.999, 0.01), // ~cos 1 vs eval 100 → purged
      2L -> Seq(-1.0, 0.0),   // cos -1 → kept
      3L -> Seq(0.1, 0.99),   // ~cos 1 vs eval 101 → purged
      4L -> Seq(0.8, -0.6))   // cos 0.8 vs eval 100 → kept at 0.9
    val survivors = Similarity.decontaminateSemantic(corpus, evalSet, 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors == Set(2L, 4L))
    // lowering the threshold below cos(row4, eval100) pulls row 4 in
    val strict = Similarity.decontaminateSemantic(corpus, evalSet, 0.7)
      .select("vec_id").as[Long].collect().toSet
    assert(strict == Set(2L))
  }

  test("contamination pairs carry quantized-exact sims; survivors+hits = corpus") {
    val d = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    val (ev, co) = (e.filter(col("vec_id") < 50), e.filter(col("vec_id") >= 50))
    val pairs = Similarity.semanticContaminationPairs(co, ev, 0.35)
    val hit = pairs.select(col("corpus_id")).distinct()
    val surv = Similarity.decontaminateSemantic(co, ev, 0.35)
    assert(hit.count() + surv.count() == co.count())
    // every emitted sim is >= threshold and <= 1 + quantization slack
    val sims = pairs.select("sim").as[Double].collect()
    assert(sims.forall(s => s >= 0.35 && s <= 1.0001))
  }

  test("semantic decon plan: eval side broadcasts, corpus never shuffles") {
    val d = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    val plan = Similarity.decontaminateSemantic(
      e.filter(col("vec_id") >= 50), e.filter(col("vec_id") < 50), 0.35)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"eval side must broadcast (scan-shaped corpus):\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no corpus shuffle join expected:\n$plan")
  }
}
