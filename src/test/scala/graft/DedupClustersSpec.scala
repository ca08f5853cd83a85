package graft

import graft.pipeline.TextDedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connected-components dedup grouping ([[TextDedup.dedupClusters]]) vs a
  * driver-side union-find oracle, plus the end-to-end purge composition.
  */
class DedupClustersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Union-find oracle: map every node appearing in `pairs` to the MIN node
    * id of its connected component.
    */
  private def unionFindOracle(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    pairs.foreach { case (a, b) => union(a, b) }
    parent.keys.map(k => k -> find(k)).toMap
  }

  // driverEdgeCap = 0 forces the DISTRIBUTED min-label fixpoint (the
  // size-adaptive default would route every test-sized graph to the
  // driver-side union-find and the loop would go untested)
  private def run(pairs: Seq[(Long, Long)], maxIters: Int = 25,
      driverEdgeCap: Long = 0L): Map[Long, Long] =
    TextDedup.dedupClusters(pairs.toDF("i", "j"), maxIters = maxIters,
        driverEdgeCap = driverEdgeCap)
      .as[(Long, Long)].collect().toMap

  test("empty pair list yields an empty cluster frame (no NPE)") {
    val out = TextDedup.dedupClusters(
      Seq.empty[(Long, Long)].toDF("i", "j"))
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("id", "cluster_id"))
  }

  test("two disjoint cliques and a bridge-free singleton pair") {
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (20L, 21L))
    assert(run(pairs) == unionFindOracle(pairs))
  }

  test("deep path graph converges past the shallow-diameter fast case") {
    // 0-1-2-…-16: diameter 16 — min-label propagation moves the min one hop
    // per round, so this genuinely exercises multi-round convergence (and
    // the bounded-lineage localCheckpoint: full lineage would go exponential)
    val pairs = (0L until 16L).map(i => (i, i + 1))
    val got = run(pairs, maxIters = 25)
    assert(got == unionFindOracle(pairs))
    assert(got.values.toSet == Set(0L)) // one component, labelled by its min
  }

  test("pointer jumping converges a 64-path in O(log diameter) edge rounds") {
    // plain 1-hop min propagation would need ~64 rounds; with the in-round
    // pointer-jump compression ~log2(64)+2 edge rounds suffice — a budget of
    // 10 only passes with the acceleration in place
    val pairs = (0L until 64L).map(i => (i, i + 1))
    val got = run(pairs, maxIters = 10)
    assert(got == unionFindOracle(pairs))
    assert(got.values.toSet == Set(0L))
  }

  test("maxIters caps the rounds (deep path with tiny budget still returns)") {
    val pairs = (0L until 16L).map(i => (i, i + 1))
    val got = run(pairs, maxIters = 2) // not converged — but total and sane
    assert(got.keySet == (0L to 16L).toSet)
    assert(got.values.forall(_ >= 0L))
  }

  test("superseded checkpoints are released: persistent-RDD count stays bounded") {
    val before = spark.sparkContext.getPersistentRDDs.size
    // 64-path: many rounds, each materializing two checkpointed label frames
    run((0L until 64L).map(i => (i, i + 1)), maxIters = 25)
    val after = spark.sparkContext.getPersistentRDDs.size
    // without per-round release every round leaks 2 checkpoint RDDs (10+
    // here); only the final labels frame (and any test-suite leftovers) may
    // remain
    assert(after - before <= 2, s"leaked checkpoint RDDs: $before -> $after")
  }

  test("labels only decrease round over round (convergence test soundness)") {
    // The label-sum convergence check assumes monotone non-increase; verify
    // the invariant on a graph whose propagation takes several rounds.
    val pairs = (0L until 16L).map(i => (i, i + 1)) ++ Seq((100L, 3L))
    val got = run(pairs, maxIters = 30)
    assert(got == unionFindOracle(pairs))
  }

  test("random graphs match union-find — BOTH strategies (distributed and driver)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 8) {
      val n = rnd.nextInt(61)
      val pairs = (0 until n).flatMap { _ =>
        val a = rnd.nextInt(31).toLong; val b = rnd.nextInt(31).toLong
        if (a == b) None else Some((math.min(a, b), math.max(a, b)))
      }
      val oracle = unionFindOracle(pairs)
      assert(run(pairs) == oracle)                             // distributed fixpoint
      assert(run(pairs, driverEdgeCap = 1000000L) == oracle)   // driver union-find
    }
  }

  test("empty pair list yields an empty frame on the driver path too") {
    val out = TextDedup.dedupClusters(Seq.empty[(Long, Long)].toDF("i", "j"),
      driverEdgeCap = 1000L)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("id", "cluster_id"))
  }

  test("shingled MinHash is order-sensitive where word-set MinHash is not") {
    // doc 2 is doc 1 reversed: identical word SET (1-gram Jaccard 1.0) but
    // almost no shared 2-word shingles; doc 3 is a true near-copy of doc 1
    val text1 = (1 to 30).map(i => s"w$i").mkString(" ")
    val text3 = (1 to 30).map(i => if (i == 30) "changed" else s"w$i").mkString(" ")
    val docs = Seq(
      (1L, text1),
      (2L, text1.split(" ").reverse.mkString(" ")),
      (3L, text3)).toDF("doc_id", "text")
    def pairsOf(shingle: Int, thr: Double) =
      TextDedup.minhashLshPairs(docs, "doc_id", "text", 64, 16, thr, shingle)
        .select("i", "j").as[(Long, Long)].collect().toSet
    // word-set view: 1↔2 are duplicates (and 1↔3, 2↔3 near-dups at 29/31)
    assert(pairsOf(1, 0.9).contains((1L, 2L)))
    // 2-shingle view: the reversal no longer collides; the true near-copy
    // (shares 28/31 shingles ≈ 0.90... wait, 29 shingles each, 28 shared)
    val sh = pairsOf(2, 0.8)
    assert(!sh.contains((1L, 2L)), s"reversed doc still paired under shingles: $sh")
    assert(sh.contains((1L, 3L)), s"true near-copy lost under shingles: $sh")
  }

  test("purgeNearDups keeps one representative per duplicate set and all singletons") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),          // dup of 1
      (3L, "alpha beta gamma delta epsilon zeta"),     // near-dup of 1/2 (J=5/6)
      (4L, "totally different words entirely here"),
      (5L, "another unrelated document body text")
    ).toDF("doc_id", "text")
    val kept = TextDedup.purgeNearDups(docs, "doc_id", "text", 64, 16, 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L))
  }

  test("purgeNearDups with no near-dups returns the corpus unchanged") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "delta epsilon zeta"),
      (3L, "eta theta iota")).toDF("doc_id", "text")
    assert(TextDedup.purgeNearDups(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }
}
