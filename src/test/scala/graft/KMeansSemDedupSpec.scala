package graft

import graft.pipeline.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic clustering + SemDeDup: the literal-centroid assignment must be
  * a pure scan (no join, no exchange) and bit-identical to driver-side
  * quantized math under any partitioning; semDedup must be EXACTLY
  * keep-first within clusters (driver all-pairs oracle at toy scale).
  */
class KMeansSemDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  /** Driver-side mirror of Similarity.quantize (HALF_UP, ≙ the column). */
  private def collectVecs(): Map[Long, Array[Long]] =
    emb.select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray.map(x =>
        BigDecimal(x * 1000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
      .toMap

  private def dotL(a: Array[Long], b: Array[Long]): Long =
    a.indices.map(i => a(i) * b(i)).sum
  private def cos(a: Array[Long], b: Array[Long]): Double =
    dotL(a, b).toDouble /
      (math.sqrt(dotL(a, a).toDouble) * math.sqrt(dotL(b, b).toDouble))

  test("kmeansAssign equals driver-side argmax, bit-identical sims, repartition-stable") {
    val vecs = collectVecs()
    val cents = Similarity.centroidsFromIds(emb, 0L until 8L)
    val qcents = (0L until 8L).map(vecs(_))
    val expected = vecs.map { case (id, v) =>
      val best = qcents.zipWithIndex.map { case (c, i) => (-cos(v, c), i) }.min
      id -> ((best._2, -best._1))
    }
    val got = Similarity.kmeansAssign(emb.repartition(7), cents)
      .select(col("vec_id").cast("long"), col("cluster"), col("sim"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, (cl, sim)) =>
      assert(got(id)._1 == cl, s"vec $id cluster")
      assert(got(id)._2 == sim, s"vec $id sim must be bit-identical to driver math")
    }
  }

  test("kmeansAssign plans as a pure scan: no exchange, no join, no generate") {
    val cents = Similarity.centroidsFromIds(emb, 0L until 8L)
    val plan = Similarity.kmeansAssign(emb, cents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment must not shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"assignment must not join:\n$plan")
    assert(!plan.contains("Generate"), s"assignment must not fan out rows:\n$plan")
  }

  test("kmeansFit is deterministic and its assignment is non-degenerate") {
    val f1 = Similarity.kmeansFit(emb, 8, maxIter = 5)
    val f2 = Similarity.kmeansFit(emb, 8, maxIter = 5)
    assert(f1.size == 8)
    assert(f1.zip(f2).forall { case (a, b) => a.sameElements(b) },
      "same seed + same sample must reproduce the same centroids")
    val used = Similarity.kmeansAssign(emb, f1).select("cluster").distinct().count()
    assert(used > 1, s"only $used cluster(s) used — degenerate fit")
  }

  test("semDedup is exactly keep-first within clusters (driver oracle)") {
    val vecs = collectVecs()
    val cents = Similarity.centroidsFromIds(emb, 0L until 8L)
    val qcents = (0L until 8L).map(vecs(_))
    val assign = vecs.map { case (id, v) =>
      id -> qcents.zipWithIndex.map { case (c, i) => (-cos(v, c), i) }.min._2
    }
    val t = 0.3
    val dropped = vecs.keySet.filter { j =>
      vecs.keys.exists(i =>
        i < j && assign(i) == assign(j) && cos(vecs(i), vecs(j)) >= t)
    }
    val expected = (vecs.keySet -- dropped).map(id => (id, assign(id)))
    val got = Similarity.semDedup(emb, cents, t)
      .select(col("vec_id").cast("long"), col("cluster"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == expected, "survivor set must match the keep-first oracle")
    // keep-first invariant restated structurally: no surviving pair within a
    // cluster sits at/above the threshold
    val surv = got.map(_._1).toSeq.sorted
    for (i <- surv; j <- surv if i < j && assign(i) == assign(j))
      assert(cos(vecs(i), vecs(j)) < t, s"surviving near-dup pair ($i,$j)")
  }

  test("pqEncode equals driver-side subspace argmin, seeds self-encode, pure scan") {
    val vecs = collectVecs()
    val nSub = 4; val sub = 16
    val cbs = Similarity.pqCodebooksFromIds(emb, 0L until 8L, nSub)
    val qcbs = (0 until nSub).map(m => (0L until 8L).map(vecs(_).slice(m * sub, (m + 1) * sub)))
    val expected = vecs.map { case (id, v) =>
      id -> (0 until nSub).map { m =>
        val xs = v.slice(m * sub, (m + 1) * sub)
        qcbs(m).zipWithIndex.map { case (c, k) =>
          (dotL(xs, xs) - 2 * dotL(xs, c) + dotL(c, c), k)
        }.min._2
      }
    }
    val encoded = Similarity.pqEncode(emb.repartition(5), cbs)
    val got = encoded.select(col("vec_id").cast("long"), col("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, codes) =>
      assert(got(id) == codes, s"vec $id codes")
    }
    // each seed reconstructs itself: its own slice is at distance 0
    (0L until 8L).foreach { s => assert(got(s) == Seq.fill(nSub)(s.toInt), s"seed $s") }
    val plan = Similarity.pqEncode(emb, cbs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.toLowerCase.contains("join") &&
      !plan.contains("Generate"), s"pqEncode must plan as a pure scan:\n$plan")
  }

  test("ivfPqTopK: k ranked rows per query, deterministic, sane recall on fit codebooks") {
    val q = emb.filter(col("vec_id") < 3)
    val cbs = Similarity.pqFit(emb, nSub = 4, k = 8, maxIter = 5)
    assert(cbs.size == 4 && cbs.forall(cb => cb.size == 8 && cb.forall(_.length == 16)))
    val r1 = Similarity.ivfPqTopK(emb, q, 5, cbs, nCentroids = 8, nProbe = 4)
      .select(col("query_id").cast("long"), col("cand_id").cast("long"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // determinism on the same input (the coarse k-means|| init is sensitive
    // to partition structure, so cross-partitioning stability holds only
    // downstream of the fit — the ADC scoring itself is literal-driven)
    val r2 = Similarity.ivfPqTopK(emb, q, 5, cbs, nCentroids = 8, nProbe = 4)
      .select(col("query_id").cast("long"), col("cand_id").cast("long"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(r1 == r2, "IVF-PQ ranking must be deterministic on the same input")
    val perQuery = r1.groupBy(_._1)
    assert(perQuery.keySet == Set(0L, 1L, 2L))
    perQuery.foreach { case (qid, rows) =>
      assert(rows.map(_._3).toSeq.sorted == (1 to 5), s"query $qid ranks")
      assert(!rows.exists(_._2 == qid), s"query $qid must not match itself")
    }
  }

  test("ivfPqTopK recall on a clustered corpus (where PQ fidelity is meaningful)") {
    // the parquet embeddings are uniform random — structureless, so PQ
    // reconstruction carries no ranking signal there (as for any ANN
    // index); recall is asserted on a deterministic CLUSTERED corpus
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(4)(Array.fill(64)(rnd.nextGaussian()))
    val rows = for (c <- 0 until 4; i <- 0 until 25) yield {
      val v = centers(c).map(x => (x + 0.15 * rnd.nextGaussian()).toFloat).toSeq
      ((c * 25 + i).toLong, v)
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id").isin(0L, 25L, 50L, 75L))
    val cbs = Similarity.pqFit(df, nSub = 8, k = 8, maxIter = 5)
    val brute = Similarity.bruteForceTopK(df, q, 10)
      .select(col("query_id").cast("long"), col("cand_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.ivfPqTopK(df, q, 10, cbs, nCentroids = 4, nProbe = 2)
      .select(col("query_id").cast("long"), col("cand_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect got).size.toDouble / brute.size
    assert(recall >= 0.6, f"IVF-PQ recall on clustered corpus: $recall%.2f < 0.6")
    // and the retrieved neighbors are overwhelmingly same-cluster
    val sameCluster = got.count { case (qid, cid) => qid / 25 == cid / 25 }
    assert(sameCluster >= got.size * 0.8,
      s"only $sameCluster/${got.size} retrieved neighbors share the query's cluster")
  }

  test("ivfPqRerankTopK: exact re-rank of the shortlist dominates plain ADC recall") {
    // same clustered corpus as the recall test — PQ fidelity meaningful
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(4)(Array.fill(64)(rnd.nextGaussian()))
    val rows = for (c <- 0 until 4; i <- 0 until 25) yield {
      val v = centers(c).map(x => (x + 0.15 * rnd.nextGaussian()).toFloat).toSeq
      ((c * 25 + i).toLong, v)
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id").isin(0L, 25L, 50L, 75L))
    val cbs = Similarity.pqFit(df, nSub = 8, k = 8, maxIter = 5)
    def pairs(r: org.apache.spark.sql.DataFrame) = r
      .select(col("query_id").cast("long"), col("cand_id").cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(df, q, 10))
    val plain = pairs(Similarity.ivfPqTopK(df, q, 10, cbs, nCentroids = 4, nProbe = 2))
    val rr = Similarity.ivfPqRerankTopK(df, q, 10, 30, cbs, nCentroids = 4, nProbe = 2)
    val rrPairs = pairs(rr)
    val recPlain = (brute intersect plain).size.toDouble / brute.size
    val recRr = (brute intersect rrPairs).size.toDouble / brute.size
    assert(recRr >= recPlain,
      f"rerank recall $recRr%.2f must dominate plain ADC recall $recPlain%.2f")
    assert(recRr >= 0.6, f"rerank recall $recRr%.2f < 0.6 on clustered corpus")
    // shape: exactly k ranked rows per query, ranks 1..10, no self-match
    val byQ = rr.select(col("query_id").cast("long"), col("cand_id").cast("long"),
        col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).groupBy(_._1)
    assert(byQ.keySet == Set(0L, 25L, 50L, 75L))
    byQ.foreach { case (qid, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1 to 10), s"query $qid ranks")
      assert(!rs.exists(_._2 == qid), s"query $qid self-match")
    }
    // and the re-ranked sims are EXACT cosines: each (q,cand) sim equals the
    // brute-force sim for the same pair (same quantized-integer metric)
    val bruteSims = Similarity.bruteForceTopK(df, q, 10)
      .select(col("query_id").cast("long"), col("cand_id").cast("long"), col("sim"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    rr.select(col("query_id").cast("long"), col("cand_id").cast("long"), col("sim"))
      .collect().foreach { r =>
        val key = (r.getLong(0), r.getLong(1))
        bruteSims.get(key).foreach(b =>
          assert(b == r.getDouble(2), s"sim mismatch for $key: exact-metric drift"))
      }
  }

  test("pruneByPrototypes keeps exactly the least-prototypical keepFrac per cluster") {
    val vecs = collectVecs()
    val cents = Similarity.centroidsFromIds(emb, 0L until 8L)
    val qcents = (0L until 8L).map(vecs(_))
    val scored = vecs.toSeq.map { case (id, v) =>
      val best = qcents.zipWithIndex.map { case (c, i) => (-cos(v, c), i) }.min
      (id, best._2, -best._1)
    }
    val keepFrac = 0.25
    val expected = scored.groupBy(_._2).flatMap { case (_, members) =>
      val byProto = members.sortBy { case (id, _, sim) => (-sim, id) }
      val n = byProto.size
      byProto.zipWithIndex.collect {
        case ((id, cl, _), idx) if (idx + 1) > n - math.ceil(n * keepFrac) =>
          (id, cl, idx + 1)
      }
    }.toSet
    val got = Similarity.pruneByPrototypes(emb, cents, keepFrac)
      .select(col("vec_id").cast("long"), col("cluster"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == expected, "kept set + prototypicality ranks must match driver oracle")
    // boundary behavior: keepFrac 0 keeps nothing, keepFrac 1 keeps all
    assert(Similarity.pruneByPrototypes(emb, cents, 0.0).count() == 0)
    assert(Similarity.pruneByPrototypes(emb, cents, 1.0).count() == vecs.size)
  }
}
