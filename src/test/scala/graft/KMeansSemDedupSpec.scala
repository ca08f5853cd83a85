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
