package graft

import graft.pipeline.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Model-based randomized lifecycle test for the incremental z-store: a
  * seeded random sequence of appends (plain and last-write-wins),
  * full re-layouts and vacuums must keep [[Layout.zorderRead]] exactly
  * equal to a driver-side reference map at every step — the whole
  * manifest/segment/generation machinery checked against the simplest
  * possible model, under operation interleavings no hand-written case
  * enumerates.
  */
class ZStorePropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("randomized append/relayout/vacuum sequence matches the reference model (seeded)") {
    val rnd = new scala.util.Random(1405)
    val dir = java.nio.file.Files.createTempDirectory("zprop").toString
    val zc = Seq(col("a"), col("b"))

    // model: key (a, b, id) -> value  — replaceOn("a","b") keeps ONE row
    // per (a, b); plain appends accumulate rows
    var model = Map.empty[(Long, Long, Long), Double]

    def frame(rows: Seq[(Long, Long, Long, Double)]) = {
      import spark.implicits._
      rows.toDF("a", "b", "id", "value")
    }
    def randRows(n: Int, idBase: Long): Seq[(Long, Long, Long, Double)] =
      (0 until n).map { i =>
        val a = rnd.nextInt(16).toLong; val b = rnd.nextInt(16).toLong
        (a, b, idBase + i, rnd.nextInt(1000).toDouble)
      }

    // initial store
    val init = randRows(200, 0)
    model = init.map { case (a, b, id, v) => (a, b, id) -> v }.toMap
    Layout.zorderWrite(spark, dir, frame(init), zc, bits = 4, numFiles = 4)

    var idBase = 1000L
    var gen = Layout.zorderGeneration(spark, dir)
    (1 to 25).foreach { step =>
      rnd.nextInt(4) match {
        case 0 | 1 => // plain append: rows accumulate
          val rows = randRows(rnd.nextInt(60) + 1, idBase); idBase += 1000
          Layout.zorderAppend(spark, dir, frame(rows), zc, bits = 4)
          model = model ++ rows.map { case (a, b, id, v) => (a, b, id) -> v }
        case 2 => // last-write-wins on (a, b): stored rows at those keys drop
          val rows = randRows(rnd.nextInt(40) + 1, idBase); idBase += 1000
          // one row per (a,b) within the batch (the API contract callers
          // must meet for replaceOn semantics; arbitrary survivor otherwise)
          val unique = rows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
          Layout.zorderAppend(spark, dir, frame(unique), zc, bits = 4,
            replaceOn = Seq("a", "b"))
          val touched = unique.map(r => (r._1, r._2)).toSet
          model = model.filterNot { case ((a, b, _), _) => touched((a, b)) } ++
            unique.map { case (a, b, id, v) => (a, b, id) -> v }
        case 3 => // maintenance: full re-layout or GC — reads must not move
          if (rnd.nextBoolean()) {
            val grown = Layout.zorderRead(spark, dir).drop("__z")
            Layout.zorderWrite(spark, dir, grown, zc, bits = 4,
              numFiles = rnd.nextInt(6) + 2)
          } else Layout.zorderVacuum(spark, dir)
      }
      // the generation moves monotonically with every commit
      val g = Layout.zorderGeneration(spark, dir)
      assert(g >= gen, s"generation went backwards at step $step: $gen -> $g")
      gen = g
      // full-state equality vs the model
      val got = Layout.zorderRead(spark, dir)
        .select(col("a"), col("b"), col("id"), col("value"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3))
      assert(got.length == model.size,
        s"row count drifted at step $step: ${got.length} vs ${model.size}")
      assert(got.toMap == model, s"contents drifted at step $step")
      // manifest invariants: every live file exists, row counts match
      val manifest = Layout.zorderManifest(spark, dir)
      manifest.foreach { zf =>
        assert(java.nio.file.Files.exists(
          java.nio.file.Paths.get(new java.net.URI(zf.path).getPath)),
          s"manifest lists a missing file at step $step: ${zf.path}")
      }
      assert(manifest.map(_.rows).sum == model.size.toLong)
    }
  }
}
