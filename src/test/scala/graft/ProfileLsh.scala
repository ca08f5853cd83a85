package graft

import org.apache.spark.sql.functions._

/** Scratch: isolate the cost centers of the LSH candidate stage at sf0.1.
  * `Test/runMain graft.ProfileLsh` — times (a) the banded self-join emit
  * alone, (b) emit + first-match-band filter, (c) the current
  * join+groupBy-dedup shape, for the pipe_dedup_minhash parameters
  * (k=64, bands=16).
  */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session()
    val sfDir = sys.env.getOrElse("SP_SF", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (k, bands) = (64, 16)
    val rows = k / bands
    val sig = graft.pipeline.TextDedup.minhashSignatures(docs, "doc_id", "text", k)
    // same banding as minhashLshPairs, but carry the full band-hash array
    val withBands = sig.select(col("doc_id"),
      array((0 until bands).map(bi =>
        hash(slice(col("sig"), bi * rows + 1, rows), lit(bi))): _*).as("bhs"))
    val nParts = spark.sessionState.conf.numShufflePartitions
    val banded0 = withBands.select(col("doc_id"), col("bhs"),
      posexplode(col("bhs")).as(Seq("band", "bh")))
    val banded = banded0.repartition(nParts, col("band"), col("bh"))
      .sortWithinPartitions(col("band"), col("bh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    banded.count()

    def timed(name: String)(body: => Long): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = body
      println(f"[lsh] $name pass$i ${(System.nanoTime() - t0) / 1e9}%7.2f s n=$n")
    }

    val L = banded.select(col("doc_id").as("i"), col("bhs").as("bi"), col("band"), col("bh"))
    val R = banded.select(col("doc_id").as("j"), col("bhs").as("bj"), col("band"), col("bh"))
    val joined = L.join(R, Seq("band", "bh")).filter(col("i") < col("j"))

    timed("emit_only      ") { joined.select(col("i")).agg(count(lit(1))).collect()(0).getLong(0) }
    // first-match-band: drop the pair unless no EARLIER band also collides
    // (band is 0-based, so the strict prefix has length `band`)
    val firstMatch2 = joined.filter(
      not(exists(zip_with(slice(col("bi"), lit(1), col("band")), slice(col("bj"), lit(1), col("band")),
        (a, b) => a === b), x => x)))
    timed("emit_first_band") { firstMatch2.select(col("i")).agg(count(lit(1))).collect()(0).getLong(0) }
    timed("first_band_distinct_check") { firstMatch2.select("i", "j").agg(count(lit(1))).collect()(0).getLong(0) }
    timed("groupby_dedup  ") {
      joined.groupBy("i", "j").agg(count(lit(1)).as("nb")).select(col("i"))
        .agg(count(lit(1))).collect()(0).getLong(0)
    }
    // V1: co-partition by (i,j) BEFORE the agg — map-side partial combining
    // is useless across bands (different partitions), so pay a dumb shuffle
    // and let the post-exchange agg combine for real
    timed("repart_groupby ") {
      joined.select(col("i"), col("j")).repartition(nParts, col("i"), col("j"))
        .groupBy("i", "j").agg(count(lit(1)).as("nb")).select(col("i"))
        .agg(count(lit(1))).collect()(0).getLong(0)
    }
    // V2: first-match-band filter as a CODEGEN'D boolean chain (GetArrayItem
    // + And short-circuit), bands statically known — emits each pair exactly
    // once, no dedup at all
    val chain = (0 until bands - 1).map(b =>
      col("band") <= b || col("bi").getItem(b) =!= col("bj").getItem(b))
      .reduce(_ && _)
    timed("chain_filter   ") {
      joined.filter(chain).select(col("i"))
        .agg(count(lit(1))).collect()(0).getLong(0)
    }
    // V3: production shape — LEAN cache (no array), arrays attached to both
    // self-join sides via a broadcast join on id
    val lean = banded0.select(col("doc_id"), col("band"), col("bh"))
      .repartition(nParts, col("band"), col("bh"))
      .sortWithinPartitions(col("band"), col("bh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lean.count()
    val docBhs = lean.groupBy(col("doc_id")).agg(
      transform(array_sort(collect_list(struct(col("band"), col("bh")))),
        x => x.getField("bh")).as("bhs"))
    val withArr = lean.join(broadcast(docBhs), Seq("doc_id"))
    val chain2 = (0 until bands - 1).map(b =>
      col("band") <= b || col("bi").getItem(b) =!= col("bj").getItem(b))
      .reduce(_ && _)
    val prod = withArr.select(col("doc_id").as("i"), col("bhs").as("bi"), col("band"), col("bh"))
      .join(withArr.select(col("doc_id").as("j"), col("bhs").as("bj"), col("band"), col("bh")),
        Seq("band", "bh"))
      .filter(col("i") < col("j")).filter(chain2)
      .select(col("i"), col("j"))
    timed("bcast_attach   ") {
      prod.select(col("i")).agg(count(lit(1))).collect()(0).getLong(0)
    }
    if (sys.env.contains("SP_EXPLAIN")) prod.explain("formatted")
    // V4: V3 + persist of the pair output (the production cand cache)
    timed("bcast_persist  ") {
      val c = prod.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = c.count()
      c.unpersist(blocking = true)
      n
    }
    spark.stop()
  }
}
