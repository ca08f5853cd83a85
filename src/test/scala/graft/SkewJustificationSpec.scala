package graft

import graft.ops.Relational
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew JUSTIFICATION for `Relational.saltedJoin` (r8 verdict ask #5): the
  * r8 gate `rel_join_salted` proves parity on roughly uniform keys — where
  * salting only adds overhead. This spec builds a deliberately skewed frame
  * (ONE key ≈ 50% of all rows) and measures, on identical data:
  *
  *   1. plain sort-merge join, AQE skew handling OFF  (the pinned-reducer baseline)
  *   2. `saltedJoin`, AQE OFF                         (the manual remedy)
  *   3. plain join with AQE skew-join ON              (Spark's adaptive remedy)
  *
  * both as a bare join and as join→aggregate-on-the-join-key.
  *
  * MEASURED OUTCOME (recorded in ARCHITECTURE §6b8, local[4], 4M×400k):
  * AQE's skew-join wins BOTH shapes — the bare join ~4.6× vs plain (manual
  * salt ~2.0×), and even the agg-after-join ~1.8× (count_distinct plans an
  * Expand + re-aggregation whose exchange decouples the join output from
  * the agg's distribution requirement, so OptimizeSkewedJoin is free to
  * split after all). Manual salting LOSES on agg-after-join (~0.9×): the
  * (k, salt)-partitioned join output forces a full re-shuffle for the
  * final k-aggregation that the plain plan doesn't need. Conclusion, on
  * record: with AQE on (the default), prefer the plain join and let
  * OptimizeSkewedJoin handle hot keys; `saltedJoin` is the portable remedy
  * for AQE-off deployments and for broadcast-ineligible skew that AQE's
  * sort-merge-only splitting can't reach. Assertions here are result
  * parity (all three variants bit-identical) so the suite stays robust on
  * contended CI machines.
  */
class SkewJustificationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val N = 4000000L
  private val TAIL = 400000L

  // one hot key (0) on 50% of rows; the rest uniform over 1..TAIL
  private def skewLeft: DataFrame =
    spark.range(N).select(
      when(col("id") % 2 === 0, 0L)
        .otherwise(pmod(hash(col("id")), lit(TAIL)).cast("long") + 1).as("k"),
      col("id").as("x"))

  private def rightSide: DataFrame =
    spark.range(TAIL + 1).select(col("id").as("k"), (col("id") * 7).as("w"))

  /** checksum of the bare join (sum over all matched rows — forces the full
    * join output without materializing it) */
  private def joinChecksum(j: DataFrame): (Long, Long) = {
    val r = j.agg(count(lit(1)).as("n"), sum(col("x") + col("w")).as("s")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** join → aggregate ON THE JOIN KEY (count_distinct defeats map-side
    * reduction, so reducer placement of the hot key is what's measured) */
  private def aggAfterJoin(j: DataFrame): (Long, Long) = {
    val r = j.groupBy(col("k"))
      .agg(count_distinct(col("x")).as("nx"), max(col("w")).as("mw"))
      .agg(sum(col("nx")).as("tnx"), count(lit(1)).as("nk")).head()
    (r.getLong(0), r.getLong(1))
  }

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def timed[A](what: String)(body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    val s = (System.nanoTime() - t0) / 1e9
    info(f"$what%-28s ${s}%6.2f s")
    (a, s)
  }

  test("one hot key = 50% of rows: plain vs salted vs AQE skew-join, bare join and agg-after-join") {
    val noBroadcast = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val aqeOff = noBroadcast ++ Seq("spark.sql.adaptive.enabled" -> "false")
    // thresholds lowered so AQE's skew detection actually fires at test scale
    val aqeSkew = noBroadcast ++ Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2MB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")

    def plain = skewLeft.join(rightSide, Seq("k"))
    def salted = Relational.saltedJoin(skewLeft, rightSide, "k", salt = 8)

    // ---- bare join ----
    val (cPlain, tPlain) = withConf(aqeOff: _*)(timed("join: plain SMJ")(joinChecksum(plain)))
    val (cSalt, tSalt) = withConf(aqeOff: _*)(timed("join: saltedJoin")(joinChecksum(salted)))
    val (cAqe, tAqe) = withConf(aqeSkew: _*)(timed("join: AQE skew-join")(joinChecksum(plain)))
    assert(cSalt == cPlain && cAqe == cPlain,
      s"parity broken: plain=$cPlain salted=$cSalt aqe=$cAqe")

    // ---- aggregate on the join key, downstream of the join ----
    val (aPlain, taPlain) = withConf(aqeOff: _*)(timed("agg: plain SMJ")(aggAfterJoin(plain)))
    val (aSalt, taSalt) = withConf(aqeOff: _*)(timed("agg: saltedJoin")(aggAfterJoin(salted)))
    val (aAqe, taAqe) = withConf(aqeSkew: _*)(timed("agg: AQE skew-join")(aggAfterJoin(plain)))
    assert(aSalt == aPlain && aAqe == aPlain,
      s"parity broken: plain=$aPlain salted=$aSalt aqe=$aAqe")

    // the numbers are recorded in ARCHITECTURE §6b8; NO timing assertions —
    // this suite shares a 4-thread session with parallel suites, where a
    // relative-time bound flakes (observed: the full `sbt test` run tripped
    // a 1.5× floor that passes in isolation). Parity above is the contract;
    // the timings are telemetry.
    info(f"speedups vs plain — join: salted ${tPlain / tSalt}%.2fx, AQE ${tPlain / tAqe}%.2fx; " +
      f"agg-after-join: salted ${taPlain / taSalt}%.2fx, AQE ${taPlain / taAqe}%.2fx")
  }

  test("skewFactors detects exactly the planted hot key, factor bounded") {
    // the test session runs 4 shuffle partitions, so the 50%-share key is
    // only ~2 reducer-targets heavy — lower the factor threshold to match
    val factors = Relational.skewFactors(skewLeft, "k", skewFactor = 1.5).toMap
    assert(factors.contains("0"), "the 50%-share key must be detected")
    assert(factors.size == 1,
      s"uniform tail keys must NOT be salted, got $factors")
    // 50% of rows over 32 reducer targets → raw factor ~16, capped at 64
    assert(factors("0") >= 2 && factors("0") <= 64)
    // a uniform frame yields no factors at all
    val uniform = spark.range(100000).select(col("id").as("k"))
    assert(Relational.skewFactors(uniform, "k", skewFactor = 1.5).isEmpty,
      "no hot key → no salting → plain-join branch")
  }

  test("saltedJoinAuto: no manual salt, parity with plain, bounded replication") {
    val noBroadcastOrAqe = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    withConf(noBroadcastOrAqe: _*) {
      val auto = Relational.saltedJoinAuto(skewLeft, rightSide, "k", skewFactor = 1.5)
      assert(joinChecksum(auto) == joinChecksum(skewLeft.join(rightSide, Seq("k"))),
        "auto-salting must not change the join result")
      // per-key replication is bounded: the explode is driven by the
      // per-key factor map (broadcast), so the plan carries a Generate
      // fed by a broadcast join — not a static replicate-everything
      val plan = auto.queryExecution.executedPlan.toString
      assert(plan.contains("Generate"), s"hot-key replication expected:\n$plan")
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
        s"the factor map must broadcast:\n$plan")
      // uniform input takes the plain-join branch — zero replication
      val uniform = spark.range(200000).select(col("id").as("k"), col("id").as("x"))
      val plain = Relational.saltedJoinAuto(uniform, rightSide, "k", skewFactor = 1.5)
      assert(!plain.queryExecution.executedPlan.toString.contains("Generate"),
        "no hot keys → the plain join, no explode anywhere")
    }
    // right/full outer would duplicate unmatched replicated right rows
    intercept[IllegalArgumentException] {
      Relational.saltedJoinAuto(skewLeft, rightSide, "k", joinType = "right")
    }
  }
}
