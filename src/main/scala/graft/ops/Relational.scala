package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators beyond the reference's surface (SURVEY §2.3/§2.5 —
  * "absent in reference", exposed on fact frames for the scale-out goals).
  * All are compositions of Spark built-ins chosen for their distributed
  * plans: one shuffle where one is unavoidable, none where not.
  */
object Relational {

  /** As-of join: for each left row, the single most recent right row with
    * `(ts, tiebreak) <= (left.ts, left.tiebreak)` within the same partition
    * key. Implemented as union + partitioned window (`last(..., ignoreNulls)`
    * over an ordered frame) — ONE shuffle on the partition key, no per-row
    * probing, no broadcast requirement on either side; scales to arbitrarily
    * large both-sides (the classic streaming point-in-time join shape).
    *
    * `left`/`right` must share `partCols`; right contributes `rightPayload`
    * columns (emitted with their names); both need `tsCol` and a unique
    * numeric `tiebreakCol` for total order.
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      partCols: Seq[String], tsCol: String, tiebreakCol: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__side", lit(1))
    val r = right.withColumn("__side", lit(0))
    val payloadNulled = rightPayload.foldLeft(l)((d, c) =>
      d.withColumn(s"__p_$c", lit(null).cast(right.schema(c).dataType)))
    val rSel = r.select((partCols ++ Seq(tsCol, tiebreakCol, "__side")).map(col) ++
      rightPayload.map(c => col(c).as(s"__p_$c")): _*)
    val lSel = payloadNulled.select((leftCols ++ Seq("__side") ++ rightPayload.map(s"__p_" + _))
      .map(col): _*)
    val unioned = lSel.unionByName(rSel, allowMissingColumns = true)
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(tiebreakCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightPayload.foldLeft(unioned)((d, c) =>
      d.withColumn(c, last(col(s"__p_$c"), ignoreNulls = true).over(w)))
    filled.filter(col("__side") === 1)
      .select((leftCols ++ rightPayload).map(col): _*)
  }

  /** Global top-k: `orderBy(...).limit(k)` — Spark plans TakeOrderedAndProject
    * (per-partition heaps + driver merge of k·P rows, no full sort/shuffle).
    */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame = df.orderBy(order: _*).limit(k)

  /** Per-group top-n via `row_number` window (single shuffle on the keys). */
  def topNPerGroup(df: DataFrame, partCols: Seq[String], order: Seq[Column], n: Int,
      rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= n)
  }

  /** Skew-safe equi-join: salt the skewed (left) side's key into `salt`
    * subkeys and replicate the right side once per subkey, so one hot key's
    * rows spread over `salt` reducers instead of one.
    *
    * Measured guidance (ARCHITECTURE §6b8, SkewJustificationSpec): with AQE
    * on — Spark's default — the PLAIN join + `OptimizeSkewedJoin` beat this
    * on both the bare join (4.6× vs 2.0× over the pinned-reducer baseline)
    * and join→aggregate-on-the-key (where the salted output's extra
    * re-shuffle makes salting a net loss). Reach for `saltedJoin` only
    * where AQE can't re-plan: AQE-off deployments, streaming micro-batch
    * joins, fixed-partitioning pipelines.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    val l = left.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)).cast("int"))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** [[saltedJoin]] with AUTO skew detection: one SpaceSaving sketch pass
    * over the left side's key ([[graft.functions.FreqSketch]] — the
    * shuffle carries one capacity-entry sketch per partition, never the
    * key space) finds the keys whose row count exceeds `skewFactor` ×
    * the per-reducer target (total rows / `spark.sql.shuffle.partitions`),
    * and ONLY those keys are salted — each with its own factor
    * `ceil(count / target)` capped at `maxSalt`. Cold keys keep salt 0 and
    * the right side replicates a row `factor` times ONLY for its key's
    * factor (via a broadcast factor-map join), so right-side inflation is
    * `Σ_hot (factor − 1)` rows — bounded by the hot-key count, never
    * `salt ×` the whole table like the static version.
    *
    * With no hot key detected this IS the plain join (zero overhead
    * beyond the sketch pass). Salting never changes join semantics, so
    * result parity with the plain join holds by construction — gated.
    * Same deployment guidance as [[saltedJoin]]: prefer AQE's skew-join
    * where AQE can re-plan; this is the portable/streaming remedy.
    */
  /** The detection pass of [[saltedJoinAuto]], usable standalone for skew
    * forensics: `(key as string, salt factor)` for every key whose
    * GUARANTEED frequency lower bound (SpaceSaving `cnt − err`) exceeds
    * `skewFactor` × the per-reducer row target. Factor =
    * `ceil(count / target)`, clamped to `[2, maxSalt]`.
    */
  def skewFactors(df: DataFrame, key: String, capacity: Int = 256,
      skewFactor: Double = 4.0, maxSalt: Int = 64): Seq[(String, Int)] = {
    val nPart = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    // null keys never match an equi-join, so salting them is pointless —
    // and they must not reach the sketch
    val probe = df.filter(col(key).isNotNull).agg(
      graft.functions.FreqSketch(col(key).cast("string"), capacity).as("hh"),
      count(lit(1)).as("n")).head()
    val total = probe.getAs[Long]("n")
    val target = math.max(1L, math.ceil(
      total.toDouble / math.max(1, nPart)).toLong)
    probe.getSeq[org.apache.spark.sql.Row](0)
      .collect {
        // cnt - err is the guaranteed LOWER bound of the true frequency:
        // only provably-hot keys get salted (a false positive would only
        // cost replication, but the conservative bound keeps the factor
        // map honest across partitionings)
        case e if (e.getAs[Long]("cnt") - e.getAs[Long]("err")) >
            skewFactor * target =>
          (e.getAs[String]("token"),
            math.min(maxSalt.toLong, math.max(2L, math.ceil(
              e.getAs[Long]("cnt").toDouble / target).toLong)).toInt)
      }
  }

  def saltedJoinAuto(left: DataFrame, right: DataFrame, key: String,
      joinType: String = "inner", capacity: Int = 256,
      skewFactor: Double = 4.0, maxSalt: Int = 64): DataFrame = {
    require(Set("inner", "left", "leftouter", "leftsemi")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoinAuto replicates the RIGHT side; join type '$joinType' " +
        "would duplicate unmatched right rows — use inner/left/semi")
    val spark = left.sparkSession
    val factors = skewFactors(left, key, capacity, skewFactor, maxSalt)
    if (factors.isEmpty) left.join(right, Seq(key), joinType)
    else {
      import spark.implicits._
      val fdf = broadcast(factors.toDF("__hk", "__f"))
      val l = left
        .join(fdf, col(key).cast("string") === col("__hk"), "left")
        .withColumn("__fl", coalesce(col("__f"), lit(1)))
        .withColumn("__salt", pmod(
          spark_partition_id() + monotonically_increasing_id(),
          col("__fl")).cast("int"))
        .drop("__hk", "__f", "__fl")
      val r = right
        .join(fdf, col(key).cast("string") === col("__hk"), "left")
        .withColumn("__fr", coalesce(col("__f"), lit(1)))
        .withColumn("__salt", explode(sequence(lit(0), col("__fr") - 1)))
        .drop("__hk", "__f", "__fr")
      l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
    }
  }

  /** Gap-based sessionization: a new session starts when the time since the
    * previous event of the same key exceeds `gapSeconds`. Session ids are a
    * running count of session starts per key — one shuffle, codegen windows.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, tiebreakCol: String,
      gapSeconds: Long, sessionCol: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tiebreakCol))
    val newSession = when(
      unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w) > gapSeconds * 1000000L ||
        lag(col(tsCol), 1).over(w).isNull, 1).otherwise(0)
    df.withColumn("__new", newSession)
      .withColumn(sessionCol,
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** Per-user stage times of an ORDERED FUNNEL (first-touch semantics —
    * the product-analytics staple Spark has no operator for): stage 1's
    * time is the user's earliest stage-1 event, stage i's time the
    * earliest stage-i event at-or-after stage i-1's time, optionally
    * bounded to `maxSpan` (an SQL interval string, e.g. "7 DAYS") after
    * stage 1. Returns one frame PER STAGE of `(user, t, t0)` — feed to
    * [[funnelCounts]] for the conversion report, or join stage k back to
    * the events for cohort drill-down.
    *
    * Shape at scale: a fold of stage-selective scans (each filter pushes
    * to the source) joined on the user key against the SHRINKING survivor
    * frame — k−1 equi-joins for a k-stage funnel, no window over all
    * events, no per-user event collection. Tie semantics are pure
    * timestamp comparisons (`>=`), deliberately identical to the SQL
    * restatement the oracle runs.
    */
  def funnelStages(events: DataFrame, userCol: Column, typeCol: Column,
      tsCol: Column, stages: Seq[String],
      maxSpan: Option[String] = None): Seq[DataFrame] = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      "funnel stages must be non-empty and distinct")
    val first = events.filter(typeCol === stages.head)
      .groupBy(userCol.as("__u")).agg(min(tsCol).as("__t"))
      .select(col("__u"), col("__t"), col("__t").as("__t0"))
    stages.tail.scanLeft(first) { (prev, st) =>
      val e = events.filter(typeCol === st)
        .select(userCol.as("__eu"), tsCol.as("__ets"))
      val within = maxSpan
        .map(sp => col("__ets") <= col("__t0") + expr(s"INTERVAL $sp"))
        .getOrElse(lit(true))
      e.join(prev, col("__eu") === col("__u") && col("__ets") >= col("__t") && within)
        .groupBy(col("__u"), col("__t0")).agg(min(col("__ets")).as("__t"))
        .select(col("__u"), col("__t"), col("__t0"))
    }
  }

  /** Cohort RETENTION: cohort = the user's first-activity day; one row per
    * `(cohort_day, period_n)` counting the cohort's users active exactly
    * `period_n` days after their first day — the second product-analytics
    * staple next to [[funnelCounts]]. Two aggregations and one user-key
    * join: day-grain distinct activity (the only event-volume shuffle,
    * collapsing to ≤ users × days rows), per-user min for the cohort,
    * join back, count — no window, no self-join over raw events.
    * `cohort_day` is emitted as `yyyy-MM-dd` text so engines with
    * different date carriers agree byte-for-byte.
    */
  def retention(events: DataFrame, userCol: Column, tsCol: Column): DataFrame = {
    val activity = events
      .select(userCol.as("__u"), to_date(tsCol).as("__d")).distinct()
    val cohorts = activity.groupBy(col("__u")).agg(min(col("__d")).as("__c"))
    activity.join(cohorts, "__u")
      .select(date_format(col("__c"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("__d"), col("__c")).cast("long").as("period_n"),
        col("__u"))
      .groupBy(col("cohort_day"), col("period_n"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Active-user curves: per day, the EXACT distinct-user count (DAU) and
    * the APPROXIMATE trailing-`trailingDays` distinct count (WAU/MAU)
    * from a window union of per-day HLL sketches — the only shape that
    * scales: raw events collapse to one sketch per day (map-side
    * combinable), and the trailing distinct is a SKETCH MERGE over ≤ n
    * day rows, never a re-scan of the window's events (an exact trailing
    * distinct over 30 days re-touches every event 30×). The day-grain
    * window is a single partition by construction — fine, because its
    * input is one row per day, not the event volume. `rangeBetween` on
    * the epoch-day number keeps calendar gaps honest (a missing day still
    * ages rows out of the window).
    */
  def activeUsers(events: DataFrame, userCol: Column, tsCol: Column,
      trailingDays: Int = 7): DataFrame = {
    require(trailingDays >= 1, "trailingDays must be >= 1")
    val daily = events.groupBy(to_date(tsCol).as("__day"))
      .agg(countDistinct(userCol).as("dau"),
        hll_sketch_agg(userCol).as("__sk"))
    val w = Window
      .orderBy(datediff(col("__day"), to_date(lit("1970-01-01"))))
      .rangeBetween(-(trailingDays - 1).toLong, 0L)
    daily
      .withColumn("trailing_au",
        hll_sketch_estimate(hll_union_agg(col("__sk")).over(w)))
      .select(date_format(col("__day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("trailing_au"))
  }

  /** The funnel conversion report over [[funnelStages]]: one row per stage
    * `(stage, event_type, n_users)` — n_users is non-increasing by
    * construction (each stage frame is a filtered join of the previous).
    */
  def funnelCounts(events: DataFrame, userCol: Column, typeCol: Column,
      tsCol: Column, stages: Seq[String],
      maxSpan: Option[String] = None): DataFrame =
    funnelStages(events, userCol, typeCol, tsCol, stages, maxSpan)
      .zip(stages).zipWithIndex.map { case ((f, st), i) =>
        f.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("stage"), lit(st).as("event_type"),
            col("n_users"))
      }.reduce(_ unionByName _)
}
