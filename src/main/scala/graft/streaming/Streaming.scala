package graft.streaming

import graft.core.Cube
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming surface (SURVEY §2.14 — extension-only; the
  * reference is purely interactive/in-memory). Streams are first-class
  * inputs to the same fact frames the batch engine aggregates.
  */
object Streaming {

  /** Continuous ingestion of cell writes `(d0…dn, value)` into a cube:
    * each micro-batch is merged last-wins into the fact frame (the streaming
    * analogue of the overlay upsert, `facttable.py:146-164`) and the result
    * cache is invalidated exactly like a batch write (`cube.py:510-511`).
    *
    * Lineage bound: the per-batch merge stacks one anti-join+union layer on
    * the fact plan, which would grow without bound over a long-running
    * stream (analysis cost alone becomes quadratic). Every `compactEvery`
    * batches the merged frame is checkpointed (`localCheckpoint`, eager) so
    * the plan resets to a flat scan; on a real cluster prefer a reliable
    * checkpoint dir, but the shape — O(1) plan depth — is the same.
    */
  /** `onBatchMerged` (optional) runs after each batch's merge COMMITS, with
    * the batch's resolved cell frame `(d0…dn, value)` — the change-tracking
    * a summary maintainer needs ([[graft.olap.Aggregates.maintain]]): bulk
    * merges reset the cube's point-write log by design (addresses live in
    * executors), so the batch frame is the only bounded description of what
    * changed. The hook runs on the stream-execution thread; keep it to
    * driver-cheap work plus at most a small recompute job. */
  /** [[ingestInto]] for a cube backed by the INCREMENTAL z-ordered store
    * ([[graft.core.Cube.compactToZorderedStore]]): each micro-batch lands
    * through [[graft.core.Cube.appendZorderedStore]] — last-write-wins
    * per address, ON_ENTRY hook applied inside the append, and ONLY the
    * files whose z-range the batch touches re-cluster — so the stored
    * layout stays slice-query-optimal CONTINUOUSLY instead of degrading
    * until the next full compaction (the plain [[ingestInto]] path stacks
    * unlayouted merge layers the compaction later has to rewrite whole).
    * Replays are idempotent: re-appending a batch replaces its own
    * addresses with the same values. No aggregation state — the plan
    * depth is O(1) by construction (every append re-reads the manifest).
    *
    * Intra-batch conflicts (one micro-batch writing the same address
    * twice): with `orderCol` set the row with the LARGEST order value wins
    * (`max_by` — deterministic when the source carries an offset or event
    * timestamp); without it the surviving row is ARBITRARY — Spark's
    * `last()` after a shuffle reflects partition arrival order, not source
    * order (r13 advice, low).
    */
  /** Generation GC: every trigger's append auto-vacuums with the keep-2
    * grace (the [[graft.core.Cube.appendZorderedStore]] default), so an
    * N-trigger stream ends with at most 2 manifest generations on disk
    * (spec-pinned) — EXCEPT when the cube records history: undo can
    * restore frames pinning arbitrarily old file lists, so no append
    * auto-vacuums and a long-running stream accumulates one generation +
    * dead files per trigger. That combination is legal but must never be
    * silent (r15 verdict #6) — it warns loudly once per query start.
    */
  def ingestIntoZStore(cube: Cube, stream: DataFrame,
      trigger: Trigger = Trigger.AvailableNow(),
      checkpointDir: Option[String] = None,
      orderCol: Option[String] = None): StreamingQuery = {
    if (cube.historyEnabled)
      System.err.println(s"[graft.Streaming] WARNING: cube '${cube.name}' " +
        "records history, so z-store appends never auto-vacuum (undo can pin " +
        "arbitrarily old file lists) — EVERY trigger of this stream leaves a " +
        "manifest generation and dead segment files on disk; run " +
        "Layout.zorderVacuum explicitly once the history log is dropped")
    val writer = stream.writeStream
      .outputMode(OutputMode.Append)
      .trigger(trigger)
    checkpointDir.foldLeft(writer)((w, d) => w.option("checkpointLocation", d))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cols = cube.dimCols
        val resolved = batch.groupBy(cols.map(col): _*)
          .agg(orderCol match {
            case Some(oc) => max_by(col("value"), col(oc)).as("value")
            case None     => last(col("value")).as("value") // ARBITRARY pick
          })
        // the groupBy above just guaranteed address uniqueness — skip the
        // append's defensive dedup shuffle on this per-trigger hot path
        cube.appendZorderedStore(resolved, assumeUniqueAddresses = true)
        ()
      }
      .start()
  }

  def ingestInto(cube: Cube, stream: DataFrame,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 10,
      checkpointDir: Option[String] = None,
      onBatchMerged: Option[DataFrame => Unit] = None): StreamingQuery = {
    val writer = stream.writeStream
      .outputMode(OutputMode.Append)
      .trigger(trigger)
    // without an explicit location Spark creates an orphan temp checkpoint
    // dir per run — callers that manage a work dir should pass one
    checkpointDir.foldLeft(writer)((w, d) => w.option("checkpointLocation", d))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cols = cube.dimCols
        // intra-batch conflicts resolve to an ARBITRARY row (last() after a
        // shuffle carries no source order); sources with an offset column
        // should pre-aggregate with max_by upstream
        val raw = batch.groupBy(cols.map(col): _*)
          .agg(last(col("value")).as("value"))
        // snapshot facts AND the overlay entries the merge bakes in, so the
        // commit can preserve interactive writes that land mid-merge
        val (facts0, incorporated) = cube.bulkMergeSnapshot()
        // reference parity: streamed writes pass the ON_ENTRY hook too
        // (cube.py:527-537); resolved per batch — rules can change
        // mid-stream. Each micro-batch is exactly the bulk-import shape, so
        // cell-reading (Ref) rules evaluate against the batch's post-write
        // state over the SAME facts snapshot the merge below uses.
        val deduped = graft.olap.Rules.applyOnEntryBulk(cube, raw, Some(facts0))
        val merged = facts0
          .join(broadcast(deduped.select(cols.map(col): _*)), cols, "left_anti")
          .unionByName(deduped.select(facts0.columns.map(col).toIndexedSeq: _*))
        if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
          cube.commitBulkMerge(merged.localCheckpoint(true), incorporated)
        else cube.commitBulkMerge(merged, incorporated)
        // the deduped frame re-evaluates here (its lineage is the batch
        // source + the facts snapshot) — bounded by the batch, and only
        // when a maintainer actually subscribed
        onBatchMerged.foreach(_(deduped))
      }
      .start()
  }

  /** Event-time tumbling/sliding window aggregation with a watermark —
    * works identically on batch and streaming frames.
    */
  def windowedAggregate(events: DataFrame, tsCol: String, watermark: String,
      windowLen: String, slide: Option[String] = None): DataFrame = {
    val win = slide.map(s => window(col(tsCol), windowLen, s))
      .getOrElse(window(col(tsCol), windowLen))
    events.withWatermark(tsCol, watermark)
      .groupBy(win, col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("wstart"), col("window.end").as("wend"),
        col("event_type"), col("n"), col("total"))
  }

  /** Gap-based session windows via the native `session_window` aggregation. */
  def sessionWindowAggregate(events: DataFrame, tsCol: String, watermark: String,
      gap: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total"))
      .select(col("session_window.start").as("sstart"), col("user_id"),
        col("n_events"), col("total"))

  /** Streaming exact dedup: drop duplicate keys within the watermark horizon
    * (the streaming face of `TextDedup.exactDedup`).
    */
  def dedupStream(stream: DataFrame, tsCol: String, watermark: String,
      keyCols: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)

  /** Streaming training-data intake — the streaming face of the batch
    * pipeline operators, composed as one transform: language-ID + quality
    * scoring (pure codegen'd columns, stream-safe), a quality floor, and
    * canonical-fingerprint dedup with watermark-bounded state
    * (`dropDuplicatesWithinWatermark` — reordered/repeated-word duplicates
    * collapse, state evicts as the watermark advances; at scale the dedup
    * state shuffles on the fingerprint, never on the document).
    */
  def documentIntake(docs: DataFrame, tsCol: String, watermark: String,
      textCol: String = "text", minQuality: Double = 0.0): DataFrame = {
    import graft.pipeline.TextAnalysis
    val quality = TextAnalysis.qualityColumns(col(textCol)).toMap.apply("quality")
    docs.withWatermark(tsCol, watermark)
      // empty docs make the quality ratios 0/0 — a DIVIDE_BY_ZERO error
      // under ANSI mode and a NaN (which sorts ABOVE every double, silently
      // passing any floor) otherwise; drop them before the ratios evaluate
      .filter(length(col(textCol)) > 0)
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
      .withColumn("quality", quality)
      .withColumn("fp_canonical", TextAnalysis.canonicalFingerprint(col(textCol)))
      .filter(!isnan(col("quality")) && col("quality") >= minQuality)
      .dropDuplicatesWithinWatermark("fp_canonical")
  }

  /** Streaming corpus accounting: the LEAF cells of
    * `TextAnalysis.corpusReport` maintained incrementally over a document
    * stream (same integer-sum aggregate battery, shared via `corpusAggs`
    * so batch and stream cannot drift). ROLLUP subtotals are not
    * incremental streaming state in Spark — and don't need to be: they
    * derive exactly from the leaf cells downstream. Run in Update/Complete
    * output mode; integer sums make every emitted snapshot exact regardless
    * of micro-batch boundaries.
    */
  def corpusReportStream(docs: DataFrame, stratum1: String, stratum2: String,
      textCol: String = "text"): DataFrame = {
    val aggs = graft.pipeline.TextAnalysis.corpusAggs(col(textCol))
    docs.groupBy(col(stratum1), col(stratum2)).agg(aggs.head, aggs.tail: _*)
  }

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserRunning(user_id: Long, n: Long, total: Double)

  final case class Alert(user_id: Long, n_in_burst: Long, at: java.sql.Timestamp)

  /** flatMapGroupsWithState: emit zero-or-more outputs per key per batch —
    * here a burst detector that alerts when a user accumulates ≥ `threshold`
    * events (then resets its counter). The 0..n output shape is what
    * mapGroupsWithState cannot express.
    */
  def burstAlerts(events: Dataset[UserEvent], threshold: Int): Dataset[Alert] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, Alert](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[Long]) =>
          var count = state.getOption.getOrElse(0L)
          val alerts = scala.collection.mutable.ArrayBuffer[Alert]()
          it.foreach { e =>
            count += 1
            if (count >= threshold) { alerts += Alert(uid, count, e.ts); count = 0L }
          }
          state.update(count)
          alerts.iterator
      }
  }

  final case class TypedEvent(user_id: Long, event_type: String,
      ts: java.sql.Timestamp)
  final case class FunnelProgress(user_id: Long, depth: Int,
      last_t: java.sql.Timestamp)

  /** STREAMING first-touch funnel — the stateful twin of
    * [[graft.ops.Relational.funnelCounts]]: per-user state is (stages
    * completed, time of the last completed stage); each trigger's events
    * are time-sorted within the batch (stage index breaks exact-timestamp
    * ties so the batch operator's `>=` semantics carry over) and folded
    * through the state machine. On a time-ordered replay (range-layout
    * files → cross-batch order holds, only within-batch disorder) the
    * final per-user depth equals the batch funnel exactly — gate-pinned
    * against the same SQL oracle. `depth` is monotone non-decreasing
    * across triggers, so `max(depth)` per user in an update-mode sink IS
    * the final state.
    */
  def funnelStream(events: Dataset[TypedEvent],
      stages: Seq[String]): Dataset[FunnelProgress] = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      "funnel stages must be non-empty and distinct")
    val idx = stages.zipWithIndex.toMap
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[FunnelProgress, FunnelProgress](GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[TypedEvent], state: GroupState[FunnelProgress]) =>
          val prev = state.getOption.getOrElse(FunnelProgress(uid, 0, null))
          var depth = prev.depth
          var lastT = Option(prev.last_t)
          val sorted = it.filter(e => idx.contains(e.event_type)).toArray
            .sortBy(e => (e.ts.getTime, e.ts.getNanos, idx(e.event_type)))
          sorted.foreach { e =>
            if (depth < stages.size && e.event_type == stages(depth) &&
                (depth == 0 || lastT.exists(t => !e.ts.before(t)))) {
              depth += 1
              lastT = Some(e.ts)
            }
          }
          val next = FunnelProgress(uid, depth, lastT.orNull)
          state.update(next)
          next
      }
  }

  /** Custom keyed state: running per-user totals via mapGroupsWithState —
    * the escape hatch for stateful logic the built-in windows can't express.
    */
  def runningTotals(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          val (n, tot) = it.foldLeft((prev.n, prev.total)) { case ((c, t), e) =>
            (c + 1, t + e.value)
          }
          val next = UserRunning(uid, n, tot)
          state.update(next)
          next
      }
  }

  /** Watermark-BOUNDED streaming deduplication: keep the first arrival per
    * key, with state that EXPIRES as the event-time watermark passes — the
    * bounded-memory form of `dropDuplicates` a 100 TB/day stream needs
    * (unbounded dedup state is a slow OOM; `pipe_stream_novelty`'s
    * fingerprint dedup makes the same point with a corpus index). The
    * contract difference is pinned in the spec: a key REAPPEARING after
    * the watermark has passed its first arrival re-emits — exact-once per
    * key is only guaranteed WITHIN the lateness horizon, which is the
    * honest semantics once state must be bounded.
    */
  def dedupWithinWatermark(stream: DataFrame, tsCol: String, delay: String,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "dedup needs at least one key column")
    stream.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
  }

  /** Continuous-intake NEAR-dup novelty: per micro-batch, admit only the
    * documents with no verified near-dup in the PREBUILT corpus index
    * ([[graft.pipeline.TextDedup.nearDupIndex]]) and append the admitted
    * rows to `outPath`. The per-doc decision is against the static index
    * only, so the admitted set is independent of batching — identical to
    * running [[graft.pipeline.TextDedup.dropCorpusNearDups]] over the whole
    * intake as one batch (spec-pinned). Exact repeats within the stream are
    * [[graft.pipeline.TextDedup.novelOnly]]'s job upstream; near-dup
    * residue within the admitted stream belongs to the periodic
    * [[graft.pipeline.TextDedup.purgeNearDups]] compaction. The sink is
    * REPLAY-IDEMPOTENT: each micro-batch overwrites its own
    * `batch_id=<id>` subdirectory, so a batch re-run after a failure
    * (checkpoint replay re-delivers the same batchId) replaces rather than
    * duplicates its admitted rows — reading `outPath` surfaces `batch_id`
    * as an ordinary discovered partition column.
    */
  def nearDupNovelStream(stream: DataFrame, idCol: String, textCol: String,
      idxBands: DataFrame, idxWords: DataFrame, outPath: String,
      threshold: Double = 0.9, k: Int = 64, bands: Int = 16, shingle: Int = 1,
      trigger: Trigger = Trigger.AvailableNow(),
      checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = stream.writeStream
      .outputMode(OutputMode.Append)
      .trigger(trigger)
    checkpointDir.foldLeft(writer)((w, d) => w.option("checkpointLocation", d))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.pipeline.TextDedup.dropCorpusNearDups(batch, idCol, textCol,
            idxBands, idxWords, threshold, k, bands, shingle)
          .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
      }
      .start()
  }

  /** Continuous-intake ENTITY MATCHING: per micro-batch, resolve incoming
    * records against the prebuilt deletion-variant index
    * ([[graft.pipeline.EntityResolution.variantIndex]]) and append the
    * matched `(incoming id, reference id, dist)` pairs to `outPath` — the
    * streaming face of record linkage (link each arriving record to the
    * master entity table it edits-within-k of). Per-record decisions
    * depend only on the static index, so the matched set is independent
    * of batching — identical to one
    * [[graft.pipeline.EntityResolution.matchAgainstIndex]] batch over the
    * whole intake (spec-pinned). Same replay-idempotent sink discipline as
    * [[nearDupNovelStream]]: each micro-batch overwrites its own
    * `batch_id=<id>` subdirectory.
    */
  def erMatchStream(stream: DataFrame, idCol: String, strCol: String,
      index: DataFrame, refIdCol: String, outPath: String, maxDist: Int = 1,
      trigger: Trigger = Trigger.AvailableNow(),
      checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = stream.writeStream
      .outputMode(OutputMode.Append)
      .trigger(trigger)
    checkpointDir.foldLeft(writer)((w, d) => w.option("checkpointLocation", d))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.pipeline.EntityResolution.matchAgainstIndex(batch, idCol,
            strCol, index, refIdCol, maxDist)
          .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
      }
      .start()
  }
}
