package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.graft.Bridge
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guard over the WHOLE gate set: every
  * `SparkEntry.queries` plan is checked for quadratic join shapes
  * (`CartesianProduct` / `BroadcastNestedLoopJoin`) and for parquet scans
  * that ignore a pushdown-eligible literal predicate. Point-wise plan
  * asserts exist in DegenerateDimSpec and Round2FixesSpec; this spec keeps
  * the NEXT operator from shipping the first plan that happened to pass.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** Gates whose nested-loop join is DECLARED: either an exact all-pairs
    * correctness baseline (excluded from the bench by design, see
    * Bench.rawOps scaladoc) or a documented bounded-broadcast-side scan
    * (the nested loop's build side cannot grow with the corpus).
    */
  private val declaredNestedLoops = Set("pipe_ann_brute", "pipe_dedup_embed",
    // the fusion gate feeds on bruteForceTopK as its oracle-exact semantic
    // arm (the broadcast nested loop is THAT documented baseline; fusion
    // itself is a bounded top-k join) — the scale path swaps in ivfPqTopK
    "pipe_hybrid_rrf",
    // semantic decontamination: the nested loop's BROADCAST side is the
    // EVAL set — small by nature (a benchmark, not a corpus), documented in
    // Similarity.semanticContaminationPairs — so the plan is O(|corpus|·
    // |eval|) scan-shaped work with no corpus shuffle, not a quadratic
    // corpus self-join; NgramSemanticSpec pins the broadcast orientation
    "pipe_decontaminate_semantic",
    // same declared shape embedded in the curation composition's semantic
    // stage (Curation.curateCorpusSemantic)
    "pipe_curate_semantic")

  /** Gates that return a verification SUMMARY: the raw scalable operator
    * PLUS an exact brute-force baseline PLUS a recall/containment compare
    * in one frame. Any quadratic shape in these plans belongs to the
    * embedded baseline; the raw operators themselves are asserted
    * quadratic-free via `Bench.rawOps` below.
    */
  private val verificationSummaries = Set(
    "pipe_ann_lsh", "pipe_ann_ivf", "pipe_ann_ivf_persist",
    "pipe_ann_ivfpq", "pipe_ann_ivfpq_persist", "pipe_ann_ivfpq_rerank",
    "pipe_dedup_simhash", "pipe_dedup_embed_lsh",
    // indexed fusion vs the EXACT fusion (bruteForceTopK arm) — the raw
    // serving composition is asserted via Bench.rawOps below
    "pipe_hybrid_rrf_indexed",
    // trailing-HLL estimate vs the exact trailing distinct (day-grain
    // non-equi join baseline) — raw operator asserted via Bench.rawOps
    "rel_active_users")

  // one planning pass shared by both tests (some gate closures also run
  // driver-side setup — streams, scratch-cube writes — so build once)
  private lazy val plans: Seq[(String, DataFrame)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, sfDir)
    } ++ Bench.rawOps.toSeq.sortBy(_._1).map { case (name, fn) =>
      s"raw:$name" -> fn(spark, sfDir)
    }

  test("no gated plan contains a quadratic join shape outside the declared baselines") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    // a nested-loop join whose BROADCAST side is a global (grouping-free)
    // aggregate is a scalar attach — one row against the stream, O(n·1),
    // the documented "grand total rides the plan" shape (Search.tfidf/
    // vocabCoverage). Anything else nested-loop or cartesian is quadratic.
    def isScalarAttach(j: BroadcastNestedLoopJoinExec): Boolean = {
      def oneRowAgg(p: SparkPlan): Boolean = p.collectFirst {
        case a: BaseAggregateExec if a.groupingExpressions.isEmpty => a
      }.isDefined
      j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => oneRowAgg(j.left)
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => oneRowAgg(j.right)
      }
    }
    def quadratic(p: SparkPlan): Boolean =
      p.toString.contains("CartesianProduct") ||
        p.collect { case j: BroadcastNestedLoopJoinExec if !isScalarAttach(j) => j }.nonEmpty
    val offenders = plans.collect {
      case (name, df)
          if !declaredNestedLoops(name) && !verificationSummaries(name) &&
            quadratic(df.queryExecution.sparkPlan) =>
        name
    }
    assert(offenders.isEmpty,
      s"quadratic join shapes leaked into gated plans: ${offenders.mkString(", ")}")
  }

  test("every parquet scan pushes its pushdown-eligible data filters") {
    // a scan carrying a translatable predicate in dataFilters but pushing
    // NOTHING to the source reads rows it was told how to skip
    val offenders = plans.flatMap { case (name, df) =>
      df.queryExecution.sparkPlan.collect {
        case scan: FileSourceScanExec
            if scan.dataFilters.exists(Bridge.isPushable) &&
              scan.metadata.get("PushedFilters").contains("[]") =>
          s"$name (${scan.dataFilters.mkString(", ")})"
      }
    }
    assert(offenders.isEmpty,
      s"pushable filters left unpushed at the parquet scan: ${offenders.mkString("; ")}")
  }
}
