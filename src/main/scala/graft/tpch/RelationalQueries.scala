package graft.tpch

import graft.ops.Relational
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The scale-out relational surface (SURVEY §2.3/§2.5/§2.6 "absent in
  * reference" rows + extension goals): joins of every flavor, windows,
  * top-k, set ops, grouping sets, as-of/range joins, scalar functions,
  * event-time windows and sessionization — each against a DuckDB oracle.
  */
object RelationalQueries {

  private def read(s: SparkSession, dir: String, t: String): DataFrame =
    s.read.parquet(s"$dir/$t.parquet")

  /** Schema-adaptive events read. The events table has shipped with two
    * physical `ts` encodings across testdata generations:
    *
    *  - parquet TIMESTAMP(NANOS), which Spark refuses natively: with
    *    `nanosAsLong` it arrives as LongType; convert to µs timestamps (the
    *    data is µs-aligned — no precision loss). Integral `div` is mandatory
    *    here: `/` is double division and 2024-epoch nanos (~1.7e18) exceed
    *    double's 2^53 exact range (ulp = 256 ns), putting ~12% of timestamps
    *    1 µs off versus the exact truncation DuckDB computes.
    *  - parquet timestamp[us] with isAdjustedToUTC=false, which Spark infers
    *    as TIMESTAMP_NTZ: cast to the session-TZ TimestampType (sessions run
    *    UTC — Verify/Bench both set `spark.sql.session.timeZone=UTC` — so
    *    the cast is value-identical to what DuckDB reads).
    *
    * Branching on the actual schema keeps both generations readable.
    */
  def readEvents(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df // already session-TZ TimestampType
    }
  }

  private def dec(c: Column): Column = c.cast("decimal(15,2)")
  private val REV = "CAST(l_extendedprice AS DECIMAL(15,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // broadcast hash join: small dim explicitly broadcast
    "rel_join_broadcast" -> ((s, dir) => {
      read(s, dir, "lineitem")
        .join(broadcast(read(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(5,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"), count(lit(1)).as("n"))
    }),

    // shuffle join on the two big tables (AQE-planned at scale)
    "rel_join_shuffle" -> ((s, dir) => {
      read(s, dir, "orders").join(read(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(dec(col("l_extendedprice"))).cast("double").as("revenue"))
    }),

    // left-semi: EXISTS
    "rel_semi_join" -> ((s, dir) => {
      read(s, dir, "customer")
        .join(read(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .join(broadcast(read(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n_customers"))
    }),

    // left-anti: NOT EXISTS
    "rel_anti_join" -> ((s, dir) => {
      read(s, dir, "customer")
        .join(read(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(read(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n_customers"))
    }),

    // per-group top-n via row_number window
    "rel_window_topn" -> ((s, dir) => {
      Relational.topNPerGroup(read(s, dir, "orders"), Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
        .select(col("o_orderkey"), col("o_custkey"), col("rn"))
    }),

    // global top-k (TakeOrderedAndProject — no full sort)
    "rel_topk" -> ((s, dir) => {
      Relational.topK(read(s, dir, "orders"), 10, col("o_totalprice").desc, col("o_orderkey").asc)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // distinct aggregation
    "rel_distinct" -> ((s, dir) => {
      read(s, dir, "customer").groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_nationkey")).as("n_nations"), count(lit(1)).as("n_customers"))
    }),

    // set ops: customers ordering in both 1995 and 1996 (INTERSECT)
    "rel_setops" -> ((s, dir) => {
      val o = read(s, dir, "orders")
      def keys(y: String) = o.filter(date_format(col("o_orderdate"), "yyyy") === y)
        .select(col("o_custkey")).distinct()
      keys("1995").intersect(keys("1996"))
        .except(keys("1997").except(keys("1995"))) // except is a no-op filter here; exercises the op
    }),

    // grouping sets / rollup over the geo attributes
    "rel_grouping_sets" -> ((s, dir) => {
      read(s, dir, "customer")
        .join(broadcast(read(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(read(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(sum(dec(col("c_acctbal"))).cast("double").as("balance"), count(lit(1)).as("n"))
    }),

    // CUBE: all four grouping combinations in ONE aggregation pass (the
    // Expand duplicates rows into the grains; one shuffle total, vs four
    // separate groupBys = four scans + four shuffles); grouping_id()
    // disambiguates data NULLs from subtotal rows — the same discipline
    // the OLAP face's Aggregates summaries use member ids for
    "rel_cube" -> ((s, dir) => {
      read(s, dir, "orders")
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(sum(dec(col("o_totalprice"))).cast("double").as("total"),
          count(lit(1)).as("n"), grouping_id().as("gid"))
    }),

    // pivot: wide conditional aggregation — one codegen'd hash aggregate,
    // no per-value scans (the pinned value list keeps the schema static,
    // as a 100 TB plan requires — inferring values would add a scan job)
    "rel_pivot" -> ((s, dir) => {
      read(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity").cast("decimal(21,4)")).cast("double"))
    }),

    // unpivot: long-form melt of the lineitem measures — scan-shaped
    // (one stack projection, no shuffle)
    "rel_unpivot" -> ((s, dir) => {
      read(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("qty"),
          col("l_extendedprice").cast("double").as("price"),
          col("l_discount").cast("double").as("discount"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("qty"), col("price"), col("discount")), "measure", "val")
    }),

    // as-of join: latest error event at-or-before each click, per user
    "rel_asof_join" -> ((s, dir) => {
      val e = readEvents(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val errors = e.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_id").as("error_id"))
      Relational.asOfJoin(clicks, errors, Seq("user_id"), "ts", "event_id", Seq("error_id"))
        .select(col("event_id").as("click_id"), col("error_id"))
    }),

    // range join: clicks within 1h after each error, per user
    "rel_range_join" -> ((s, dir) => {
      val e = readEvents(s, dir)
      val err = e.filter(col("event_type") === "error")
        .select(col("user_id").as("u"), col("ts").as("t0"), col("event_id").as("error_id"))
      val clk = e.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("ct"), col("event_id").as("click_id"))
      err.join(clk, col("u") === col("cu") &&
          col("ct") >= col("t0") && col("ct") <= col("t0") + expr("INTERVAL 1 HOUR"), "left")
        .groupBy(col("error_id")).agg(count(col("click_id")).as("n_clicks"))
    }),

    // scalar function battery (string/date/math) — codegen'd built-ins only
    "rel_scalar_funcs" -> ((s, dir) => {
      read(s, dir, "part").filter(col("p_partkey") < 100)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 5).as("prefix"),
          length(col("p_name")).as("name_len"),
          regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          abs(col("p_size") - 25).as("size_dist"),
          round(col("p_retailprice") * 2, 1).as("double_price"),
          sqrt(col("p_size").cast("double")).as("size_sqrt"))
    }),

    // date/time functions on orders
    "rel_date_funcs" -> ((s, dir) => {
      read(s, dir, "orders").filter(col("o_orderkey") < 400)
        .select(
          col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_format(col("o_orderdate"), "E").as("dow"),
          date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("d30"))
    }),

    // running windowed aggregation (exact decimal running sums)
    "rel_window_running" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      read(s, dir, "orders")
        .select(col("o_orderkey"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("running"))
    }),

    // event-TIME-RANGE window frame: per user, events in the trailing hour
    // (RANGE BETWEEN on µs epoch — a sliding aggregate with no bucketing,
    // the frame ends exactly at each row). Distinct from both the tumbling
    // window (fixed buckets) and the rows-frame running sum: the frame is
    // defined by the ORDER VALUE, so ties share identical frames in Spark
    // and the oracle. One shuffle on the partition key.
    "rel_window_timerange" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600L * 1000L * 1000L, org.apache.spark.sql.expressions.Window.currentRow)
      readEvents(s, dir).select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("value").cast("decimal(15,2)")).over(w).cast("double").as("sum_1h"))
    }),

    // event-time tumbling window aggregation (Structured-Streaming-shaped)
    "rel_events_tumbling" -> ((s, dir) => {
      readEvents(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("total"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
          col("event_type"), col("n"), col("total"))
    }),

    // 3-way join: revenue by supplier nation (supplier ⋈ lineitem ⋈ nation)
    "rel_join_threeway" -> ((s, dir) => {
      read(s, dir, "lineitem")
        .join(broadcast(read(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(read(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice"))).cast("double").as("revenue"),
          countDistinct(col("s_suppkey")).as("n_suppliers"))
    }),

    // HLL sketch distinct (rows-only: sketch internals are engine-specific;
    // error bound asserted in specs against the exact count)
    // HLL approximate distinct, verified: per-group relative error vs the
    // in-engine exact countDistinct, thresholded at 5% (HLL rsd=0.01 sits
    // far inside) and oracle-checked as booleans — the sketch value itself
    // has no DuckDB twin, but a drifting sketch now FAILS the gate
    "rel_approx_distinct" -> ((s, dir) => {
      read(s, dir, "orders").groupBy(col("o_orderpriority"))
        .agg(approx_count_distinct(col("o_custkey"), 0.01).as("approx"),
          countDistinct(col("o_custkey")).as("exact"))
        .agg(
          max(abs(col("approx") - col("exact")).cast("double") /
            col("exact").cast("double")).as("__maxerr"),
          count(lit(1)).as("__n"))
        .select((col("__maxerr") <= 0.05).as("err_ok"), (col("__n") > 0).as("nonempty_ok"))
    }),

    // MERGEABLE distinct sketches (round 11): the summary-table answer for
    // NON-ADDITIVE measures — an exact distinct count cannot roll up from
    // a pre-aggregate, but HLL sketches can. Build one sketch per NATION
    // (the grain a summary table would store), then answer the REGION
    // question by MERGING the nation sketches — never rescanning the
    // customer table. Customers belong to exactly one nation, so the
    // per-nation exact distincts SUM to the region exact — the yardstick
    // the merged estimate is error-gated against (HLL default lgK error
    // ~1.6%; gate at 5%).
    "rel_hll_rollup" -> ((s, dir) => {
      val cust = read(s, dir, "customer")
        .join(read(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      val perNation = cust.groupBy(col("n_regionkey"), col("n_nationkey"))
        .agg(hll_sketch_agg(col("c_custkey")).as("sk"),
          countDistinct(col("c_custkey")).as("exact"))
      val perRegion = perNation.groupBy(col("n_regionkey"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx"),
          sum(col("exact")).as("exact"))
      perRegion.agg(
        max(abs(col("approx") - col("exact")).cast("double") /
          col("exact").cast("double")).as("__maxerr"),
        count(lit(1)).as("__n"))
        .select((col("__maxerr") <= 0.05).as("err_ok"),
          (col("__n") > 0).as("nonempty_ok"))
    }),

    // exact interpolated percentiles (quantities are integer-valued, so the
    // interpolation arithmetic is exact in double on both engines)
    "rel_percentiles" -> ((s, dir) => {
      read(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25)").as("q25"),
          expr("percentile(l_quantity, 0.5)").as("median"),
          expr("percentile(l_quantity, 0.75)").as("q75"),
          min(col("l_quantity")).as("mn"), max(col("l_quantity")).as("mx"))
    }),

    // window navigation battery: lag (inter-event gap), lead (next value),
    // ntile (quartile buckets) over the deterministic (ts, event_id) order
    "rel_window_lag" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      readEvents(s, dir).select(
        col("event_id"), col("user_id"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).as("gap_us"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        ntile(4).over(w).as("quartile"))
    }),

    // hopping (sliding) event-time windows (round 9): 1-hour windows every
    // 30 minutes — each event lands in exactly length/slide = 2 windows
    // (Spark's `window` plans a Generate fan-out, epoch-aligned starts);
    // decimal-exact sums keep the overlap totals order-independent
    "rel_events_hopping" -> ((s, dir) => {
      readEvents(s, dir)
        .select(col("event_type"), col("value").cast("decimal(15,2)").as("value"),
          window(col("ts"), "1 hour", "30 minutes").as("w"))
        .groupBy(col("w.start").as("ws"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).cast("double").as("total"))
        .select(date_format(col("ws"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
          col("event_type"), col("n"), col("total"))
    }),

    // the full rank-function battery (round 9): rank/dense_rank over value
    // ties, plus the distribution ranks — percent_rank = (rank−1)/(n−1)
    // and cume_dist = peers≤x / n are single divisions of exact integers,
    // so the doubles are bit-identical across engines
    "rel_window_ranks" -> ((s, dir) => {
      // ORDER BY value alone: rank functions are functions of the KEY VALUE
      // (peers share ranks), so ties are exercised AND every output row is
      // deterministic without a tiebreak column
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
        .orderBy(col("value"))
      readEvents(s, dir).select(
        col("event_id"), col("user_id"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cdist"))
    }),

    // ordered first-touch funnel (round 12): view → click → purchase, per
    // stage the user's earliest qualifying event at-or-after the previous
    // stage's time — a fold of stage-selective scans joined on the user
    // key against the shrinking survivor frame (filters push to the
    // source; no window over all events)
    "rel_funnel" -> ((s, dir) =>
      Relational.funnelCounts(readEvents(s, dir), col("user_id"),
        col("event_type"), col("ts"), Seq("view", "click", "purchase"))),

    // cohort retention (round 12): day-grain distinct activity → per-user
    // first day → (cohort, days-since) counts; the activity distinct is
    // the only event-volume shuffle
    "rel_retention" -> ((s, dir) =>
      Relational.retention(readEvents(s, dir), col("user_id"), col("ts"))),

    // DAU/WAU curves (round 12): exact per-day distinct + trailing-7-day
    // distinct via window-merged HLL sketches (one sketch per day — never
    // a re-scan of the window's events). DAU is SQL-oracled exactly; the
    // sketch estimate verifies in-engine against the exact trailing
    // distinct (non-equi join = the embedded quadratic BASELINE, declared
    // in PlanShapeSpec; the raw operator is asserted via Bench.rawOps)
    "rel_active_users" -> ((s, dir) => {
      val e = readEvents(s, dir)
      val au = Relational.activeUsers(e, col("user_id"), col("ts"), 7)
      val act = e.select(col("user_id").as("u"), to_date(col("ts")).as("d")).distinct()
      val exact = au.select(col("day"))
        .join(act, datediff(to_date(col("day")), col("d")).between(0, 6))
        .groupBy(col("day")).agg(countDistinct(col("u")).as("wx"))
      au.join(exact, "day")
        .select(col("day"), col("dau"),
          (abs(col("trailing_au") - col("wx")) <= col("wx") * 0.05).as("wau_ok"))
    }),

    // gap-based sessionization (lag + running session counter)
    "rel_sessionize" -> ((s, dir) => {
      Relational.sessionize(readEvents(s, dir), "user_id", "ts", "event_id", 1800)
        .groupBy(col("user_id"))
        .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
    }),

    // approximate percentiles — the quantile path that actually scales (the
    // exact form sorts the whole group; approx_percentile is one-pass
    // mergeable sketch state). Verified like the HLL gate: in-engine
    // against the exact per-group quantiles, thresholded at 2% of the
    // group's value RANGE (quantile error is positional, so a rank-epsilon
    // guarantee maps to a value tolerance via the spread), booleans oracled
    // as the constant all-true row — a drifting sketch FAILS the gate.
    "rel_approx_percentiles" -> ((s, dir) => {
      val li = read(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(
          percentile_approx(col("l_extendedprice"), array(lit(0.25), lit(0.5), lit(0.75)),
            lit(1000)).as("ap"),
          expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))").as("ex"),
          (max(col("l_extendedprice")) - min(col("l_extendedprice"))).as("range"))
        .select(explode(arrays_zip(col("ap"), col("ex"))).as("z"), col("range"))
        .agg(max(abs(col("z.ap") - col("z.ex")) / col("range")).as("__maxerr"),
          count(lit(1)).as("__n"))
        .select((col("__maxerr") <= 0.02).as("err_ok"), (col("__n") > 0).as("nonempty_ok"))
    }),

    // skew-safe salted join: the SAME aggregate as rel_join_shuffle computed
    // through Relational.saltedJoin (left keys salted into 8 subkeys, right
    // side replicated per subkey) — result parity with the plain shuffle
    // join is the gate, via the identical oracle. The portable skew tool
    // for when one hot key would otherwise pin a single reducer at 100 TB.
    "rel_join_salted" -> ((s, dir) => {
      val orders = read(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      Relational.saltedJoin(
          read(s, dir, "lineitem").select(col("l_orderkey"), col("l_extendedprice")),
          orders, "l_orderkey", salt = 8)
        .groupBy(col("o_orderpriority"))
        .agg(sum(dec(col("l_extendedprice"))).cast("double").as("revenue"))
    }),

    // AUTO-skew salted join (round 13): a hot key is PLANTED (half the
    // lineitems collapse onto orderkey 1), no manual salt parameter —
    // skewFactors' sketch pass must detect it (require'd, so the gate
    // can't pass vacuously through the plain-join branch), salt only it,
    // and keep exact parity with the plain join the oracle runs
    "rel_join_salted_auto" -> ((s, dir) => {
      val skewed = read(s, dir, "lineitem")
        .select(when(col("l_orderkey") % 2 === 0, lit(1L))
          .otherwise(col("l_orderkey")).as("l_orderkey"),
          col("l_extendedprice"))
      // skewFactor 1.5 so detection fires at any shuffle-partition count
      // the harness uses (4 locally, 32 in the driver): the planted key
      // holds ~50% of rows, i.e. nPart/2 reducer targets
      require(Relational.skewFactors(skewed, "l_orderkey", skewFactor = 1.5).nonEmpty,
        "the planted hot key must be detected — a vacuous plain-join pass " +
          "would not exercise auto-salting")
      val orders = read(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      Relational.saltedJoinAuto(skewed, orders, "l_orderkey", skewFactor = 1.5)
        .groupBy(col("o_orderpriority"))
        .agg(sum(dec(col("l_extendedprice"))).cast("double").as("revenue"))
    }),

    // semi-structured: typed JSON extraction from the events `props` column
    // — `from_json` with an explicit schema (the codegen'd Jackson path; a
    // malformed document yields NULL, counted rather than erroring), then
    // integer aggregates so the oracle compare is exact. At scale this is a
    // pure scan: extraction stays inside WholeStageCodegen, no shuffle
    // beyond the final hash agg.
    "rel_json_props" -> ((s, dir) => {
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      readEvents(s, dir)
        .withColumn("k",
          from_json(col("props"), StructType(Seq(StructField("k", LongType))))
            .getField("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"),
          count(when(col("k").isNull, 1)).as("n_null"))
    }),

    // event-time interval self-join (round 9): view→click attribution —
    // per click, the same user's views in the trailing 30 minutes
    // (inclusive bounds), aggregated per user. The time-bound equi-key
    // join shape whose streaming twin (rel_event_pairs_stream) is the
    // stream-stream join with two-sided state; this batch plan is the
    // parity anchor. One shuffle on user_id; the interval predicate rides
    // the join as a post-condition on the equi-match.
    "rel_event_pairs" -> ((s, dir) => {
      val e = readEvents(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("cts"), col("event_id").as("cid"))
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id").as("vu"), col("ts").as("vts"), col("event_id").as("vid"))
      clicks.join(views,
          col("cu") === col("vu") &&
            col("vts") >= col("cts") - expr("interval 30 minutes") &&
            col("vts") <= col("cts"))
        .groupBy(col("cu").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          count_distinct(col("cid")).as("n_clicks_matched"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // error-bound verification summary: Spark measures HLL vs exact and
    // emits booleans; the oracle is the constant all-true row
    "rel_approx_distinct" -> "SELECT TRUE AS err_ok, TRUE AS nonempty_ok",
    "rel_hll_rollup" -> "SELECT TRUE AS err_ok, TRUE AS nonempty_ok",
    "rel_approx_percentiles" -> "SELECT TRUE AS err_ok, TRUE AS nonempty_ok",
    "rel_join_broadcast" ->
      s"""SELECT p_brand, CAST(SUM($REV) AS DOUBLE) AS revenue, COUNT(*) AS n
          FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand""",

    "rel_join_shuffle" ->
      """SELECT o_orderpriority, CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS revenue
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY o_orderpriority""",

    // parity with the plain shuffle join IS the gate: salting must not
    // change the result, only the shuffle layout
    "rel_join_salted" ->
      """SELECT o_orderpriority, CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS revenue
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY o_orderpriority""",

    // the same parity contract for the auto-detected variant, over the
    // hot-key-planted left side
    "rel_join_salted_auto" ->
      """SELECT o_orderpriority, CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS revenue
         FROM orders JOIN (
           SELECT CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE l_orderkey END AS l_orderkey,
                  l_extendedprice FROM lineitem) l
         ON o_orderkey = l.l_orderkey GROUP BY o_orderpriority""",

    "rel_semi_join" ->
      """SELECT n_name, COUNT(*) AS n_customers FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY n_name""",

    "rel_anti_join" ->
      """SELECT n_name, COUNT(*) AS n_customers FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY n_name""",

    "rel_window_topn" ->
      """SELECT o_orderkey, o_custkey, rn FROM (
           SELECT o_orderkey, o_custkey,
                  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3""",

    "rel_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",

    "rel_distinct" ->
      """SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations, COUNT(*) AS n_customers
         FROM customer GROUP BY c_mktsegment""",

    "rel_setops" ->
      """SELECT o_custkey FROM orders WHERE strftime(o_orderdate,'%Y')='1995'
         INTERSECT
         SELECT o_custkey FROM orders WHERE strftime(o_orderdate,'%Y')='1996'
         EXCEPT
         (SELECT o_custkey FROM orders WHERE strftime(o_orderdate,'%Y')='1997'
          EXCEPT
          SELECT o_custkey FROM orders WHERE strftime(o_orderdate,'%Y')='1995')""",

    "rel_grouping_sets" ->
      """SELECT r_name, n_name, CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2))) AS DOUBLE) AS balance,
                COUNT(*) AS n
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)""",

    // Spark's grouping_id bit order: first grouping column = MSB
    "rel_cube" ->
      """SELECT o_orderpriority, o_orderstatus,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total,
           COUNT(*) AS n,
           GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS gid
         FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)""",

    "rel_pivot" ->
      """SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(21,4)) END) AS DOUBLE) AS F,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(21,4)) END) AS DOUBLE) AS O
         FROM lineitem GROUP BY l_returnflag""",

    "rel_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'qty' AS measure, CAST(l_quantity AS DOUBLE) AS val FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'price', CAST(l_extendedprice AS DOUBLE) FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'discount', CAST(l_discount AS DOUBLE) FROM lineitem""",

    "rel_asof_join" ->
      """SELECT c.event_id AS click_id,
           (SELECT e.event_id FROM events e
            WHERE e.user_id = c.user_id AND e.event_type = 'error'
              AND (e.ts < c.ts OR (e.ts = c.ts AND e.event_id <= c.event_id))
            ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS error_id
         FROM events c WHERE c.event_type = 'click'""",

    "rel_range_join" ->
      """SELECT e.event_id AS error_id, COUNT(c.event_id) AS n_clicks
         FROM events e LEFT JOIN events c
           ON c.user_id = e.user_id AND c.event_type = 'click'
          AND c.ts >= e.ts AND c.ts <= e.ts + INTERVAL 1 HOUR
         WHERE e.event_type = 'error'
         GROUP BY e.event_id""",

    "rel_scalar_funcs" ->
      """SELECT p_partkey, UPPER(p_name) AS uname, SUBSTRING(p_name, 1, 5) AS prefix,
           LENGTH(p_name) AS name_len,
           COALESCE(regexp_extract(p_type, '^(\w+)', 1), '') AS type_head,
           p_brand || '|' || p_type AS brand_type,
           ABS(p_size - 25) AS size_dist,
           ROUND(p_retailprice * 2, 1) AS double_price,
           SQRT(CAST(p_size AS DOUBLE)) AS size_sqrt
         FROM part WHERE p_partkey < 100""",

    "rel_date_funcs" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS d,
           CAST(strftime(o_orderdate, '%Y') AS INT) AS y,
           CAST(strftime(o_orderdate, '%m') AS INT) AS m,
           CAST(strftime(o_orderdate, '%d') AS INT) AS dom,
           strftime(o_orderdate, '%a') AS dow,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS d30
         FROM orders WHERE o_orderkey < 400""",

    "rel_window_running" ->
      """SELECT o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
         FROM orders""",

    "rel_window_timerange" ->
      """SELECT event_id, user_id,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(15,2))) OVER w AS DOUBLE) AS sum_1h
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""",

    "rel_events_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS wstart, event_type,
           COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(15,2))) AS DOUBLE) AS total
         FROM events GROUP BY 1, 2""",

    "rel_join_threeway" ->
      """SELECT n_name, CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS revenue,
           COUNT(DISTINCT s_suppkey) AS n_suppliers
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name""",

    "rel_percentiles" ->
      """SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.5) AS median,
           quantile_cont(l_quantity, 0.75) AS q75,
           min(l_quantity) AS mn, max(l_quantity) AS mx
         FROM lineitem GROUP BY l_returnflag""",

    "rel_window_lag" ->
      """SELECT event_id, user_id,
           epoch_ns(ts) // 1000 - epoch_ns(LAG(ts) OVER w) // 1000 AS gap_us,
           LEAD(event_type) OVER w AS next_type,
           NTILE(4) OVER w AS quartile
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",

    // an event at t belongs to the two 30-min-aligned starts in (t−1h, t]:
    // its own 30-min bucket and the one before — epoch-aligned like Spark's
    "rel_events_hopping" ->
      """WITH e AS (SELECT event_type, CAST(value AS DECIMAL(15,2)) AS value,
             to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)) AS b
           FROM events),
         x AS (SELECT event_type, value, b AS ws FROM e
               UNION ALL
               SELECT event_type, value, b - INTERVAL 30 MINUTE AS ws FROM e)
         SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS wstart, event_type,
           COUNT(*) AS n, CAST(SUM(value) AS DOUBLE) AS total
         FROM x GROUP BY 1, 2""",

    "rel_window_ranks" ->
      """SELECT event_id, user_id,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           PERCENT_RANK() OVER w AS prnk,
           CUME_DIST() OVER w AS cdist
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY value)""",

    // inclusive BETWEEN mirrors the engine's >= / <= interval bounds
    "rel_event_pairs" ->
      """SELECT c.user_id, COUNT(*) AS n_pairs,
           COUNT(DISTINCT c.event_id) AS n_clicks_matched
         FROM events c JOIN events v
           ON v.user_id = c.user_id
          AND c.event_type = 'click' AND v.event_type = 'view'
          AND v.ts BETWEEN c.ts - INTERVAL 30 MINUTE AND c.ts
         GROUP BY c.user_id""",

    // CAST(SUM(...) AS BIGINT): DuckDB's SUM over BIGINT widens to HUGEINT,
    // which arrives driver-side as float64 and can never hash-match Spark's
    // int64 — same convention as rel_sessionize below. The json_valid guard
    // mirrors Spark's from_json NULL-on-malformed semantics (DuckDB's
    // json_extract_string raises on invalid JSON instead of yielding NULL).
    "rel_json_props" ->
      """WITH ext AS (
           SELECT event_type,
             CASE WHEN json_valid(props)
                  THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
           FROM events)
         SELECT event_type, COUNT(*) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           MIN(k) AS min_k,
           MAX(k) AS max_k,
           COUNT(CASE WHEN k IS NULL THEN 1 END) AS n_null
         FROM ext GROUP BY event_type""",

    "rel_sessionize" ->
      """WITH flagged AS (
           SELECT user_id,
             CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800 OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
         FROM flagged GROUP BY user_id""",

    // exact DAU; the trailing sketch estimate gates as the error-bound
    // boolean (a drifting sketch fails the gate)
    "rel_active_users" ->
      """WITH a AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events)
         SELECT strftime(d, '%Y-%m-%d') AS day, count(*) AS dau, TRUE AS wau_ok
         FROM a GROUP BY d""",

    // identical two-agg + join restatement; dates rendered as text so the
    // engines' date carriers agree byte-for-byte
    "rel_retention" ->
      """WITH a AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
           c AS (SELECT u, min(d) AS cd FROM a GROUP BY 1)
         SELECT strftime(cd, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', cd, d) AS BIGINT) AS period_n,
           count(*) AS n_users
         FROM a JOIN c USING (u) GROUP BY 1, 2""",

    // first-touch funnel restated as the stage-join chain — pure timestamp
    // `>=` tie semantics on both sides
    "rel_funnel" ->
      """WITH s1 AS (SELECT user_id AS u, min(ts) AS t FROM events
                     WHERE event_type = 'view' GROUP BY 1),
           s2 AS (SELECT e.user_id AS u, min(e.ts) AS t FROM events e
                  JOIN s1 ON e.user_id = s1.u AND e.ts >= s1.t
                  WHERE e.event_type = 'click' GROUP BY 1),
           s3 AS (SELECT e.user_id AS u, min(e.ts) AS t FROM events e
                  JOIN s2 ON e.user_id = s2.u AND e.ts >= s2.t
                  WHERE e.event_type = 'purchase' GROUP BY 1)
         SELECT 1 AS stage, 'view' AS event_type, count(*) AS n_users FROM s1
         UNION ALL
         SELECT 2, 'click', count(*) FROM s2
         UNION ALL
         SELECT 3, 'purchase', count(*) FROM s3""",
  )
}
