package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Convention for oracle parity: every aggregated numeric output is computed
  * through EXACT intermediates (decimal casts of fixed-point inputs, or
  * integer arithmetic) and cast to double only at the end, so the result is
  * independent of partitioning/summation order and bit-identical to DuckDB's.
  */
object SparkEntry {

  /** Exact decimal view of a fixed-point double column (TPC-H money/quantity
    * values have ≤2 decimals; discount/tax ≤2): sums become order-independent.
    * Precision kept tight so products stay EXACT (15,2 × 5,2 → 21,4 — no
    * precision-loss rounding, which Spark and DuckDB would do differently).
    */
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(15,2)")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  private def read(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = baseQueries ++
    graft.tpch.TpchQueries.queries ++ graft.tpch.RelationalQueries.queries ++
    graft.tpch.PipelineQueries.queries ++ graft.tpch.StreamingQueries.queries

  private def baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> ((s, dir) => {
      read(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(5,2)") - col("l_discount").cast("decimal(5,2)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // TPC-H Q3 shape (shipping priority): segment-filtered customer ⋈
    // orders ⋈ lineitem, revenue per open order, deterministic top 10.
    // customers broadcast (segment slice of a dimension table); the
    // orders⋈lineitem join shuffles on the order key; TakeOrdered caps the
    // result driver-side. Decimal-exact revenue; ties broken by order key
    // so the LIMIT boundary is engine-independent.
    "q3_shipping_priority" -> ((s, dir) => {
      val cut = lit("1997-06-30").cast("timestamp")
      val cust = read(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val orders = read(s, dir, "orders")
        .filter(col("o_orderdate") < cut)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = read(s, dir, "lineitem")
        .filter(col("l_shipdate") > cut)
        .select(col("l_orderkey"),
          (dec(col("l_extendedprice")) *
            (lit(1).cast("decimal(5,2)") - col("l_discount").cast("decimal(5,2)")))
            .as("rev"))
      orders.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
        .withColumn("o_orderdate", date_format(col("o_orderdate"), "yyyy-MM-dd"))
    }),

    // TPC-H Q5 shape (local supplier volume): revenue per nation where the
    // CUSTOMER and SUPPLIER sit in the same nation of one region, one
    // order-year. nation⋈region⋈supplier collapse into one broadcast side
    // (dimension tables); customer broadcasts; only orders⋈lineitem
    // shuffles, on the order key — the plan a 100 TB fact table wants.
    "q5_local_supplier" -> ((s, dir) => {
      val nat = read(s, dir, "nation")
        .join(read(s, dir, "region").filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val supp = read(s, dir, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val cust = read(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val orders = read(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val li = read(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"),
        (dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(5,2)") - col("l_discount").cast("decimal(5,2)")))
          .as("rev"))
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
    }),

    // TPC-H Q4 shape (order priority checking): orders of one quarter that
    // had at least one LATE line (shipped > 60 days after the order date),
    // counted per priority. The EXISTS becomes a LEFT SEMI join on the order
    // key with the lateness predicate as a join-side condition — the fact
    // table is filtered and de-correlated in one pass, no per-order probe.
    // Both sides shuffle on l_orderkey once; the quarter filter reaches the
    // orders scan (PushedFilters), so at 100 TB only the quarter's keys move.
    "q4_order_priority" -> ((s, dir) => {
      val orders = read(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val late = read(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      orders.join(late,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // TPC-H Q14 shape (promotion effect): share of one month's revenue from
    // PROMO parts. part is a dimension — broadcast; the month filter prunes
    // the fact scan; the conditional split is a codegen'd CASE inside ONE
    // aggregation (no second pass for the numerator). Numerator/denominator
    // are decimal-exact; the ratio is one double division at the very end,
    // mirrored operation-for-operation by the oracle.
    "q14_promo_revenue" -> ((s, dir) => {
      val part = read(s, dir, "part").select(col("p_partkey"), col("p_type"))
      val li = read(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("l_partkey"),
          (dec(col("l_extendedprice")) *
            (lit(1).cast("decimal(5,2)") - col("l_discount").cast("decimal(5,2)")))
            .as("rev"))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("rev"))
            .otherwise(lit(0).cast("decimal(21,4)"))).cast("double").as("promo_rev"),
          sum(col("rev")).cast("double").as("total_rev"))
        .select(col("promo_rev"), col("total_rev"),
          (col("promo_rev") * lit(100.0) / col("total_rev")).as("promo_pct"))
    }),

    // TPC-H Q18 shape (large-volume orders): orders whose total quantity
    // exceeds a threshold, joined back to their header + customer. The
    // HAVING filter runs where the data is (one fact-side aggregation) and
    // the join back is left to AQE: the surviving key set's size is
    // THRESHOLD-dependent (it grows linearly with the fact table at a
    // fixed cutoff), so a static broadcast hint would be a lie at 100 TB —
    // AQE's post-shuffle stats pick broadcast when the filtered aggregate
    // fits and a shuffle join when it doesn't, which is the honest
    // contract. Top-20 by total price with key tie-break keeps the LIMIT
    // boundary engine-independent.
    "q18_large_orders" -> ((s, dir) => {
      val big = read(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_quantity"))).as("sum_qty"))
        .filter(col("sum_qty") > lit(300).cast("decimal(15,2)"))
      val orders = read(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_totalprice"))
      val cust = read(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      orders.join(big, col("o_orderkey") === col("l_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          dec(col("o_totalprice")).cast("double").as("o_totalprice"),
          col("sum_qty").cast("double").as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
    }),

    // TPC-H Q22 shape (global sales opportunity): above-average-balance
    // customers with NO recent order, per market segment. The scalar
    // subquery (mean positive balance) is a ONE-ROW aggregate cross-joined
    // into the scan — and the mean test is rewritten multiplication-exact:
    // `bal * n_pos > sum_pos` compares scaled integers, so the boundary
    // cannot flip on engine-specific division rounding. The NOT EXISTS is a
    // LEFT ANTI join on the customer key against the date-pruned orders
    // scan; at 100 TB both sides shuffle once on c_custkey (the anti side
    // pre-filtered to the recent window).
    "q22_idle_customers" -> ((s, dir) => {
      val cust = read(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), dec(col("c_acctbal")).as("bal"))
      val stats = cust.filter(col("bal") > 0)
        .agg(count(lit(1)).as("n_pos"), sum(col("bal")).as("sum_pos"))
      val recent = read(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      cust.crossJoin(broadcast(stats))
        .filter(col("bal") * col("n_pos") > col("sum_pos"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("bal")).cast("double").as("totacctbal"))
    }),

    // TPC-H Q17 shape (small-quantity revenue): lines of one brand's parts
    // whose quantity is below 20% of that part's average quantity. The
    // textbook correlated scalar subquery de-correlates into ONE window
    // over the brand-filtered fact slice — sum/count per part computed by
    // the same shuffle the compare consumes, one fact scan (the self-join
    // form reads the slice twice). The 0.2·avg threshold is rewritten
    // multiplication-exact: `qty·5·n < sum` compares scaled integers, no
    // division at the boundary; /7.0 is one double division at the end.
    "q17_small_quantity" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val part = read(s, dir, "part")
        .filter(col("p_brand") === "Brand#23").select("p_partkey")
      val li = read(s, dir, "lineitem").select(col("l_partkey"),
        dec(col("l_quantity")).as("qty"), dec(col("l_extendedprice")).as("price"))
      val w = Window.partitionBy(col("l_partkey"))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .withColumn("sum_qty", sum(col("qty")).over(w))
        .withColumn("n_qty", count(lit(1)).over(w))
        .filter(col("qty") * lit(5) * col("n_qty") < col("sum_qty"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("price")).cast("double").as("total_price"))
        .select(col("n_rows"), col("total_price"),
          (col("total_price") / lit(7.0)).as("avg_yearly"))
    }),

    // TPC-H Q19 shape (discounted revenue, disjunctive predicates): revenue
    // from three OR'd brand/size/quantity windows. The interesting plan
    // property is predicate EXTRACTION: Catalyst rewrites the OR-of-ANDs so
    // the part-only disjunction (brand/size) pushes below the join to the
    // part scan and the lineitem-only disjunction (quantity windows) to the
    // fact scan — each side prunes on ITS OR before the broadcast join,
    // and only the cross-side conjunction evaluates post-join.
    "q19_discounted_revenue" -> ((s, dir) => {
      val part = read(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      // the quantity windows test the RAW double column: integer bounds are
      // exactly representable, so the predicate is value-identical to the
      // decimal form AND stays parquet-pushable (a cast would block it)
      val li = read(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity").as("qty"),
          (dec(col("l_extendedprice")) *
            (lit(1).cast("decimal(5,2)") - col("l_discount").cast("decimal(5,2)")))
            .as("rev"))
      def win(brand: String, sizeHi: Int, qLo: Int, qHi: Int) =
        col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
          col("qty").between(qLo, qHi)
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .filter(win("Brand#12", 5, 1, 11) || win("Brand#23", 10, 10, 20) ||
          win("Brand#3", 15, 20, 30))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("rev")).cast("double").as("revenue"))
    }),

    // TPC-H Q10 shape (returned-item reporting): customers ranked by the
    // revenue of their RETURNED lines in one half-year. Both fact filters
    // reach their scans; orders⋈lineitem shuffles once on the order key;
    // the per-customer aggregate is window-bounded, so the join back to
    // customer is AQE-decided (the Q18 lesson: its size is data-dependent,
    // a static hint would be wrong at some scale). Deterministic top 20.
    "q10_returned_items" -> ((s, dir) => {
      val orders = read(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val li = read(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          (dec(col("l_extendedprice")) *
            (lit(1).cast("decimal(5,2)") - col("l_discount").cast("decimal(5,2)")))
            .as("rev"))
      val cust = read(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // TPC-H Q16 shape (supplier relationship counting): distinct suppliers
    // per (brand, type) over a size class, excluding a blacklist (here:
    // negative-balance suppliers). The NOT IN becomes a LEFT ANTI against
    // the small broadcastable blacklist; part broadcasts; the distinct
    // count is one partial-aggregated shuffle at the (brand, type,
    // suppkey) grain — never a global distinct.
    "q16_supplier_counts" -> ((s, dir) => {
      val part = read(s, dir, "part")
        .filter(col("p_size").between(1, 15))
        .select(col("p_partkey"), col("p_brand"), col("p_type"))
      val badSupp = read(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      read(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // TPC-H Q7 shape (volume shipping): revenue between every
    // (supplier nation, customer nation) pair per order year. Two honest
    // fact shuffles (order key, then customer key); the nation sides ride
    // as broadcasts. The output is nation²×years — bounded regardless of
    // fact size, the cube-shaped result a reporting layer consumes.
    "q7_volume_shipping" -> ((s, dir) => {
      val nat = read(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      val supp = read(s, dir, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = read(s, dir, "customer")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val orders = read(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy").as("l_year"))
      val li = read(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"),
        (dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(5,2)") - col("l_discount").cast("decimal(5,2)")))
          .as("rev"))
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(sum(col("rev")).cast("double").as("revenue"),
          count(lit(1)).as("n"))
    }),

    // TPC-H Q8 shape (national market share): one nation's share of a
    // region's import revenue per year. Same join graph as Q7 plus the
    // region slice; numerator and denominator come out of ONE conditional
    // aggregation (no second pass), both decimal-exact, with a single
    // double division at the end mirrored by the oracle.
    "q8_market_share" -> ((s, dir) => {
      val nat = read(s, dir, "nation")
      val supp = read(s, dir, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val custEu = read(s, dir, "customer")
        .join(broadcast(nat.join(read(s, dir, "region"),
            col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "EUROPE").select(col("n_nationkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val orders = read(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy").as("o_year"))
      val li = read(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"),
        (dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(5,2)") - col("l_discount").cast("decimal(5,2)")))
          .as("rev"))
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(custEu, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", col("rev"))
            .otherwise(lit(0).cast("decimal(21,4)"))).cast("double").as("nation_rev"),
          sum(col("rev")).cast("double").as("total_rev"))
        .select(col("o_year"), col("nation_rev"), col("total_rev"),
          (col("nation_rev") / col("total_rev")).as("mkt_share"))
    }),

    // TPC-H Q15 shape (top supplier): the supplier(s) whose quarter
    // revenue equals the maximum. The scalar subquery (max over the
    // aggregated view) is rewritten as a GLOBAL window over the
    // supplier-grain aggregate: the fact slice is scanned and shuffled
    // EXACTLY once, and the single-partition window only ever sees
    // supplier-grain rows (bounded by |suppliers|, not facts). The naive
    // self-join form plans the fact aggregation twice — Spark does not
    // reuse the exchange across the subquery boundary (measured).
    // Decimal-exact revenue so the max-equality cannot flip cross-engine.
    "q15_top_supplier" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val rev = read(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(5,2)") - col("l_discount").cast("decimal(5,2)")))
          .as("total_rev"))
      val supp = read(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
      rev.withColumn("max_rev", max(col("total_rev")).over(Window.partitionBy()))
        .filter(col("total_rev") === col("max_rev"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_rev"))
    }),

    // TPC-H Q21 shape (suppliers who kept orders waiting): for finalized
    // multi-supplier orders, count per supplier the orders where THEY
    // shipped late (> 60 days after the order date) and no other supplier
    // did. The two correlated subqueries de-correlate into a LEFT SEMI
    // (another supplier exists on the order) and a LEFT ANTI (no OTHER
    // late supplier) against the same lineitem table — three shuffles on
    // the order key, no per-order probes; the non-equi "other supplier"
    // residual rides each join condition. Deterministic top 20.
    "q21_waiting_supplier" -> ((s, dir) => {
      val late = expr("INTERVAL 60 DAYS")
      val orders = read(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val l1 = read(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + late)
      val l2 = read(s, dir, "lineitem")
        .select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      val l3 = read(s, dir, "lineitem")
        .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"),
          col("l_shipdate").as("d3"))
      val waited = l1
        .join(l2, col("o2") === col("l_orderkey") && col("s2") =!= col("l_suppkey"),
          "left_semi")
        .join(l3, col("o3") === col("l_orderkey") && col("s3") =!= col("l_suppkey") &&
          col("d3") > col("o_orderdate") + late, "left_anti")
      val supp = read(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
      waited.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(20)
    }),

    // TPC-H Q6 shape (forecasting revenue change): the canonical
    // pushdown microbenchmark — every predicate reaches the parquet scan
    // (PushedFilters on shipdate, discount, quantity), one partial-
    // aggregated scan, one row out. Raw-double range tests (bounds exactly
    // representable) keep the filters pushable; the SUM is decimal-exact.
    "q6_forecast_revenue" -> ((s, dir) => {
      read(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * col("l_discount").cast("decimal(5,2)"))
          .cast("double").as("revenue"), count(lit(1)).as("n_rows"))
    }),

    // TPC-H Q11 shape (important stock): (supplier, part) positions whose
    // value exceeds 2× the mean position value. Both the count and the
    // grand total ride a GLOBAL window over the position-grain aggregate
    // (the Q15 single-scan discipline), and the threshold is
    // multiplication-exact — `val·n > total·2` compares scaled integers,
    // so the cut cannot flip on division rounding.
    "q11_important_stock" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy()
      read(s, dir, "lineitem")
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(dec(col("l_extendedprice"))).as("value"))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("total", sum(col("value")).over(w))
        .filter(col("value") * col("n") > col("total") * 2)
        .select(col("l_suppkey"), col("l_partkey"),
          col("value").cast("double").as("value"))
    }),

    // TPC-H Q13 shape (customer order-count distribution): LEFT OUTER join
    // with the filter INSIDE the join condition (a WHERE would turn it
    // inner and lose zero-order customers), then two aggregations — per
    // customer, then the histogram. The second groupBy runs on the
    // customer-grain frame; both shuffles are key-grain, never fact-grain.
    "q13_order_distribution" -> ((s, dir) => {
      val orders = read(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"))
      read(s, dir, "customer").select(col("c_custkey"))
        .join(orders, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    // TPC-H Q2 shape (min-cost supplier): per part, the supplier(s)
    // offering the LOWEST observed unit price. The correlated min becomes
    // one window over the (part, supplier) aggregate — partkey-grain
    // shuffle, no join-back, no second fact scan. Unit price is a RAW
    // double division: both engines divide the identical parquet doubles,
    // so min/argmin and the emitted values are bit-identical (a decimal
    // division would round differently per engine).
    "q2_min_cost_supplier" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      read(s, dir, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_price"))
        .withColumn("best", min(col("unit_price"))
          .over(Window.partitionBy(col("l_partkey"))))
        .filter(col("unit_price") === col("best"))
        .select(col("l_partkey"), col("l_suppkey"), col("unit_price"))
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS sum_disc_price,
         COUNT(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",

    "q3_shipping_priority" ->
      """SELECT l_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) *
             (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS revenue
         FROM customer, orders, lineitem
         WHERE c_mktsegment = 'BUILDING'
           AND c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND o_orderdate < TIMESTAMP '1997-06-30'
           AND l_shipdate > TIMESTAMP '1997-06-30'
         GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
         ORDER BY revenue DESC, l_orderkey ASC
         LIMIT 10""",

    "q5_local_supplier" ->
      """SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) *
             (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS revenue
         FROM customer, orders, lineitem, supplier, nation, region
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'EUROPE'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n_name""",

    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1996-07-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY o_orderpriority""",

    "q14_promo_revenue" ->
      """WITH t AS (
           SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice AS DECIMAL(15,2)) *
                         (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))
                    ELSE CAST(0 AS DECIMAL(21,4)) END) AS DOUBLE) AS promo_rev,
                  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) *
                         (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS total_rev
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE l_shipdate >= TIMESTAMP '1996-03-01'
             AND l_shipdate < TIMESTAMP '1996-04-01')
         SELECT promo_rev, total_rev, promo_rev * 100.0 / total_rev AS promo_pct FROM t""",

    "q18_large_orders" ->
      """SELECT c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS DOUBLE) AS o_totalprice,
           CAST(sum_qty AS DOUBLE) AS sum_qty
         FROM (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(15,2))) AS sum_qty
               FROM lineitem GROUP BY l_orderkey
               HAVING SUM(CAST(l_quantity AS DECIMAL(15,2))) > 300) big
         JOIN orders ON o_orderkey = big.l_orderkey
         JOIN customer ON c_custkey = o_custkey
         ORDER BY o_totalprice DESC, o_orderkey ASC
         LIMIT 20""",

    "q22_idle_customers" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment,
                      CAST(c_acctbal AS DECIMAL(15,2)) AS bal FROM customer),
           s AS (SELECT COUNT(*) AS n_pos, SUM(bal) AS sum_pos FROM c WHERE bal > 0)
         SELECT c_mktsegment, COUNT(*) AS numcust,
           CAST(SUM(bal) AS DOUBLE) AS totacctbal
         FROM c CROSS JOIN s
         WHERE bal * n_pos > sum_pos
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderdate >= TIMESTAMP '2001-01-01')
         GROUP BY c_mktsegment""",

    "q17_small_quantity" ->
      """WITH sel AS (SELECT l_partkey, CAST(l_quantity AS DECIMAL(15,2)) AS qty,
                        CAST(l_extendedprice AS DECIMAL(15,2)) AS price
                      FROM lineitem JOIN part ON l_partkey = p_partkey
                      WHERE p_brand = 'Brand#23'),
           wd AS (SELECT *, SUM(qty) OVER (PARTITION BY l_partkey) AS sum_qty,
                            COUNT(*) OVER (PARTITION BY l_partkey) AS n_qty
                  FROM sel)
         SELECT COUNT(*) AS n_rows,
           CAST(SUM(price) AS DOUBLE) AS total_price,
           CAST(SUM(price) AS DOUBLE) / 7.0 AS avg_yearly
         FROM wd WHERE qty * 5 * n_qty < sum_qty""",

    "q19_discounted_revenue" ->
      """SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) *
             (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                AND CAST(l_quantity AS DECIMAL(15,2)) BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                AND CAST(l_quantity AS DECIMAL(15,2)) BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
                AND CAST(l_quantity AS DECIMAL(15,2)) BETWEEN 20 AND 30)""",

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_mktsegment,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) *
             (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS revenue
         FROM customer, orders, lineitem
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1996-07-01'
         GROUP BY c_custkey, c_name, c_mktsegment
         ORDER BY revenue DESC, c_custkey ASC
         LIMIT 20""",

    "q16_supplier_counts" ->
      """SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_size BETWEEN 1 AND 15
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         GROUP BY p_brand, p_type""",

    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           strftime(o_orderdate, '%Y') AS l_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) *
             (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
         FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY 1, 2, 3""",

    "q8_market_share" ->
      """WITH t AS (
           SELECT strftime(o_orderdate, '%Y') AS o_year,
             CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
                  THEN CAST(l_extendedprice AS DECIMAL(15,2)) *
                       (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))
                  ELSE CAST(0 AS DECIMAL(21,4)) END) AS DOUBLE) AS nation_rev,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) *
               (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS total_rev
           FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation n1 ON s_nationkey = n1.n_nationkey
             JOIN nation n2 ON c_nationkey = n2.n_nationkey
             JOIN region ON n2.n_regionkey = r_regionkey
           WHERE r_name = 'EUROPE'
             AND o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1998-01-01'
           GROUP BY 1)
         SELECT o_year, nation_rev, total_rev, nation_rev / total_rev AS mkt_share
         FROM t""",

    "q15_top_supplier" ->
      """WITH rev AS (
           SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(15,2)) *
               (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS total_rev
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1996-04-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
         FROM rev JOIN supplier ON l_suppkey = s_suppkey
         WHERE total_rev = (SELECT MAX(total_rev) FROM rev)""",

    "q21_waiting_supplier" ->
      """SELECT s_name, COUNT(*) AS numwait
         FROM supplier
           JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
           JOIN orders ON o_orderkey = l1.l_orderkey
         WHERE o_orderstatus = 'F'
           AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY s_name
         ORDER BY numwait DESC, s_name ASC
         LIMIT 20""",

    "q6_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) *
             CAST(l_discount AS DECIMAL(5,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",

    "q11_important_stock" ->
      """WITH v AS (SELECT l_suppkey, l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS val
           FROM lineitem GROUP BY l_suppkey, l_partkey)
         SELECT l_suppkey, l_partkey, CAST(val AS DOUBLE) AS value
         FROM v
         WHERE val * (SELECT COUNT(*) FROM v) > (SELECT SUM(val) FROM v) * 2""",

    "q13_order_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist
         FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
               FROM customer LEFT OUTER JOIN orders
                 ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
               GROUP BY c_custkey) c_orders
         GROUP BY c_count""",

    "q2_min_cost_supplier" ->
      """WITH up AS (SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_price
           FROM lineitem GROUP BY l_partkey, l_suppkey),
           best AS (SELECT *, MIN(unit_price) OVER (PARTITION BY l_partkey) AS best_unit
                    FROM up)
         SELECT l_partkey, l_suppkey, unit_price
         FROM best WHERE unit_price = best_unit""",
  ) ++ graft.tpch.TpchQueries.oracleSql ++ graft.tpch.RelationalQueries.oracleSql ++
    graft.tpch.PipelineQueries.oracleSql ++ graft.tpch.StreamingQueries.oracleSql
}
