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
  ) ++ graft.tpch.TpchQueries.oracleSql ++ graft.tpch.RelationalQueries.oracleSql ++
    graft.tpch.PipelineQueries.oracleSql ++ graft.tpch.StreamingQueries.oracleSql
}
