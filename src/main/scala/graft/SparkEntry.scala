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
  ) ++ graft.tpch.TpchQueries.oracleSql ++ graft.tpch.RelationalQueries.oracleSql ++
    graft.tpch.PipelineQueries.oracleSql ++ graft.tpch.StreamingQueries.oracleSql
}
