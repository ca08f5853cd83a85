package graft.tpch

import graft.core._
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.concurrent.TrieMap

/** The driver-provided TPC-H-ish star schema modeled as a graft OLAP cube
  * (FIXTURES.md §4): the differential-testing bridge between the engine and
  * the DuckDB oracle.
  *
  * Dimensions:
  *  - `geo`:      World → region → nation → customer (`C#<custkey>`)
  *  - `calendar`: AllTime → year → month (`1995-03`) → day (`1995-03-14`)
  *  - `product`:  part (`P#<partkey>`) with TWO parents — its brand under
  *                `AllBrands` and its type under `AllTypes` (multi-parent DAG,
  *                ≙ tiny's `best sellers`, `samples/tiny.py:96-99`)
  *  - `measures`: leaves quantity / gross / disc_amt / plan;
  *                `net` = gross − disc_amt via weights [+1, −1]
  *
  * Fact values are decimal(21,4) — EXACT — so every rollup is independent of
  * partition/summation order and hash-matches DuckDB (see SparkEntry note).
  */
final class TpchModel(val db: Database, val cube: Cube, val sfDir: String) {
  def geo: Dimension = db.dimension("geo")
  def calendar: Dimension = db.dimension("calendar")
  def product: Dimension = db.dimension("product")
  def measures: Dimension = db.dimension("measures")

  /** Map a grid-result member-id column to member names. */
  def named(df: DataFrame, idCol: String, dimIdx: Int, outName: String): DataFrame = {
    val names = cube.memberNamesDf(dimIdx)
      .select(col("id").as(s"__nid_$outName"), col("mname").as(outName))
    df.join(broadcast(names), col(idCol) === col(s"__nid_$outName"))
      .drop(idCol, s"__nid_$outName")
  }
}

object TpchModel {
  private val cache = TrieMap[String, TpchModel]()

  /** Wall-clock phase attribution (seconds) of the most recent COLD build —
    * emitted into the bench artifact so an outlying `model_build` total says
    * WHERE the time went (r7 verdict #2: an unexplained 2.6× regression in
    * the official artifact was undiagnosable from the total alone). */
  @volatile var lastBuildPhases: Map[String, Double] = Map.empty

  def get(spark: SparkSession, sfDir: String): TpchModel =
    cache.getOrElseUpdate(sfDir, build(spark, sfDir))

  private def dec2(c: Column): Column = c.cast("decimal(15,2)")

  private def build(spark: SparkSession, sfDir: String): TpchModel = {
    def read(t: String) = spark.read.parquet(s"$sfDir/$t.parquet")
    val phases = scala.collection.mutable.LinkedHashMap[String, Double]()
    def phase[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      phases(name) = (System.nanoTime() - t0) / 1e9
      r
    }

    // ---- dimension catalogs (driver-side; dims are small by design) -------
    // The five catalog scans are independent Spark actions; Spark schedules
    // jobs from concurrent driver threads freely, so they run in parallel
    // futures and each is awaited right before its catalog is needed. The
    // win is overlapping planning + scan latency of five small jobs
    // (~1.5 s of the sf0.1 model build), and on a real cluster the same
    // overlap hides five network round-trips.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.DurationInt
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fRegions = Future(read("region").collect().map(r =>
      r.getAs[Int]("r_regionkey") -> r.getAs[String]("r_name")).toMap)
    val fNations = Future(read("nation").collect().map(r =>
      (r.getAs[Int]("n_nationkey"), r.getAs[String]("n_name"), r.getAs[Int]("n_regionkey"))))
    val fCustomers = Future(read("customer").select("c_custkey", "c_nationkey").collect().map(r =>
      (r.getAs[Long]("c_custkey"), r.getAs[Int]("c_nationkey"))))
    val fDays = Future(read("orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
      .distinct().collect().map(_.getString(0)).sorted)
    val fParts = Future(read("part").select("p_partkey", "p_brand", "p_type").collect().map(r =>
      (r.getAs[Long]("p_partkey"), r.getAs[String]("p_brand"), r.getAs[String]("p_type"))))
    val (regions, nations, customers) = phase("await_geo_catalogs") {
      (Await.result(fRegions, 10.minutes),
       Await.result(fNations, 10.minutes),
       Await.result(fCustomers, 10.minutes))
    }

    val db = new Database("tpch", spark)
    val geo = db.addDimension("geo")
    phase("dim_geo") {
    geo.edit()
    geo.add("World", regions.values.toSeq.sorted)
    nations.groupBy(_._3).foreach { case (rk, ns) =>
      geo.add(regions(rk), ns.map(_._2).toSeq.sorted)
    }
    val nationName = nations.map(n => n._1 -> n._2).toMap
    customers.groupBy(_._2).foreach { case (nk, cs) =>
      geo.add(nationName(nk), cs.map(c => s"C#${c._1}").toSeq)
    }
    geo.commit()
    }

    val days = phase("await_days_catalog") { Await.result(fDays, 10.minutes) }
    val cal = db.addDimension("calendar")
    phase("dim_calendar") {
    cal.edit()
    val years = days.map(_.substring(0, 4)).distinct.sorted
    cal.add("AllTime", years)
    days.groupBy(_.substring(0, 7)).toSeq.sortBy(_._1).foreach { case (month, ds) =>
      cal.add(month.substring(0, 4), Seq(month))
      cal.add(month, ds.sorted)
    }
    cal.commit()
    // static subset: first half of 1995, month granularity (Q2.11 surface)
    cal.addSubset("h1_1995", (1 to 6).map(m => f"1995-$m%02d"))
    }

    val parts = phase("await_parts_catalog") { Await.result(fParts, 10.minutes) }
    val prod = db.addDimension("product")
    phase("dim_product") {
    prod.edit()
    prod.add("AllBrands", parts.map(_._2).distinct.sorted)
    prod.add("AllTypes", parts.map(_._3).distinct.sorted)
    parts.groupBy(_._2).foreach { case (brand, ps) =>
      prod.add(brand, ps.map(p => s"P#${p._1}").toSeq)
    }
    parts.groupBy(_._3).foreach { case (tpe, ps) =>
      prod.add(tpe, ps.map(p => s"P#${p._1}").toSeq)
    }
    prod.commit()
    // typed attribute on part leaves (F3/F5 surface) + a region alias
    prod.addAttribute("ptype")
    parts.foreach { case (pk, _, tpe) => prod.setAttribute("ptype", s"P#$pk", tpe) }
    geo.addAlias("EU", "EUROPE")
    }

    val meas = db.addDimension("measures")
    meas.edit()
    meas.addMany(Seq("quantity", "gross", "disc_amt", "plan", "margin"))
    meas.add("net", Seq("gross", "disc_amt"), Seq(1.0, -1.0))
    meas.commit()

    // ---- fact frame -------------------------------------------------------
    // lineitem ⋈ orders on orderkey (the one genuine shuffle join — AQE
    // handles it at scale), then broadcast id-mapping joins, 3-way measure
    // unpivot, and one pre-aggregation to FactTable semantics (one value per
    // address, ≙ `facttable.py:146-164` upsert).
    val facts = phase("fact_plan") {
    val custMap = mapDf(spark, customers.map(c => c._1 -> geo.idOf(s"C#${c._1}")), "ckey", "gid")
    val dateMap = spark.createDataFrame(
      spark.sparkContext.parallelize(days.map(d => Row(d, cal.idOf(d))).toList, 1),
      StructType(Seq(StructField("dstr", StringType), StructField("did", IntegerType))))
    val partMap = mapDf(spark, parts.map(p => p._1 -> prod.idOf(s"P#${p._1}")), "pkey", "pid")

    val qid = meas.idOf("quantity"); val gid = meas.idOf("gross"); val aid = meas.idOf("disc_amt")

    val joined = read("lineitem").join(
      read("orders").select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
      col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custMap), col("o_custkey") === col("ckey"))
      .withColumn("dstr", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .join(broadcast(dateMap), Seq("dstr"))
      .join(broadcast(partMap), col("l_partkey") === col("pkey"))

    // Aggregate at address grain FIRST (3 narrow decimal sums), THEN unpivot
    // the aggregated triple: the shuffle carries one row per (geo, day,
    // part) instead of 3 per lineitem — measured 1.7× on the whole build at
    // sf0.1, and the 3×-smaller exchange is exactly what survives 100 TB.
    // Decimal sums are order-independent, so the result is bit-identical to
    // aggregating after the stack (FactTable upsert semantics preserved:
    // still exactly one value per address).
    val preagg = joined.groupBy(col("gid").as("d0"), col("did").as("d1"), col("pid").as("d2"))
      .agg(
        sum(col("l_quantity").cast("decimal(21,4)")).cast("decimal(21,4)").as("v_qty"),
        sum(col("l_extendedprice").cast("decimal(21,4)")).cast("decimal(21,4)").as("v_gross"),
        sum((dec2(col("l_extendedprice")) * col("l_discount").cast("decimal(5,2)"))
          .cast("decimal(21,4)")).cast("decimal(21,4)").as("v_disc"))

    preagg.select(col("d0"), col("d1"), col("d2"),
      expr(s"""stack(3,
        $qid, v_qty,
        $gid, v_gross,
        $aid, v_disc
      ) AS (d3, value)"""))
      .select(col("d0"), col("d1"), col("d2"), col("d3"), col("value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    // materialize: queries measure steady-state latency
    phase("fact_materialize") { facts.count() }

    val cube = db.addCube("sales", Seq(geo, cal, prod, meas), facts)
    // standing rule-derived measure: margin = net / gross (ALL_LEVELS)
    cube.registerRule(graft.olap.RuleDef(
      trigger = Map("measures" -> "margin"),
      scope = graft.olap.RuleScope.AllLevels,
      expr = graft.olap.RuleParser.parse("[net] / [gross]"),
      name = "margin"))
    lastBuildPhases = scala.collection.immutable.ListMap.from(phases)
    new TpchModel(db, cube, sfDir)
  }

  private def mapDf(spark: SparkSession, pairs: Seq[(Long, Int)], k: String, v: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(pairs.map(p => Row(p._1, p._2)).toList, 1),
      StructType(Seq(StructField(k, LongType), StructField(v, IntegerType))))
}
