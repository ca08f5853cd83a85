package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 fixes.
  *
  * Malformed-JSON semantics of the `rel_json_props` extraction path (r8
  * verdict #1 secondary / ask #3): the sf testdata is 100% clean JSON, so the
  * gate never exercises the documented NULL-on-malformed path. This spec pins
  * the ENGINE semantics — `from_json` with an explicit struct schema — on the
  * malformed shapes a real event feed produces, so the behavior the gate
  * documents is actually tested.
  *
  * Engine vs oracle divergence, on record: for a QUOTED number (`{"k":"12"}`)
  * Spark's `from_json` LongType field is NULL (type-mismatched field ⇒
  * PERMISSIVE mode nulls the field), while DuckDB's
  * `json_extract_string(...)::BIGINT` would return 12 — the two genuinely
  * disagree on that shape. The oracle's `json_valid` guard only mirrors the
  * malformed-document case; quoted numbers are an ENGINE semantics choice
  * (strict typing), asserted here, and absent from the gate data by
  * construction.
  */
class Round9FixesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val kSchema = StructType(Seq(StructField("k", LongType)))

  test("from_json k-extraction: malformed, missing-key, quoted, null, float shapes") {
    import spark.implicits._
    val rows = Seq(
      ("clean",       """{"k": 7}"""),      // valid → 7
      ("malformed",   """{invalid json"""), // broken document → NULL
      ("missing_key", """{"x": 5}"""),      // valid JSON, no k → NULL
      ("quoted_num",  """{"k": "12"}"""),   // quoted number → NULL (strict typing)
      ("null_props",  null),                // NULL input → NULL
      ("empty",       ""),                  // empty string → NULL
      ("float_val",   """{"k": 3.5}"""),    // non-integral → NULL (no silent truncation)
      ("nested",      """{"k": {"a": 1}}""")) // wrong shape → NULL
    val got = rows.toDF("tag", "props")
      .withColumn("k", from_json(col("props"), kSchema).getField("k"))
      .select("tag", "k").as[(String, Option[Long])].collect().toMap
    assert(got("clean") == Some(7L))
    for (tag <- Seq("malformed", "missing_key", "quoted_num", "null_props",
                    "empty", "float_val", "nested"))
      assert(got(tag).isEmpty, s"$tag should extract as NULL, got ${got(tag)}")
  }

  test("rel_json_props aggregate shape counts malformed rows in n_null, keeps sums exact") {
    import spark.implicits._
    val df = Seq(
      ("click", """{"k": 10}"""),
      ("click", """{"k": 32}"""),
      ("click", """not json"""),
      ("click", null: String),
      ("view",  """{"k": "9"}"""),   // quoted → NULL under strict typing
      ("view",  """{"k": 5}"""))
      .toDF("event_type", "props")
      .withColumn("k", from_json(col("props"), kSchema).getField("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        count(when(col("k").isNull, 1)).as("n_null"))
      .as[(String, Long, Option[Long], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(df("click") == ((4L, Some(42L), 2L)))
    assert(df("view") == ((2L, Some(5L), 1L)))
  }

  test("CubeRef cache: mutating the TARGET cube invalidates cached converted values") {
    import graft.core._
    import graft.olap._
    val db = new Database("r9_fxcache", spark)
    val cur = db.addDimension("currency")
    cur.edit().addMany(Seq("EUR", "USD")).commit()
    val exrates = db.addCube("exrates", Seq(cur))
    exrates.set(Seq("EUR"), 1.1)
    exrates.set(Seq("USD"), 1.0)
    val reg = db.addDimension("region")
    reg.edit().add("World", Seq("de", "us")).commit()
    reg.addAttribute("cur")
    reg.setAttribute("cur", "de", "EUR")
    reg.setAttribute("cur", "us", "USD")
    val m = db.addDimension("m")
    m.edit().addMany(Seq("LC", "GC")).commit()
    val sales = db.addCube("sales", Seq(reg, m))
    sales.set(Seq("de", "LC"), 100.0)
    sales.registerRule(RuleDef(Map("m" -> "GC"), RuleScope.AllLevels,
      RuleExpr.Mul(RuleExpr.Ref("LC"),
        RuleExpr.CubeRef("exrates", Seq(RuleExpr.CubeRefPart.AttrOf("region", "cur")))),
      "lc_to_gc"))
    // prime the source cube's result cache with the converted value
    assert(sales.get(Seq("de", "GC")).contains(100.0 * 1.1))
    assert(sales.get(Seq("de", "GC")).contains(100.0 * 1.1)) // cached read
    // mutate ONLY the target cube: the r8 cache key (source stateVersion
    // alone) would keep serving 110.0 here until sales itself mutated
    exrates.set(Seq("EUR"), 1.25)
    assert(sales.get(Seq("de", "GC")).contains(100.0 * 1.25))
    // and back again — key is version-accurate, not clear-on-read
    exrates.set(Seq("EUR"), 1.1)
    assert(sales.get(Seq("de", "GC")).contains(100.0 * 1.1))
  }

  test("interval-join bounds are inclusive at BOTH ends (rel_event_pairs shape)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    def at(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
    // click at t=0; views at exactly -30min (IN), -30min-1s (OUT), 0 (IN), +1s (OUT)
    val clicks = Seq((1L, 7L, at(0))).toDF("cid", "cu", "cts")
    val views = Seq(
      (10L, 7L, at(-1800)), (11L, 7L, at(-1801)),
      (12L, 7L, at(0)), (13L, 7L, at(1))).toDF("vid", "vu", "vts")
    val got = clicks.join(views,
        col("cu") === col("vu") &&
          col("vts") >= col("cts") - expr("interval 30 minutes") &&
          col("vts") <= col("cts"))
      .select("vid").as[Long].collect().toSet
    assert(got == Set(10L, 12L),
      s"boundary views must be inclusive at -30min and at the click instant: $got")
  }

  test("sampleExactK: exact per-stratum sizes, deterministic, partitioning-independent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = ((0L until 100L).map(i => (i, "a")) ++ (100L until 103L).map(i => (i, "b")))
      .toDF("id", "lang")
    def pick(d: org.apache.spark.sql.DataFrame) =
      graft.pipeline.Curation.sampleExactK(d, col("id"), col("lang"), 10, "s")
        .select("id").as[Long].collect().toSet
    val s1 = pick(df)
    assert(s1 == pick(df.repartition(13)))
    val byLang = graft.pipeline.Curation.sampleExactK(df, col("id"), col("lang"), 10, "s")
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == Map("a" -> 10L, "b" -> 3L)) // min(k, n_s) — never padded
    // a different salt carves a different set of the same exact size
    val s2 = graft.pipeline.Curation.sampleExactK(df, col("id"), col("lang"), 10, "t")
      .select("id").as[Long].collect().toSet
    assert(s2.size == s1.size && s2 != s1)
  }

  test("sum over all-NULL group is NULL, not 0 (oracle SUM agrees)") {
    import spark.implicits._
    val s = Seq(("err", "{bad"), ("err", null: String)).toDF("event_type", "props")
      .withColumn("k", from_json(col("props"), kSchema).getField("k"))
      .groupBy(col("event_type")).agg(sum(col("k")).as("sum_k"))
      .as[(String, Option[Long])].collect().head
    assert(s == (("err", None)))
  }
}
