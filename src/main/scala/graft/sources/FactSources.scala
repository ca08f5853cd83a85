package graft.sources

import graft.core.Cube
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fact-frame sources/sinks beyond the canonical parquet store (SURVEY §2.1;
  * the reference's only store is SQLite KV — `storage/sqlite.py`). Spark's
  * readers give csv/json/orc for free; this layer adds the cube-schema
  * contract (d0…dn int columns + value) and name-addressed import.
  */
object FactSources {

  def factSchema(nDims: Int, valueType: DataType = DoubleType): StructType =
    StructType((0 until nDims).map(i => StructField(s"d$i", IntegerType)) :+
      StructField("value", valueType))

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, nDims: Int): DataFrame =
    spark.read.option("header", "true").schema(factSchema(nDims)).csv(path)

  def readJson(spark: SparkSession, path: String, nDims: Int): DataFrame =
    spark.read.schema(factSchema(nDims)).json(path)

  def readOrc(spark: SparkSession, path: String, nDims: Int): DataFrame = {
    // same fact-schema contract as readCsv/readJson: pin (d0..dn, value) at
    // the source boundary so a mis-shaped file fails fast, not deep inside
    // a cube join
    val schema = factSchema(nDims)
    spark.read.orc(path).select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  def writeOrc(facts: DataFrame, path: String): Unit =
    facts.write.mode(SaveMode.Overwrite).orc(path)

  def writeParquet(facts: DataFrame, path: String): Unit =
    facts.write.mode(SaveMode.Overwrite).parquet(path)

  def writeJson(facts: DataFrame, path: String): Unit =
    facts.write.mode(SaveMode.Overwrite).json(path)

  /** Name resolution of `(dimName0, …, dimNameN, value)` records into id
    * space with LEFT semantics: every input row survives, carrying nullable
    * `d<i>` columns — null where the name did not resolve. Names resolve
    * against LEAF members only, mirroring `Cube.set` (the reference rejects
    * writes to aggregated cells, `cube.py:527`): a record addressed at an
    * aggregate or unknown name must never land at a non-leaf id.
    */
  private def resolveNamed(cube: Cube, records: DataFrame): DataFrame = {
    var df = records
    cube.dimensions.zipWithIndex.foreach { case (d, i) =>
      if (d.isDegenerate) {
        // functional parse in place — the catalog is EMPTY, so a name join
        // would silently drop every record. Same canonical contract as the
        // driver-side parse: case-insensitive prefix, canonical numeral;
        // non-parsing names yield null like catalog-unknown names do,
        // never a silent mis-map.
        val prefix = d.degeneratePrefix.get
        val name = col(d.name)
        val digits = name.substr(lit(prefix.length + 1), length(name))
        // try_cast, not cast: under ANSI mode a plain cast of a malformed
        // numeral ('12x4') THROWS even behind an rlike guard in the same
        // conjunction — conjunct evaluation order isn't guaranteed after
        // optimization. try_cast yields null and the row drops.
        val parsed = digits.try_cast("long")
        df = df.withColumn(s"d$i",
          when(lower(substring(name, 1, prefix.length)) === prefix.toLowerCase &&
            parsed.isNotNull && parsed.between(0, Int.MaxValue - 1) &&
            digits === parsed.cast("string"), // canonical: no 007
            parsed.cast("int")))
          .drop(d.name)
      } else {
        val names = cube.leafNamesDf(i)
          .select(col("id").as(s"d$i"), lower(col("mname")).as(s"__n$i"))
        df = df.join(broadcast(names), lower(col(d.name)) === col(s"__n$i"), "left")
          .drop(d.name, s"__n$i")
      }
    }
    df
  }

  private def resolvedPred(cube: Cube): org.apache.spark.sql.Column =
    cube.dimCols.map(col(_).isNotNull).reduce(_ && _)

  private def hooked(cube: Cube, resolved: DataFrame): DataFrame =
    // reference parity: EVERY write passes the ON_ENTRY hook (cube.py:527-537)
    // — bulk import included. Column-expressible rules apply as one
    // declarative transform; Ref-bearing rules evaluate per imported row
    // against the post-write state (Rules.applyOnEntryBulk compute-then-write)
    graft.olap.Rules.applyOnEntryBulk(cube, resolved)

  /** Import NAME-addressed records `(dimName0, …, dimNameN, value)` into id
    * space via broadcast member-name joins — the bulk-load path
    * (≙ per-cell `cube[...]` loading, `samples/huge.py:115-133`, done as one
    * job). Records addressed at aggregate or unknown names DROP, silently:
    * this zero-extra-jobs fast path is for pre-validated feeds. At scale a
    * silent drop of 3% of a load is a catastrophe nobody sees — loads that
    * can contain junk should use [[importNamedReport]] (same semantics plus
    * an exact dropped-row count, one extra counting pass) or
    * [[importNamedStrict]] (throws on any drop — the reference's per-cell
    * semantics, `cube.py:601-627`).
    */
  def importNamed(cube: Cube, records: DataFrame): DataFrame =
    hooked(cube, resolveNamed(cube, records).filter(resolvedPred(cube))
      .select((cube.dimCols.map(col) :+ col("value")): _*))

  /** The result of a counted name-addressed import: the resolved fact frame
    * plus exact input/resolved row counts, so a bulk load can never lose
    * records without the caller being able to see it.
    */
  final case class ImportReport(facts: DataFrame, inputRows: Long, resolvedRows: Long) {
    def droppedRows: Long = inputRows - resolvedRows
  }

  /** [[importNamed]] with loss accounting: one extra aggregation pass over
    * the name-resolution frame counts input vs resolved rows BEFORE the load
    * materializes; a non-zero drop is also logged loudly. The fact frame is
    * identical to `importNamed`'s.
    */
  def importNamedReport(cube: Cube, records: DataFrame): ImportReport = {
    val joined = resolveNamed(cube, records)
    val ok = resolvedPred(cube)
    val counts = joined.agg(
      count(lit(1)).as("n"), count(when(ok, lit(1))).as("r")).head()
    val report = ImportReport(
      hooked(cube, joined.filter(ok).select((cube.dimCols.map(col) :+ col("value")): _*)),
      counts.getLong(0), counts.getLong(1))
    if (report.droppedRows > 0)
      System.err.println(s"[graft] importNamed into cube '${cube.name}': " +
        s"${report.droppedRows} of ${report.inputRows} records did not resolve " +
        "to leaf members and were DROPPED (aggregate-addressed or unknown names)")
    report
  }

  /** Strict name-addressed import: any unresolvable record aborts the load
    * (≙ the reference raising on unknown-member lookups in per-cell loading,
    * `cube.py:601-627`). Returns the fully-resolved fact frame.
    */
  def importNamedStrict(cube: Cube, records: DataFrame): DataFrame = {
    val report = importNamedReport(cube, records)
    require(report.droppedRows == 0L,
      s"strict import into cube '${cube.name}': ${report.droppedRows} of " +
        s"${report.inputRows} records did not resolve to leaf members " +
        "(aggregate-addressed or unknown names)")
    report.facts
  }

  /** Partitioned parquet sink: directory-partition on the given dimension
    * columns so downstream reads get partition pruning on those dims (the
    * 100 TB layout knob — e.g. partition a sales cube by the time dim).
    */
  def writePartitioned(facts: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    facts.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  def writeCsv(facts: DataFrame, path: String): Unit =
    facts.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Bucketed table sink: hash-bucket + sort on the join keys so repeated
    * co-located joins/aggregations on those keys skip the shuffle entirely
    * (catalog tables — bucketing metadata requires `saveAsTable`). Written
    * as ONE file per bucket (repartition on the bucket hash first): only
    * then can readers trust the sortBy order and skip the fact-side Sort
    * on merge joins (with `spark.sql.legacy.bucketedTableScan
    * .outputOrdering=true` — `Cube.compactToBucketed` sets it).
    */
  def writeBucketed(facts: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int): Unit =
    facts.repartition(nBuckets, bucketCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
