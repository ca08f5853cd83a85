package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A subspace of a cube — "all cells where year=2023 ∧ datatype=Plan" — for
  * mass read/write/transform operations (≙ `area.py:16`). The pattern maps
  * dimension index → requested member ids (OR within a dimension, AND across
  * dimensions, ≙ `facttable.py:350-373`); aggregated members select all their
  * leaf descendants.
  *
  * All mutations are whole-DataFrame rewrites (filter/union) — no driver-side
  * row loops — so they scale to arbitrarily large fact frames.
  */
final class Area(val cube: Cube, val pattern: Map[Int, Seq[Int]]) {

  /** Leaf-expanded pattern: dimension index → leaf id set. */
  lazy val leafPattern: Map[Int, Seq[Int]] =
    pattern.map { case (i, ids) => i -> cube.leafIdsOf(i, ids) }

  /** Conjunctive membership predicate over the fact columns. */
  def predicate: Column =
    if (leafPattern.isEmpty) lit(true)
    else leafPattern.map { case (i, ids) =>
      if (ids.size == 1) col(s"d$i") === ids.head else col(s"d$i").isin(ids: _*)
    }.reduce(_ && _)

  private def facts: DataFrame = cube.facts

  def rows: DataFrame = facts.filter(predicate)

  /** Misuse guard for the two `enumerateDataSpace` surfaces: the full leaf
    * cross-product is reference-mandated semantics (`area.py:140-192`) but a
    * cartesian bomb if pointed at a high-cardinality area by accident — at
    * 100× scale an unconstrained product over, say, customer × day × part is
    * ~1e13 rows before the write even starts. The product size is known on
    * the driver for free (per-dimension id-list lengths), so estimate it
    * up-front and fail loudly above the cap (`spark.graft.enum.maxCells`,
    * default 1e8) instead of launching a doomed job.
    */
  private def guardEnumeration(perDimCounts: Seq[(String, Int)]): Unit = {
    val cap = cube.spark.conf.get("spark.graft.enum.maxCells", "100000000").toDouble
    val est = perDimCounts.foldLeft(1.0)((a, c) => a * math.max(1, c._2))
    require(est <= cap,
      f"area enumeration would materialize ~$est%.3g cells (" +
        perDimCounts.map { case (n, c) => s"$n=$c" }.mkString(" × ") +
        f"), above the ${cap}%.3g-cell cap — narrow the area pattern or raise " +
        "spark.graft.enum.maxCells if this cross-product is intentional")
  }

  /** Count of stored cells in the area (≙ `area.py:54-60`). */
  def count: Long = rows.count()

  /** Enumerate `(member names…, value)` records (≙ `area.py:86-114`). */
  def records: DataFrame = {
    var df = rows
    cube.dimCols.indices.foreach { i =>
      val d = cube.dimensions(i)
      if (d.isDegenerate) {
        // names are functional (prefix + id): computed in place — a catalog
        // join would be an inner join against an EMPTY frame and silently
        // drop every record
        df = df.withColumn(d.name, d.functionalNameColumn(col(s"d$i")))
      } else {
        val names = cube.memberNamesDf(i)
          .select(col("id").as(s"__id$i"), col("mname").as(d.name))
        df = df.join(broadcast(names), col(s"d$i") === col(s"__id$i"))
      }
    }
    df.select(cube.dimensions.map(d => col(d.name)) :+ col("value"): _*)
  }

  /** Derive a new area with some dimensions' selections replaced, the rest
    * kept (≙ `area.alter`, `area.py:209-214`): `area.alter("years" ->
    * Seq("2024"))` moves the slice without restating the other modifiers.
    */
  def alter(overrides: (String, Seq[String])*): Area = {
    val byIdx = overrides.map { case (dimName, members) =>
      val i = cube.dimensions.indexWhere(_.name.equalsIgnoreCase(dimName))
      require(i >= 0, s"unknown dimension '$dimName' in cube '${cube.name}'")
      i -> members.map(cube.dimensions(i).idOf)
    }
    new Area(cube, pattern ++ byIdx)
  }

  /** Member-name addresses of the area WITHOUT values (≙ `area.addresses`,
    * `area.py:140-192`): stored cells only by default;
    * `enumerateDataSpace = true` yields the FULL leaf cross-product of the
    * pattern whether or not a cell exists there.
    */
  def addresses(enumerateDataSpace: Boolean = false): DataFrame =
    if (!enumerateDataSpace) records.drop("value")
    else {
      val spark = cube.spark
      val perDim = cube.dimCols.indices.map { i =>
        val d = cube.dimensions(i)
        require(!(d.isDegenerate && !leafPattern.contains(i)),
          s"dimension '${d.name}' is degenerate — enumeration needs explicit " +
            "raw keys in the area pattern (its key space has no catalog)")
        d -> leafPattern.getOrElse(i, d.leafMembers.map(_.id))
      }
      guardEnumeration(perDim.map { case (d, ids) => d.name -> ids.size })
      var grid: DataFrame = null
      perDim.foreach { case (d, ids) =>
        val names = ids.map(id => Row(d.nameOf(id)))
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(names.toList, 1),
          StructType(Seq(StructField(d.name, StringType))))
        grid = if (grid == null) df else grid.crossJoin(df)
      }
      grid
    }

  /** In-pattern membership test on raw address ids (payload cells). */
  private def idsInArea(ids: Vector[Int]): Boolean =
    leafPattern.forall { case (i, mids) => mids.contains(ids(i)) }

  /** Records INCLUDING non-float payload cells (extra `payload` column,
    * null on numeric rows; payload rows carry a null value — ≙ enumerating a
    * reference area whose cells hold arbitrary objects, `cube.py:325-327`).
    */
  def recordsWithPayloads: DataFrame = {
    val numeric = records.withColumn("payload", lit(null).cast(StringType))
    val pRows = cube.payloadEntries(idsInArea).map { case (ids, p) =>
      Row.fromSeq(ids.zipWithIndex.map { case (id, i) => cube.dimensions(i).nameOf(id) } :+
        null :+ p)
    }
    if (pRows.isEmpty) numeric
    else {
      val schema = StructType(
        cube.dimensions.map(d => StructField(d.name, StringType)).toIndexedSeq :+
          StructField("value", numeric.schema("value").dataType) :+
          StructField("payload", StringType))
      numeric.unionByName(cube.spark.createDataFrame(
        cube.spark.sparkContext.parallelize(pRows.toList, 1), schema))
    }
  }

  // ---- aggregates (≙ `area.py:372-447`) -----------------------------------

  private def aggOne(c: Column): Option[Double] =
    rows.agg(c).collect().headOption.flatMap(r => Option(r.get(0)).map {
      case d: java.lang.Double => d.doubleValue()
      case bd: java.math.BigDecimal => bd.doubleValue()
      case l: java.lang.Long => l.doubleValue()
    })
  // sum/avg aggregate in the fact frame's NATIVE type first (decimal facts
  // sum exactly, independent of partition order) and convert to double at
  // the end; avg divides the exact sum by the count in double rather than
  // using decimal division, whose rounding is engine-specific.
  def sum: Option[Double] = aggOne(org.apache.spark.sql.functions.sum(col("value")))
  def min: Option[Double] = aggOne(org.apache.spark.sql.functions.min(col("value").cast(DoubleType)))
  def max: Option[Double] = aggOne(org.apache.spark.sql.functions.max(col("value").cast(DoubleType)))
  def avg: Option[Double] = aggOne(
    org.apache.spark.sql.functions.sum(col("value")).cast(DoubleType) /
      org.apache.spark.sql.functions.count(col("value")))

  // ---- mutations (≙ `area.py:224-370`) ------------------------------------

  /** Delete all rows in the subspace, payload cells included
    * (≙ `area.py:224-233`).
    */
  def clear(): Unit = {
    cube.removePayloads(idsInArea)
    cube.replaceFacts(facts.filter(!predicate))
  }

  /** Overwrite the value of every EXISTING cell (≙ `area.py:280-336`). */
  def setValue(v: Double): Unit = transform(_ => lit(v).cast(valueType))

  def multiply(factor: Double): Unit = transform(c => (c * factor).cast(valueType))
  def increment(x: Double): Unit = transform(c => (c + x).cast(valueType))
  def transform(f: Column => Column): Unit =
    cube.replaceFacts(facts.withColumn("value",
      when(predicate, onEntryHooked(f)(col("value"))).otherwise(col("value"))))

  /** Compose a value transform with the cube's bulk ON_ENTRY hook
    * (reference parity: every write passes the hook, `cube.py:527-537`) —
    * identity when the cube has no ON_ENTRY rules, keeping the single-pass
    * plan shape.
    */
  private def onEntryHooked(f: Column => Column): Column => Column =
    graft.olap.Rules.onEntryBulk(cube)
      .map(h => (c: Column) => h(f(c)).cast(valueType))
      .getOrElse(f)

  private def valueType: DataType = facts.schema("value").dataType

  /** Write the FULL leaf cross-product of the area with a constant value
    * (≙ `enumerate_data_space=True`, `area.py:140-192`): cross-join of the
    * per-dimension leaf member frames.
    */
  def setValueEnumerated(v: Double): Unit = {
    val spark = cube.spark
    val perDim = cube.dimCols.indices.map { i =>
      require(!(cube.dimensions(i).isDegenerate && !leafPattern.contains(i)),
        s"dimension '${cube.dimensions(i).name}' is degenerate — enumeration " +
          "needs explicit raw keys in the area pattern (its key space has no catalog)")
      i -> leafPattern.getOrElse(i, cube.dimensions(i).leafMembers.map(_.id))
    }
    guardEnumeration(perDim.map { case (i, ids) => cube.dimensions(i).name -> ids.size })
    var grid: DataFrame = null
    perDim.foreach { case (i, ids) =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(ids.map(Row(_)).toList, 1),
        StructType(Seq(StructField(s"d$i", IntegerType))))
      grid = if (grid == null) df else grid.crossJoin(df)
    }
    val full = grid.withColumn("value", onEntryHooked(_ => lit(v).cast(valueType))(lit(v)))
    cube.replaceFacts(facts.filter(!predicate).unionByName(full))
  }

  /** Allocate a TARGET total across the area's stored cells — the classic
    * planning writeback ("spread 1M budget over last year's actuals").
    * An extension beyond the reference's Area surface (which stops at
    * setValue/multiply/increment, `area.py:280-370`): proportional mode
    * scales every stored cell by `target / currentSum` so the slice's
    * rollup lands on the target while cell RATIOS are preserved; equal
    * mode overwrites every stored cell with `target / cellCount`.
    *
    * Shape: ONE scalar aggregate job to learn the slice mass, then the same
    * single-pass filter/union rewrite as [[multiply]] — no driver-side row
    * loop, scales with the fact frame. Scaling arithmetic runs in double
    * (exact decimal sum → double, then IEEE `v * T / S` per cell) and is
    * recast to the fact frame's native value type on write. Bulk ON_ENTRY
    * rules apply to the allocated values like every other write path.
    */
  def allocate(target: Double, mode: AllocationMode = AllocationMode.Proportional): Unit = {
    val r = rows.agg(
      org.apache.spark.sql.functions.sum(col("value")).cast(DoubleType),
      org.apache.spark.sql.functions.count(lit(1))).collect().head
    val n = r.getLong(1)
    require(n > 0, "allocate: area holds no stored cells to allocate across")
    mode match {
      case AllocationMode.Proportional =>
        val s = if (r.isNullAt(0)) 0.0 else r.getDouble(0)
        require(s != 0.0,
          "allocate: proportional allocation over a zero-sum area is undefined — use AllocationMode.Equal")
        transform(c => (c.cast(DoubleType) * lit(target) / lit(s)).cast(valueType))
      case AllocationMode.Equal =>
        val share = target / n
        transform(_ => lit(share).cast(valueType))
    }
  }

  /** Area-to-area copy with scalar transform — `plan = actual * 1.15`
    * (≙ `area.py:511-570, 693-743`). Source and target patterns must differ
    * only in dimensions where both select a single member; the target member
    * must be base-level (writeback goes to base cells). The source is read
    * (snapshotted by DataFrame immutability, ≙ "pinning" `area.py:63-70`)
    * before the target subspace is cleared.
    */
  def copyFrom(src: Area, f: Column => Column = identity): Unit = {
    require(src.cube eq cube, "cross-cube area copy not supported")
    val diffs = (0 until cube.nDims).filter { i =>
      pattern.get(i).map(_.toSet) != src.pattern.get(i).map(_.toSet)
    }
    diffs.foreach { i =>
      val t = pattern.getOrElse(i, Nil); val s = src.pattern.getOrElse(i, Nil)
      require(t.size == 1 && s.size == 1,
        s"area copy: differing dimension ${cube.dimensions(i).name} must fix exactly one member on both sides")
      require(cube.dimensions(i).levelOf(t.head) == 0,
        s"area copy target member must be base level in ${cube.dimensions(i).name}")
    }
    var mapped = src.rows
    diffs.foreach { i => mapped = mapped.withColumn(s"d$i", lit(pattern(i).head)) }
    // hook applies AFTER the address rewrite above: ON_ENTRY triggers match
    // the TARGET address the values land at, as per-cell set would
    mapped = mapped.withColumn("value",
      onEntryHooked(c => f(c).cast(valueType))(col("value")))
    cube.replaceFacts(facts.filter(!predicate).unionByName(mapped))
  }
}

/** How [[Area.allocate]] distributes the target across stored cells. */
sealed trait AllocationMode
object AllocationMode {
  /** Scale each cell by `target / currentSum` — ratios preserved. */
  case object Proportional extends AllocationMode
  /** Overwrite each stored cell with `target / cellCount`. */
  case object Equal extends AllocationMode
}

object Area {
  /** Build from member-name pattern `("years" -> Seq("2023"), …)`. */
  def apply(cube: Cube, byName: Seq[(String, Seq[String])]): Area = {
    val byIdx = byName.map { case (dimName, members) =>
      val i = cube.dimensions.indexWhere(_.name.equalsIgnoreCase(dimName))
      require(i >= 0, s"unknown dimension '$dimName' in cube '${cube.name}'")
      i -> members.map(cube.dimensions(i).idOf)
    }.toMap
    new Area(cube, byIdx)
  }
}
