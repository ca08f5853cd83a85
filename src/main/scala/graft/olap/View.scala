package graft.olap

import graft.core.{Cube, MemberDef}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One axis of a view: an ordered list of (dimension, members) entries; the
  * axis positions are the cartesian product of the member lists in order
  * (≙ `view.py:167-171`).
  */
final case class AxisDef(entries: Seq[(String, Seq[String])])

/** A pivot-report definition (≙ `view.py:582-744`): filter axis (single
  * members), row axis, column axis. Dimensions not mentioned anywhere fall
  * back to their default member on the filter axis (≙ `view.py:615-622`).
  */
final case class ViewDef(
    filters: Seq[(String, String)] = Nil,
    rows: AxisDef,
    cols: AxisDef,
    zeroSuppression: Boolean = false)

/** Paged refresh window (≙ `ViewWindow`, `view.py:65-105`): inclusive row and
  * column index bounds of the rendered grid.
  */
final case class ViewWindow(top: Int, left: Int, bottom: Int, right: Int)

/** Refresh statistics (≙ `ViewStatistics`, `view.py:46-63`): wall time, grid
  * extent, how many positions were served from storage vs computed by rules.
  */
final case class ViewStats(
    durationMs: Long,
    rows: Long,
    columns: Int,
    aggregatedPositions: Int = 0,
    rulePositions: Int = 0)

/** Pivot-grid report over a cube. The whole grid — every axis combination —
  * is ONE Spark job: closure-join grid aggregation, then `groupBy(rowKeys)
  * .pivot(colKey)` (≙ the per-cell loop `view.py:769-911`, re-planned as
  * SURVEY §2.10 V3 prescribes).
  *
  * Measure rules: when the column axis is a single dimension, requested
  * members backed by an ALL_LEVELS / AGGREGATION_LEVEL rule with same-dim
  * refs are computed post-pivot as derived Columns — still one job.
  */
final class View(val cube: Cube, val dfn: ViewDef) {

  private def dimIdx(name: String): Int = {
    val i = cube.dimensions.indexWhere(_.name.equalsIgnoreCase(name))
    require(i >= 0, s"unknown dimension '$name' in cube '${cube.name}'")
    i
  }

  var stats: ViewStats = ViewStats(0, 0, 0)

  /** The grid as a DataFrame: one column per row-axis dimension (member
    * names), then one column per column-axis POSITION — the cartesian product
    * of the column-axis member lists in entry order, last entry varying
    * fastest (≙ `view.py:167-171`). Multi-dimension positions are named
    * `m1/m2/…` (one member per axis entry). Cells are doubles (null = empty).
    */
  def refresh(): DataFrame = {
    val t0 = System.nanoTime()
    val rowDims = dfn.rows.entries.map(e => dimIdx(e._1))
    val colEntries = dfn.cols.entries
    require(colEntries.nonEmpty, "column axis needs at least one dimension")

    // per column-axis dimension: split requested members into stored vs
    // rule-derived (ALL_LEVELS / AGGREGATION_LEVEL with same-dim refs)
    def ruleFor(dimI: Int, m: String): Option[RuleDef] = cube.rules.find { r =>
      (r.scope == RuleScope.AllLevels || r.scope == RuleScope.AggregationLevel) &&
        r.trigger.exists { case (d, mm) =>
          d.equalsIgnoreCase(cube.dimensions(dimI).name) && mm.equalsIgnoreCase(m) }
    }
    // (dimIdx, requested, ruled members, members to fetch from storage)
    val perDim = colEntries.map { case (dName, requested) =>
      val cd = dimIdx(dName)
      val ruled = requested.flatMap(m => ruleFor(cd, m).map(m -> _)).toMap
      val plain = requested.filterNot(ruled.contains)
      val refs = ruled.values.flatMap(r => collectRefNames(r.expr)).toSeq.distinct
      (cd, requested, ruled, (plain ++ refs.filterNot(plain.contains)).distinct)
    }

    // selections: filters fix single members; unmentioned dims → default
    val sel = Array.tabulate(cube.nDims) { i =>
      Seq(cube.dimensions(i).defaultMember.id)
    }
    dfn.filters.foreach { case (d, m) => sel(dimIdx(d)) = Seq(cube.dimensions(dimIdx(d)).idOf(m)) }
    dfn.rows.entries.zip(rowDims).foreach { case ((_, ms), i) =>
      sel(i) = ms.map(cube.dimensions(i).idOf)
    }
    perDim.foreach { case (cd, _, _, fetch) => sel(cd) = fetch.map(cube.dimensions(cd).idOf) }

    var df = cube.gridAggregate(sel.toIndexedSeq)

    // row member names + position ordinals (axis order, not alphabetical)
    rowDims.zip(dfn.rows.entries).foreach { case (i, (dName, members)) =>
      val spark = cube.spark
      val rows = members.zipWithIndex.map { case (m, ord) =>
        org.apache.spark.sql.Row(cube.dimensions(i).idOf(m), m, ord)
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(s"__id$i", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField(dName, org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField(s"__ord$i", org.apache.spark.sql.types.IntegerType)))
      val names = spark.createDataFrame(spark.sparkContext.parallelize(rows.toList, 1), schema)
      df = df.join(broadcast(names), col(s"a$i") === col(s"__id$i")).drop(s"__id$i")
    }

    // pivot on the composite position key: per column dim an id→name map,
    // joined with '/' — ONE pivot regardless of axis dimensionality
    val nameCols = perDim.map { case (cd, _, _, fetch) =>
      val byId = fetch.map(m => cube.dimensions(cd).idOf(m) -> m)
      map(byId.flatMap { case (id, n) => Seq(lit(id), lit(n)) }: _*)(col(s"a$cd"))
    }
    df = df.withColumn("__colName",
      if (nameCols.size == 1) nameCols.head else concat_ws("/", nameCols: _*))
    val fetchNames = cartesian(perDim.map(_._4)).map(_.mkString("/"))
    val rowKeyCols = rowDims.zip(dfn.rows.entries).map(_._2._1)
    val ordCols = rowDims.map(i => s"__ord$i")
    var grid = df.groupBy((rowKeyCols ++ ordCols).map(col): _*)
      .pivot("__colName", fetchNames)
      .agg(first(col("value").cast("double")))

    // requested positions: cartesian product in axis order (last fastest)
    val reqPositions = cartesian(perDim.map(_._2))
    // rule-derived positions post-pivot (one job, no per-cell recursion):
    // refs resolve to the sibling position with only the ruled dim's member
    // replaced (Jan/Profit ← Jan/Sales − Jan/Cost)
    reqPositions.foreach { pos =>
      val ruledAt = pos.zipWithIndex.zip(perDim).filter { case ((m, _), pd) => pd._3.contains(m) }
      if (ruledAt.size > 1) throw new IllegalArgumentException(
        s"position ${pos.mkString("/")}: rule-backed members on more than one " +
          "column-axis dimension are not supported")
      ruledAt.headOption.foreach { case ((m, k), pd) =>
        grid = grid.withColumn(pos.mkString("/"),
          exprByName(pd._3(m).expr, ref => pos.updated(k, ref).mkString("/")))
      }
    }

    val reqNames = reqPositions.map(_.mkString("/"))
    if (dfn.zeroSuppression) {
      val cells = reqNames.map(m => abs(coalesce(col(m), lit(0.0))))
      grid = grid.filter(cells.reduce(_ + _) =!= 0.0) // ≙ `view.py:844-885`
    }

    val ordered = grid.orderBy(ordCols.map(col): _*)
      .select((rowKeyCols.map(col) ++ reqNames.map(col)): _*)
    val nRuled = reqPositions.count(pos =>
      pos.zip(perDim).exists { case (m, pd) => pd._3.contains(m) })
    stats = ViewStats((System.nanoTime() - t0) / 1000000, 0, reqNames.size,
      aggregatedPositions = reqNames.size - nRuled, rulePositions = nRuled)
    ordered
  }

  /** Cartesian product preserving entry order; LAST list varies fastest
    * (≙ `itertools.product`, `view.py:167-171`).
    */
  private def cartesian[A](xs: Seq[Seq[A]]): Seq[Seq[A]] =
    xs.foldLeft(Seq(Seq.empty[A]))((acc, l) => acc.flatMap(p => l.map(p :+ _)))

  private def collectRefNames(e: RuleExpr): Seq[String] =
    Rules.collectRefs(e).filterNot(_.contains(":"))

  private def exprByName(e: RuleExpr, rename: String => String = identity): Column = {
    def c(x: RuleExpr): Column = x match {
      case RuleExpr.Lit(v) => lit(v)
      case RuleExpr.Ref(s) => col(rename(s))
      case RuleExpr.Add(a, b) =>
        when(c(a).isNull && c(b).isNull, lit(null))
          .otherwise(coalesce(c(a), lit(0)) + coalesce(c(b), lit(0)))
      case RuleExpr.Sub(a, b) =>
        when(c(a).isNull && c(b).isNull, lit(null))
          .otherwise(coalesce(c(a), lit(0)) - coalesce(c(b), lit(0)))
      case RuleExpr.Mul(a, b) => c(a) * c(b)
      case RuleExpr.Div(a, b) =>
        when(c(b).cast("double") =!= 0.0, c(a).cast("double") / c(b).cast("double"))
          // zero denominator with data present → #DIV/0! sentinel (NaN)
          .otherwise(when(c(a).isNotNull && c(b).isNotNull, lit(Double.NaN)))
      case RuleExpr.Neg(a) => -c(a)
      case RuleExpr.Fn("abs", a) => abs(c(a))
      case RuleExpr.Fn("round", a) => round(c(a))
      case RuleExpr.Fn(n, _) => throw new IllegalArgumentException(s"unknown rule function '$n'")
      case RuleExpr.Shift(d, _) => throw new IllegalArgumentException(
        s"relative shift on '$d' not expressible in a view column")
    }
    c(e)
  }

  // ---- windowed / rendered output (≙ `view.py:746-767, 984-1331`) ---------

  /** Collect (a window of) the grid driver-side for rendering. */
  def collect(window: Option[ViewWindow] = None): (Seq[String], Seq[Seq[Any]]) = {
    val grid = refresh()
    val allCols = grid.columns.toSeq
    val nRowKeys = dfn.rows.entries.size
    val keptCols = window match {
      case Some(w) =>
        allCols.take(nRowKeys) ++
          allCols.drop(nRowKeys).slice(w.left, w.right + 1)
      case None => allCols
    }
    val rows = window match {
      case Some(w) =>
        grid.limit(w.bottom + 1).collect().drop(w.top).toSeq
      case None => grid.collect().toSeq
    }
    stats = stats.copy(rows = rows.size)
    (keptCols, rows.map(r => keptCols.map(c => r.get(r.fieldIndex(c)))))
  }

  /** Member number format cascade: the LAST column-axis member (usually the
    * measure) with a defined format wins, else plain (≙ `view.py:791-852`,
    * formats `dimension.py:1479-1518`). Multi-dim positions split on '/'.
    */
  private def fmtFor(colName: String): Option[String] = {
    val parts = colName.split("/").toSeq
    val cds = dfn.cols.entries.map(e => dimIdx(e._1))
    cds.zip(parts).reverse.collectFirst {
      case (cd, p) if cube.dimensions(cd).contains(p) &&
        cube.dimensions(cd)(p).format.isDefined => cube.dimensions(cd)(p).format.get
    }
  }

  def toConsole(window: Option[ViewWindow] = None): String = {
    val (cols, rows) = collect(window)
    val rendered = rows.map(_.zip(cols).map { case (v, c) =>
      v match {
        case null => ""
        case d: java.lang.Double if d.isNaN => graft.core.CellValue.DivZero
        case d: java.lang.Double => ViewFormat(fmtFor(c), d)
        case x => x.toString
      }
    })
    val widths = cols.indices.map(i =>
      (cols(i).length +: rendered.map(_(i).length)).max)
    def line(vals: Seq[String]) = vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }.mkString(" | ")
    (line(cols) +: line(widths.map("-" * _)) +: rendered.map(line)).mkString("\n")
  }

  /** Full idx address of one grid cell (filters + row members + the column
    * member + defaults) — used to surface cell comments (≙ `view.py:870-871`).
    */
  private def cellAddress(rowMembers: Map[String, String], colMember: String): Vector[Int] = {
    val colByDim = dfn.cols.entries.map(e => dimIdx(e._1))
      .zip(colMember.split("/").toSeq).toMap
    Vector.tabulate(cube.nDims) { i =>
      val d = cube.dimensions(i)
      colByDim.get(i).map(d.idOf).getOrElse {
        rowMembers.get(d.name.toLowerCase).map(d.idOf).getOrElse {
          dfn.filters.find(_._1.equalsIgnoreCase(d.name))
            .map(f => d.idOf(f._2)).getOrElse(d.defaultMember.id)
        }
      }
    }
  }

  def toHtml(window: Option[ViewWindow] = None): String = {
    val (cols, rows) = collect(window)
    val nRowKeys = dfn.rows.entries.size
    val head = cols.map(c => s"<th>$c</th>").mkString
    val body = rows.map { r =>
      val rowMembers = cols.take(nRowKeys).zip(r.take(nRowKeys))
        .map { case (c, v) => c.toLowerCase -> String.valueOf(v) }.toMap
      "<tr>" + r.zip(cols).zipWithIndex.map { case ((v, c), idx) =>
        val s = v match {
          case null => ""
          case d: java.lang.Double if d.isNaN => graft.core.CellValue.DivZero
          case d: java.lang.Double => ViewFormat(fmtFor(c), d)
          case x => x.toString
        }
        val tooltip = if (idx < nRowKeys) "" else {
          val cs = cube.comments.get(cellAddress(rowMembers, c))
          if (cs.isEmpty) ""
          else " title=\"" + cs.map(cm => s"${cm.user}: ${cm.text}").mkString("; ")
            .replace("\"", "&quot;") + "\""
        }
        s"<td$tooltip>$s</td>"
      }.mkString + "</tr>"
    }.mkString("\n")
    s"<table><thead><tr>$head</tr></thead><tbody>\n$body\n</tbody></table>"
  }

  /** CSV render (≙ the Slice CSV export, `slice.py:669-671`). */
  def toCsv(window: Option[ViewWindow] = None): String = {
    val (cols, rows) = collect(window)
    def esc(s: String) =
      if (s.exists(c => c == ',' || c == '"' || c == '\n')) "\"" + s.replace("\"", "\"\"") + "\""
      else s
    (cols.map(esc).mkString(",") +: rows.map(_.map {
      case null => ""
      case d: java.lang.Double if d.isNaN => graft.core.CellValue.DivZero
      case d: java.lang.Double => d.toString
      case x => x.toString
    }.map(esc).mkString(","))).mkString("\n")
  }

  def toJson(window: Option[ViewWindow] = None): String = {
    val (cols, rows) = collect(window)
    val items = rows.map { r =>
      cols.zip(r).map { case (c, v) =>
        val vs = v match {
          case null => "null"
          case d: java.lang.Double if d.isNaN => "\"" + graft.core.CellValue.DivZero + "\""
          case d: java.lang.Double => d.toString
          case x => "\"" + x.toString.replace("\"", "\\\"") + "\""
        }
        "\"" + c.replace("\"", "\\\"") + "\":" + vs
      }.mkString("{", ",", "}")
    }
    items.mkString("[", ",", "]")
  }
}

/** ViewDef ⇄ JSON (≙ `view.py:1089-1149` — definition round-trip,
  * `tests/test_view.py:41-60`).
  */
object ViewDef {
  import org.json4s._
  import org.json4s.JsonDSL._
  import org.json4s.jackson.JsonMethods

  private def axisJson(a: AxisDef): JValue =
    a.entries.map { case (d, ms) => ("dimension" -> d) ~ ("members" -> ms.toList) }

  def toJson(v: ViewDef): String = JsonMethods.compact(JsonMethods.render(
    ("filters" -> v.filters.map { case (d, m) =>
      ("dimension" -> d) ~ ("member" -> m) }.toList) ~
    ("rows" -> axisJson(v.rows)) ~
    ("columns" -> axisJson(v.cols)) ~
    ("zeroSuppression" -> v.zeroSuppression)))

  def fromJson(s: String): ViewDef = {
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(s)
    def axis(field: String): AxisDef = AxisDef(
      (j \ field).extract[List[JValue]].map { e =>
        ((e \ "dimension").extract[String], (e \ "members").extract[List[String]]) })
    ViewDef(
      filters = (j \ "filters").extract[List[JValue]].map(e =>
        ((e \ "dimension").extract[String], (e \ "member").extract[String])),
      rows = axis("rows"),
      cols = axis("columns"),
      zeroSuppression = (j \ "zeroSuppression").extract[Boolean])
  }
}

/** Python-format-mini-language subset for member number formats
  * (≙ `dimension.py:1479-1518`, applied at `view.py:866-869`):
  * `{:.Nf}`, `{:.N%}`, `{:,.Nf}`.
  */
object ViewFormat {
  private val P = """\{:(,)?\.(\d+)([f%])\}""".r
  def apply(fmt: Option[String], v: Double): String = fmt match {
    case Some(P(comma, digits, kind)) =>
      val n = digits.toInt
      kind match {
        case "%" => String.format(s"%.${n}f%%", Double.box(v * 100))
        case _ =>
          val s = String.format(s"%${if (comma != null) "," else ""}.${n}f", Double.box(v))
          s
      }
    case _ => if (v == v.floor && math.abs(v) < 1e15) v.toLong.toString else v.toString
  }
}
