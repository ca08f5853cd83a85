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

final case class ViewStats(durationMs: Long, rows: Long, columns: Int)

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
    * names), then one column per column-axis position, ordered by axis
    * position. Cells are doubles (null = empty).
    */
  def refresh(): DataFrame = {
    val t0 = System.nanoTime()
    val rowDims = dfn.rows.entries.map(e => dimIdx(e._1))
    val colDims = dfn.cols.entries.map(e => dimIdx(e._1))
    require(colDims.size == 1, "column axis must hold exactly one dimension")
    val cd = colDims.head
    val colDim = cube.dimensions(cd)

    // split requested column members into stored vs rule-derived
    val requested = dfn.cols.entries.head._2
    def ruleFor(m: String): Option[RuleDef] = cube.rules.find { r =>
      (r.scope == RuleScope.AllLevels || r.scope == RuleScope.AggregationLevel) &&
        r.trigger.exists { case (d, mm) =>
          d.equalsIgnoreCase(colDim.name) && mm.equalsIgnoreCase(m) }
    }
    val ruled = requested.flatMap(m => ruleFor(m).map(m -> _)).toMap
    val plain = requested.filterNot(ruled.contains)
    val refMembers = ruled.values.flatMap(r => collectRefNames(r.expr)).toSeq.distinct
    val colMembers = (plain ++ refMembers.filterNot(plain.contains)).distinct

    // selections: filters fix single members; unmentioned dims → default
    val sel = Array.tabulate(cube.nDims) { i =>
      Seq(cube.dimensions(i).defaultMember.id)
    }
    dfn.filters.foreach { case (d, m) => sel(dimIdx(d)) = Seq(cube.dimensions(dimIdx(d)).idOf(m)) }
    dfn.rows.entries.zip(rowDims).foreach { case ((_, ms), i) =>
      sel(i) = ms.map(cube.dimensions(i).idOf)
    }
    sel(cd) = colMembers.map(colDim.idOf)

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

    // pivot by column member name
    val colNameById = colMembers.map(m => colDim.idOf(m) -> m).toMap
    val mapExpr = map(colNameById.toSeq.flatMap { case (id, n) => Seq(lit(id), lit(n)) }: _*)
    df = df.withColumn("__colName", mapExpr(col(s"a$cd")))
    val rowKeyCols = rowDims.zip(dfn.rows.entries).map(_._2._1)
    val ordCols = rowDims.map(i => s"__ord$i")
    var grid = df.groupBy((rowKeyCols ++ ordCols).map(col): _*)
      .pivot("__colName", colMembers)
      .agg(first(col("value").cast("double")))

    // rule-derived columns post-pivot (one job, no per-cell recursion)
    ruled.foreach { case (m, rule) =>
      grid = grid.withColumn(m, exprByName(rule.expr))
    }

    if (dfn.zeroSuppression) {
      val cells = requested.map(m => abs(coalesce(col(m), lit(0.0))))
      grid = grid.filter(cells.reduce(_ + _) =!= 0.0) // ≙ `view.py:844-885`
    }

    val ordered = grid.orderBy(ordCols.map(col): _*)
      .select((rowKeyCols.map(col) ++ requested.map(col)): _*)
    stats = ViewStats((System.nanoTime() - t0) / 1000000, 0, requested.size)
    ordered
  }

  private def collectRefNames(e: RuleExpr): Seq[String] =
    Rules.collectRefs(e).filterNot(_.contains(":"))

  private def exprByName(e: RuleExpr): Column = e match {
    case RuleExpr.Lit(v) => lit(v)
    case RuleExpr.Ref(s) => col(s)
    case RuleExpr.Add(a, b) => coalesce(exprByName(a), lit(0)) + coalesce(exprByName(b), lit(0))
    case RuleExpr.Sub(a, b) => coalesce(exprByName(a), lit(0)) - coalesce(exprByName(b), lit(0))
    case RuleExpr.Mul(a, b) => exprByName(a) * exprByName(b)
    case RuleExpr.Div(a, b) =>
      when(exprByName(b).cast("double") =!= 0.0, exprByName(a).cast("double") / exprByName(b).cast("double"))
    case RuleExpr.Neg(a) => -exprByName(a)
    case RuleExpr.Fn("abs", a) => abs(exprByName(a))
    case RuleExpr.Fn("round", a) => round(exprByName(a))
    case RuleExpr.Fn(n, _) => throw new IllegalArgumentException(s"unknown rule function '$n'")
    case RuleExpr.Shift(d, _) => throw new IllegalArgumentException(
      s"relative shift on '$d' not expressible in a view column")
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

  /** Member number format cascade: column member format wins, else plain
    * (≙ `view.py:791-852`, formats `dimension.py:1479-1518`).
    */
  private def fmtFor(colName: String): Option[String] = {
    val cd = dimIdx(dfn.cols.entries.head._1)
    val d = cube.dimensions(cd)
    if (d.contains(colName)) d(colName).format else None
  }

  def toConsole(window: Option[ViewWindow] = None): String = {
    val (cols, rows) = collect(window)
    val rendered = rows.map(_.zip(cols).map { case (v, c) =>
      v match {
        case null => ""
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
    val cd = dimIdx(dfn.cols.entries.head._1)
    Vector.tabulate(cube.nDims) { i =>
      val d = cube.dimensions(i)
      if (i == cd) d.idOf(colMember)
      else rowMembers.get(d.name.toLowerCase).map(d.idOf).getOrElse {
        dfn.filters.find(_._1.equalsIgnoreCase(d.name))
          .map(f => d.idOf(f._2)).getOrElse(d.defaultMember.id)
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
