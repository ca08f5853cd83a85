package graft.olap

import graft.core.{Cube, Dimension}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Materialized aggregates + navigator — the classic OLAP accelerator the
  * reference's in-memory engine never needed but a 100 TB deployment cannot
  * live without: pre-aggregate the fact frame at a coarser GRAIN (e.g.
  * nation × year instead of customer × day), then serve any query whose
  * addresses sit at-or-above the grain from the (orders-of-magnitude
  * smaller) summary, falling back to the base cube otherwise.
  *
  * Design: per dimension the grain is a LEVEL whose members must PARTITION
  * the leaves at unit weight (validated driver-side from the closure — a
  * multi-parent level like product's brand/type double-cover is rejected
  * loudly). The summary is a full `Cube` over DERIVED dimensions: grain
  * members become the leaves, and every base member whose leaf set
  * decomposes exactly into grain cells (constant weight per cell) is added
  * as an ancestor with the decomposition as its children. Because derived
  * members keep their NAMES, coverage routing is simply
  * `dimension.contains(member)` — an address below the grain (a customer, a
  * day) is not a member of the derived dimension and falls back to base.
  * Every existing read path (rollup, identity elision, gridAggregate,
  * views, dialect, rules) works unchanged on the summary cube.
  *
  * Pre-aggregation runs through the base cube's own `gridAggregate` at the
  * grain selection — weighted closures, decimal exactness and the one-
  * shuffle plan are inherited, so summary-served results are bit-identical
  * to base-served ones. The summary frame is `localCheckpoint`ed
  * (materialized, lineage cut) — it IS the materialization.
  *
  * Base rules are re-registered on the summary (an ALL_LEVELS ratio like
  * margin = net/gross computes identically over summary-aggregated
  * operands); a rule that cannot validate there (a ref below the grain)
  * fails the materialization loudly rather than silently serving stored
  * empties. Summaries are read-only by convention — the navigator exposes
  * reads, and any write to the BASE cube bumps its state version, which the
  * navigator checks so a stale summary is never consulted.
  *
  * Lifetime: summaries are session-scope materializations (localCheckpoint
  * blocks) — at session start they rebuild in ONE `gridAggregate` job over
  * the base facts. If that rebuild is too costly at your scale, persist
  * `summary.facts` (e.g. `FactSources.writeBucketed`, bucketed on the
  * query-hot grain keys) and construct the summary `Cube` over the loaded
  * frame with the same derived dimensions.
  */
object Aggregates {

  /** Build a materialized summary cube of `base` at the given per-dimension
    * grain levels (`None` = keep full leaf resolution, reusing the base
    * dimension object). ≙ the aggregate tables a tinyolap user would
    * maintain by hand with rules (`cube.py` has no native equivalent).
    */
  def materialize(base: Cube, name: String,
      grainLevels: Seq[Option[Int]]): Cube = {
    require(grainLevels.length == base.nDims,
      s"materialize: ${base.nDims} grain entries expected, got ${grainLevels.length}")
    // degenerate dimensions have no member catalog to enumerate a grain or
    // a leaf selection from — a summary over them would silently be EMPTY
    base.dimensions.foreach(d => require(!d.isDegenerate,
      s"dimension '${d.name}' is degenerate — cubes with degenerate " +
        "dimensions cannot be summarized (no catalog to enumerate)"))
    val derived: Seq[(Dimension, Seq[Int])] =
      base.dimensions.zip(grainLevels).map {
        case (d, None) => (d, d.leafMembers.map(_.id))
        case (d, Some(lvl)) =>
          require(!d.isDegenerate,
            s"dimension '${d.name}' is degenerate — only leaf resolution (None) is possible")
          require(lvl > 0, s"grain level must be > 0 (None keeps leaf resolution)")
          val grain = d.members.filter(_.level == lvl)
          require(grain.nonEmpty, s"dimension '${d.name}' has no members at level $lvl")
          // the grain must PARTITION the leaves at unit weight
          val cover = mutable.Map[Int, Int]().withDefaultValue(0)
          grain.foreach { g =>
            d.leavesOf(g.name).foreach { cr =>
              require(cr.weight == 1.0,
                s"grain member '${g.name}' reaches a leaf at weight ${cr.weight} — " +
                  "unit-weight partition required for a summary grain")
              cover(cr.leaf) += 1
            }
          }
          d.leafMembers.foreach(l => require(cover(l.id) == 1,
            s"grain level $lvl of '${d.name}' covers leaf '${l.name}' ${cover(l.id)}× — " +
              "the grain must partition the leaves (multi-parent levels cannot be a grain)"))
          val grainLeafSets: Seq[(String, Set[Int])] =
            grain.map(g => g.name -> d.leavesOf(g.name).map(_.leaf).toSet)
          val nd = new Dimension(d.name)
          nd.edit()
          nd.addMany(grain.map(_.name))
          // every ancestor that decomposes exactly into grain cells with a
          // constant per-cell weight joins the derived dim (flat hierarchy:
          // children are the grain cells directly)
          d.members.filter(_.level > lvl).foreach { m =>
            val mls = d.leavesOf(m.name).map(cr => cr.leaf -> cr.weight).toMap
            val parts = mutable.ArrayBuffer[(String, Double)]()
            var servable = true
            grainLeafSets.foreach { case (gn, gl) =>
              val inter = gl.intersect(mls.keySet)
              if (inter.nonEmpty) {
                val ws = inter.toSeq.map(mls)
                if (inter != gl || ws.distinct.size != 1) servable = false
                else parts += (gn -> ws.head)
              }
            }
            if (servable && parts.iterator.map(p => grainLeafSets
                .find(_._1 == p._1).get._2.size).sum == mls.size)
              nd.add(m.name, parts.map(_._1).toSeq, parts.map(_._2).toSeq)
          }
          nd.commit()
          (nd, grain.map(_.id))
      }

    // pre-aggregate at the grain through the base cube's own grid machinery
    // (weighted closures, identity elision, decimal exactness inherited),
    // then remap base member ids to the derived dims' ids (name-stable)
    val g = base.gridAggregate(derived.map(_._2))
    val remapped = derived.zipWithIndex.foldLeft(g) { case (df, ((nd, grainIds), i)) =>
      if (nd eq base.dimensions(i)) df.withColumnRenamed(s"a$i", s"d$i")
      else {
        val idMap = map(grainIds.flatMap(bid =>
          Seq(lit(bid), lit(nd.idOf(base.dimensions(i).nameOf(bid))))): _*)
        df.withColumn(s"d$i", idMap(col(s"a$i"))).drop(s"a$i")
      }
    }.select((0 until base.nDims).map(i => col(s"d$i")) :+ col("value"): _*)

    val summary = new Cube(name, derived.map(_._1), base.spark,
      Some(remapped.localCheckpoint(true)))
    summary.databaseRef = base.databaseRef // CubeRef rules keep resolving
    // rules travel: ratio/derived measures compute identically over
    // summary-aggregated operands; a rule that cannot validate against the
    // derived dims fails the materialization LOUDLY (a silently rule-less
    // summary would serve stored empties for rule-backed members)
    base.rules.foreach(summary.registerRule)
    summary
  }

  /** Aggregate navigator: routes each read to the FIRST summary whose
    * dimensions contain every addressed member (pass summaries smallest
    * first), else the base cube. Any base mutation after construction makes
    * every summary stale — the navigator then always answers from base.
    */
  final class Navigator(val base: Cube, val summaries: Seq[Cube]) {
    private val version = base.currentStateVersion

    def fresh: Boolean = base.currentStateVersion == version

    /** The cube that will answer `address`: names carry over into derived
      * dimensions, so membership IS coverage (below-grain members are
      * absent by construction). */
    def cubeFor(address: Seq[String]): Cube =
      if (!fresh) base
      else summaries.find(sc => address.length == sc.nDims &&
        address.zip(sc.dimensions).forall { case (m, d) => d.contains(m) })
        .getOrElse(base)

    def get(address: Seq[String]): Option[Double] = cubeFor(address).get(address)

    /** A whole VIEW through the navigator: dimensions the definition leaves
      * unmentioned are pinned to the BASE cube's default member first (view
      * semantics must not shift with routing — a summary's own default
      * would be a grain member, not the base leaf), then the view runs on
      * the first summary containing every named member, else on base.
      */
    def view(dfn: ViewDef): View = {
      val mentioned = (dfn.filters.map(_._1) ++ dfn.rows.entries.map(_._1) ++
        dfn.cols.entries.map(_._1)).map(_.toLowerCase).toSet
      val pins = base.dimensions.filterNot(d => mentioned(d.name.toLowerCase))
        .map(d => d.name -> d.defaultMember.name)
      val dfn2 = dfn.copy(filters = dfn.filters ++ pins)
      val named: Seq[(String, String)] = dfn2.filters ++
        dfn2.rows.entries.flatMap { case (dn, ms) => ms.map(dn -> _) } ++
        dfn2.cols.entries.flatMap { case (dn, ms) => ms.map(dn -> _) }
      val target =
        if (!fresh) base
        else summaries.find(sc => named.forall { case (dn, m) =>
          val i = sc.dimensions.indexWhere(_.name.equalsIgnoreCase(dn))
          i >= 0 && sc.dimensions(i).contains(m)
        }).getOrElse(base)
      new View(target, dfn2)
    }
  }
}
