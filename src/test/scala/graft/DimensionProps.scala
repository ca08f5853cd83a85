package graft

import graft.core.Dimension
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the catalog/closure layer (SURVEY §5: property
  * tests the reference never had). Pure driver-side — no Spark session.
  *
  * Random DAGs are built layer-by-layer (edges only point to lower layers),
  * so they are acyclic by construction; weights are small integers.
  */
object DimensionProps extends Properties("Dimension") {

  /** (nLeaves, edges) where edges: (parentLayerNode, childName, weight). */
  private case class Dag(leaves: Seq[String], mids: Seq[(String, Seq[(String, Double)])],
      root: Seq[(String, Double)])

  private val genDag: Gen[Dag] = for {
    nLeaves <- Gen.choose(2, 8)
    nMids <- Gen.choose(1, 4)
    leaves = (0 until nLeaves).map(i => s"L$i")
    mids <- Gen.sequence[Seq[(String, Seq[(String, Double)])], (String, Seq[(String, Double)])](
      (0 until nMids).map { m =>
        for {
          kidIdx <- Gen.someOf(leaves.indices)
          kids = if (kidIdx.isEmpty) Seq(leaves(m % nLeaves)) else kidIdx.map(leaves).toSeq
          ws <- Gen.listOfN(kids.size, Gen.choose(-2, 3).map(_.toDouble))
        } yield (s"M$m", kids.zip(ws))
      })
    rootWs <- Gen.listOfN(nMids, Gen.choose(1, 2).map(_.toDouble))
  } yield Dag(leaves, mids, mids.map(_._1).zip(rootWs))

  private def build(dag: Dag): Dimension = {
    val d = new Dimension("prop")
    d.edit()
    dag.leaves.foreach(l => d.add(l))
    dag.mids.foreach { case (m, kids) =>
      d.add(m, kids.map(_._1), kids.map(_._2))
    }
    d.add("ROOT", dag.root.map(_._1), dag.root.map(_._2))
    d.commit()
    d
  }

  /** Brute-force effective leaf weights: Σ over paths of Π edge weights. */
  private def brute(dag: Dag, node: String): Map[String, Double] = {
    if (node.startsWith("L")) Map(node -> 1.0)
    else {
      val kids: Seq[(String, Double)] =
        if (node == "ROOT") dag.root else dag.mids.find(_._1 == node).get._2
      kids.foldLeft(Map.empty[String, Double]) { case (acc, (k, w)) =>
        brute(dag, k).foldLeft(acc) { case (a, (leaf, lw)) =>
          a.updated(leaf, a.getOrElse(leaf, 0.0) + w * lw)
        }
      }
    }
  }

  property("closure weights equal brute-force path-product sums") = forAll(genDag) { dag =>
    val d = build(dag)
    (dag.mids.map(_._1) :+ "ROOT").forall { node =>
      val cl = d.leavesOf(node).map(r => d.nameOf(r.leaf) -> r.weight).toMap
      val bf = brute(dag, node).filter(_._2 != 0.0)
      // closure may keep explicit zero-weight rows; compare non-zero support
      cl.filter(_._2 != 0.0) == bf &&
        cl.keys.forall(l => d(l).level == 0)
    }
  }

  property("levels: parent is strictly above every child") = forAll(genDag) { dag =>
    val d = build(dag)
    d.members.forall(m => m.children.forall(c => d.levelOf(c) < m.level))
  }

  property("multi-parent leaves appear in every ancestor's closure") = forAll(genDag) { dag =>
    val d = build(dag)
    d.leafMembers.forall { leaf =>
      d.allParents(leaf.id).forall { anc =>
        d.closureRows.exists(r => r.anc == anc && r.leaf == leaf.id)
      }
    }
  }

  property("back edges are rejected as cycles") = forAll(genDag) { dag =>
    val d = build(dag)
    val reachableLeaf = d.nameOf(d.leavesOf("ROOT").head.leaf)
    Prop.throws(classOf[IllegalArgumentException]) {
      d.edit()
      d.add(reachableLeaf, Seq("ROOT")) // a ROOT-reachable leaf becomes ROOT's parent
      d.commit()
    }
  }
}
