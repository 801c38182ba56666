package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.BlockClustering

/** Unit fixtures for the MT_Kruskal.R / likelihood.R parity clusterer:
  * hand-computed dendrogram cuts on small blocks.
  */
class BlockClusteringSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "blockclustering-spec")
  import spark.implicits._

  test("two tight cliques joined by one weak edge are split at the cut") {
    // clique {0,1,2} sims .95, clique {3,4,5} sims .95, bridge (2,3) sim .55
    val edges = Array(
      (0, 1, 0.95), (0, 2, 0.95), (1, 2, 0.95),
      (3, 4, 0.95), (3, 5, 0.95), (4, 5, 0.95),
      (2, 3, 0.55)
    )
    val lab = BlockClustering.clusterBlock(6, edges)
    assert(lab(0) == lab(1) && lab(1) == lab(2))
    assert(lab(3) == lab(4) && lab(4) == lab(5))
    assert(lab(0) != lab(3), "weak bridge must be cut by the likelihood objective")
  }

  test("uniformly tight block stays one cluster") {
    val edges = for { i <- 0 until 5; j <- i + 1 until 5 } yield (i, j, 0.9)
    val lab = BlockClustering.clusterBlock(5, edges.toArray)
    assert(lab.distinct.length == 1)
  }

  test("all-weak block stays singletons") {
    // sims below 0.5 have negative logit: merging them lowers L
    val edges = Array((0, 1, 0.2), (1, 2, 0.3), (0, 2, 0.25))
    val lab = BlockClustering.clusterBlock(3, edges)
    assert(lab.distinct.length == 3)
  }

  test("refine splits a chained component, keeps tight ones, covers all ids") {
    val clusters = Seq(
      ("a1", "A"), ("a2", "A"), ("a3", "A"), ("b1", "A"), ("b2", "A"), ("b3", "A"),
      ("t1", "T"), ("t2", "T"),
      ("s1", "s1") // singleton block
    ).toDF("conv_id", "component")
    val pairs = Seq(
      ("a1", "a2", 0.95), ("a1", "a3", 0.95), ("a2", "a3", 0.95),
      ("b1", "b2", 0.95), ("b1", "b3", 0.95), ("b2", "b3", 0.95),
      ("a3", "b1", 0.55), // the chain that glued A
      ("t1", "t2", 0.9)
    ).toDF("id1", "id2", "jaccard")
    val out = BlockClustering.refine(spark, clusters, pairs).cache()
    assert(out.count() == 9, "every conv keeps exactly one row")
    val m = out.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("a1") == m("a2") && m("a2") == m("a3"))
    assert(m("b1") == m("b2") && m("b2") == m("b3"))
    assert(m("a1") != m("b1"), "chained block must be split")
    assert(m("t1") == m("t2"))
    assert(m("s1") == "s1")
  }

  test("refine labeling is a pure function of block content (partition-independent, tie-robust)") {
    // every edge shares the SAME sim: merge order among ties is exactly what
    // partition-order-dependent iteration would scramble
    val clusters = (1 to 12).map(i => (f"c$i%02d", "B")).toDF("conv_id", "component")
    val pairs = ((1 to 11).map(i => (f"c$i%02d", f"c${i + 1}%02d", 0.8)) ++
      Seq(("c01", "c03", 0.8), ("c09", "c11", 0.8))).toDF("id1", "id2", "jaccard")
    def run(cp: Int, pp: Int): Map[String, String] =
      BlockClustering.refine(spark, clusters.repartition(cp), pairs.repartition(pp))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val ref = run(1, 1)
    assert(ref == run(7, 5), "labels must not depend on partitioning")
    assert(ref == run(3, 2), "labels must not depend on partitioning")
  }

  test("constrained clusterBlock never merges conflict-group siblings (G11)") {
    // one tight clique; members 0 and 1 are splits of the same duplicated id
    val edges = (for { i <- 0 until 4; j <- i + 1 until 4 } yield (i, j, 0.95)).toArray
    val conflict = Array(0, 0, -1, -1)
    val lab = BlockClustering.clusterBlock(4, edges, conflict = conflict)
    assert(lab(0) != lab(1), "siblings must stay in distinct sub-clusters")
    // the unconstrained objective would have merged everything
    assert(BlockClustering.clusterBlock(4, edges).distinct.length == 1)
  }

  test("splitDuplicates replicates edges, forces splits apart, keeps others intact") {
    val clusters = Seq(
      ("a1", "A"), ("a2", "A"), ("dup", "A"), ("b1", "A"), ("b2", "A")
    ).toDF("conv_id", "component")
    // dup is strongly tied to BOTH the a-clique and the b-clique — exactly
    // the dual-assignment situation MT_Kruskal.R:46-82 splits. Scores are
    // asymmetric (the realistic classifier case); attachment among splits is
    // greedy in descending-sim order, as in the reference's Kruskal.
    val pairs = Seq(
      ("a1", "a2", 0.95), ("a1", "dup", 0.93), ("a2", "dup", 0.93),
      ("b1", "b2", 0.95), ("b1", "dup", 0.92), ("b2", "dup", 0.92),
      ("a1", "b1", 0.1)
    ).toDF("id1", "id2", "jaccard")
    val dups = Seq(("dup", 2)).toDF("conv_id", "n")
    val out = BlockClustering.splitDuplicates(spark, clusters, pairs, dups)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out.keySet == Set("a1", "a2", "b1", "b2", "dup_1", "dup_2"),
      "dup must be replaced by its splits")
    assert(out("dup_1") != out("dup_2"), "splits must land in distinct clusters")
    assert(out("a1") == out("a2") && out("b1") == out("b2"))
    assert(out("a1") != out("b1"))
    val dupSides = Set(out("dup_1"), out("dup_2"))
    assert(dupSides == Set(out("a1"), out("b1")),
      "each split must adopt one of the two cliques")
  }

  test("splitDuplicates labeling is partition-invariant") {
    val clusters = Seq(("x1", "X"), ("x2", "X"), ("d", "X")).toDF("conv_id", "component")
    val pairs = Seq(("x1", "d", 0.9), ("x2", "d", 0.9), ("x1", "x2", 0.2)).toDF("id1", "id2", "jaccard")
    val dups = Seq(("d", 2)).toDF("conv_id", "n")
    def run(p: Int) = BlockClustering
      .splitDuplicates(spark, clusters.repartition(p), pairs.repartition(p), dups)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(run(1) == run(5))
  }
}
