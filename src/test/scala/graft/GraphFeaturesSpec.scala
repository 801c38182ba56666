package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraphFeatures

/** shortpath.py parity fixture: weight 1/sim, feature 1/dist, 0 when
  * disconnected; indirect paths accumulate weights.
  */
class GraphFeaturesSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "graphfeat-spec")
  import spark.implicits._

  test("path features: direct, transitive, and disconnected pairs") {
    val clusters = Seq(
      ("a", "C"), ("b", "C"), ("c", "C"), ("d", "C"), // chain a-b-c, d isolated
      ("x", "X"), ("y", "X") // another block
    ).toDF("conv_id", "component")
    val pairs = Seq(
      ("a", "b", 0.5), // w=2
      ("b", "c", 0.25), // w=4
      ("x", "y", 1.0) // w=1
    ).toDF("id1", "id2", "jaccard")
    val feats = GraphFeatures.shortestPathFeatures(spark, clusters, pairs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(feats(("a", "b")) == 0.5) // 1/2
    assert(feats(("b", "c")) == 0.25) // 1/4
    assert(feats(("a", "c")) == 1.0 / 6.0) // via b: 2+4
    assert(feats(("a", "d")) == 0.0 && feats(("c", "d")) == 0.0) // disconnected
    assert(feats(("x", "y")) == 1.0)
    assert(feats.size == 7, s"C(4,2)+C(2,2)=7 pairs, got ${feats.size}") // full pair matrix per block
  }

  test("unweighted 2/dist variant (short_path.R coau_dist parity)") {
    val clusters = Seq(("a", "C"), ("b", "C"), ("c", "C"), ("d", "C"))
      .toDF("conv_id", "component")
    val pairs = Seq(("a", "b", 0.5), ("b", "c", 0.25)).toDF("id1", "id2", "jaccard")
    val feats = GraphFeatures
      .shortestPathFeatures(spark, clusters, pairs, unweighted = true, featureNumerator = 2.0)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(feats(("a", "b")) == 2.0) // 1 hop -> 2/1
    assert(feats(("a", "c")) == 1.0) // 2 hops -> 2/2; coau_dummy == (feature == 1)
    assert(feats(("a", "d")) == 0.0) // disconnected
  }

  test("same-component indicator: joined labels, absent nodes never connect") {
    val clusters = Seq(("a", "C"), ("b", "C"), ("x", "X")).toDF("conv_id", "component")
    val pairs = Seq(("a", "b"), ("a", "x"), ("a", "zz")).toDF("id1", "id2")
    val m = GraphFeatures.sameComponentFeature(pairs, clusters)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(m(("a", "b")) == 1)
    assert(m(("a", "x")) == 0)
    assert(m(("a", "zz")) == 0) // zz unlabeled
  }

  test("shared-key adjacency keeps mid-frequency keys only (1 < count < 4 parity)") {
    val members = Seq(
      ("p1", "kRare"), // count 1: dropped
      ("p2", "kPair"), ("p3", "kPair"), // count 2: kept
      ("p4", "kTri"), ("p5", "kTri"), ("p6", "kTri"), // count 3: kept
      ("p7", "kHub"), ("p8", "kHub"), ("p9", "kHub"), ("p0", "kHub") // count 4: hub, dropped
    ).toDF("id", "key")
    val adj = GraphFeatures.sharedKeyAdjacency(members)
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(adj == Set(("p2", "p3"), ("p4", "p5"), ("p4", "p6"), ("p5", "p6")), adj.toString)
  }

  test("per-block accuracy report ranks blocks by mean correctness") {
    import graft.pipeline.Eval
    val labeled = Seq(
      ("A", 1, 1), ("A", 0, 0), // perfect
      ("B", 1, 0), ("B", 0, 0), // 0.5
      ("C", 1, 0) // 0.0
    ).toDF("block", "label", "pred")
    val rows = Eval.perBlockAccuracy(labeled).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(("A", 2L, 1.0), ("B", 2L, 0.5), ("C", 1L, 0.0)))
  }

  test("weight column is parameterized (one shortpath pass per feature field)") {
    val clusters = Seq(("a", "C"), ("b", "C"), ("c", "C")).toDF("conv_id", "component")
    val pairs = Seq(("a", "b", 0.9, 0.2), ("b", "c", 0.9, 0.5))
      .toDF("id1", "id2", "jaccard", "org_sim")
    val feats = GraphFeatures
      .shortestPathFeatures(spark, clusters, pairs, weightCol = "org_sim")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(feats(("a", "b")) == 0.2) // 1/(1/0.2)
    assert(feats(("b", "c")) == 0.5)
    assert(feats(("a", "c")) == 1.0 / 7.0) // 5 + 2
  }
}
