package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AffinityPropagation

/** Frey–Dueck AP kernel (ap_cluster.R parity path) on analytically-known
  * blocks, plus the distributed per-block wrapper.
  */
class AffinityPropagationSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "ap-spec")
  import spark.implicits._

  test("two tight cliques with weak cross sims form two clusters") {
    val intra = for { c <- 0 to 1; i <- 0 until 3; j <- i + 1 until 3 }
      yield (c * 3 + i, c * 3 + j, 0.9)
    val cross = for { i <- 0 until 3; j <- 3 until 6 } yield (i, j, 0.05)
    val lab = AffinityPropagation.apBlock(6, (intra ++ cross).toArray)
    assert(lab(0) == lab(1) && lab(1) == lab(2))
    assert(lab(3) == lab(4) && lab(4) == lab(5))
    assert(lab(0) != lab(3))
  }

  test("uniform block collapses to one exemplar under a low preference") {
    // all off-diagonal sims equal -> the median preference sits AT the
    // similarity level and exemplar count is genuinely undetermined (AP's
    // granularity is the preference, Frey-Dueck 2007); a low preference
    // resolves it to one cluster, which is the distributed wrapper's default
    // (preference = missingSim)
    val edges = for { i <- 0 until 5; j <- i + 1 until 5 } yield (i, j, 0.9)
    val lab = AffinityPropagation.apBlock(5, edges.toArray, preference = Some(0.1))
    assert(lab.distinct.length == 1)
  }

  test("labels are invariant to edge input order") {
    val edges = Array(
      (0, 1, 0.9), (0, 2, 0.85), (1, 2, 0.9),
      (3, 4, 0.8), (2, 3, 0.1), (0, 4, 0.05))
    val a = AffinityPropagation.apBlock(5, edges)
    val b = AffinityPropagation.apBlock(5, edges.reverse)
    val c = AffinityPropagation.apBlock(5, scala.util.Random.shuffle(edges.toSeq).toArray)
    assert(a.sameElements(b) && a.sameElements(c))
  }

  test("distributed cluster() splits a glued component and covers all ids") {
    val clusters = Seq(
      ("a1", "A"), ("a2", "A"), ("a3", "A"), ("b1", "A"), ("b2", "A"), ("b3", "A"),
      ("s1", "s1")
    ).toDF("conv_id", "component")
    val pairs = Seq(
      ("a1", "a2", 0.95), ("a1", "a3", 0.95), ("a2", "a3", 0.95),
      ("b1", "b2", 0.95), ("b1", "b3", 0.95), ("b2", "b3", 0.95),
      ("a3", "b1", 0.15)
    ).toDF("id1", "id2", "jaccard")
    val out = AffinityPropagation.cluster(spark, clusters, pairs)
      .as[(String, String)].collect().toMap
    assert(out.keySet == Set("a1", "a2", "a3", "b1", "b2", "b3", "s1"))
    assert(out("a1") == out("a2") && out("a2") == out("a3"))
    assert(out("b1") == out("b2") && out("b2") == out("b3"))
    assert(out("a1") != out("b1"), "weak bridge must separate the sub-cliques")
    assert(out("s1") == "s1", "singleton block keeps its CC label")
  }

  test("distributed labels are a pure function of block content (repartition-invariant)") {
    val clusters = (1 to 12).map(i => (s"m$i", "B")).toDF("conv_id", "component")
    val pairs = (for { i <- 1 to 12; j <- i + 1 to 12 if (i <= 6) == (j <= 6) }
      yield (s"m$i", s"m$j", 0.88)).toDF("id1", "id2", "jaccard")
    val r1 = AffinityPropagation.cluster(spark, clusters, pairs)
      .orderBy("conv_id").as[(String, String)].collect()
    val r2 = AffinityPropagation.cluster(spark, clusters.repartition(7), pairs.repartition(5))
      .orderBy("conv_id").as[(String, String)].collect()
    assert(r1.sameElements(r2))
  }
}
