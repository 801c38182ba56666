package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.plans.ConnectedComponents

/** Property-based invariants (SURVEY §5 test plan): CC is invariant under
  * edge order/orientation/duplication; pair canonicalization is idempotent;
  * MinHash estimate tracks exact Jaccard across random set pairs.
  */
class PropertiesSpec extends AnyFunSuite {
  // raw ScalaCheck generators driven by deterministic seeds (the
  // scalatestplus bridge is not in the offline cache)
  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  lazy val spark = Sessions.local(4, "props-spec")
  import spark.implicits._

  // localThreshold = 0 forces the distributed star loop: the property must
  // hold for the scale path, not the driver union-find shortcut
  private def componentsOf(edges: Seq[(String, String)]): Map[String, String] = {
    val df = edges.toDF("src", "dst")
    ConnectedComponents.run(spark, df, localThreshold = 0L).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
  }

  private def refUnionFind(nodes: Set[String], edges: Seq[(String, String)]): Map[String, Set[String]] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n).toSeq: _*)
    def find(x: String): String = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) => parent(find(a)) = find(b) }
    nodes.groupBy(find)
  }

  val edgeGen: Gen[Seq[(Int, Int)]] = for {
    n <- Gen.choose(2, 14)
    m <- Gen.choose(1, 20)
    es <- Gen.listOfN(m, for { a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1) } yield (a, b))
  } yield es

  test("CC matches a reference union-find and is invariant to order/orientation/dup") {
    samples(edgeGen, 12).filter(_.nonEmpty).foreach { esInt =>
      {
        val es = esInt.map { case (a, b) => (s"n$a", s"n$b") }
        val nodes = es.flatMap(e => Seq(e._1, e._2)).toSet

        def partition(m: Map[String, String]): Set[Set[String]] =
          m.groupBy(_._2).values.map(_.keys.toSet).toSet

        val base = componentsOf(es)
        // CC.run covers nodes appearing in at least one non-self-loop edge;
        // compare against the reference partition restricted to those nodes
        val expected = refUnionFind(nodes, es).values
          .map(_.intersect(base.keySet)).filter(_.nonEmpty).toSet
        assert(partition(base) == expected)

        val shuffled = scala.util.Random.shuffle(es.map { case (a, b) => (b, a) }) ++ es.take(2)
        assert(partition(componentsOf(shuffled)) == partition(base))
      }
    }
  }

  test("CC local union-find shortcut and distributed star loop label identically") {
    samples(edgeGen, 8).filter(_.nonEmpty).foreach { esInt =>
      val es = esInt.map { case (a, b) => (s"n$a", s"n$b") }
      val df = es.toDF("src", "dst")
      val dist = ConnectedComponents.run(spark, df, localThreshold = 0L).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val local = ConnectedComponents.run(spark, df, localThreshold = 1000000L).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(local == dist, s"adaptive cutoff must not change the labeling")
    }
  }

  test("pair canonicalization is idempotent and stable") {
    samples(Gen.listOf(for { a <- Gen.alphaStr; b <- Gen.alphaStr } yield (a, b)), 20).foreach { ps =>
      val canon = ps.collect { case (a, b) if a != b =>
        (if (a < b) a else b, if (a < b) b else a)
      }
      canon.foreach { case (x, y) =>
        assert(x < y)
        val again = (if (x < y) x else y, if (x < y) y else x)
        assert(again == ((x, y)))
      }
    }
  }

  test("minhash estimate within tolerance of exact jaccard over random set pairs") {
    val gen = for {
      na <- Gen.choose(50, 200)
      nb <- Gen.choose(50, 200)
      overlap <- Gen.choose(0, math.min(na, nb))
    } yield (na, nb, overlap)
    samples(gen, 8).foreach { case (na, nb, ov) =>
      val inter = (0 until ov).map(i => s"s$i")
      val a = inter ++ (10000 until 10000 + na - ov).map(i => s"s$i")
      val b = inter ++ (20000 until 20000 + nb - ov).map(i => s"s$i")
      val exact = ov.toDouble / (na + nb - ov)
      val sigs = Seq(("a", a), ("b", b)).toDF("id", "toks")
        .select(col("id"), graft.functions.MinHashSignature(
          transform(col("toks"), t => xxhash64(t)), 512, 99L).as("sig"))
        .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
      val est = sigs("a").zip(sigs("b")).count { case (x, y) => x == y } / 512.0
      assert(math.abs(est - exact) < 0.11, s"est $est exact $exact")
    }
  }
}
