package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{JsonCorpus, TokenSim}
import graft.pipeline.Eval

/** Reference-parity fixtures: nested JSON corpus ingestion (data_transfer.R),
  * IDF-weighted multiset pair features (c_org.py, IDF.py), macro pairwise F1
  * (evaluate.py macro path) — hand-computed expectations per FIXTURES.md §2.
  */
class ParitySpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "parity-spec")
  import spark.implicits._

  test("nested JSON corpus -> long-form tables (data_transfer.R parity)") {
    val json =
      """{"bin_yu": [
        |  {"id": "p1", "title": "T one", "venue": "V", "year": 2001,
        |   "authors": [{"name": "bin yu", "org": "ucb"}, {"name": "co a", "org": "mit"}],
        |   "keywords": ["stats", "ml"], "abstract": "Aa"},
        |  {"id": "p2", "title": "T two", "venue": "W", "year": 2002,
        |   "authors": [{"name": "bin yu", "org": "ucb"}],
        |   "keywords": []}
        |],
        |"j_smith": [
        |  {"id": "p3", "title": "T three", "venue": "V", "year": 1999,
        |   "authors": [{"name": "j smith", "org": null}], "keywords": ["db"]}
        |]}""".stripMargin
    val f = Files.createTempFile("corpus", ".json")
    Files.write(f, json.getBytes)

    val pubs = JsonCorpus.pubs(spark, f.toString).cache()
    assert(pubs.count() == 3)
    val items = JsonCorpus.items(pubs).collect().map(r => (r.getString(1), r.getString(2), r.getInt(4))).toSet
    assert(items == Set(("p1", "T one", 2001), ("p2", "T two", 2002), ("p3", "T three", 1999)))
    val au = JsonCorpus.authors(pubs)
    assert(au.count() == 4)
    val seq = au.where(col("id") === "p1").orderBy("auseq").collect().map(r => (r.getInt(2), r.getString(3)))
    assert(seq.toSeq == Seq((1, "bin yu"), (2, "co a")), "auseq must preserve author order")
    assert(JsonCorpus.keywords(pubs).where(col("keyword").isNotNull).count() == 3)
    assert(JsonCorpus.abstracts(pubs).where(col("abstract").isNull).count() == 2)
  }

  test("IDF-weighted multiset pair features (c_org.py fixture)") {
    // FIXTURES.md §2: bags {a,a,b} x {a,b,c} -> overlap 2, jaccard 2/4
    val docs = Seq(
      ("d1", Seq("a", "a", "b")),
      ("d2", Seq("a", "b", "c")),
      ("d3", Seq("x"))
    ).toDF("id", "tokens")
    val idf = TokenSim.idfTable(docs) // N=3; df: a=2,b=2,c=1,x=1
    val idfMap = idf.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(idfMap("a") == 1.5 && idfMap("c") == 3.0)

    val pairs = Seq(("d1", "d2"), ("d1", "d3")).toDF("id1", "id2")
    val feats = TokenSim.pairFeatures(pairs, docs, idf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val f12 = feats(("d1", "d2"))
    assert(f12.getAs[Int]("overlap") == 2) // min(2,1)[a] + min(1,1)[b]
    assert(f12.getAs[Int]("share_dummy") == 1)
    assert(math.abs(f12.getAs[Double]("jaccard_similarity_metric") - 2.0 / 4.0) < 1e-12)
    // logIDF = log(idf_a*1 + 1) + log(idf_b*1 + 1) = log(2.5) + log(2.5)
    assert(math.abs(f12.getAs[Double]("logIDF") - 2 * math.log(2.5)) < 1e-12)
    assert(math.abs(f12.getAs[Double]("logTFIDF") - 2 * math.log(2.5) / 9.0) < 1e-12)
    val f13 = feats(("d1", "d3"))
    assert(f13.getAs[Int]("overlap") == 0 && f13.getAs[Int]("share_dummy") == 0)
  }

  test("pairFeatures: broadcast-map and exploded-join IDF paths agree") {
    val docs = Seq(
      ("d1", Seq("a", "a", "b", "q")),
      ("d2", Seq("a", "b", "c", "c")),
      ("d3", Seq("x", "a")),
      ("d4", Seq.empty[String])
    ).toDF("id", "tokens")
    val idf = TokenSim.idfTable(docs)
    val pairs = Seq(("d1", "d2"), ("d1", "d3"), ("d2", "d3"), ("d1", "d4")).toDF("id1", "id2")
    def rows(maxTerms: Int) =
      TokenSim.pairFeatures(pairs, docs, idf, maxIdfMapTerms = maxTerms)
        .orderBy("id1", "id2").collect().map(_.toSeq).toSeq
    assert(rows(1000000) == rows(0), "large-vocabulary join path must match broadcast-map path")
  }

  test("pairFeatures: 10k-token docs + wide vocabulary complete quickly (single-pass bag)") {
    // the O(len^2) bag would do ~10^8 comparisons per doc here; the sorted
    // run-length bag is O(len log len)
    val big = (0 until 6).map { d =>
      (s"d$d", (0 until 10000).map(i => s"t${(i * (d + 7)) % 30000}"))
    }
    val docs = big.toDF("id", "tokens")
    val idf = TokenSim.idfTable(docs)
    val pairs = Seq(("d0", "d1"), ("d2", "d3"), ("d4", "d5")).toDF("id1", "id2")
    val t0 = System.nanoTime()
    val n = TokenSim.pairFeatures(pairs, docs, idf).count()
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"3 pairs of 10k-token docs scored in $sec%.1f s")
    assert(n == 3)
    assert(sec < 60, f"single-pass bag must keep this in seconds, took $sec%.1f")
  }

  test("macro pairwise F1 averages per-block scores (evaluate.py macro path)") {
    // block A: perfect (1 truth pair, found); block B: miss (1 truth pair, not found)
    val pred = Seq(("a1", "c1"), ("a2", "c1"), ("b1", "x1"), ("b2", "x2")).toDF("conv_id", "component")
    val truth = Seq(("a1", 1L), ("a2", 1L), ("b1", 2L), ("b2", 2L)).toDF("conv_id", "cluster_id")
    val blocks = Seq(("a1", "A"), ("a2", "A"), ("b1", "B"), ("b2", "B")).toDF("conv_id", "block")
    val macroF1 = Eval.pairwiseMacro(spark, pred, truth, blocks)
    assert(math.abs(macroF1 - 0.5) < 1e-9, s"expected (1.0 + 0.0)/2, got $macroF1")
  }
}
