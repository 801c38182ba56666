package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Eval}
import graft.synth.Synth

/** Skew handling under a tiny bucket cap: viral/boilerplate buckets larger
  * than the cap must be chunked WITH logged drop metrics (no silent loss) and
  * WITHOUT losing cluster-level recall (hub chaining keeps each bucket
  * connected through verification).
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "skew-spec")

  test("oversized buckets: metrics reported, connectivity preserved") {
    val scfg = Synth.Config(nClusters = 80, boilerClusters = 2, boilerSize = 40)
    val cfg = Dedup.Config(bucketCap = 8) // force chunking on 40-member buckets
    val transcripts = Synth.transcripts(spark, scfg).toDF
    val res = Dedup.run(spark, transcripts, cfg)
    val clusters = res.clusters.cache()
    clusters.count() // materialize -> accumulators final

    val cand = res.skew("candidates")
    assert(cand.oversizedBuckets.value > 0, "40-member boilerplate buckets must trip the cap")
    assert(cand.droppedPairs.value > 0, "cap must report dropped cross-chunk pairs")

    // despite dropped pairs, each boilerplate cluster must stay ONE component
    val truth = Synth.truth(spark, scfg).toDF
    val boiler = truth.where(col("variant") === "boilerplate")
    val comps = clusters.join(boiler, "conv_id")
      .groupBy(col("cluster_id")).agg(countDistinct(col("component")).as("c"))
    val split = comps.where(col("c") > 1).count()
    assert(split == 0, "hub chaining must keep capped buckets connected")

    // and overall recall vs the exact-Jaccard oracle still holds
    val oracle = Eval.bruteForceOracle(res.sigs.select(col("conv_id"), col("shingles")), cfg.threshold)
    val recall = Eval.pairRecall(spark, clusters, oracle)
    info(f"recall under cap=8: $recall%.4f")
    assert(recall >= 0.99)
  }

  test("embedding near-dup: one hot sign-LSH bucket stays bounded, recall preserved") {
    import spark.implicits._
    val dim = 8
    // 4000 identical vectors -> every table hashes them to ONE bucket: the
    // uncapped join would enumerate C(4000,2)*6 tables ~ 48M pairs; the capped
    // generator emits O(n*cap)
    val hotN = 4000
    val cap = 64
    val hot = (0 until hotN).map(i => (f"h$i%05d", Seq.fill(dim)(0.5f)))
    // plus genuinely distinct near-dup pairs the cap must not lose
    val base = (0 until 20).map { i =>
      val v = (0 until dim).map(d =>
        (java.lang.Long.remainderUnsigned(
          graft.functions.MinHashImpl.mix64(99L + i * 131L + d), 2000) / 1000.0 - 1.0).toFloat)
      (f"p$i%05d", v)
    }
    val dups = base.map { case (id, v) => (id + "_d", v.map(x => x + 0.003f)) }
    val corpus = (hot ++ base ++ dups).toDF("id", "vec")

    val m = Dedup.skewMetrics(spark, "ann")
    val pairs = graft.ops.Ann.nearDupPairs(
      corpus, dim, threshold = 0.999, bucketCap = cap, metrics = Some(m)).cache()
    val n = pairs.count()

    // bounded explosion: n*cap-ish within-chunk pairs + hub edges, per table,
    // never the ~48M of the quadratic join
    val bound = 6L * (hotN.toLong / cap + 1) * (cap.toLong * (cap - 1) / 2 + 1) + 100000
    assert(n < bound, s"pair count $n exceeds chunked bound $bound")
    assert(m.oversizedBuckets.value > 0, "hot bucket must trip the cap")
    assert(m.droppedPairs.value > 0, "cap must report dropped cross-chunk pairs")

    val found = pairs.select("id1", "id2").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val hit = base.indices.count { i =>
      val p = (f"p$i%05d", f"p$i%05d_d"); found.contains(p) || found.contains(p.swap)
    }
    info(s"planted near-dup pairs found under hot-bucket cap: $hit/20; total pairs $n, " +
      s"oversized=${m.oversizedBuckets.value} dropped=${m.droppedPairs.value}")
    assert(hit >= 19, s"cap must not lose distinct planted pairs: $hit/20")
  }
}
