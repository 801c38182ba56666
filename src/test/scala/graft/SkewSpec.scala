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

    val lsh = res.skew("lsh")
    assert(lsh.oversizedBuckets.value > 0, "40-member boilerplate buckets must trip the cap")
    assert(lsh.droppedPairs.value > 0, "cap must report dropped cross-chunk pairs")

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
}
