package graft.tools

import graft.{Sessions, SparkEntry}

/** Regenerates the committed golden-parquet oracles under `golden/` for the
  * driver queries whose semantics are not ANSI-SQL-expressible (custom hash
  * expressions, LSH candidate generation, the full dedup pipeline, Java-regex
  * segmentation). Each of these queries is deterministic at ANY parallelism —
  * seeded synthesis, pure per-row hash functions, sorted-group pair emission —
  * so a pinned parquet snapshot is a hard value-level oracle: the driver's
  * DuckDB compare reads it via read_parquet() and hashes it against the live
  * Spark output. sbt specs (OpsSpec/FunctionsSpec/DedupPipelineSpec) establish
  * the *correctness* of these operators against independent brute-force /
  * reimplementation checks; the goldens pin the exact values against
  * regression.
  *
  * Run after any INTENTIONAL semantic change to one of these queries:
  *   sbt -batch "runMain graft.tools.MakeGolden /root/testdata/sf0.01 golden"
  * then commit the refreshed files. The goldens are generated at sf0.01 —
  * the scale the driver's correctness gate runs at.
  */
object MakeGolden {
  def goldenNames: Seq[String] = SparkEntry.goldenQueries

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "golden"
    val spark = Sessions.fromEnv("graft-golden")
    goldenNames.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$n")
      println(f"[golden] $n rewritten (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    // a05's trained doc vectors: the cross-engine oracle re-executes the whole
    // top-k retrieval over these in DuckDB, so the MODEL output is the pin
    SparkEntry.a05Vectors(spark, sfDir).coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/a05_doc_vectors")
    println("[golden] a05_doc_vectors rewritten")
    // p01's candidate graph: the cross-engine oracle recomputes the connected
    // components AND their sizes from these pinned edges/nodes via a recursive
    // closure in DuckDB — the pin is the pipeline's pair graph (whose recall
    // the sbt specs gate against brute force), not the clustering answer
    val r = graft.pipeline.Dedup.run(
      spark,
      graft.synth.Synth.transcripts(spark,
        graft.synth.Synth.Config(nClusters = 120, boilerClusters = 1, boilerSize = 12)).toDF,
      graft.pipeline.Dedup.Config())
    // jaccard rides along (full double precision): g02's oracle re-derives
    // weighted shortest paths from these edge weights
    r.pairs.select("id1", "id2", "jaccard").coalesce(1).write.mode("overwrite").parquet(s"$outDir/p01_pairs")
    r.clusters.select("conv_id").coalesce(1).write.mode("overwrite").parquet(s"$outDir/p01_nodes")
    println("[golden] p01_pairs + p01_nodes rewritten")
    spark.stop()
  }
}
