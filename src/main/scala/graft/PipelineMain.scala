package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Eval}
import graft.synth.Synth

/** spark-submit entry point for the near-dup pipeline over a transcripts
  * table: reads parquet transcripts (or synthesizes the deterministic corpus
  * with --synth-clusters), runs assemble -> shingle -> MinHash/LSH + SimHash +
  * substring-anchor candidates -> exact-Jaccard verify -> connected
  * components, writes clusters + verified pairs as parquet, prints one JSON
  * metrics line.
  *
  * Usage:
  *   graft.PipelineMain --out DIR [--input transcripts.parquet]
  *     [--synth-clusters N] [--cores N] [--threshold T] [--eval]
  */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    val opts = args
      .sliding(2, 2)
      .collect { case Array(k, v) if k.startsWith("--") => k.drop(2) -> v }
      .toMap
    val out = opts.getOrElse(
      "out",
      sys.error("--out DIR is required (also: --input PARQUET | --synth-clusters N, --cores, --threshold, --eval true)")
    )
    val cores = opts.get("cores").map(_.toInt).getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val spark = Sessions.local(cores, "graft-pipeline")
    val cfg = Dedup.Config(threshold = opts.get("threshold").map(_.toDouble).getOrElse(0.70))

    val scfg = Synth.Config(nClusters = opts.get("synth-clusters").map(_.toInt).getOrElse(2000))
    val transcripts = opts.get("input") match {
      case Some(path) => spark.read.parquet(path)
      case None       => Synth.transcripts(spark, scfg).toDF
    }

    val t0 = System.nanoTime()
    val nTurns = transcripts.count()
    val res = Dedup.run(spark, transcripts, cfg)
    res.clusters.write.mode("overwrite").parquet(s"$out/clusters")
    res.pairs.write.mode("overwrite").parquet(s"$out/pairs")
    val wall = (System.nanoTime() - t0) / 1e9

    val clusters = spark.read.parquet(s"$out/clusters")
    val nConvs = clusters.count()
    val nDupPairs = spark.read.parquet(s"$out/pairs").count()
    val nComponents = clusters.select("component").distinct().count()

    val evalJson =
      if (opts.get("eval").contains("true") && opts.get("input").isEmpty) {
        val s = Eval.pairwise(spark, clusters, Synth.truth(spark, scfg).toDF)
        f""","planted_precision":${s.precision}%.4f,"planted_recall":${s.recall}%.4f,"planted_f1":${s.f1}%.4f"""
      } else ""

    println(
      f"""{"turns":$nTurns,"convs":$nConvs,"dup_pairs":$nDupPairs,"components":$nComponents,""" +
        f""""wall_sec":$wall%.2f,"turns_per_sec":${nTurns / wall}%.1f$evalJson}"""
    )
    spark.stop()
  }
}
