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
  *     [--synth-clusters N] [--cores N] [--threshold T] [--eval true]
  *     [--warehouse DIR]   checkpointed stages w/ resume (Checkpoint.scala)
  *     [--refine true]     per-block likelihood-cut refinement
  *     [--profile true]    per-stage wall/cpu/gc
  *     [--package F.zip]   zip the final clusters as result.json (S9)
  */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    // strict --key value pairing: a value-less flag would silently shift
    // every later pair, so malformed argv is an error, not a guess
    require(args.length % 2 == 0,
      s"arguments must be --key value pairs; got odd argv ${args.mkString(" ")}")
    val opts = args
      .sliding(2, 2)
      .map {
        case Array(k, v) if k.startsWith("--") && !v.startsWith("--") => k.drop(2) -> v
        case Array(k, v) => sys.error(s"malformed argument pair '$k $v': expected --key value")
      }
      .toMap
    val out = opts.getOrElse(
      "out",
      sys.error("--out DIR is required (also: --input PARQUET | --synth-clusters N, " +
        "--cores N, --threshold T, --eval true, --warehouse DIR, --refine true, --profile true)")
    )
    val cores = opts.get("cores").map(_.toInt).getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    // --parts pins shuffle partitions independently of cores (the bench's
    // N-vs-4N scaling runs pin it so both levels do identical logical work)
    val spark = Sessions.local(cores, "graft-pipeline", opts.get("parts").map(_.toInt))
    val cfg = Dedup.Config(threshold = opts.get("threshold").map(_.toDouble).getOrElse(0.70))

    val scfg = Synth.Config(nClusters = opts.get("synth-clusters").map(_.toInt).getOrElse(2000))
    val transcripts = opts.get("input") match {
      case Some(path) => spark.read.parquet(path)
      case None       => Synth.transcripts(spark, scfg).toDF
    }

    val profile = opts.get("profile").contains("true")
    // task-time accounting: wall vs summed task time exposes how much of the
    // pipeline is actually parallel work vs driver planning/scheduling gaps
    val taskNanos = new java.util.concurrent.atomic.AtomicLong
    val gcNanos = new java.util.concurrent.atomic.AtomicLong
    val cpuNanos = new java.util.concurrent.atomic.AtomicLong
    val taskCount = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (te.taskMetrics != null) {
          taskNanos.addAndGet(te.taskMetrics.executorRunTime * 1000000L)
          gcNanos.addAndGet(te.taskMetrics.jvmGCTime * 1000000L)
          cpuNanos.addAndGet(te.taskMetrics.executorCpuTime)
          taskCount.incrementAndGet()
        }
      }
    })
    def timed[A](name: String)(f: => A): A = {
      val s0 = System.nanoTime()
      val (t0, c0, g0) = (taskNanos.get(), cpuNanos.get(), gcNanos.get())
      val r = f
      if (profile)
        println(f"[stage] $name%-12s ${(System.nanoTime() - s0) / 1e9}%8.2f s wall  " +
          f"${(taskNanos.get() - t0) / 1e9}%8.1f task-s  ${(cpuNanos.get() - c0) / 1e9}%8.1f cpu-s  " +
          f"${(gcNanos.get() - g0) / 1e9}%6.1f gc-s")
      r
    }

    val t0 = System.nanoTime()
    val nTurns = transcripts.count()
    val res =
      if (opts.contains("warehouse")) {
        val inputFp = opts.get("input") match {
          case Some(p) => graft.pipeline.TableIO.pathFingerprint(p)
          case None    => s"synth:${scfg.toString}"
        }
        graft.pipeline.CheckpointedDedup.run(spark, transcripts, inputFp, opts("warehouse"), cfg)
      } else if (!profile) Dedup.run(spark, transcripts, cfg)
      else {
        val docs = Dedup.assemble(transcripts)
        val shingled = Dedup.shingle(docs, cfg)
        val sigs = Dedup.signatures(shingled, cfg).cache()
        timed("signatures")(sigs.count())
        val cands = Dedup.candidates(sigs, cfg).cache()
        timed("candidates")(cands.count())
        val pairs = Dedup.verify(cands, sigs, cfg).cache()
        timed("verify")(pairs.count())
        val clusters = timed("cc")(Dedup.cluster(spark, sigs, pairs).cache())
        timed("cc_count")(clusters.count())
        Dedup.Result(docs, sigs, pairs, clusters)
      }
    // optional likelihood-cut refinement of the CC clustering
    // (MT_Kruskal.R/likelihood.R parity path)
    val finalClusters =
      if (opts.get("refine").contains("true"))
        graft.plans.BlockClustering.refine(spark, res.clusters, res.pairs)
      else res.clusters
    timed("write") {
      finalClusters.write.mode("overwrite").parquet(s"$out/clusters")
      res.pairs.write.mode("overwrite").parquet(s"$out/pairs")
    }
    // optional submission artifact (S9 parity: zip -9 of result.json)
    opts.get("package").foreach { zip =>
      graft.pipeline.TableIO.packageZip(finalClusters, zip)
      println(s"[package] $zip")
    }
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

    // skew-cap accounting (accumulators are final once the actions above ran)
    res.skew.foreach { case (pass, m) =>
      if (m.oversizedBuckets.value > 0)
        println(s"[skew] $pass: ${m.oversizedBuckets.value} oversized buckets, " +
          s"${m.droppedPairs.value} cross-chunk pairs dropped (hub-chained)")
    }

    val taskSec = taskNanos.get() / 1e9
    println(
      f"""{"turns":$nTurns,"convs":$nConvs,"dup_pairs":$nDupPairs,"components":$nComponents,""" +
        f""""wall_sec":$wall%.2f,"turns_per_sec":${nTurns / wall}%.1f,""" +
        f""""task_sec":$taskSec%.1f,"gc_sec":${gcNanos.get() / 1e9}%.1f,"cpu_sec":${cpuNanos.get() / 1e9}%.1f,""" +
        f""""n_tasks":${taskCount.get()},"busy_frac":${taskSec / (wall * cores)}%.3f$evalJson}"""
    )
    spark.stop()
  }
}
