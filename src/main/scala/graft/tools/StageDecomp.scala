package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Bench, Sessions}
import graft.pipeline.Dedup
import graft.synth.Synth

/** Per-stage decomposition of the pipeline's core-scaling behavior — built to
  * answer ONE question the round-4 artifacts left open: when total pipeline
  * CPU seconds inflate from local[2] to local[8], WHICH stage inflates?
  * "The shared memory bus saturates at 8 threads" was the round-4 hypothesis,
  * but that round's own controls contradicted it (pure-CPU thread efficiency
  * 0.902 at 8 threads, near-linear bandwidth growth), leaving GC pressure,
  * shuffle fan-in, and task skew as live suspects. A uniform per-stage
  * inflation supports the bus story; a single inflating stage names the fix.
  *
  * Method: one JVM, alternating core levels (2,8,2,8,...) so both levels
  * sample the same contention window; each rep runs the pipeline STAGE BY
  * STAGE (same split as PipelineMain --profile true) with per-stage
  * wall/task/cpu/gc deltas from a task-metrics listener; a 1-thread memory
  * bandwidth probe before each rep tags the window. Shuffle partitions are
  * pinned identically at both levels (Bench's scaling contract) so the only
  * variable is executor parallelism.
  *
  * Env: SPARK_GRAFT_DECOMP_CLUSTERS (synth corpus size, default 220000 — the
  * Bench scaling corpus), SPARK_GRAFT_DECOMP_CORES (default "2,8"),
  * SPARK_GRAFT_DECOMP_REPS (default 2), SPARK_GRAFT_BENCH_PARTS (default 16),
  * SPARK_GRAFT_DECOMP_OUT (artifact path, default /tmp/stage_decomp.json).
  */
object StageDecomp {

  private final case class StageM(wall: Double, task: Double, cpu: Double, gc: Double)

  def main(args: Array[String]): Unit = {
    val nClusters = sys.env.getOrElse("SPARK_GRAFT_DECOMP_CLUSTERS", "220000").toInt
    val coresList = sys.env.getOrElse("SPARK_GRAFT_DECOMP_CORES", "2,8")
      .split(",").map(_.trim.toInt).toSeq
    val reps = sys.env.getOrElse("SPARK_GRAFT_DECOMP_REPS", "2").toInt
    val parts = sys.env.getOrElse("SPARK_GRAFT_BENCH_PARTS", "16").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_DECOMP_OUT", "/tmp/stage_decomp.json")

    // pre-materialize the corpus exactly like Bench (generation is not
    // measured; real deployments read storage)
    val inputDir =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-decomp-input"
      else "/tmp/graft-decomp-input"
    locally {
      val s = Sessions.local(coresList.max, "graft-decomp-gen")
      try Synth.transcripts(s, Synth.Config(nClusters = nClusters)).toDF
        .write.mode("overwrite").parquet(inputDir)
      finally s.stop()
    }

    final case class Rep(cores: Int, probe: Double, turns: Long,
        stages: Seq[(String, StageM)], totalWall: Double)
    val repsOut = scala.collection.mutable.ArrayBuffer[Rep]()

    def runOne(cores: Int): Rep = {
      val probe = Bench.memBandwidthProbe(1)
      val spark = Sessions.local(cores, s"graft-decomp-$cores", Some(parts))
      val task = new java.util.concurrent.atomic.AtomicLong
      val cpu = new java.util.concurrent.atomic.AtomicLong
      val gc = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null) {
            task.addAndGet(te.taskMetrics.executorRunTime * 1000000L)
            gc.addAndGet(te.taskMetrics.jvmGCTime * 1000000L)
            cpu.addAndGet(te.taskMetrics.executorCpuTime)
          }
      })
      try {
        val stages = scala.collection.mutable.ArrayBuffer[(String, StageM)]()
        def timed[A](name: String)(f: => A): A = {
          val s0 = System.nanoTime()
          val (t0, c0, g0) = (task.get(), cpu.get(), gc.get())
          val r = f
          // listener events drain asynchronously (the bus API is
          // private[spark]); a short settle keeps each stage's delta from
          // leaking into the next — attribution slop << stage durations
          Thread.sleep(500)
          stages += name -> StageM((System.nanoTime() - s0) / 1e9,
            (task.get() - t0) / 1e9, (cpu.get() - c0) / 1e9, (gc.get() - g0) / 1e9)
          r
        }
        val transcripts = spark.read.parquet(inputDir)
        val nTurns = transcripts.count()
        val w0 = System.nanoTime()
        val cfg = Dedup.Config()
        val docs = Dedup.assemble(transcripts)
        val sigs = Dedup.signatures(Dedup.shingle(docs, cfg), cfg).cache()
        timed("signatures")(sigs.count())
        val cands = Dedup.candidates(sigs, cfg).cache()
        timed("candidates")(cands.count())
        val pairs = Dedup.verify(cands, sigs, cfg).cache()
        timed("verify")(pairs.count())
        val clusters = timed("cc")(Dedup.cluster(spark, sigs, pairs).cache())
        timed("cc_count")(clusters.count())
        timed("sink") {
          clusters.write.mode("overwrite").format("noop").save()
          pairs.write.mode("overwrite").format("noop").save()
        }
        Rep(cores, probe, nTurns, stages.toSeq, (System.nanoTime() - w0) / 1e9)
      } finally spark.stop()
    }

    (1 to reps).foreach { _ => coresList.foreach { c => repsOut += runOne(c) } }

    def stageJson(s: Seq[(String, StageM)]): String =
      s.map { case (n, m) =>
        f""""$n":{"wall":${m.wall}%.2f,"task":${m.task}%.2f,"cpu":${m.cpu}%.2f,"gc":${m.gc}%.2f}"""
      }.mkString("{", ",", "}")
    val runsJson = repsOut.map { r =>
      f"""{"cores":${r.cores},"probe_mbps":${r.probe}%.0f,"turns":${r.turns},""" +
        f""""total_wall":${r.totalWall}%.2f,"stages":${stageJson(r.stages)}}"""
    }.mkString("[", ",", "]")

    // summary: per stage, the min-CPU rep at each level (min over reps is
    // robust to co-tenant noise, which only ADDS cpu/wall) and the
    // high/low-core inflation ratios for cpu and gc
    val lo = coresList.min
    val hi = coresList.max
    def bestPerStage(cores: Int): Map[String, StageM] = {
      val rs = repsOut.filter(_.cores == cores)
      rs.flatMap(_.stages).groupBy(_._1).map { case (n, ms) =>
        n -> ms.map(_._2).minBy(_.cpu)
      }
    }
    val bLo = bestPerStage(lo)
    val bHi = bestPerStage(hi)
    def ratioJson(num: Double, den: Double, floor: Double): String =
      if (den > floor) f"${num / den}%.3f" else "null" // NaN is not valid JSON
    val summary = bLo.keys.toSeq.sorted.map { n =>
      val (l, h) = (bLo(n), bHi(n))
      f""""$n":{"cpu_${lo}":${l.cpu}%.2f,"cpu_${hi}":${h.cpu}%.2f,""" +
        s""""cpu_ratio":${ratioJson(h.cpu, l.cpu, 0.0)},""" +
        f""""gc_${lo}":${l.gc}%.2f,"gc_${hi}":${h.gc}%.2f,""" +
        s""""gc_ratio":${ratioJson(h.gc, l.gc, 0.01)}}"""
    }.mkString("{", ",", "}")

    val json = s"""{"clusters":$nClusters,"parts":$parts,"cores":[${coresList.mkString(",")}],""" +
      s""""reps":$reps,"runs":$runsJson,"stage_summary_min_cpu":$summary}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json.take(3500))
  }
}
