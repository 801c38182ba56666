package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Eval}
import graft.streaming.IncrementalDedup
import graft.synth.Synth

/** Incremental (Structured Streaming, AvailableNow) pipeline equivalence:
  * streaming the corpus in micro-batches must find the same dup pairs as the
  * batch pipeline, including pairs that SPAN batches.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "streaming-spec")

  test("AvailableNow incremental dedup matches batch pipeline pairs") {
    val scfg = Synth.Config(nClusters = 100, boilerClusters = 1, boilerSize = 8)
    val cfg = Dedup.Config()
    val transcripts = Synth.transcripts(spark, scfg).toDF.cache()

    // batch reference answer
    val batchPairs = Dedup.run(spark, transcripts, cfg).pairs
      .select(col("id1"), col("id2")).cache()
    val nBatch = batchPairs.count()
    assert(nBatch > 50)

    // write input split into several files so AvailableNow produces multiple
    // micro-batches; split BY CONVERSATION (append-only conv-complete)
    val tmp = Files.createTempDirectory("graft-stream").toString
    val inDir = s"$tmp/in"
    transcripts
      .withColumn("part", pmod(xxhash64(col("conv_id")), lit(8)))
      .repartition(8, col("part"))
      .drop("part")
      .write.parquet(inDir)

    val stores = IncrementalDedup.Stores(s"$tmp/sigs", s"$tmp/pairs")
    IncrementalDedup.runAvailableNow(spark, inDir, stores, cfg, maxFilesPerTrigger = 2)

    val streamPairs = spark.read.parquet(stores.pairStore)
      .select(col("id1"), col("id2")).distinct().cache()
    val nStream = streamPairs.count()
    val missing = batchPairs.exceptAll(streamPairs).count()
    val extra = streamPairs.exceptAll(batchPairs).count()
    info(s"batch pairs: $nBatch, stream pairs: $nStream, missing: $missing, extra: $extra")
    // all three candidate passes (LSH, SimHash, substring anchors) run
    // incrementally against the bucket store: parity must be EXACT — the
    // verify stage is identical, so any delta is a candidate-generation bug
    assert(extra == 0, s"stream must not invent pairs: $extra extra")
    assert(missing == 0, s"missing $missing of $nBatch batch pairs")

    // clustering over accumulated pairs covers all convs
    val clusters = IncrementalDedup.clusterNow(spark, stores)
    assert(clusters.count() == transcripts.select("conv_id").distinct().count())
  }

  test("per-batch shuffle volume stays ~flat while the stores grow (scheme-qualified paths)") {
    val scfg = Synth.Config(nClusters = 160, boilerClusters = 1, boilerSize = 8)
    val cfg = Dedup.Config()
    val transcripts = Synth.transcripts(spark, scfg).toDF
      .withColumn("part", pmod(xxhash64(col("conv_id")), lit(8)))
      .cache()
    transcripts.count()

    // stores addressed through the Hadoop FileSystem API with an explicit
    // scheme — the warehouse-filesystem abstraction the checkpoint layer
    // claims (hdfs://-shaped paths resolve the same way)
    val tmp = Files.createTempDirectory("graft-stream-flat").toString
    val stores = IncrementalDedup.Stores(s"file:$tmp/sigs", s"file:$tmp/pairs")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          shuffleBytes.addAndGet(te.taskMetrics.shuffleReadMetrics.totalBytesRead)
    }
    spark.sparkContext.addSparkListener(listener)
    val perBatch = (0 until 8).map { b =>
      val batch = transcripts.where(col("part") === b).drop("part")
      shuffleBytes.set(0)
      IncrementalDedup.processBatch(spark, batch, stores, cfg)
      Thread.sleep(300) // listener bus drains async
      shuffleBytes.get()
    }
    spark.sparkContext.removeSparkListener(listener)
    info(s"per-batch shuffle-read bytes: ${perBatch.mkString(", ")}")
    // batch 2 already joins a store; by batch 8 the store is ~4x larger —
    // shuffle volume must NOT track store size (flat within noise + floor)
    val early = perBatch(2)
    val late = perBatch.last
    assert(late <= math.max(3 * early, early + (5L << 20)),
      s"late-batch shuffle ($late) must not grow with the store (early $early)")
  }
}
