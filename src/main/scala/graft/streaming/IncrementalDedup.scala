package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Cols._
import graft.pipeline.Dedup

/** Structured-Streaming extension of the batch pipeline (the reference is
  * pure batch — SURVEY §2.10; this is the documented `Trigger.AvailableNow`
  * incremental path over an append-only transcripts table):
  *
  *   - `readStream` over the transcripts directory; per micro-batch,
  *     complete conversations are assembled and signed exactly like batch
  *     (same ShingleHashes/MinHash/SimHash expressions);
  *   - a persistent signature store (parquet table) accumulates signatures;
  *     each batch generates LSH candidates restricted to pairs touching at
  *     least one NEW conversation (new x new ∪ new x old — old x old pairs
  *     were emitted by earlier batches), verifies them exactly, and appends
  *     to the pairs table;
  *   - clustering stays a batch job over the accumulated pairs table
  *     (connected components is not incrementally maintainable without
  *     rewriting history — re-run `Dedup.cluster` on demand).
  *
  * Assumption (documented): a conversation's turns arrive within one batch
  * (append-only conv-complete ingestion). Cross-batch turn splits would need
  * flatMapGroupsWithState turn buffering — out of scope for parity.
  */
object IncrementalDedup {

  final case class Stores(sigStore: String, pairStore: String)

  /** Process one micro-batch of transcript rows. Returns (newConvs, newPairs). */
  def processBatch(
      spark: SparkSession,
      batch: DataFrame,
      stores: Stores,
      cfg: Dedup.Config
  ): (Long, Long) = {
    val docs = Dedup.assemble(batch)
    val newSigs = Dedup.signatures(Dedup.shingle(docs, cfg), cfg)
      .select($"conv_id", $"shingles", $"sig", $"simhash")
      .cache()
    val nNew = newSigs.count()

    val haveOld = new java.io.File(stores.sigStore).exists()
    val oldSigs = if (haveOld) spark.read.parquet(stores.sigStore) else newSigs.limit(0)

    // candidates among the union, pruned to pairs touching a new conv
    val all = oldSigs.select($"conv_id", $"shingles", $"sig", $"simhash")
      .union(newSigs).cache()
    val newIds = newSigs.select($"conv_id")
    var cands = Dedup.lshCandidates(all, cfg)
    if (cfg.simhashEnabled) cands = cands.union(Dedup.simhashCandidates(all, cfg))
    val touchingNew = cands
      .join(newIds.select($"conv_id".as("id1")).withColumn("n1", lit(1)), Seq("id1"), "left_outer")
      .join(newIds.select($"conv_id".as("id2")).withColumn("n2", lit(1)), Seq("id2"), "left_outer")
      .where($"n1".isNotNull || $"n2".isNotNull)
      .select($"id1", $"id2")
    val pairs = Dedup.verify(touchingNew, all, cfg).cache()
    val nPairs = pairs.count()

    pairs.write.mode("append").parquet(stores.pairStore)
    newSigs.write.mode("append").parquet(stores.sigStore)
    newSigs.unpersist()
    all.unpersist()
    pairs.unpersist()
    (nNew, nPairs)
  }

  /** Drive the incremental pipeline over everything currently in `inputDir`
    * (AvailableNow: consume the backlog as micro-batches, then stop).
    */
  def runAvailableNow(
      spark: SparkSession,
      inputDir: String,
      stores: Stores,
      cfg: Dedup.Config = Dedup.Config(),
      maxFilesPerTrigger: Int = 4
  ): Unit = {
    val schema = spark.read.parquet(inputDir).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"${stores.pairStore}_ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (n, p) = processBatch(spark, batch, stores, cfg)
        println(s"[stream] batch $batchId: $n convs, $p new pairs")
      }
      .start()
    q.awaitTermination()
  }

  /** Batch clustering over the accumulated pair store. */
  def clusterNow(spark: SparkSession, stores: Stores): DataFrame = {
    val sigs = spark.read.parquet(stores.sigStore)
    val pairs = spark.read.parquet(stores.pairStore)
    Dedup.cluster(spark, sigs.select($"conv_id"), pairs)
  }
}
