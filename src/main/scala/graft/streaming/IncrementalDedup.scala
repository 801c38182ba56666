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
  *     (same ShingleHashes/MinHash/SimHash/anchor expressions);
  *   - a persistent BUCKET store (pass, bucket, conv_id, payload) accumulates
  *     every LSH band / SimHash chunk / substring anchor ever emitted; each
  *     batch generates (a) new x new candidates with the batch chunk/cap
  *     generator over just the new signatures and (b) new x old candidates by
  *     equi-joining the new bucket entries against the store — so per-batch
  *     candidate WORK is O(new buckets + matching store rows), not
  *     O(accumulated corpus) as re-bucketing the whole signature store each
  *     batch would be. All three candidate passes run incrementally,
  *     including the substring-anchor pass (anchors ride the store);
  *   - the old side of a hot bucket is hash-thinned to `bucketCap` members
  *     (same discipline as the batch chunk cap / ANN probe cap);
  *   - exact verification joins candidate ids against the signature store —
  *     a keyed join (at warehouse scale: a bucket-partitioned table);
  *   - clustering stays a batch job over the accumulated pairs table
  *     (connected components is not incrementally maintainable without
  *     rewriting history — re-run `Dedup.cluster` on demand).
  *
  * Assumption (documented): a conversation's turns arrive within one batch
  * (append-only conv-complete ingestion). Cross-batch turn splits would need
  * flatMapGroupsWithState turn buffering — out of scope for parity.
  */
object IncrementalDedup {

  final case class Stores(sigStore: String, pairStore: String) {
    def bucketStore: String = s"${sigStore}_buckets"
  }

  /** All bucket entries of a signature frame, tagged by pass. */
  private def bucketEntries(sigs: DataFrame, cfg: Dedup.Config): DataFrame = {
    val l = Dedup.lshBuckets(sigs, cfg).select(lit("lsh").as("pass"), $"bucket", $"id", $"payload")
    val s =
      if (cfg.simhashEnabled)
        Dedup.simhashBuckets(sigs, cfg).select(lit("sim").as("pass"), $"bucket", $"id", $"payload")
      else l.limit(0)
    val a =
      if (cfg.substringEnabled)
        Dedup.anchorBuckets(sigs, cfg).select(lit("sub").as("pass"), $"bucket", $"id", $"payload")
      else l.limit(0)
    l.unionByName(s).unionByName(a)
  }

  /** Process one micro-batch of transcript rows. Returns (newConvs, newPairs). */
  def processBatch(
      spark: SparkSession,
      batch: DataFrame,
      stores: Stores,
      cfg: Dedup.Config
  ): (Long, Long) = {
    val docs = Dedup.assemble(batch)
    val newSigs = Dedup.signatures(Dedup.shingle(docs, cfg), cfg).cache()
    val nNew = newSigs.count()

    // (a) new x new — the batch generator over just this batch's signatures
    // (identical chunk-cap semantics to the batch pipeline, one shuffle)
    var cands = Dedup.candidates(newSigs, cfg)

    // (b) new x old — join new bucket entries against the persisted store;
    // old side of oversized buckets hash-thinned to bucketCap
    val newB = bucketEntries(newSigs, cfg).cache()
    val haveOld = new java.io.File(stores.bucketStore).exists()
    if (haveOld) {
      val old = spark.read.parquet(stores.bucketStore)
      val oldCapped = old
        .join(
          old.groupBy($"pass", $"bucket").agg(count(lit(1)).as("bsz"))
            .where($"bsz" > cfg.bucketCap),
          Seq("pass", "bucket"),
          "left_outer"
        )
        .where($"bsz".isNull || pmod(xxhash64($"id", $"bucket"), $"bsz") < cfg.bucketCap)
        .drop("bsz")
      val maxD = cfg.simhashMaxHamming
      val joined = newB.select($"pass", $"bucket", $"id".as("nid"), $"payload".as("np"))
        .join(oldCapped.select($"pass", $"bucket", $"id".as("oid"), $"payload".as("op")),
          Seq("pass", "bucket"))
        .where($"nid" =!= $"oid")
        .where($"pass" =!= "sim" || bit_count($"np".bitwiseXOR($"op")) <= maxD)
        .select(least($"nid", $"oid").as("id1"), greatest($"nid", $"oid").as("id2"))
      cands = cands.union(joined)
    }

    // exact verification over old + new signatures
    val sigCols = Seq($"conv_id", $"shingles", $"sig", $"simhash")
    val oldSigs =
      if (new java.io.File(stores.sigStore).exists()) spark.read.parquet(stores.sigStore)
      else newSigs.select(sigCols: _*).limit(0)
    val all = oldSigs.select(sigCols: _*).union(newSigs.select(sigCols: _*))
    val pairs = Dedup.verify(cands.select($"id1", $"id2"), all, cfg).cache()
    val nPairs = pairs.count()

    pairs.write.mode("append").parquet(stores.pairStore)
    newB.write.mode("append").parquet(stores.bucketStore)
    newSigs.select(sigCols: _*).write.mode("append").parquet(stores.sigStore)
    newSigs.unpersist()
    newB.unpersist()
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
