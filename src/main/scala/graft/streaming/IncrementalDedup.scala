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

  /** Store existence through the Hadoop FileSystem API — the stores live
    * wherever the warehouse lives (hdfs://, s3a://, file:/), so a java.io
    * local-path check would be wrong everywhere but a single machine.
    */
  private def storeExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
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
    val haveOld = storeExists(spark, stores.bucketStore)
    if (haveOld) {
      // the store is first SEMI-JOINED down to the batch's bucket keys (a
      // small broadcast set): the hot-bucket size count and the candidate
      // join then aggregate/shuffle only matching store rows, so per-batch
      // shuffle volume tracks the batch, not the accumulated corpus
      // (StreamingSpec asserts it stays ~flat while the store grows)
      val batchBuckets = newB.select($"pass", $"bucket").distinct()
      val old = spark.read.parquet(stores.bucketStore)
        .join(broadcast(batchBuckets), Seq("pass", "bucket"), "left_semi")
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

    // exact verification: the candidate id set is small (bounded by this
    // batch's bucket matches), so the signature store is SEMI-JOINED down to
    // candidate endpoints before the verify joins — per-batch verify work is
    // O(candidates), not O(accumulated corpus); the semi join broadcasts the
    // candidate ids, so the growing store is scanned but never re-shuffled
    // (cands is cached: it feeds both the id set and the verify join)
    val candKeys = cands.select($"id1", $"id2").cache()
    val candIds = candKeys.select($"id1".as("conv_id")).union(candKeys.select($"id2".as("conv_id")))
      .distinct()
    val sigCols = Seq($"conv_id", $"shingles", $"sig", $"simhash")
    val oldSigs =
      if (storeExists(spark, stores.sigStore))
        spark.read.parquet(stores.sigStore)
          .join(broadcast(candIds), Seq("conv_id"), "left_semi")
      else newSigs.select(sigCols: _*).limit(0)
    val all = oldSigs.select(sigCols: _*).union(newSigs.select(sigCols: _*))
    val pairs = Dedup.verify(candKeys, all, cfg).cache()
    val nPairs = pairs.count()

    pairs.write.mode("append").parquet(stores.pairStore)
    newB.write.mode("append").parquet(stores.bucketStore)
    newSigs.select(sigCols: _*).write.mode("append").parquet(stores.sigStore)
    newSigs.unpersist()
    newB.unpersist()
    candKeys.unpersist()
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
