package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Cols._
import graft.functions.{text => T, MinHashSignature, SimHash64, SortedIntersectSize}
import graft.plans.ConnectedComponents

/** End-to-end near-duplicate detection + clustering over transcripts
  * (conv_id, turn_idx, role, text, tool, ts) — the Spark-native re-expression
  * of the reference's blocking → pairwise-scoring → clustering flow
  * (Makefile:8-12 blocking; id_pairs.py:21-23 pair enumeration;
  * c_org.py:18-28 similarity; MT_Kruskal.R + likelihood.R clustering).
  *
  * Stages (each returns a DataFrame so the checkpoint runner can materialize
  * any prefix):
  *   assemble -> shingle -> signatures -> candidates (LSH ∪ SimHash ∪
  *   substring-anchor) -> verify (exact Jaccard) -> cluster (CC) -> clusters
  */
object Dedup {

  final case class Config(
      shingleK: Int = 5, // word shingles
      numPerms: Int = 128, // MinHash permutations
      bands: Int = 32, // 32 bands x 4 rows: ~0.9998 detection at s=0.70
      threshold: Double = 0.70, // exact-Jaccard accept threshold
      estMargin: Double = 0.20, // signature pre-filter slack below threshold
      bucketCap: Int = 256, // max ids per LSH bucket chunk (skew cap)
      seed: Long = 42L,
      simhashEnabled: Boolean = true,
      simhashMaxHamming: Int = 3, // 4x16-bit chunks guarantee d<=3 retrieval
      substringEnabled: Boolean = true,
      substringWindow: Int = 64, // chars; catches common substrings >= 95 chars
      substringStride: Int = 32
  ) {
    require(numPerms % bands == 0, "bands must divide numPerms")
    def rows: Int = numPerms / bands
  }

  /** Per-conversation document assembly under stable turn ordering.
    * `array_sort` over struct(turn_idx, ...) makes the reference's implicit
    * positional ordering (SURVEY §1.3) explicit — collect_list order is
    * nondeterministic, the sort key is not.
    * Output: (conv_id, doc, n_turns)
    */
  def assemble(transcripts: DataFrame): DataFrame =
    transcripts
      .where($"conv_id".isNotNull) // a rowless key cannot cluster; drop, don't NPE
      .groupBy($"conv_id")
      .agg(
        concat_ws(
          "\n",
          transform(
            array_sort(collect_list(struct($"turn_idx", $"text"))),
            s => s.getField("text")
          )
        ).as("doc"),
        count(lit(1)).as("n_turns")
      )

  /** (conv_id, doc, n_turns, shingles array<int> sorted distinct).
    * The reference's pre-tokenization normalization (P6,
    * venue_author_preprocess.R:18-39: lowercase, punctuation -> delimiter)
    * is FUSED inside ShingleHashes' single char pass — always on, map-side,
    * zero extra cost — so case/punctuation-variant near-dups cluster by
    * default (DedupPipelineSpec pins jaccard 1.0 for such variants). The
    * substring-anchor pass runs over the SAME normalized text (see
    * functions/text.scala windowAnchors and substringCandidates: exact
    * NORMALIZED-substring semantics — case/punctuation variants of a long
    * block still collide).
    */
  def shingle(docs: DataFrame, cfg: Config): DataFrame =
    docs.select(
      $"conv_id",
      $"doc",
      $"n_turns",
      graft.functions.ShingleHashes($"doc", cfg.shingleK).as("shingles")
    )

  /** + (sig array<int>, simhash long, anchors array<long>) — winnowing
    * anchors are computed here, in the same map-side pass over the assembled
    * text, so the substring candidate pass never re-reads (or caches) the
    * full documents: downstream stages carry only hashes.
    */
  def signatures(shingled: DataFrame, cfg: Config): DataFrame =
    shingled.select(
      $"conv_id",
      $"shingles",
      MinHashSignature($"shingles", cfg.numPerms, cfg.seed).as("sig"),
      SimHash64($"shingles").as("simhash"),
      (if (cfg.substringEnabled)
         T.windowAnchors($"doc", cfg.substringWindow, cfg.substringStride)
       else array().cast("array<bigint>")).as("anchors")
    )

  /** Skew metrics for one candidate pass — "no silent caps" (SURVEY §4):
    * oversized buckets and the pair count the chunk cap dropped (beyond the
    * hub chain that preserves connectivity) are counted via accumulators and
    * must be logged by the caller.
    */
  final case class SkewMetrics(
      oversizedBuckets: org.apache.spark.util.LongAccumulator,
      droppedPairs: org.apache.spark.util.LongAccumulator
  )

  def skewMetrics(spark: SparkSession, pass: String): SkewMetrics = SkewMetrics(
    spark.sparkContext.longAccumulator(s"graft.$pass.oversized_buckets"),
    spark.sparkContext.longAccumulator(s"graft.$pass.dropped_pairs")
  )

  /** Shared candidate-pair generator over (bucket, id, payload) rows — ONE
    * shuffle (hash partition by bucket), then streaming bounded-memory pair
    * emission per bucket via `flatMapSortedGroups`:
    *   - buckets of n <= cap emit all C(n,2) pairs (J1 analogue: the
    *     reference's block-local pair enumeration, id_pairs.py:21-23);
    *   - oversized (skewed) buckets are chunked to `cap` ids; pairs are
    *     exhaustive within a chunk and chunks are chained through their first
    *     ids, preserving bucket connectivity (cluster recall) while bounding
    *     the explosion to O(n*cap) instead of O(n^2). The reference is
    *     skew-blind (one process per block, SURVEY §4); this is the explicit
    *     skew handling the north_rule requires. Sorted groups keep the output
    *     deterministic under any shuffle arrival order.
    * `pairFilter` (e.g. the SimHash Hamming gate) prunes pairs in-stream.
    *
    * Shared beyond text: the embedding near-dup path (ops/Ann.nearDupPairs)
    * routes its sign-LSH buckets through here with a packed-sign-bit payload,
    * so one dense Hamming bucket can never go quadratic — hence the
    * package-private visibility.
    */
  private[graft] def bucketPairs(
      bucketed: DataFrame, // (bucket long, id string, payload long)
      cap: Int,
      pairFilter: (Long, Long) => Boolean = (_, _) => true,
      metrics: Option[SkewMetrics] = None
  ): DataFrame = {
    val spark = bucketed.sparkSession
    import spark.implicits._
    bucketed
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("id")) { (_, it) =>
        // almost all buckets are singletons (unique anchors/bands): bail out
        // before any allocation, or the per-group garbage dominates the stage
        val first = it.next()
        if (!it.hasNext) Iterator.empty
        else new Dedup.ChunkPairIterator(first, it, cap, pairFilter, metrics)
      }
      .toDF("id1", "id2")
  }

  /** Streaming bounded-memory pair emitter for one bucket (see bucketPairs).
    * Chunk buffers are thread-local (one Spark task per thread), so the
    * millions of small buckets share two arrays per core instead of
    * allocating per group.
    */
  private final class ChunkPairIterator(
      first: (Long, String, Long),
      it: Iterator[(Long, String, Long)],
      cap: Int,
      pairFilter: (Long, Long) => Boolean,
      metrics: Option[SkewMetrics]
  ) extends Iterator[(String, String)] {
    private val (ids, pls) = Dedup.buffers(cap)
    private var n = 0
    private var i = 0 // pair cursor within chunk
    private var j = 1
    private var pendingFirst = true
    private var prevHub: String = null
    private var hubEdge: (String, String) = null
    private var seen = 0L // total ids consumed (for dropped-pair accounting)

    private def refill(): Unit = {
      val prevSeen = seen
      if (n > 0) prevHub = ids(0)
      n = 0; i = 0; j = 1
      if (pendingFirst) { ids(0) = first._2; pls(0) = first._3; n = 1; pendingFirst = false }
      while (n < cap && it.hasNext) {
        val t = it.next(); ids(n) = t._2; pls(n) = t._3; n += 1
      }
      seen += n
      if (prevSeen > 0 && n > 0) {
        // a bucket spilled into another chunk: count it once, and count the
        // cross-chunk pairs the cap dropped (minus the 1 hub edge kept)
        if (prevSeen == cap.toLong) metrics.foreach(_.oversizedBuckets.add(1))
        metrics.foreach(_.droppedPairs.add(prevSeen * n - 1))
      }
      if (n > 0 && prevHub != null) hubEdge = (prevHub, ids(0))
    }

    private def advance(): (String, String) = {
      while (true) {
        if (hubEdge != null) { val e = hubEdge; hubEdge = null; return e }
        while (j < n) {
          val (a, b) = (i, j)
          j += 1
          if (j == n) { i += 1; j = i + 1 }
          if (pairFilter(pls(a), pls(b))) return (ids(a), ids(b))
        }
        if (!it.hasNext) return null
        refill()
      }
      null
    }

    refill()
    private var nxt = advance()
    override def hasNext: Boolean = nxt != null
    override def next(): (String, String) = { val r = nxt; nxt = advance(); r }
  }

  private val tlBuffers = new ThreadLocal[(Array[String], Array[Long])]
  private def buffers(cap: Int): (Array[String], Array[Long]) = {
    var b = tlBuffers.get()
    if (b == null || b._1.length < cap) {
      b = (new Array[String](cap), new Array[Long](cap))
      tlBuffers.set(b)
    }
    b
  }

  /** (bucket, id, payload) rows of the MinHash LSH banding pass — shared by
    * the batch candidate generator and the incremental bucket store.
    */
  private[graft] def lshBuckets(sigs: DataFrame, cfg: Config): DataFrame = {
    val r = cfg.rows
    sigs.select(
      explode(
        transform(
          sequence(lit(0), lit(cfg.bands - 1)),
          b => xxhash64(slice($"sig", b * r + 1, lit(r)), b)
        )
      ).as("bucket"),
      $"conv_id".as("id"),
      lit(0L).as("payload")
    )
  }

  /** (bucket, id, payload=simhash) rows of the SimHash chunk pass. */
  private[graft] def simhashBuckets(sigs: DataFrame, cfg: Config): DataFrame =
    sigs.select(
      explode(
        array((0 until 4).map(i =>
          xxhash64(shiftrightunsigned($"simhash", i * 16).bitwiseAND(lit(0xffffL)), lit(i))
        ): _*)
      ).as("bucket"),
      $"conv_id".as("id"),
      $"simhash".as("payload")
    )

  /** (bucket, id, payload) rows of the winnowing-anchor substring pass. */
  private[graft] def anchorBuckets(sigs: DataFrame, cfg: Config): DataFrame =
    sigs.select(
      explode($"anchors").as("bucket"),
      $"conv_id".as("id"),
      lit(0L).as("payload")
    )

  /** In-stream pair gate for the SimHash pass. */
  private[graft] def simhashGate(cfg: Config): (Long, Long) => Boolean = {
    val maxD = cfg.simhashMaxHamming
    (a, b) => java.lang.Long.bitCount(a ^ b) <= maxD
  }

  /** MinHash LSH banding: band hash -> bucket, then streamed pair emission. */
  def lshCandidates(sigs: DataFrame, cfg: Config, metrics: Option[SkewMetrics] = None): DataFrame =
    bucketPairs(lshBuckets(sigs, cfg), cfg.bucketCap, metrics = metrics)

  /** SimHash Hamming-ball candidates: 4x16-bit chunk banding guarantees every
    * pair within Hamming distance 3 shares at least one exact chunk
    * (pigeonhole); the in-stream Hamming gate bounds the final distance.
    */
  def simhashCandidates(sigs: DataFrame, cfg: Config, metrics: Option[SkewMetrics] = None): DataFrame =
    bucketPairs(simhashBuckets(sigs, cfg), cfg.bucketCap, simhashGate(cfg), metrics)

  /** Exact-long-substring candidates via content-defined winnowing anchors
    * (ContentAnchors; the distributed-suffix-array stand-in, SURVEY §7.5):
    * two docs sharing any exact normalized substring of length
    * >= window+stride-1 are guaranteed to collide on an anchor hash. Exact
    * verification downstream keeps precision.
    */
  def substringCandidates(sigs: DataFrame, cfg: Config, metrics: Option[SkewMetrics] = None): DataFrame =
    bucketPairs(anchorBuckets(sigs, cfg), cfg.bucketCap, metrics = metrics)

  /** ALL enabled candidate passes in ONE shuffle: the three bucket frames
    * (disjoint 64-bit key spaces) union before the single hash-partition +
    * sorted-group pair emission, so the full candidate generation costs one
    * shuffle of the combined entries instead of three separate
    * groupBy-shuffles over the same cached signatures (each with its own job
    * scheduling + codegen floor — measurable at any scale, dominant at
    * bench scale). Pair semantics are identical to the three separate
    * passes: buckets never merge across passes, so chunking/caps behave the
    * same, and the SimHash Hamming gate applies only where payloads are
    * non-zero (LSH/anchor rows carry payload 0; a genuine simhash of 0 — an
    * empty doc — passes the gate and is caught by exact verification like
    * any other candidate).
    */
  def candidates(sigs: DataFrame, cfg: Config, metrics: Option[SkewMetrics] = None): DataFrame = {
    var entries = lshBuckets(sigs, cfg)
    if (cfg.simhashEnabled) entries = entries.union(simhashBuckets(sigs, cfg))
    if (cfg.substringEnabled) entries = entries.union(anchorBuckets(sigs, cfg))
    val maxD = cfg.simhashMaxHamming
    val gate: (Long, Long) => Boolean =
      (a, b) => (a == 0L && b == 0L) || java.lang.Long.bitCount(a ^ b) <= maxD
    bucketPairs(entries, cfg.bucketCap, gate, metrics)
  }

  /** Verification of distinct candidate pairs against exact shingle-set
    * Jaccard (c_org.py:18-28 analogue, keyed joins instead of positional
    * alignment). One fused join pass: pairs pick up (sig, shingles) for each
    * side in two shuffles total; the cheap 128-int signature estimate gates
    * the merge-intersection of the full shingle arrays row-locally.
    * ShingleHashes emits sorted arrays, so exact |∩| is a linear merge
    * (SortedIntersectSize), not a hash build. Output: (id1, id2, jaccard).
    */
  def verify(cands: DataFrame, sigs: DataFrame, cfg: Config): DataFrame = {
    val side = sigs.select($"conv_id", $"sig", $"shingles")
    val est = aggregate(
      zip_with($"sig1", $"sig2", (x, y) => (x === y).cast("int")),
      lit(0),
      (acc, x) => acc + x
    ).cast("double") / cfg.numPerms
    val inter = SortedIntersectSize($"sh1", $"sh2").cast("double")
    val uni = (size($"sh1") + size($"sh2")).cast("double") - inter
    cands
      .distinct()
      .join(side.select($"conv_id".as("id1"), $"sig".as("sig1"), $"shingles".as("sh1")), "id1")
      .join(side.select($"conv_id".as("id2"), $"sig".as("sig2"), $"shingles".as("sh2")), "id2")
      .where(est >= cfg.threshold - cfg.estMargin)
      .withColumn("jaccard", when(uni === 0d, lit(1.0)).otherwise(inter / uni))
      .where($"jaccard" >= cfg.threshold)
      .select($"id1", $"id2", $"jaccard")
  }

  /** Cluster verified pairs; every conversation gets a row (singletons map to
    * themselves). `ccCheckpointDir` switches the CC loop to reliable
    * checkpointing (fault-tolerant on a real cluster); the checkpointed
    * runner always passes its warehouse dir. Output: (conv_id, component)
    */
  def cluster(
      spark: SparkSession,
      allIds: DataFrame,
      edges: DataFrame,
      ccCheckpointDir: Option[String] = None
  ): DataFrame = {
    val comps = ConnectedComponents.run(
      spark,
      edges.select($"id1".as("src"), $"id2".as("dst")),
      checkpointDir = ccCheckpointDir
    )
    allIds
      .select($"conv_id")
      .join(comps.withColumnRenamed("id", "conv_id"), Seq("conv_id"), "left_outer")
      .select($"conv_id", coalesce($"component", $"conv_id").as("component"))
  }

  final case class Result(
      docs: DataFrame, // (conv_id, doc, n_turns)
      sigs: DataFrame, // (conv_id, shingles, sig, simhash)
      pairs: DataFrame, // (id1, id2, jaccard) verified
      clusters: DataFrame, // (conv_id, component)
      skew: Map[String, SkewMetrics] = Map.empty // per-pass cap metrics
  )

  /** Full pipeline. Reused intermediates are cached (MEMORY_AND_DISK) — the
    * local analogue of the per-stage checkpoint tables the Checkpointed
    * runner writes at cluster scale; without it every downstream consumer
    * re-executes the assemble/shingle/verify chain.
    */
  def run(spark: SparkSession, transcripts: DataFrame, cfg: Config = Config()): Result = {
    val docs = assemble(transcripts) // single consumer (shingle) — not cached
    val shingled = shingle(docs, cfg)
    val sigs = signatures(shingled, cfg).cache() // reused by candidates + verify + cluster
    val skew = Map("candidates" -> skewMetrics(spark, "candidates"))
    val cands = candidates(sigs, cfg, skew.get("candidates"))
    val pairs = verify(cands, sigs, cfg).cache() // consumed by cluster + caller's sink
    val clusters = cluster(spark, sigs, pairs)
    Result(docs, sigs, pairs, clusters, skew)
  }
}
