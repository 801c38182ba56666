package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Cols._
import graft.functions.{text => T, MinHashSignature, SimHash64}
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

  /** (conv_id, shingles array<long>, tokens array<string>) */
  def shingle(docs: DataFrame, cfg: Config): DataFrame = {
    val toks = T.tokens($"doc")
    docs.select(
      $"conv_id",
      $"doc",
      $"n_turns",
      T.shingleHashes(toks, cfg.shingleK).as("shingles")
    )
  }

  /** + (sig array<int>, simhash long) */
  def signatures(shingled: DataFrame, cfg: Config): DataFrame =
    shingled.select(
      $"conv_id",
      $"shingles",
      MinHashSignature($"shingles", cfg.numPerms, cfg.seed).as("sig"),
      SimHash64($"shingles").as("simhash")
    )

  /** Candidate pairs from LSH banding with explicit skew handling:
    * oversized (band,bucket) groups are chunked to `bucketCap` ids; pairs are
    * exhaustive within a chunk and chunks are chained through their min-id
    * hubs, preserving connectivity (cluster-level recall) while bounding the
    * per-bucket pair explosion to O(n*cap) instead of O(n^2) — SURVEY §4
    * skew notes; the reference is skew-blind (one process per block).
    */
  def lshCandidates(sigs: DataFrame, cfg: Config): DataFrame = {
    val r = cfg.rows
    val banded = sigs
      .select(
        $"conv_id",
        posexplode(
          transform(
            sequence(lit(0), lit(cfg.bands - 1)),
            b => xxhash64(slice($"sig", b * r + 1, lit(r)), b)
          )
        ).as(Seq("band", "bhash"))
      )
      .select($"conv_id", $"band", $"bhash")

    val w = Window.partitionBy($"band", $"bhash").orderBy($"conv_id")
    val chunked = banded
      .withColumn("chunk", ((row_number().over(w) - 1) / cfg.bucketCap).cast("int"))

    val a = chunked.select($"band", $"bhash", $"chunk", $"conv_id".as("id1"))
    val b = chunked.select($"band", $"bhash", $"chunk", $"conv_id".as("id2"))
    val intra = a
      .join(b, Seq("band", "bhash", "chunk"))
      .where($"id1" < $"id2")
      .select($"id1", $"id2")

    // chain chunk hubs so a split bucket stays one connected candidate group
    val hubs = chunked
      .groupBy($"band", $"bhash", $"chunk")
      .agg(min($"conv_id").as("hub"))
    val hw = Window.partitionBy($"band", $"bhash").orderBy($"chunk")
    val hubEdges = hubs
      .withColumn("prev", lag($"hub", 1).over(hw))
      .where($"prev".isNotNull)
      .select(least($"prev", $"hub").as("id1"), greatest($"prev", $"hub").as("id2"))

    intra.union(hubEdges)
  }

  /** SimHash Hamming-ball candidates: 4x16-bit chunk banding guarantees every
    * pair within Hamming distance 3 shares at least one exact chunk
    * (pigeonhole); the Hamming filter then bounds the final distance.
    */
  def simhashCandidates(sigs: DataFrame, cfg: Config): DataFrame = {
    val chunks = sigs.select(
      $"conv_id",
      $"simhash",
      posexplode(
        array((0 until 4).map(i => shiftrightunsigned($"simhash", i * 16).bitwiseAND(lit(0xffffL))): _*)
      ).as(Seq("ci", "cv"))
    )
    val w = Window.partitionBy($"ci", $"cv").orderBy($"conv_id")
    val chunked = chunks.withColumn("chunk", ((row_number().over(w) - 1) / cfg.bucketCap).cast("int"))
    val a = chunked.select($"ci", $"cv", $"chunk", $"conv_id".as("id1"), $"simhash".as("sh1"))
    val b = chunked.select($"ci", $"cv", $"chunk", $"conv_id".as("id2"), $"simhash".as("sh2"))
    a.join(b, Seq("ci", "cv", "chunk"))
      .where($"id1" < $"id2")
      .where(T.hamming64($"sh1", $"sh2") <= cfg.simhashMaxHamming)
      .select($"id1", $"id2")
  }

  /** Exact-long-substring candidates via content-defined winnowing anchors
    * (ContentAnchors; the distributed-suffix-array stand-in, SURVEY §7.5):
    * two docs sharing any exact normalized substring of length
    * >= window+stride-1 are guaranteed to collide on an anchor hash. Exact
    * verification downstream keeps precision.
    */
  def substringCandidates(docs: DataFrame, cfg: Config): DataFrame = {
    val anchors = docs
      .select(
        $"conv_id",
        explode(T.windowAnchors($"doc", cfg.substringWindow, cfg.substringStride)).as("anchor")
      )
    val w = Window.partitionBy($"anchor").orderBy($"conv_id")
    val chunked = anchors.withColumn("chunk", ((row_number().over(w) - 1) / cfg.bucketCap).cast("int"))
    val a = chunked.select($"anchor", $"chunk", $"conv_id".as("id1"))
    val b = chunked.select($"anchor", $"chunk", $"conv_id".as("id2"))
    a.join(b, Seq("anchor", "chunk"))
      .where($"id1" < $"id2")
      .select($"id1", $"id2")
  }

  /** Two-stage verification of distinct candidate pairs:
    *  1. cheap signature-estimate pre-filter (join against 128-int sigs,
    *     keep est >= threshold - margin) — cuts the heavy shingle-set join;
    *  2. exact Jaccard on shingle sets (c_org.py:18-28 analogue, by key join
    *     instead of positional alignment).
    * Output: (id1, id2, jaccard)
    */
  def verify(cands: DataFrame, sigs: DataFrame, cfg: Config): DataFrame = {
    val sigOnly = sigs.select($"conv_id", $"sig")
    val est = cands
      .distinct()
      .join(sigOnly.select($"conv_id".as("id1"), $"sig".as("sig1")), "id1")
      .join(sigOnly.select($"conv_id".as("id2"), $"sig".as("sig2")), "id2")
      .withColumn(
        "est",
        aggregate(
          zip_with($"sig1", $"sig2", (x, y) => (x === y).cast("int")),
          lit(0),
          (acc, x) => acc + x
        ).cast("double") / cfg.numPerms
      )
      .where($"est" >= cfg.threshold - cfg.estMargin)
      .select($"id1", $"id2")

    val sh = sigs.select($"conv_id", $"shingles")
    est
      .join(sh.select($"conv_id".as("id1"), $"shingles".as("sh1")), "id1")
      .join(sh.select($"conv_id".as("id2"), $"shingles".as("sh2")), "id2")
      .withColumn("jaccard", T.jaccard($"sh1", $"sh2"))
      .where($"jaccard" >= cfg.threshold)
      .select($"id1", $"id2", $"jaccard")
  }

  /** Cluster verified pairs; every conversation gets a row (singletons map to
    * themselves). Output: (conv_id, component)
    */
  def cluster(spark: SparkSession, allIds: DataFrame, edges: DataFrame): DataFrame = {
    val comps = ConnectedComponents.run(
      spark,
      edges.select($"id1".as("src"), $"id2".as("dst"))
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
      clusters: DataFrame // (conv_id, component)
  )

  /** Full pipeline, lazily declared; caller materializes what it needs. */
  def run(spark: SparkSession, transcripts: DataFrame, cfg: Config = Config()): Result = {
    val docs = assemble(transcripts)
    val shingled = shingle(docs, cfg)
    val sigs = signatures(shingled, cfg).cache() // reused by 3 candidate passes + verify
    var cands = lshCandidates(sigs, cfg)
    if (cfg.simhashEnabled) cands = cands.union(simhashCandidates(sigs, cfg))
    if (cfg.substringEnabled) cands = cands.union(substringCandidates(docs, cfg))
    val pairs = verify(cands, sigs, cfg)
    val clusters = cluster(spark, docs, pairs)
    Result(docs, sigs, pairs, clusters)
  }
}
