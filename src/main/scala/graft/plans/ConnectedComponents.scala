package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative large-star / small-star connected components over DataFrames
  * (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
  * — the scalable replacement for the reference's per-block igraph
  * `components()` calls (coauthor_glue.R:44-47, uni_glue_baseline.R:49-115)
  * and MST clustering (MT_Kruskal.R:153-158). Converges in O(log n) rounds
  * even on chain graphs; every round is two shuffles (groupBy min + join),
  * both AQE-managed, so it survives a 1000-executor scale-up.
  *
  * Node ids are strings — the algorithm only needs a total order, and string
  * ids avoid a 64-bit-hash collision risk at 10^12 nodes.
  */
object ConnectedComponents {

  /** edges: DataFrame(src, dst) undirected, any orientation, self-loops ok.
    * Returns DataFrame(id, component) covering every node present in edges;
    * component = min node id of the component.
    *
    * Adaptive execution, same spirit as Spark's broadcast-join cutoff: an
    * edge set at or under `localThreshold` rows is collected and solved with
    * driver-side union-find — one job plus a parallelize, versus the
    * iterative loop's ~8 barrier jobs whose fixed scheduling floor dwarfs the
    * actual work on small graphs (a 2M-edge set is ~64 MB on a driver that
    * Spark sizes in GB; the near-dup pair graph is a vanishing fraction of
    * corpus size — 100 TB of transcripts yields millions, not billions, of
    * verified pairs unless the corpus is mostly duplicates). Larger edge
    * sets take the distributed large-star/small-star loop unchanged. Both
    * paths produce the identical (id, min-node-id) labeling —
    * PropertiesSpec pins them against each other.
    *
    * Iteration state in the distributed loop is pinned per round. With
    * `checkpointDir` set the pin is a RELIABLE `checkpoint()` into that
    * directory — on a real cluster a lost executor recomputes from the
    * checkpoint files, whereas `localCheckpoint`'s executor-local blocks
    * would abort the whole job (unrecomputable lineage). Without a dir
    * (tests/ad-hoc local runs) it falls back to localCheckpoint for speed.
    * The production path (CheckpointedDedup) always passes its warehouse
    * checkpoint dir.
    *
    * Exiting via maxIter without reaching the edge-set fixpoint would return
    * a possibly-inconsistent labeling, so it throws instead; 50 doubled star
    * rounds cover any graph this universe stores (rounds needed ~ log n).
    */
  def run(
      spark: SparkSession,
      edges: DataFrame,
      maxIter: Int = 50,
      checkpointDir: Option[String] = None,
      localThreshold: Long = 1000000L
  ): DataFrame = {
    import spark.implicits._

    if (localThreshold > 0 && edges.limit((localThreshold + 1).toInt).count() <= localThreshold) {
      val rows = edges.select($"src".cast("string"), $"dst".cast("string"))
        .as[(String, String)].collect()
      return localUnionFind(spark, rows)
    }

    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def pin(d: DataFrame): DataFrame =
      if (checkpointDir.isDefined) d.checkpoint(true) else d.localCheckpoint(true)

    // canonical directed-to-smaller representation: (hi > lo)
    def canon(e: DataFrame): DataFrame = e
      .select(
        greatest($"src", $"dst").as("hi"),
        least($"src", $"dst").as("lo")
      )
      .filter($"hi" =!= $"lo")
      .distinct()

    def sig(d: DataFrame): (Long, Option[Long]) =
      d.agg(count(lit(1)), bit_xor(xxhash64($"hi", $"lo"))).as[(Long, Option[Long])].first()

    // one large-star + small-star phase, declared lazily (no materialization)
    def starRound(in: DataFrame): DataFrame = {
      // --- large-star: for each node u, link every strictly-larger neighbor
      // to the minimum of u's closed neighborhood.
      val sym = in.select($"hi".as("u"), $"lo".as("v"))
        .union(in.select($"lo".as("u"), $"hi".as("v")))
      val mins = sym.groupBy($"u").agg(min($"v").as("mn"))
      val ls = sym
        .join(mins, "u")
        .select($"v".as("src"), least($"mn", $"u").as("dst"))
        .where($"src" > $"dst")
      val afterLs = canon(ls)

      // --- small-star: each node links its smaller-or-equal neighborhood
      // (including itself) to that neighborhood's minimum.
      val mins2 = afterLs.groupBy($"hi").agg(min($"lo").as("mn"))
      val ss = afterLs
        .join(mins2, "hi")
        .select($"lo".as("src"), $"mn".as("dst"))
        .union(mins2.select($"hi".as("src"), $"mn".as("dst")))
      canon(ss)
    }

    val verbose = sys.env.get("GRAFT_CC_VERBOSE").contains("true")
    def vtimed[A](name: String)(f: => A): A = {
      val s0 = System.nanoTime()
      val r = f
      if (verbose) println(f"[cc] $name%-10s ${(System.nanoTime() - s0) / 1e9}%6.2f s")
      r
    }

    var cur = vtimed("canon")(pin(canon(edges)))
    var curSig = vtimed("sig0")(sig(cur))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // two star phases per materialization: halves the checkpoint/agg job
      // rounds (the driver-side latency floor of the loop) without changing
      // the fixpoint
      val next = vtimed(s"round$iter")(pin(starRound(starRound(cur))))

      // convergence: edge set unchanged (count + order-independent XOR
      // checksum); previous iteration's signature is reused, one agg job per
      // round
      val nextSig = vtimed(s"sig$iter")(sig(next))
      converged = curSig == nextSig
      cur = next
      curSig = nextSig
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not reach its edge-set fixpoint in $maxIter doubled star rounds")

    // at convergence every edge is (node -> component root); roots map to themselves
    cur
      .select($"hi".as("id"), $"lo".as("component"))
      .union(cur.select($"lo".as("id"), $"lo".as("component")))
      .groupBy($"id")
      .agg(min($"component").as("component"))
  }

  /** Driver-side union-find with path halving; representative = min node id
    * of each set (matching the distributed loop's labeling exactly,
    * independent of edge order).
    */
  private def localUnionFind(spark: SparkSession, edges: Array[(String, String)]): DataFrame = {
    import spark.implicits._
    // self-loops are dropped exactly like the distributed canon() — a node
    // appearing only in self-loops is absent from both labelings (callers
    // map uncovered nodes to themselves, Dedup.cluster:coalesce)
    val real = edges.filter(e => e._1 != e._2)
    val idx = scala.collection.mutable.HashMap[String, Int]()
    real.foreach { case (a, b) =>
      idx.getOrElseUpdate(a, idx.size); idx.getOrElseUpdate(b, idx.size)
    }
    val parent = Array.tabulate(idx.size)(identity)
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    real.foreach { case (a, b) =>
      val (ra, rb) = (find(idx(a)), find(idx(b)))
      if (ra != rb) parent(ra) = rb
    }
    val names = new Array[String](idx.size)
    idx.foreach { case (name, i) => names(i) = name }
    // min node id per set
    val minOf = scala.collection.mutable.HashMap[Int, String]()
    var i = 0
    while (i < names.length) {
      val r = find(i)
      val cur = minOf.get(r)
      if (cur.isEmpty || names(i) < cur.get) minOf(r) = names(i)
      i += 1
    }
    val out = new Array[(String, String)](names.length)
    i = 0
    while (i < names.length) { out(i) = (names(i), minOf(find(i))); i += 1 }
    // slice so each task binary stays well under the 1 MiB scheduler warning:
    // a local collection is serialized INTO the task closures, so the slice
    // count — not defaultParallelism — bounds per-task payload (~20k labels
    // of ~50 bytes ≈ 1 MB total per slice at worst)
    val slices = math.max(spark.sparkContext.defaultParallelism, 1 + out.length / 20000)
    spark.createDataset(spark.sparkContext.parallelize(out.toIndexedSeq, slices)).toDF("id", "component")
  }
}
