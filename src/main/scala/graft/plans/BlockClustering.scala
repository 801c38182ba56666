package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._



/** Per-block single-linkage agglomerative clustering with a likelihood-model
  * dendrogram cut — the faithful re-expression of the reference's clustering
  * core (MT_Kruskal.R:101-183 Kruskal-with-snapshots; likelihood.R:30-93
  * L-maximizing cut + singleton patch), running inside
  * `groupByKey.flatMapGroups` per block. Blocks (= connected components of
  * the candidate graph) are small after LSH blocking, exactly like the
  * reference's per-name blocks, so the per-block work is in-memory Scala —
  * the distributed skeleton is the groupBy, as SURVEY §2.9 G4 prescribes.
  *
  * The likelihood of a clustering given observed pair similarities
  * (likelihood.R:39-50): L = Σ_intra log(sim) + Σ_inter log(1-sim) over
  * observed pairs. Merges happen in Kruskal order (descending sim, weight
  * 1-sim per MT_Kruskal.R:149); L(k) is evaluated incrementally for every
  * dendrogram prefix and the argmax cut is emitted (the reference bisects for
  * the first ΔL decrease assuming unimodality, likelihood.R:57-66 — argmax
  * over all k is the exact version of the same objective).
  */
object BlockClustering {

  private final val Eps = 1e-6

  /** ids: block members; edges: (i, j, sim) indices into ids.
    * Returns per-member sub-cluster labels (0-based).
    *
    * `missingSim`: the reference's likelihood sums over EVERY pair in the
    * block (classifier predicts all pairs); our candidate generation only
    * observes colliding pairs, and an LSH non-collision is itself evidence of
    * low similarity — unobserved cross pairs enter the objective at this
    * pessimistic similarity, which is what makes a weak bridge between two
    * tight sub-cliques cuttable.
    *
    * `conflict` (optional, G11): per-member constraint group, -1 for none.
    * Two members sharing a group may NEVER end up in one sub-cluster — the
    * reference's constrained Kruskal (MT_Kruskal.R:101-126: a merge is
    * accepted only if the disambiguation splits still occupy distinct
    * components). Enforced at merge time, so every dendrogram prefix —
    * including the likelihood-argmax cut — respects it.
    *
    * `greedyGate`: skip negative-ΔL merges at merge time instead of
    * recording them for the global argmax cut. For the UNCONSTRAINED cut the
    * global argmax is the better estimator (a locally negative bridge can be
    * recovered by later gains and the cut sees the whole curve) and stays
    * the default; under conflict constraints a doomed bridge merge would
    * CONSUME the constraint budget of a root (replicated split edges carry
    * identical sims, so tie order alone cannot route the second split around
    * it) — constrained callers gate greedily, which is exactly the local
    * accept/reject the reference's Kruskal loop applies per arc.
    */
  def clusterBlock(
      nIds: Int,
      edges: Array[(Int, Int, Double)],
      missingSim: Double = 0.2,
      conflict: Array[Int] = null,
      greedyGate: Boolean = false
  ): Array[Int] = {
    val parent = Array.tabulate(nIds)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }

    val sorted = edges.sortBy(-_._3) // descending sim == ascending weight 1-sim
    def logit(s: Double): Double = {
      val c = math.min(1 - Eps, math.max(Eps, s))
      math.log(c) - math.log1p(-c)
    }

    // merge log: for each accepted edge, the two roots it merged
    val merges = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    val mergeGain = scala.collection.mutable.ArrayBuffer[Double]()
    // component membership as arrays for pair accounting
    val members = Array.tabulate(nIds)(i => scala.collection.mutable.ArrayBuffer(i))
    // adjacency: sims between member pairs, for ΔL of a merge
    val simOf = new java.util.HashMap[Long, Double]()
    edges.foreach { case (i, j, s) =>
      simOf.put(math.min(i, j).toLong << 32 | math.max(i, j).toLong, s)
    }
    // per-root constraint groups (tiny sets; merged small-into-big with the
    // member lists)
    val rootGroups: Array[scala.collection.mutable.HashSet[Int]] =
      if (conflict == null) null
      else Array.tabulate(nIds) { i =>
        val s = scala.collection.mutable.HashSet[Int]()
        if (conflict(i) >= 0) s += conflict(i)
        s
      }

    sorted.foreach { case (i, j, _) =>
      val ri = find(i)
      val rj = find(j)
      if (ri != rj && (rootGroups == null ||
          !rootGroups(ri).exists(rootGroups(rj).contains))) {
        // ΔL of merging components ri, rj = Σ over observed cross pairs of
        // [log(sim) - log(1-sim)]
        var delta = 0.0
        val (small, big) = if (members(ri).size <= members(rj).size) (ri, rj) else (rj, ri)
        members(small).foreach { a =>
          members(big).foreach { b =>
            val key = math.min(a, b).toLong << 32 | math.max(a, b).toLong
            delta += logit(if (simOf.containsKey(key)) simOf.get(key) else missingSim)
          }
        }
        if (!greedyGate || delta >= 0) {
          merges += ((ri, rj))
          mergeGain += delta
          parent(small) = big
          members(big) ++= members(small)
          members(small).clear()
          if (rootGroups != null) {
            rootGroups(big) ++= rootGroups(small)
            rootGroups(small).clear()
          }
        }
      }
    }

    // argmax prefix of cumulative gains (L(0) is a constant offset)
    var best = 0
    var cum = 0.0
    var bestCum = 0.0
    var k = 0
    while (k < mergeGain.length) {
      cum += mergeGain(k)
      if (cum > bestCum) { bestCum = cum; best = k + 1 }
      k += 1
    }

    // replay the first `best` merges on a fresh union-find
    val p2 = Array.tabulate(nIds)(identity)
    def find2(x: Int): Int = { var r = x; while (p2(r) != r) r = p2(r); r }
    var m = 0
    while (m < best) { p2(find2(merges(m)._1)) = find2(merges(m)._2); m += 1 }
    Array.tabulate(nIds)(find2)
  }

  /** Shared distributed skeleton for every per-block kernel (likelihood-cut
    * refine, affinity propagation, constrained split): attach both
    * endpoints' blocks to the pairs with two keyed joins (only within-block
    * pairs participate — a cross-block pair would double-assign a member),
    * union member rows (optionally carrying a conflict group in `grp`) with
    * edge rows, shuffle ONCE on the block key, canonicalize the block
    * in-memory, and run `kernel(n, edges, conflict)`. Canonicalization —
    * members sorted lexicographically, edges by (sim desc, i, j) — is what
    * makes labels a pure function of block content (group iterators arrive
    * in partition order; the golden-oracle determinism requirement). Blocks
    * over `maxBlock` keep their block label.
    */
  private[plans] def runPerBlock(
      spark: SparkSession,
      members: DataFrame, // (conv_id, component[, grp])
      pairs: DataFrame, // (id1, id2, jaccard)
      maxBlock: Int
  )(kernel: (Int, Array[(Int, Int, Double)], Array[Int]) => Array[Int]): DataFrame = {
    import spark.implicits._
    val withGrp =
      if (members.columns.contains("grp")) members
      else members.withColumn("grp", lit(null).cast("string"))
    val c1 = withGrp.select(col("conv_id").as("id1"), col("component"))
    val c2 = withGrp.select(col("conv_id").as("id2"), col("component").as("component2"))
    val withComp = pairs
      .join(c1, "id1")
      .join(c2, "id2")
      .where(col("component") === col("component2"))
      .select(col("component"), col("id1").as("conv_id"), col("id2"), col("jaccard"),
        lit(null).cast("string").as("grp"))
    val blockRows = withGrp
      .select(col("component"), col("conv_id"), lit(null).cast("string").as("id2"),
        lit(0.0).as("jaccard"), col("grp"))
      .unionByName(withComp)

    blockRows
      .as[(String, String, Option[String], Double, Option[String])]
      .groupByKey(_._1)
      .flatMapGroups { (comp, it) =>
        val grpOf = scala.collection.mutable.HashMap[String, String]()
        val seen = scala.collection.mutable.HashSet[String]()
        val edges = scala.collection.mutable.ArrayBuffer[(String, String, Double)]()
        it.foreach {
          case (_, a, None, _, g) =>
            seen += a
            g.foreach(grpOf.update(a, _))
          case (_, a, Some(b), s, _) =>
            seen += a; seen += b
            edges += ((a, b, s))
        }
        val names = seen.toArray.sorted
        val ids = names.zipWithIndex.toMap
        val n = names.length
        if (n <= 1 || n > maxBlock || edges.isEmpty) {
          names.iterator.map(id => (id, comp))
        } else {
          val groupIdx = grpOf.values.toArray.distinct.sorted.zipWithIndex.toMap
          val conflict = names.map(nm => grpOf.get(nm).map(groupIdx).getOrElse(-1))
          val e = edges.map { case (a, b, s) => (ids(a), ids(b), s) }.toArray
            .sortBy { case (i, j, s) => (-s, math.min(i, j), math.max(i, j)) }
          val lab = kernel(n, e, conflict)
          names.iterator.zipWithIndex.map { case (id, i) => (id, s"$comp#${lab(i)}") }
        }
      }
      .toDF("conv_id", "component")
  }

  /** Refine a coarse clustering: within each `component` (block), re-cluster
    * members by likelihood cut over the observed pair sims. Components larger
    * than `maxBlock` keep their CC assignment (logged upstream; a block that
    * big means the LSH threshold, not the cut, is the lever). Output:
    * (conv_id, component) where component = "<block>#<sub>".
    */
  def refine(
      spark: SparkSession,
      clusters: DataFrame, // (conv_id, component)
      pairs: DataFrame, // (id1, id2, jaccard)
      maxBlock: Int = 4096
  ): DataFrame =
    runPerBlock(spark, clusters, pairs, maxBlock)((n, e, _) => clusterBlock(n, e))

  /** Duplicate-node splitting + constrained clustering (G11,
    * MT_Kruskal.R:46-82,101-126 + dual_marry.py): a member listed in `dups`
    * with count n is replaced by splits `<id>_1..<id>_n`; every edge touching
    * it is replicated across the splits (both endpoints split -> cross
    * product, the same result as the reference's two sequential replication
    * passes), zero-similarity edges are added between siblings
    * (MT_Kruskal.R:71-77), and the per-block likelihood-cut clustering runs
    * under the hard constraint that siblings never share a sub-cluster.
    *
    * `dups` is a disambiguation table — rare ids only — so it broadcasts;
    * the replication is two broadcast joins + explode (map-side), and the
    * only shuffle added over `refine` is none: same two keyed joins + one
    * groupByKey. Output: (conv_id, component) over the SPLIT id namespace,
    * component = "<block>#<sub>"; blocks over `maxBlock` keep their CC label.
    * Rows with n < 2 are ignored (n=1 would only rename the id, n<=0 would
    * make `sequence` count DOWN and fabricate phantom splits).
    */
  def splitDuplicates(
      spark: SparkSession,
      clusters: DataFrame, // (conv_id, component)
      pairs: DataFrame, // (id1, id2, jaccard)
      dups: DataFrame, // (conv_id, n)
      maxBlock: Int = 4096,
      missingSim: Double = 0.2
  ): DataFrame = {
    import spark.implicits._
    val d = broadcast(
      dups.select(col("conv_id"), col("n").cast("int").as("n")).where(col("n") >= 2))

    def splitsOf(idCol: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), coalesce(col("n"), lit(1))),
        i => concat(idCol, lit("_"), i.cast("string")))

    val members = clusters
      .join(d, Seq("conv_id"), "left")
      .select(
        col("component"),
        explode(when(col("n").isNotNull, splitsOf(col("conv_id")))
          .otherwise(array(col("conv_id")))).as("conv_id"),
        when(col("n").isNotNull, col("conv_id")).as("grp"))

    val e1 = pairs
      .join(d.withColumnRenamed("conv_id", "id1"), Seq("id1"), "left")
      .select(
        explode(when(col("n").isNotNull, splitsOf(col("id1")))
          .otherwise(array(col("id1")))).as("id1"),
        col("id2"), col("jaccard"))
    val e2 = e1
      .join(d.withColumnRenamed("conv_id", "id2"), Seq("id2"), "left")
      .select(
        col("id1"),
        explode(when(col("n").isNotNull, splitsOf(col("id2")))
          .otherwise(array(col("id2")))).as("id2"),
        col("jaccard"))
    val siblings = d
      .as[(String, Int)]
      .flatMap { case (id, n) =>
        for { i <- 1 to n; j <- (i + 1) to n } yield (s"${id}_$i", s"${id}_$j", 0.0)
      }
      .toDF("id1", "id2", "jaccard")
    val allPairs = e2.unionByName(siblings)

    runPerBlock(spark, members, allPairs, maxBlock)((n, e, conflict) =>
      clusterBlock(n, e, missingSim, conflict, greedyGate = true))
  }
}
