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
    */
  def clusterBlock(
      nIds: Int,
      edges: Array[(Int, Int, Double)],
      missingSim: Double = 0.2
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

    sorted.foreach { case (i, j, _) =>
      val ri = find(i)
      val rj = find(j)
      if (ri != rj) {
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
        merges += ((ri, rj))
        mergeGain += delta
        parent(small) = big
        members(big) ++= members(small)
        members(small).clear()
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
  ): DataFrame = {
    import spark.implicits._
    // attach both endpoints' blocks; only within-block pairs refine (pairs
    // crossing blocks would double-assign a member)
    val c1 = clusters.select(col("conv_id").as("id1"), col("component"))
    val c2 = clusters.select(col("conv_id").as("id2"), col("component").as("component2"))
    val withComp = pairs
      .join(c1, "id1")
      .join(c2, "id2")
      .where(col("component") === col("component2"))
      .select(col("component"), col("id1"), col("id2"), col("jaccard"))
    val blockRows = clusters
      .select(col("component"), col("conv_id"), lit(null).cast("string").as("id2"), lit(0.0).as("jaccard"))
      .unionByName(withComp.select(col("component"), col("id1").as("conv_id"), col("id2"), col("jaccard")))

    blockRows
      .as[(String, String, Option[String], Double)]
      .groupByKey(_._1)
      .flatMapGroups { (comp, it) =>
        val seen = scala.collection.mutable.HashSet[String]()
        val edges = scala.collection.mutable.ArrayBuffer[(String, String, Double)]()
        it.foreach {
          case (_, a, None, _) => seen += a
          case (_, a, Some(b), s) =>
            seen += a; seen += b
            edges += ((a, b, s))
        }
        // canonicalize BEFORE indexing: group iterators arrive in partition
        // order, so member indices and same-sim merge order would otherwise
        // vary run to run — sort members lexicographically and edges by
        // (sim desc, id1, id2) for a labeling that is a pure function of the
        // block's content (the golden-oracle determinism requirement)
        val names = seen.toArray.sorted
        val ids = names.zipWithIndex.toMap
        val n = names.length
        if (n <= 1 || n > maxBlock || edges.isEmpty) {
          names.iterator.map(id => (id, comp))
        } else {
          val e = edges.map { case (a, b, s) => (ids(a), ids(b), s) }.toArray
            .sortBy { case (i, j, s) => (-s, math.min(i, j), math.max(i, j)) }
          val lab = clusterBlock(n, e)
          names.iterator.zipWithIndex.map { case (id, i) => (id, s"$comp#${lab(i)}") }
        }
      }
      .toDF("conv_id", "component")
  }
}
