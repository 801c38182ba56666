package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-block affinity-propagation clustering — the re-expression of the
  * reference's exploratory AP path (ap_cluster.R:24-39: per-name dense
  * similarity matrix -> `apcluster` -> exemplar assignment lists), previously
  * a SURVEY §2.9 G10 non-goal, now implemented with the same distributed
  * skeleton as the likelihood-cut refinement (BlockClustering.refine): blocks
  * are small after LSH blocking, so the message-passing iteration is
  * in-memory Scala per block inside `groupByKey.flatMapGroups`, and the
  * distributed work is exactly one keyed shuffle of (block, edges).
  *
  * The kernel is the published Frey–Dueck update (Science 315, 2007):
  *   r(i,k) <- s(i,k) - max_{k'!=k} [a(i,k') + s(i,k')]
  *   a(i,k) <- min(0, r(k,k) + sum_{i' not in {i,k}} max(0, r(i',k)))   i!=k
  *   a(k,k) <- sum_{i'!=k} max(0, r(i',k))
  * with damping, run to exemplar-set stability. Defaults follow the R
  * `apcluster` package the reference calls: damping 0.9 and the input
  * preference (the s(k,k) diagonal) at the median of the off-diagonal
  * similarities. Unobserved pairs (non-colliding under LSH — the reference's
  * classifier scores every pair, we only observe candidates) enter the dense
  * matrix at `missingSim`, the same pessimistic-fill convention as
  * BlockClustering.clusterBlock.
  *
  * Everything is deterministic: the matrix is a pure function of the block's
  * content after member/edge canonicalization, iteration count is
  * data-driven but order-free, and every argmax breaks ties toward the
  * lowest member index.
  */
object AffinityPropagation {

  /** ids 0..nIds-1; edges (i, j, sim) with i != j. Returns per-member
    * cluster labels, 0-based, numbered by ascending exemplar index.
    */
  def apBlock(
      nIds: Int,
      edges: Array[(Int, Int, Double)],
      missingSim: Double = 0.0,
      damping: Double = 0.9,
      maxIter: Int = 500,
      convIter: Int = 30,
      preference: Option[Double] = None
  ): Array[Int] = {
    val n = nIds
    if (n <= 1) return Array.fill(n)(0)
    val S = Array.fill(n * n)(missingSim)
    edges.foreach { case (i, j, s) => S(i * n + j) = s; S(j * n + i) = s }

    // preference = median of the full off-diagonal multiset (observed sims +
    // fills) — apcluster's q=0.5 default over the complete matrix the
    // reference feeds it
    val p = preference.getOrElse {
      val off = new Array[Double](n * (n - 1))
      var t = 0
      var i = 0
      while (i < n) {
        var j = 0
        while (j < n) { if (i != j) { off(t) = S(i * n + j); t += 1 }; j += 1 }
        i += 1
      }
      java.util.Arrays.sort(off)
      if (off.length % 2 == 1) off(off.length / 2)
      else (off(off.length / 2 - 1) + off(off.length / 2)) / 2.0
    }
    var d = 0
    while (d < n) { S(d * n + d) = p; d += 1 }

    // deterministic symmetry-breaking jitter (the degeneracy fix both R
    // apcluster's addNoise and sklearn apply): perfectly symmetric blocks
    // otherwise stalemate the messages and no exemplar emerges. Hash-derived
    // -> labels stay a pure function of (n, edges, params); 1e-6 of the value
    // range cannot flip any non-degenerate decision.
    var lo = Double.MaxValue
    var hi = Double.MinValue
    S.foreach { v => if (v < lo) lo = v; if (v > hi) hi = v }
    val scale = 1e-6 * math.max(hi - lo, 1e-6)
    var ji = 0
    while (ji < n) {
      var jj = ji
      while (jj < n) {
        val u = java.lang.Long
          .remainderUnsigned(graft.functions.MinHashImpl.mix64(ji.toLong * n + jj + 1), 1L << 20)
          .toDouble / (1L << 20)
        S(ji * n + jj) += scale * u
        if (jj != ji) S(jj * n + ji) += scale * u
        jj += 1
      }
      ji += 1
    }

    val R = new Array[Double](n * n)
    val A = new Array[Double](n * n)
    var exemplars = new java.util.BitSet(n)
    var stable = 0
    var iter = 0
    while (iter < maxIter && stable < convIter) {
      // responsibilities: per row, max + runner-up of a+s
      var i = 0
      while (i < n) {
        var m1 = Double.NegativeInfinity
        var m2 = Double.NegativeInfinity
        var am = -1
        var k = 0
        while (k < n) {
          val v = A(i * n + k) + S(i * n + k)
          if (v > m1) { m2 = m1; m1 = v; am = k } else if (v > m2) { m2 = v }
          k += 1
        }
        k = 0
        while (k < n) {
          val excl = if (k == am) m2 else m1
          R(i * n + k) = damping * R(i * n + k) + (1 - damping) * (S(i * n + k) - excl)
          k += 1
        }
        i += 1
      }
      // availabilities: per column, sum of positive responsibilities
      var k = 0
      while (k < n) {
        var sum = 0.0
        i = 0
        while (i < n) { if (i != k) sum += math.max(0.0, R(i * n + k)); i += 1 }
        i = 0
        while (i < n) {
          if (i != k) {
            val v = math.min(0.0, R(k * n + k) + sum - math.max(0.0, R(i * n + k)))
            A(i * n + k) = damping * A(i * n + k) + (1 - damping) * v
          }
          i += 1
        }
        A(k * n + k) = damping * A(k * n + k) + (1 - damping) * sum
        k += 1
      }
      // exemplar set: k with a(k,k)+r(k,k) > 0; stability counts convergence
      val e = new java.util.BitSet(n)
      k = 0
      while (k < n) { if (A(k * n + k) + R(k * n + k) > 0) e.set(k); k += 1 }
      if (e.equals(exemplars) && !e.isEmpty) stable += 1
      else { stable = 0; exemplars = e }
      iter += 1
    }

    if (exemplars.isEmpty) return Array.fill(n)(0) // degenerate: one cluster

    val exArr = exemplars.stream().toArray
    val label = new Array[Int](n)
    var i = 0
    while (i < n) {
      if (exemplars.get(i)) {
        label(i) = java.util.Arrays.binarySearch(exArr, i)
      } else {
        // assign to the most similar exemplar; ties -> lowest exemplar index
        var best = 0
        var bs = Double.NegativeInfinity
        var e = 0
        while (e < exArr.length) {
          val v = S(i * n + exArr(e))
          if (v > bs) { bs = v; best = e }
          e += 1
        }
        label(i) = best
      }
      i += 1
    }
    label
  }

  /** Re-cluster each `component` (block) of a coarse clustering by affinity
    * propagation over the observed pair similarities — the AP counterpart of
    * BlockClustering.refine, same plan shape: two keyed joins to attach
    * blocks to pairs, one groupByKey shuffle, per-block in-memory kernel.
    * Blocks larger than `maxBlock` keep their CC assignment (the dense
    * matrix is O(block²); at 100 TB the block-size cap is the LSH threshold's
    * job, exactly as for the likelihood cut). Output: (conv_id, component)
    * with component = "<block>#<sub>".
    *
    * Default preference = `missingSim`, not the kernel's median: near-dup
    * blocks are observed near-cliques of HIGH sims, where the median sits at
    * the similarity level and AP's exemplar count is undetermined — an
    * exemplar's self-preference should cost the uninformative-pair level,
    * which is exactly what `missingSim` encodes.
    */
  def cluster(
      spark: SparkSession,
      clusters: DataFrame, // (conv_id, component)
      pairs: DataFrame, // (id1, id2, jaccard)
      maxBlock: Int = 2048,
      missingSim: Double = 0.0,
      damping: Double = 0.9,
      preference: Option[Double] = None
  ): DataFrame =
    BlockClustering.runPerBlock(spark, clusters, pairs, maxBlock)((n, e, _) =>
      apBlock(n, e, missingSim, damping, preference = preference.orElse(Some(missingSim))))
}
