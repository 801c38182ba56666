package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-block all-pairs shortest-path features — the reference's
  * similarity-graph distance features (shortpath.py:44-77: edge weight
  * 1/sim for sim>0, Dijkstra all-pairs, feature 1/dist else 0; unweighted
  * variant short_path.R:65-85 with coau_dist = 2/dist). Blocks are the
  * connected components of the verified-pair graph, which are small after
  * LSH blocking, so each block's Dijkstra runs in-memory inside
  * `flatMapGroups` (SURVEY §2.9 G6/G7 — distributed APSP is a non-goal).
  */
object GraphFeatures {

  /** Dijkstra from every node (binary-heap, O(V E log V) per block). */
  private def allPairs(n: Int, adj: Array[List[(Int, Double)]]): Array[Array[Double]] = {
    val out = Array.fill(n)(Array.fill(n)(Double.PositiveInfinity))
    var s = 0
    while (s < n) {
      val dist = out(s)
      dist(s) = 0.0
      val pq = new java.util.PriorityQueue[(Double, Int)](11, Ordering.by[(Double, Int), Double](_._1))
      pq.add((0.0, s))
      while (!pq.isEmpty) {
        val (d, u) = pq.poll()
        if (d <= dist(u)) {
          adj(u).foreach { case (v, w) =>
            if (d + w < dist(v)) { dist(v) = d + w; pq.add((d + w, v)) }
          }
        }
      }
      s += 1
    }
    out
  }

  /** For each within-block pair (observed or not): shortest-path feature
    * `featureNumerator/dist`, 0 when disconnected. Two modes matching the
    * reference's two variants, selected per call:
    *   - weighted (default): edge weight `1/sim` over `weightCol`, feature
    *     `1/dist` (shortpath.py:48,75); the Makefile runs one such pass per
    *     similarity field (Makefile:136-159) — that parameterization is
    *     `weightCol`;
    *   - `unweighted = true`: every edge costs 1 (hop count), feature
    *     `2/dist` with `featureNumerator = 2` (short_path.R:65-85
    *     `coau_dist`; its `coau_dummy` indicator is `feature == 1`).
    * Emits all C(n,2) pairs per block (the reference emits the full pair
    * matrix per name) — callers cap block size upstream.
    * clusters: (conv_id, component); pairs: (id1, id2, <weightCol>).
    * Output: (id1, id2, sp_feature).
    */
  def shortestPathFeatures(
      spark: SparkSession,
      clusters: DataFrame,
      pairs: DataFrame,
      maxBlock: Int = 512,
      weightCol: String = "jaccard",
      unweighted: Boolean = false,
      featureNumerator: Double = 1.0
  ): DataFrame = {
    import spark.implicits._
    val c1 = clusters.select(col("conv_id").as("id1"), col("component"))
    val withComp = pairs.join(c1, "id1")
      .select(col("component"), col("id1"), col("id2"), col(weightCol).as("sim"))
    val rows = clusters
      .select(col("component"), col("conv_id"), lit(null).cast("string").as("id2"), lit(0.0).as("sim"))
      .unionByName(withComp.select(col("component"), col("id1").as("conv_id"), col("id2"), col("sim")))

    rows
      .as[(String, String, Option[String], Double)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val ids = scala.collection.mutable.LinkedHashMap[String, Int]()
        val edges = scala.collection.mutable.ArrayBuffer[(String, String, Double)]()
        it.foreach {
          case (_, a, None, _) => ids.getOrElseUpdate(a, ids.size)
          case (_, a, Some(b), s) =>
            ids.getOrElseUpdate(a, ids.size); ids.getOrElseUpdate(b, ids.size)
            if (s > 0) edges += ((a, b, s))
        }
        val n = ids.size
        if (n < 2 || n > maxBlock) Iterator.empty
        else {
          val adj = Array.fill(n)(List.empty[(Int, Double)])
          edges.foreach { case (a, b, s) =>
            val (i, j) = (ids(a), ids(b))
            val w = if (unweighted) 1.0 else 1.0 / s
            adj(i) = (j, w) :: adj(i)
            adj(j) = (i, w) :: adj(j)
          }
          val dist = allPairs(n, adj)
          val names = ids.keys.toArray
          for {
            i <- Iterator.range(0, n)
            j <- Iterator.range(i + 1, n)
          } yield {
            val d = dist(i)(j)
            val f = if (d.isInfinity || d == 0.0) 0.0 else featureNumerator / d
            if (names(i) < names(j)) (names(i), names(j), f) else (names(j), names(i), f)
          }
        }
      }
      .toDF("id1", "id2", "sp_feature")
  }

  /** Same-component indicator per candidate pair (G8,
    * shortpath_feature.py:63-70 / subgraph.py:63-72 binary variant): joins
    * each pair's endpoints to their component labels; 1 when both sides land
    * in the same component, 0 otherwise (including endpoints absent from the
    * clustering — no component, no connection). Two keyed joins, any scale.
    * pairs: (id1, id2); clusters: (conv_id, component).
    * Output: (id1, id2, same_component).
    */
  def sameComponentFeature(pairs: DataFrame, clusters: DataFrame): DataFrame =
    pairs
      .join(clusters.select(col("conv_id").as("id1"), col("component").as("c1")), Seq("id1"), "left_outer")
      .join(clusters.select(col("conv_id").as("id2"), col("component").as("c2")), Seq("id2"), "left_outer")
      .select(
        col("id1"),
        col("id2"),
        // explicit when: SQL three-valued logic turns (non-null === null)
        // into NULL, not false
        when(col("c1").isNotNull && col("c2").isNotNull && col("c1") === col("c2"), 1)
          .otherwise(0).as("same_component")
      )

  /** Shared-key adjacency (G3, coauthor adjacency — coauthor_glue.R:32-39,
    * short_path.R:27-28,45-50): entities are adjacent iff they share a key
    * whose global frequency lies in [minKeyCount, maxKeyCount] — the
    * reference keeps coauthors seen more than once but fewer than 4 times
    * (`1 < count < 4`), dropping both noise keys and uninformative hubs.
    * A self equi-join on the key with the frequency filter pushed BEFORE the
    * join (predicate-before-expansion, SURVEY §4); the hub cap doubles as
    * the skew guard. members: (id, key). Output: (key, id1, id2) distinct,
    * id1 < id2.
    */
  def sharedKeyAdjacency(
      members: DataFrame,
      minKeyCount: Long = 2,
      maxKeyCount: Long = 3
  ): DataFrame = {
    val m = members.select(col("id"), col("key")).distinct()
    val keep = m.groupBy(col("key")).agg(count(lit(1)).as("kc"))
      .where(col("kc") >= minKeyCount && col("kc") <= maxKeyCount)
      .select(col("key"))
    val filtered = m.join(keep, Seq("key"))
    filtered.select(col("key"), col("id").as("id1"))
      .join(filtered.select(col("key"), col("id").as("id2")), Seq("key"))
      .where(col("id1") < col("id2"))
      .distinct()
  }
}
