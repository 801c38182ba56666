package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.MinHashImpl

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane (sign-LSH) bucketed variant as the scale path — at 10^9+
  * vectors the bucketed candidate join replaces the full cross product, the
  * same blocking idea the dedup pipeline applies to text.
  */
object Ann {

  /** cosine similarity of two float-array columns, computed in double */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (s, x) => s + x)
    val na = aggregate(transform(a, x => x.cast("double") * x.cast("double")), lit(0.0), (s, x) => s + x)
    val nb = aggregate(transform(b, x => x.cast("double") * x.cast("double")), lit(0.0), (s, x) => s + x)
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Exact brute-force top-k neighbors for every query vector. Queries should
    * be small (broadcast side); the corpus side streams. O(|Q| * |C|) — the
    * correctness baseline and the right choice when |Q| is small.
    * Input frames: (id, vec). Output: (query_id, neighbor_id, cos, rank).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("nv"))
    val scored = broadcast(q)
      .crossJoin(c)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Deterministic random hyperplanes: nBits x dim, N(0,1)-ish from hash. */
  private def planes(dim: Int, nBits: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(nBits) { b =>
      Array.tabulate(dim) { d =>
        // Box-Muller-free gaussian-ish: sum of 4 uniforms - 2 (Irwin-Hall)
        val u = (0 until 4).map { r =>
          java.lang.Long.remainderUnsigned(MinHashImpl.mix64(seed + b * 7919L + d * 104729L + r), 1L << 20)
            .toDouble / (1L << 20)
        }
        u.sum - 2.0
      }
    }

  /** sign-LSH bucket id per vector: nBits hyperplane signs packed to long */
  def signBucket(vec: Column, dim: Int, nBits: Int, seed: Long): Column = {
    val ps = planes(dim, nBits, seed)
    val bits = ps.zipWithIndex.map { case (p, b) =>
      val dot = aggregate(
        zip_with(vec, array(p.map(lit): _*), (x, w) => x.cast("double") * w),
        lit(0.0),
        (s, x) => s + x
      )
      when(dot >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Bucketed ANN: candidates = corpus vectors sharing the query's sign
    * bucket in ANY of `nTables` independent hash tables (multi-table sign-LSH
    * — standard recall amplification), then exact cosine + top-k over the
    * candidate set only. Approximate: recall measured against
    * bruteForceTopK in the spec.
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      dim: Int,
      k: Int,
      nBits: Int = 12,
      nTables: Int = 8,
      seed: Long = 42L
  ): DataFrame = {
    def bucketed(df: DataFrame, idCol: String): DataFrame =
      df.select(
        col("id").as(idCol),
        col("vec"),
        explode(array((0 until nTables).map(t =>
          struct(lit(t).as("table"), signBucket(col("vec"), dim, nBits, seed + t * 1000003L).as("bucket"))
        ): _*)).as("tb")
      ).select(col(idCol), col("vec"), col("tb.table"), col("tb.bucket"))

    val qb = bucketed(queries, "query_id").withColumnRenamed("vec", "qv")
    val cb = bucketed(corpus, "neighbor_id").withColumnRenamed("vec", "nv")
    val cands = qb
      .join(cb, Seq("table", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("qv"), col("neighbor_id"), col("nv"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    cands
      .withColumn("cos", cosine(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** IVF-style ANN: a KMeans coarse quantizer (seeded, deterministic)
    * partitions the corpus into nCells inverted lists; each query probes its
    * nProbe nearest centroids and brute-forces only those lists — the
    * standard billion-scale layout (IVF-Flat), expressed as two broadcast
    * joins + a windowed top-k. Returns (query_id, neighbor_id, cos, rank).
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 3,
      seed: Long = 42L
  ): DataFrame = {
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val spark = corpus.sparkSession

    val toVec = corpus.select(col("id"), col("vec"),
      array_to_vector(transform(col("vec"), x => x.cast("double"))).as("features"))
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(nCells).setSeed(seed).setFeaturesCol("features").setPredictionCol("cell")
      .fit(toVec)
    val lists = km.transform(toVec).select(col("id").as("neighbor_id"), col("vec").as("nv"), col("cell"))

    // centroid table, broadcast to score query->cell distances
    val cents = km.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
    import spark.implicits._
    val centDf = cents.toDF("cell", "centroid")
    val qCells = broadcast(queries.select(col("id").as("query_id"), col("vec").as("qv")))
      .crossJoin(broadcast(centDf))
      .withColumn("dist", aggregate(
        zip_with(col("qv"), col("centroid"), (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
        lit(0.0), (s, x) => s + x))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("cell"))
    val probes = qCells.withColumn("pr", row_number().over(wProbe)).where(col("pr") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))

    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    probes
      .join(lists, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs over one corpus: sign-LSH buckets
    * feed the same chunked pair generator idea as text dedup; exact cosine
    * gate at `threshold`. Output: (id1, id2, cos).
    */
  def nearDupPairs(
      corpus: DataFrame,
      dim: Int,
      threshold: Double,
      nBits: Int = 14,
      nTables: Int = 6,
      seed: Long = 42L
  ): DataFrame = {
    val b = corpus.select(
      col("id"),
      col("vec"),
      explode(array((0 until nTables).map(t =>
        xxhash64(lit(t), signBucket(col("vec"), dim, nBits, seed + t * 1000003L))
      ): _*)).as("bucket")
    )
    val a1 = b.select(col("bucket"), col("id").as("id1"), col("vec").as("v1"))
    val a2 = b.select(col("bucket"), col("id").as("id2"), col("vec").as("v2"))
    a1.join(a2, Seq("bucket"))
      .where(col("id1") < col("id2"))
      .dropDuplicates("id1", "id2")
      .withColumn("cos", cosine(col("v1"), col("v2")))
      .where(col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cos"))
  }
}
