package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{LongType, StructField}

/** Positional zip-join (J8) — the reference row-aligns frames purely by file
  * order: `similarity vector cbind id_pairs` (MT_Kruskal.R:32-42,
  * likelihood.R:19-22, ap_cluster.R:16). SURVEY §1.4 replaced every such
  * alignment in the pipeline with keyed joins — positional identity does not
  * survive a shuffle — but the operator itself is implementable with an
  * EXPLICIT ordering contract, which is what this is: each side is totally
  * ordered by its own key columns, assigned a dense 0-based row index, and
  * the sides are inner-equi-joined on that index (shorter side truncates,
  * like R's cbind recycling disabled).
  *
  * Scale shape: per side, one range-partitioned total sort (checkpointed so the
  * count pass and the index pass see identical partition boundaries), one
  * tiny per-partition count job (P longs to the driver), and a typed
  * `mapPartitions` that adds each partition's running offset — the standard
  * public dense-index pattern, Dataset/Encoder end to end (no RDD API;
  * `monotonically_increasing_id` is NOT dense and a `row_number()` over a
  * global window is a single-partition bottleneck) + one shuffle join on the
  * index. Everything stays distributed; no driver materialization.
  *
  * The ordering columns must make each side's order total (unique keys),
  * otherwise the alignment is tie-ambiguous; that contract is the caller's,
  * exactly as the reference's silent reliance on file row order was.
  */
object Align {

  /** Attach a dense 0-based `indexCol` to `df` under the total order given
    * by `order`. The sorted frame is locally checkpointed (eager) so the
    * per-partition count pass and the offset-adding pass are guaranteed the
    * same range-partition boundaries — recomputing the sort in two separate
    * actions would re-sample the range partitioner. A localCheckpoint
    * instead of persist(): checkpoint blocks are reference-tracked and
    * GC-cleaned when the returned frame is dropped, while an unpersisted
    * cache entry would pin both sides' sorted copies in the CacheManager
    * for the session's lifetime (one leak per zipJoin call). Tradeoff:
    * localCheckpoint truncates lineage, so on a multi-executor cluster a
    * lost executor fails the job instead of recomputing — acceptable here
    * because the operator is a correctness bridge for reference parity, not
    * a 100 TB path (SURVEY §2.3 J8); callers needing executor-loss
    * resilience should set a reliable checkpoint dir and use checkpoint().
    *
    * Partition identity travels IN THE DATA: `spark_partition_id()` is baked
    * into the cached rows at cache build (when the stage partitioning is the
    * sort's own), and the offset pass keys on that column value per row. A
    * `TaskContext.getPartitionId()` lookup would be wrong under any
    * downstream stage-fusing plan change — e.g. a caller's `coalesce(1)`
    * before a write pulls this map into one task whose runtime partition id
    * is 0 for every parent partition (the exact bug j01's oracle caught);
    * the row-carried id is invariant to such narrow rearrangements because
    * they preserve per-parent-partition row order.
    */
  def withRowIndex(df: DataFrame, order: Seq[Column], indexCol: String = "rn"): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, spark_partition_id}
    val pidCol = "__graft_zip_pid"
    val sorted = df.orderBy(order: _*)
      .withColumn(pidCol, spark_partition_id())
      .localCheckpoint() // eager: pins rows AND partition boundaries now
    val pidIdx = sorted.schema.fieldIndex(pidCol)
    val outSchema = org.apache.spark.sql.types.StructType(
      sorted.schema.filterNot(_.name == pidCol))
      .add(StructField(indexCol, LongType, nullable = false))
    // tiny job: (pid, rows) per partition over the checkpointed blocks, so
    // the pid values are pinned under the sort's own partitioning
    val counts = sorted.groupBy(col(pidCol)).agg(count(org.apache.spark.sql.functions.lit(1)))
      .as[(Int, Long)](Encoders.product[(Int, Long)])
      .collect()
      .sortBy(_._1)
    val offsets: Map[Int, Long] =
      counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _)).toMap
    val bc = df.sparkSession.sparkContext.broadcast(offsets)
    sorted.mapPartitions { it =>
      // a coalesced task computes each parent partition separately (or
      // concatenated — either way the row-carried pid flags the switch)
      var cur = Int.MinValue
      var i = 0L
      it.map { row =>
        val pid = row.getInt(pidIdx)
        if (pid != cur) { cur = pid; i = bc.value(pid) }
        val vals = row.toSeq.patch(pidIdx, Nil, 1) :+ i
        i += 1
        Row.fromSeq(vals)
      }
    }(Encoders.row(outSchema))
  }

  /** Zip-join: row i of `left` (under `leftOrder`) joined to row i of
    * `right` (under `rightOrder`); output carries `indexCol` plus both
    * sides' columns, truncated to the shorter side. Column names must be
    * disjoint across the sides.
    */
  def zipJoin(
      left: DataFrame,
      right: DataFrame,
      leftOrder: Seq[Column],
      rightOrder: Seq[Column],
      indexCol: String = "rn"
  ): DataFrame = {
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"zipJoin requires disjoint column names; both sides have: ${dup.mkString(", ")}")
    val clash = (left.columns ++ right.columns).filter(_ == indexCol)
    require(clash.isEmpty,
      s"zipJoin index column '$indexCol' already exists in an input; pass a different indexCol")
    withRowIndex(left, leftOrder, indexCol)
      .join(withRowIndex(right, rightOrder, indexCol), Seq(indexCol), "inner")
  }
}
