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

  /** As-of join — for each left row, the single right row sharing its join
    * key with the greatest event time strictly before (default) or at/before
    * (`inclusive = true`) the left row's. The standard time-series
    * enrichment join (attribute each outcome to the latest preceding
    * reference event) that Spark has no native operator for.
    *
    * Composed Spark-first as ONE keyed window pass instead of any join:
    * tag both sides, union them, sort each key group by
    * (ts, side-tag, rightTie…), carry the last right-side payload seen with
    * `last(..., ignoreNulls)` over a rows-frame, and keep the left rows.
    * That is a single hash shuffle on `keys` with a local sort — no range
    * join, no per-key explosion (the naive equi-join + `ts` filter + argmax
    * is quadratic in a hot key's row count; this is linear), AQE-splittable
    * on skewed keys like any keyed window.
    *
    * Determinism: right rows tied on `tsCol` within a key are resolved by
    * the caller's `rightTie` columns (last in ascending tie order wins);
    * pass tie columns that make the right side's order total or the pick
    * among exact-ts ties is plan-dependent. Left rows with a null `tsCol`
    * match nothing (null event time cannot be "after" anything); right rows
    * with a null `tsCol` are dropped for the same reason — nulls-first
    * ordering would otherwise leak them into every match. Null JOIN keys
    * follow equi-join semantics, not window-partition semantics: a
    * null-keyed right row is dropped and a null-keyed left row comes back
    * unmatched (null never equals null). Output: all left
    * columns plus `matchedCol`, a nullable struct of ALL right columns
    * (null = no admissible right row).
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      rightTie: Seq[String] = Nil,
      matchedCol: String = "matched",
      inclusive: Boolean = false
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NOT functions._ — functions.left/right would shadow the parameters
    import org.apache.spark.sql.functions.{col, last, lit, struct}
    require(keys.nonEmpty, "asOfJoin needs at least one join key column")
    require(!left.columns.contains(matchedCol),
      s"asOfJoin output column '$matchedCol' already exists in the left side")
    val tagCol = "__graft_asof_tag"
    val tieCols = rightTie.indices.map(i => s"__graft_asof_tie$i")
    // internal scratch names must not collide with caller columns, or the
    // union below builds a duplicate-name select instead of a clear error
    val scratch = (tagCol +: tieCols).toSet
    val scratchClash = (left.columns ++ right.columns).filter(scratch.contains).distinct
    require(scratchClash.isEmpty,
      s"asOfJoin reserves internal column names ${scratch.mkString(", ")}; " +
        s"rename the conflicting input column(s): ${scratchClash.mkString(", ")}")
    // at equal ts a right row is admissible only under inclusive semantics:
    // sort it before the left row (tag 0) when inclusive, after (tag 1) when
    // strict — the rows-frame then includes/excludes it automatically
    val (leftTag, rightTag) = if (inclusive) (1, 0) else (0, 1)
    val payload = struct(right.columns.toSeq.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType
    val leftRest = left.columns.filterNot(keys.contains)
    val lpart = left.select(
      keys.map(col) ++
        leftRest.map(col) ++
        Seq(lit(leftTag).as(tagCol), lit(null).cast(payloadType).as(matchedCol)) ++
        rightTie.zip(tieCols).map { case (src, alias) =>
          lit(null).cast(right.schema(src).dataType).as(alias)
        }: _*)
    // null-keyed reference rows are dropped like null-ts ones: a window's
    // partitionBy groups null keys together, which would "match" null to
    // null — no SQL as-of/equi-join does that. Null-keyed probe rows then
    // sit in a reference-free partition and come back unmatched.
    val rightKeyed = keys.map(col(_).isNotNull).reduce(_ && _)
    val rpart = right.where(col(tsCol).isNotNull && rightKeyed).select(
      keys.map(col) ++
        leftRest.map { c =>
          val f = if (c == tsCol) col(tsCol) else lit(null).cast(left.schema(c).dataType)
          f.as(c)
        } ++
        Seq(lit(rightTag).as(tagCol), payload.as(matchedCol)) ++
        rightTie.zip(tieCols).map { case (src, alias) => col(src).as(alias) }: _*)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy((Seq(col(tsCol).asc, col(tagCol).asc) ++ tieCols.map(col(_).asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lpart.unionByName(rpart)
      .withColumn(matchedCol, last(col(matchedCol), ignoreNulls = true).over(w))
      .where(col(tagCol) === leftTag)
      .select(left.columns.toSeq.map(col) :+ col(matchedCol): _*)
  }
}
