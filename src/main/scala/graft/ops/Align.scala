package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
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
  * Scale shape: two range-partitioned total sorts + `zipWithIndex` (one
  * extra tiny job per side to count per-partition offsets — the standard
  * public pattern; `monotonically_increasing_id` is NOT dense and a
  * `row_number()` over a global window is a single-partition bottleneck) +
  * one shuffle join on the index. Everything stays distributed; no driver
  * materialization.
  *
  * The ordering columns must make each side's order total (unique keys),
  * otherwise the alignment is tie-ambiguous; that contract is the caller's,
  * exactly as the reference's silent reliance on file row order was.
  */
object Align {

  /** Attach a dense 0-based `indexCol` to `df` under the total order given
    * by `order`.
    */
  def withRowIndex(df: DataFrame, order: Seq[Column], indexCol: String = "rn"): DataFrame = {
    val sorted = df.orderBy(order: _*)
    val schema = sorted.schema
    val rdd = sorted.rdd.zipWithIndex().map { case (row, i) => Row.fromSeq(row.toSeq :+ i) }
    df.sparkSession.createDataFrame(
      rdd,
      schema.add(StructField(indexCol, LongType, nullable = false)))
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
