package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** Static kernel shared by interpreted eval and generated code. */
object CentroidDistancesImpl {
  final val ElemLong = 0
  final val ElemDouble = 1
  final val ElemFloat = 2
  final val ElemInt = 3

  /** Squared euclidean distance from `vec` to each of `nCells` centroids
    * (flattened row-major cell-then-dim). Per cell the sum runs in
    * ascending element order from 0.0 — the same left fold (same IEEE
    * rounding) as the `aggregate(zip_with(vec, array(lit...)))` column
    * composition this replaces, so distances are bit-identical.
    */
  def sqDists(vec: ArrayData, flat: Array[Double], nCells: Int, elemType: Int): ArrayData = {
    val dim = flat.length / nCells
    val n = math.min(vec.numElements(), dim)
    val out = new Array[Double](nCells)
    var c = 0
    while (c < nCells) {
      val off = c * dim
      var s = 0.0
      var d = 0
      while (d < n) {
        val x = elemType match {
          case ElemLong   => vec.getLong(d).toDouble
          case ElemDouble => vec.getDouble(d)
          case ElemFloat  => vec.getFloat(d).toDouble
          case _          => vec.getInt(d).toDouble
        }
        val diff = x - flat(off + d)
        s += diff * diff
        d += 1
      }
      out(c) = s
      c += 1
    }
    new GenericArrayData(out)
  }
}

/** `centroid_sq_distances(array<numeric>) -> array<double>` — the IVF coarse
  * quantizer's distance row as a native codegen'd expression: one pass over
  * the vector per centroid in a tight JVM loop. Replaces a per-cell
  * `aggregate(zip_with(vec, array(lit...)))` HOF composition that fell off
  * whole-stage codegen and re-evaluated nCells interpreted lambda folds
  * (plus nCells x dim literal array constructions) per row. Centroids are
  * runtime-trained values, carried as a Seq so the case class keeps
  * structural equality for Catalyst tree comparisons.
  */
case class CentroidSqDistances(child: Expression, flatCentroids: Seq[Double], nCells: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val flat: Array[Double] = flatCentroids.toArray

  private def elemType: Int = child.dataType match {
    case ArrayType(LongType, _)   => CentroidDistancesImpl.ElemLong
    case ArrayType(DoubleType, _) => CentroidDistancesImpl.ElemDouble
    case ArrayType(FloatType, _)  => CentroidDistancesImpl.ElemFloat
    case _                        => CentroidDistancesImpl.ElemInt
  }

  override def nullSafeEval(input: Any): Any =
    CentroidDistancesImpl.sqDists(input.asInstanceOf[ArrayData], flat, nCells, elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidsFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CentroidDistancesImpl.sqDists($c, $ref, $nCells, $elemType);")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidSqDistances =
    copy(child = newChild)
}

object CentroidSqDistances {
  def apply(c: Column, centroids: Array[Array[Double]]): Column =
    graftbridge.column(
      CentroidSqDistances(graftbridge.expression(c), centroids.flatten.toSeq, centroids.length))
}
