package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

object SimHashImpl {
  /** Charikar SimHash over token hashes (multiplicity = weight): each of the
    * 64 bit-planes accumulates +1/-1 per token, sign gives the fingerprint
    * bit. 32-bit inputs are re-mixed to spread over all 64 planes.
    */
  def simhash64(tokenHashes: ArrayData, intElems: Boolean): Long = {
    val acc = new Array[Int](64)
    val n = tokenHashes.numElements()
    var j = 0
    while (j < n) {
      val h =
        if (intElems) MinHashImpl.mix64(tokenHashes.getInt(j).toLong)
        else tokenHashes.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** `simhash64(array<long>) -> long` — 64-bit SimHash fingerprint from token
  * hashes (with multiplicity). Hamming-ball retrieval pairs with 16-bit chunk
  * banding (4 chunks find all pairs at Hamming distance <= 3 by pigeonhole).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  private def intElems: Boolean = child.dataType match {
    case ArrayType(IntegerType, _) => true
    case _                         => false
  }

  override def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash64(input.asInstanceOf[ArrayData], intElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.SimHashImpl.simhash64($c, $intElems);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def apply(c: Column): Column = graftbridge.column(SimHash64(graftbridge.expression(c)))
}
