package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object ContentAnchorsImpl {
  private final val B = 1000003L // polynomial rolling-hash base

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03): rolling
    * hashes of every `width`-char window, then the minimum hash of every
    * `stride` consecutive windows (monotone deque, O(n) total). Guarantee:
    * two strings sharing any substring of length >= width + stride - 1 share
    * at least one selected fingerprint — anchor positions are content-defined,
    * so alignment never depends on document offsets.
    */
  def anchors(s: UTF8String, width: Int, stride: Int): GenericArrayData = {
    val str = s.toString
    val n = str.length
    if (n < width) return new GenericArrayData(Array.empty[Long])
    val m = n - width + 1 // number of windows
    val hs = new Array[Long](m)
    // precompute B^(width-1) for the rolling update
    var pow = 1L
    var i = 0
    while (i < width - 1) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < width) { h = h * B + str.charAt(i); i += 1 }
    hs(0) = h
    i = 1
    while (i < m) {
      h = (h - str.charAt(i - 1) * pow) * B + str.charAt(i + width - 1)
      hs(i) = h
      i += 1
    }
    if (m <= stride) {
      var mn = hs(0); i = 1
      while (i < m) { if (hs(i) < mn) mn = hs(i); i += 1 }
      return new GenericArrayData(Array(mix(mn)))
    }
    // sliding-window minimum over hs with window `stride` (monotone deque of
    // indices, increasing hash values; rightmost-min tie rule)
    val sel = new Array[Long](m - stride + 1)
    var selN = 0
    val deque = new Array[Int](m)
    var head = 0; var tail = 0 // [head, tail)
    i = 0
    while (i < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      while (deque(head) <= i - stride) head += 1
      if (i >= stride - 1) {
        val v = mix(hs(deque(head)))
        // consecutive windows usually share their min; cheap run-length skip
        if (selN == 0 || sel(selN - 1) != v) { sel(selN) = v; selN += 1 }
      }
      i += 1
    }
    val trimmed = java.util.Arrays.copyOf(sel, selN)
    java.util.Arrays.sort(trimmed)
    var w = 0
    i = 0
    while (i < selN) {
      if (w == 0 || trimmed(i) != trimmed(w - 1)) { trimmed(w) = trimmed(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(trimmed, w))
  }

  /** finalize raw polynomial hashes so adversarial/low-entropy windows spread */
  private def mix(h: Long): Long = MinHashImpl.mix64(h)

  /** Positioned variant for the LCP-extension substring pass: the same
    * winnowing selection, but each selected fingerprint keeps the 0-based
    * start offset of its window, deduplicated to ONE row per anchor hash
    * (smallest offset) so a downstream explode emits at most one
    * (doc, anchor) row. Returns array<struct<anchor:long, pos:int>> sorted
    * by (anchor, pos).
    */
  def anchorPositions(s: UTF8String, width: Int, stride: Int): GenericArrayData = {
    val str = s.toString
    val n = str.length
    if (n < width) return new GenericArrayData(Array.empty[Any])
    val m = n - width + 1
    val hs = new Array[Long](m)
    var pow = 1L
    var i = 0
    while (i < width - 1) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < width) { h = h * B + str.charAt(i); i += 1 }
    hs(0) = h
    i = 1
    while (i < m) {
      h = (h - str.charAt(i - 1) * pow) * B + str.charAt(i + width - 1)
      hs(i) = h
      i += 1
    }
    val sel = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
    if (m <= stride) {
      var mnIdx = 0
      i = 1
      while (i < m) { if (hs(i) < hs(mnIdx)) mnIdx = i; i += 1 }
      sel += ((mix(hs(mnIdx)), mnIdx))
    } else {
      val deque = new Array[Int](m)
      var head = 0; var tail = 0
      var lastIdx = -1
      i = 0
      while (i < m) {
        while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
        deque(tail) = i; tail += 1
        while (deque(head) <= i - stride) head += 1
        if (i >= stride - 1 && deque(head) != lastIdx) {
          lastIdx = deque(head)
          sel += ((mix(hs(lastIdx)), lastIdx))
        }
        i += 1
      }
    }
    // one row per anchor value: smallest offset (identical content, so any
    // occurrence extends the same match)
    val sorted = sel.sortBy(identity)
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var last = Long.MinValue
    var first = true
    sorted.foreach { case (a, p) =>
      if (first || a != last) {
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](a, p))
        last = a; first = false
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** `content_anchors(string, width, stride) -> array<long>` — content-defined
  * exact-substring fingerprints; the degraded-but-guaranteed replacement for a
  * distributed suffix array (SURVEY §7.5): docs sharing a long exact substring
  * collide on an anchor and become candidate pairs.
  */
case class ContentAnchors(child: Expression, width: Int, stride: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ContentAnchorsImpl.anchors(input.asInstanceOf[UTF8String], width, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = graft.functions.ContentAnchorsImpl.anchors($c, $width, $stride);"
    )

  override protected def withNewChildInternal(newChild: Expression): ContentAnchors =
    copy(child = newChild)
}

object ContentAnchors {
  def apply(c: Column, width: Int, stride: Int): Column =
    graftbridge.column(ContentAnchors(graftbridge.expression(c), width, stride))
}

/** `anchor_positions(string, width, stride) -> array<struct<anchor,pos>>` —
  * the positioned winnowing fingerprints feeding the bounded suffix-array
  * substring pass (`ops/SubstringDup`): same selection as `content_anchors`,
  * plus each anchor's window offset so matches can be LCP-extended in situ.
  */
case class AnchorPositions(child: Expression, width: Int, stride: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("anchor", LongType, nullable = false),
      StructField("pos", IntegerType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ContentAnchorsImpl.anchorPositions(input.asInstanceOf[UTF8String], width, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = graft.functions.ContentAnchorsImpl.anchorPositions($c, $width, $stride);"
    )

  override protected def withNewChildInternal(newChild: Expression): AnchorPositions =
    copy(child = newChild)
}

object AnchorPositions {
  def apply(c: Column, width: Int, stride: Int): Column =
    graftbridge.column(AnchorPositions(graftbridge.expression(c), width, stride))
}
