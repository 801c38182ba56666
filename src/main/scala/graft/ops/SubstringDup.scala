package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{AnchorPositions, MinHashImpl}

/** Exact long-substring duplicate pass — the bounded distributed
  * suffix-array variant SURVEY §7.5 step 5 prescribes ("sorted w-gram
  * anchors -> repartition + LCP extension"), completing the north-star's
  * MinHash / SimHash / suffix-array-substring triple. The degraded fallback
  * (anchor-equality candidacy via `content_anchors`) shipped in round 1;
  * this operator reports the actual shared-substring LENGTH per pair.
  *
  * A suffix array clusters suffixes by common prefix and reads match
  * lengths off the LCP array; materializing O(total-chars) suffixes of a
  * 100 TB corpus is the part that does not scale. The bounded equivalent:
  *   1. winnowed anchor positions per doc (codegen'd `anchor_positions`,
  *      density ~2/stride, one row per distinct anchor hash per doc) — the
  *      sampled suffix starts;
  *   2. each anchor row carries a BOUNDED context slice
  *      (`maxExtend + width + maxExtend` chars around the window) — the
  *      suffix prefix a real suffix array would compare, truncated;
  *   3. one hash shuffle groups equal w-grams (the suffix-array "runs of
  *      equal prefix"), hot anchors (boilerplate) deterministically thinned
  *      to `anchorCap` members; within a group, cross-doc pairs verify the
  *      literal w-gram (rolling-hash collision guard) and LCP-extend left +
  *      right inside the contexts;
  *   4. per-pair max over anchors, filtered to `minLen`.
  *
  * Guarantees: any two docs sharing a substring of length >=
  * `width + stride - 1` share a winnowed anchor inside it (the winnowing
  * guarantee), so the pair is emitted with `longest_match` >= `width`;
  * the reported length never exceeds the true longest common substring
  * (every reported char was compared), and equals it whenever the true
  * match extends at most `maxExtend` beyond the anchor window on each
  * side. Shuffle volume is O(anchors x context), NOT O(corpus²) — the
  * 100 TB shape is identical to the LSH candidate pass.
  */
object SubstringDup {

  def sharedSubstrings(
      docs: DataFrame, // (id, text)
      width: Int = 24,
      stride: Int = 16,
      maxExtend: Int = 200,
      minLen: Int = 40,
      anchorCap: Int = 64
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val anchored = docs
      .select(col("id").cast("string").as("id"), col("text"))
      .select($"id", $"text", explode(AnchorPositions($"text", width, stride)).as("a"))
      .select($"id", $"a.anchor".as("anchor"), $"a.pos".as("pos"),
        greatest($"a.pos" - maxExtend, lit(0)).as("start"), $"text")
      // bounded context slice + the anchor's offset inside it (substring is
      // 1-based SQL); everything up to here is map-side codegen
      .select(
        $"anchor",
        $"id",
        ($"pos" - $"start").cast("int").as("off"),
        expr(s"substring(text, start + 1, pos - start + ${width + maxExtend})").as("ctx"))

    anchored
      .as[(Long, String, Int, String)]
      .groupByKey(_._1)
      .flatMapGroups { (anchor, it) =>
        // canonical member order (group iterators arrive in partition order);
        // anchor_positions emits one row per (doc, anchor), so members are
        // distinct docs
        val rows = it.toArray.map { case (_, id, off, ctx) => (id, off, ctx) }
          .sortBy(r => (r._1, r._2))
        // deterministic hot-anchor thinning, same discipline as the LSH
        // bucket caps: boilerplate anchors keep a hash-chosen subset
        val kept =
          if (rows.length <= anchorCap) rows
          else rows
            .sortBy(r => (MinHashImpl.mix64(anchor ^ r._1.hashCode.toLong), r._1))
            .take(anchorCap)
            .sortBy(r => (r._1, r._2))
        val out = scala.collection.mutable.ArrayBuffer[(String, String, Int)]()
        var i = 0
        while (i < kept.length) {
          val (ida, offa, ca) = kept(i)
          var j = i + 1
          while (j < kept.length) {
            val (idb, offb, cb) = kept(j)
            if (ca.regionMatches(offa, cb, offb, width)) {
              var l = 0
              while (offa - l - 1 >= 0 && offb - l - 1 >= 0 &&
                ca.charAt(offa - l - 1) == cb.charAt(offb - l - 1)) l += 1
              var r = 0
              while (offa + width + r < ca.length && offb + width + r < cb.length &&
                ca.charAt(offa + width + r) == cb.charAt(offb + width + r)) r += 1
              val len = l + width + r
              val (x, y) = if (ida < idb) (ida, idb) else (idb, ida)
              out += ((x, y, len))
            }
            j += 1
          }
          i += 1
        }
        out.iterator
      }
      .toDF("id1", "id2", "len")
      .groupBy($"id1", $"id2")
      .agg(max($"len").as("longest_match"))
      .where($"longest_match" >= minLen)
  }
}
