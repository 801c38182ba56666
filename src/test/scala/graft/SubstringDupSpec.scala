package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SubstringDup

/** Bounded suffix-array substring pass vs a brute-force longest-common-
  * substring oracle (O(n·m) DP — test-only reimplementation, nothing shared
  * with the operator).
  */
class SubstringDupSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "substringdup-spec")
  import spark.implicits._

  private def lcs(a: String, b: String): Int = {
    val dp = new Array[Int](b.length + 1)
    var best = 0
    var i = 1
    while (i <= a.length) {
      var prev = 0
      var j = 1
      while (j <= b.length) {
        val cur = dp(j)
        dp(j) = if (a.charAt(i - 1) == b.charAt(j - 1)) prev + 1 else 0
        if (dp(j) > best) best = dp(j)
        prev = cur
        j += 1
      }
      i += 1
    }
    best
  }

  private val rnd = new scala.util.Random(42)
  private def randStr(n: Int): String =
    (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString

  // 12 random docs; planted shared blocks at DIFFERENT offsets:
  // docs 0/1 share 120 chars, docs 2/3 share 60 chars
  private lazy val corpus: Seq[(String, String)] = {
    val block120 = randStr(120)
    val block60 = randStr(60)
    val base = (0 until 12).map(i => randStr(250 + 10 * i))
    base.zipWithIndex.map { case (t, i) =>
      val text = i match {
        case 0 => t.substring(0, 40) + block120 + t.substring(40)
        case 1 => t.substring(0, 170) + block120 + t.substring(170)
        case 2 => block60 + t
        case 3 => t.substring(0, 95) + block60 + t.substring(95)
        case _ => t
      }
      (s"d$i", text)
    }
  }

  test("planted shared substrings are found with exact lengths") {
    val out = SubstringDup
      .sharedSubstrings(corpus.toDF("id", "text"), width = 24, stride = 16, maxExtend = 200, minLen = 40)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getInt(2))
      .toMap
    val texts = corpus.toMap
    assert(out.contains(("d0", "d1")))
    assert(out(("d0", "d1")) == lcs(texts("d0"), texts("d1")),
      "reported length must equal the true LCS when it fits the extension bound")
    assert(out.contains(("d2", "d3")))
    assert(out(("d2", "d3")) == lcs(texts("d2"), texts("d3")))
  }

  test("guarantee + soundness vs brute-force LCS over every pair") {
    val width = 24; val stride = 16
    val out = SubstringDup
      .sharedSubstrings(corpus.toDF("id", "text"), width, stride, maxExtend = 200, minLen = width)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getInt(2))
      .toMap
    val texts = corpus.toMap
    for {
      (ia, ta) <- corpus; (ib, tb) <- corpus if ia < ib
    } {
      val truth = lcs(ta, tb)
      val got = out.get((ia, ib))
      // winnowing guarantee: a shared run of width+stride-1 chars must be hit
      if (truth >= width + stride - 1)
        assert(got.nonEmpty, s"pair ($ia,$ib) with LCS $truth must be detected")
      // soundness: every reported char was actually compared
      got.foreach(len => assert(len <= truth, s"($ia,$ib): reported $len > true LCS $truth"))
    }
  }

  test("result is partitioning-invariant (golden-oracle determinism)") {
    def run(p: Int) = SubstringDup
      .sharedSubstrings(corpus.toDF("id", "text").repartition(p), width = 24, stride = 16)
      .orderBy("id1", "id2").collect().map(_.toString).toSeq
    assert(run(1) == run(7))
  }

  test("supplementary characters (emoji) before a match do not misalign offsets") {
    // each emoji is 2 UTF-16 units but 1 code point: a code-point-based
    // context slice would shift the anchor offset and silently miss the match
    val block = randStr(120)
    val docs = Seq(
      ("e1", "😀😀😀" + block + randStr(50)),
      ("e2", randStr(80) + block + "🚀" + randStr(40))
    ).toDF("id", "text")
    val out = SubstringDup.sharedSubstrings(docs, width = 24, stride = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(out.contains(("e1", "e2")), "emoji-prefixed shared block must be found")
    assert(out(("e1", "e2")) >= 120)
  }

  test("a w-gram repeating inside one doc still extends at the right occurrence") {
    // the same 24-gram appears EARLY in d_a (isolated) and again inside the
    // long block shared with d_b; keeping only the first occurrence would
    // extend at the isolated site and under-report the match
    val gram = randStr(24)
    val block = randStr(40) + gram + randStr(60) // 124-char shared block
    val docs = Seq(
      ("r1", gram + randStr(100) + block + randStr(30)),
      ("r2", randStr(55) + block + randStr(70))
    ).toDF("id", "text")
    val out = SubstringDup.sharedSubstrings(docs, width = 24, stride = 16, minLen = 100)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(out.get(("r1", "r2")).exists(_ >= block.length),
      s"must report the full ${block.length}-char block, got ${out.get(("r1", "r2"))}")
  }

  test("property: soundness + guarantee hold on random small-alphabet corpora") {
    // alphabet of 4 makes accidental w-gram repeats COMMON — the stress case
    // for multi-occurrence anchors; anchorCap is effectively off so the
    // winnowing guarantee is tested in its uncapped form
    val width = 8; val stride = 4
    (0 until 8).foreach { round =>
      val r = new scala.util.Random(1000 + round)
      def rs(n: Int) = (0 until n).map(_ => ('a' + r.nextInt(4)).toChar).mkString
      val block = rs(30 + r.nextInt(40))
      val docs = (0 until 8).map { i =>
        val t = rs(80 + r.nextInt(120))
        val text =
          if (i < 4 && r.nextBoolean()) {
            val p = r.nextInt(t.length)
            t.substring(0, p) + block + t.substring(p)
          } else t
        (s"p$i", text)
      }
      val out = SubstringDup
        .sharedSubstrings(docs.toDF("id", "text"), width, stride,
          maxExtend = 200, minLen = width, anchorCap = 10000)
        .collect().map(x => (x.getString(0), x.getString(1)) -> x.getInt(2)).toMap
      for { (ia, ta) <- docs; (ib, tb) <- docs if ia < ib } {
        val truth = lcs(ta, tb)
        if (truth >= width + stride - 1)
          assert(out.contains((ia, ib)), s"round $round: ($ia,$ib) with LCS $truth undetected")
        out.get((ia, ib)).foreach(len =>
          assert(len <= truth, s"round $round ($ia,$ib): reported $len > true LCS $truth"))
      }
    }
  }

  test("hot boilerplate anchors are capped, pairs stay bounded") {
    val boiler = randStr(80)
    val docs = (0 until 100).map(i => (f"b$i%03d", randStr(60) + boiler + randStr(60)))
    val out = SubstringDup
      .sharedSubstrings(docs.toDF("id", "text"), width = 24, stride = 16, anchorCap = 16)
    val n = out.count()
    assert(n > 0, "capped anchors must still emit pairs")
    assert(n < 100L * 99 / 2, s"cap must bound the quadratic blowup (got $n)")
  }
}
