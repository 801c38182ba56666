package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{text => T, MinHashImpl, MinHashSignature, SimHash64}

/** Unit + property tests for the custom Catalyst expressions and text
  * primitives (SURVEY.md §5 test plan).
  */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(4, "functions-spec")
  import spark.implicits._

  test("normalize strips punctuation/whitespace variation") {
    val df = Seq("  Hello,   World!! ", "hello world").toDF("t")
      .select(T.normalize(col("t")).as("n"))
    val vals = df.collect().map(_.getString(0)).distinct
    assert(vals.sameElements(Array("hello world")))
  }

  test("shingleHashes: short docs get whole-doc shingle; k-gram count correct") {
    val df = Seq("a b c d e f g", "a b").toDF("t")
      .select(size(T.shingleHashes(T.tokens(col("t")), 5)).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(3, 1)) // 7-5+1=3, short=1
  }

  test("wordGrams: short docs get the whole-doc sentinel gram; never crash") {
    val df = Seq("a b c d", "a b", "a", "").toDF("t")
      .select(T.wordGrams(col("t"), 3).as("g"))
    val got = df.collect().map(_.getSeq[String](0).toSeq).toSeq
    // 4 tokens -> two 3-grams; <3 tokens -> one whole-doc gram (unguarded,
    // slice(toks, 0, 3) throws: sequence(0, size-3) runs descending)
    assert(got == Seq(Seq("a b c", "b c d"), Seq("a b"), Seq("a"), Seq("")))
  }

  test("minhash estimate converges to exact jaccard (property)") {
    // two synthetic shingle sets with known overlap: |A|=|B|=200, |A∩B|=150
    val inter = (0 until 150).map(i => s"s$i")
    val a = inter ++ (1000 until 1050).map(i => s"s$i")
    val b = inter ++ (2000 until 2050).map(i => s"s$i")
    val exact = 150.0 / 250.0
    val df = Seq(("a", a), ("b", b)).toDF("id", "toks")
      .select(col("id"), transform(col("toks"), t => xxhash64(t)).as("sh"))
      .select(col("id"), MinHashSignature(col("sh"), 1024, 42L).as("sig"))
    val sigs = df.collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    val est = sigs("a").zip(sigs("b")).count { case (x, y) => x == y } / 1024.0
    assert(math.abs(est - exact) < 0.05, s"est $est vs exact $exact")
  }

  test("minhash signature invariant under shingle order permutation") {
    val toks = (0 until 100).map(i => s"t$i")
    val df = Seq(("fwd", toks), ("rev", toks.reverse)).toDF("id", "toks")
      .select(col("id"), MinHashSignature(transform(col("toks"), t => xxhash64(t)), 128, 7L).as("sig"))
    val m = df.collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(m("fwd") == m("rev"))
  }

  test("minhash coefficients deterministic and in range") {
    val c1 = MinHashImpl.coeffs(128, 42L)
    val c2 = MinHashImpl.coeffs(128, 42L)
    assert(c1.sameElements(c2))
    assert(c1.zipWithIndex.forall { case (v, i) =>
      if (i % 2 == 0) v >= 1 && v < MinHashImpl.P else v >= 0 && v < MinHashImpl.P
    })
  }

  test("simhash: identical inputs identical; near inputs near in Hamming space") {
    val base = (0 until 300).map(i => s"t$i")
    val near = base.updated(0, "CHANGED").updated(150, "ALSO")
    val far = (1000 until 1300).map(i => s"u$i")
    val df = Seq(("a", base), ("a2", base), ("n", near), ("f", far)).toDF("id", "toks")
      .select(col("id"), SimHash64(transform(col("toks"), t => xxhash64(t))).as("sh"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == m("a2"))
    val dNear = java.lang.Long.bitCount(m("a") ^ m("n"))
    val dFar = java.lang.Long.bitCount(m("a") ^ m("f"))
    assert(dNear < dFar, s"near=$dNear far=$dFar")
    assert(dNear <= 8, s"2/300 token change should stay within small Hamming ball, got $dNear")
  }

  test("fused ShingleHashes agrees with built-in chain on count and set relations") {
    val docs = Seq(
      "The  quick, brown FOX jumps over the lazy dog again and again!",
      "a b", // short -> whole-doc
      "", // empty -> whole-doc sentinel
      "one two three four five six one two three four five six" // repeated grams dedup
    ).zipWithIndex.map { case (t, i) => (s"d$i", t) }
    val df = docs.toDF("id", "t").select(
      col("id"),
      size(T.shingleHashes(T.tokens(col("t")), 5)).as("n_builtin"),
      size(graft.functions.ShingleHashes(col("t"), 5)).as("n_fused"),
      graft.functions.ShingleHashes(col("t"), 5).as("sh")
    )
    df.collect().foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"${r.getString(0)}: builtin ${r.getInt(1)} != fused ${r.getInt(2)}")
      val arr = r.getSeq[Int](3)
      assert(arr == arr.sorted && arr.distinct == arr, "fused output must be sorted distinct")
    }
    // normalization-insensitivity: case/punct/whitespace variants -> same shingles
    val v = Seq(("a", "Hello,   World! Great big test here"), ("b", "hello world great BIG test here"))
      .toDF("id", "t").select(col("id"), graft.functions.ShingleHashes(col("t"), 5).as("sh"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(v("a") == v("b"))
  }

  test("jaccard column function: exact values incl. both-empty") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)), // 2/4
      (Seq.empty[Long], Seq.empty[Long]), // both empty -> 1.0
      (Seq(1L), Seq.empty[Long]) // 0.0
    ).toDF("a", "b").select(T.jaccard(col("a"), col("b")).as("j"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(0.5, 1.0, 0.0))
  }

  test("winnowing anchors: shared substring >= width+stride-1 guarantees a shared anchor") {
    val shared = ("x" * 5) + (0 until 40).map(i => s"common$i").mkString(" ") // > 95 normalized chars
    val d1 = s"prefix one $shared suffix one"
    val d2 = s"totally different beginning $shared and end"
    val df = Seq(("a", d1), ("b", d2)).toDF("id", "t")
      .select(col("id"), T.windowAnchors(col("t"), 64, 32).as("an"))
    val m = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    assert(m("a").intersect(m("b")).nonEmpty)
  }

  test("winnowing anchors guarantee (property over many offsets)") {
    val gen = new scala.util.Random(7)
    def rand(n: Int) = (0 until n).map(_ => ('a' + gen.nextInt(26)).toChar).mkString
    val shared = rand(95) // exactly width + stride - 1
    val docs = (0 until 20).map { i => (s"d$i", rand(1 + gen.nextInt(300)) + " " + shared + " " + rand(1 + gen.nextInt(300))) }
    val df = docs.toDF("id", "t").select(col("id"), T.windowAnchors(col("t"), 64, 32).as("an"))
    val sets = df.collect().map(r => r.getSeq[Long](1).toSet)
    val common = sets.reduce(_ intersect _)
    assert(common.nonEmpty, "every pair must share the winnowed anchor of the common substring")
  }

  test("lastToken: family-name extraction (family_name.R:6-7 parity)") {
    val df = Seq(
      ("a", "jorge luis borges"), // multi-token -> last
      ("b", "plato"),             // single token -> itself
      ("c", "  ada   lovelace  "),// ragged whitespace -> still last real token
      ("d", ""),                  // empty -> empty string
      ("e", "   "),               // whitespace-only -> empty string
      ("f", null)                 // null -> null
    ).toDF("id", "name").select(col("id"), T.lastToken(col("name")).as("fam"))
    val m = df.collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(m("a").contains("borges"))
    assert(m("b").contains("plato"))
    assert(m("c").contains("lovelace"))
    assert(m("d").contains(""))
    assert(m("e").contains(""))
    assert(m("f").isEmpty)
  }

  test("cosine_sim expression: bit-identical to the HOF composition it replaces") {
    import graft.functions.CosineSim
    // the reference semantics: the exact column composition Ann.cosine used
    // before round 5 (interpreted HOF lambdas, left-fold double sums)
    def hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (s, x) => s + x)
      val na = aggregate(transform(a, x => x.cast("double") * x.cast("double")), lit(0.0), (s, x) => s + x)
      val nb = aggregate(transform(b, x => x.cast("double") * x.cast("double")), lit(0.0), (s, x) => s + x)
      when(na === 0d || nb === 0d, lit(0.0)).otherwise(dot / (sqrt(na) * sqrt(nb)))
    }
    val rnd = new scala.util.Random(5)
    val rows: Seq[(Seq[Float], Seq[Float])] =
      (0 until 300).map { _ =>
        val d = 1 + rnd.nextInt(40)
        (Seq.fill(d)(rnd.nextFloat() * 20 - 10), Seq.fill(d)(rnd.nextFloat() * 20 - 10))
      } ++ Seq(
        (Seq.fill(8)(0f), Seq.fill(8)(1f)),   // zero-norm left -> 0.0
        (Seq.fill(8)(1f), Seq.fill(8)(0f)),   // zero-norm right -> 0.0
        (Seq.empty[Float], Seq.empty[Float]), // both empty: norms 0 -> 0.0
        (Seq(1f, 2f), Seq(1f, 2f, 3f))        // length mismatch -> null
      )
    val df = rows.toDF("a", "b")
      .select(hof(col("a"), col("b")).as("h"), CosineSim(col("a"), col("b")).as("c"))
    val vals = df.collect()
    vals.foreach { r =>
      val h = if (r.isNullAt(0)) null else java.lang.Double.valueOf(r.getDouble(0))
      val c = if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1))
      // BIT-identical, not epsilon-close: same IEEE fold order is the contract
      assert(h == c || (h != null && c != null &&
        java.lang.Double.doubleToRawLongBits(h) == java.lang.Double.doubleToRawLongBits(c)),
        s"hof=$h codegen=$c")
    }
    // null-element propagation matches too
    val withNull = Seq((Seq[java.lang.Float](1f, null, 3f), Seq[java.lang.Float](1f, 2f, 3f)))
      .toDF("a", "b")
      .select(hof(col("a"), col("b")).as("h"), CosineSim(col("a"), col("b")).as("c"))
      .head
    assert(withNull.isNullAt(0) && withNull.isNullAt(1))
  }

  test("cosine_sim participates in whole-stage codegen") {
    import graft.functions.CosineSim
    val df = spark.range(4)
      .select(CosineSim(
        array(col("id").cast("float"), lit(2f)),
        array(lit(3f), col("id").cast("float"))).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("minhash expression participates in whole-stage codegen") {
    val df = spark.range(4)
      .select(MinHashSignature(array(col("id"), col("id") * 2), 16, 1L).as("sig"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan) // '*' prefix = inside WholeStageCodegen
  }
}
