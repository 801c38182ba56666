package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** SQL surface for the engine's codegen'd Catalyst expressions, registered
  * through the standard `SparkSessionExtensions` hook — the same mechanism a
  * cluster user reaches with `--conf spark.sql.extensions=graft.GraftExtensions`
  * on spark-submit, with zero graft imports in their code:
  *
  *   SELECT doc_id, simhash64(token_hashes) FROM docs
  *   SELECT explode(content_anchors(text, 24, 16)) FROM docs
  *
  * Scalar parameters (widths, permutation counts, seeds) must be integer
  * LITERALS: they parameterize generated code and plane/permutation tables,
  * exactly like the typed `apply(Column, ...)` builders the Scala API uses —
  * a non-literal argument gets a clear error at analysis time, not a runtime
  * surprise.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(fn: String, name: String, e: Expression): Int = e match {
    case Literal(v: Int, _)  => v
    case Literal(v: Long, _) => v.toInt
    case other =>
      throw new IllegalArgumentException(s"$fn: $name must be an integer literal, got $other")
  }

  private def longLit(fn: String, name: String, e: Expression): Long = e match {
    case Literal(v: Int, _)  => v.toLong
    case Literal(v: Long, _) => v
    case other =>
      throw new IllegalArgumentException(s"$fn: $name must be an integer literal, got $other")
  }

  private def arity(fn: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n)
      throw new IllegalArgumentException(s"$fn expects $n arguments, got ${args.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def reg(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, ""),
          builder))

    reg("shingle_hashes", "shingle_hashes(tokens, k) - rolling k-gram hashes of a token array") {
      args =>
        arity("shingle_hashes", 2, args)
        ShingleHashes(args(0), intLit("shingle_hashes", "k", args(1)))
    }
    reg("minhash_signature",
      "minhash_signature(hashes, numPerms, seed) - batched MinHash signature") { args =>
      arity("minhash_signature", 3, args)
      MinHashSignature(args(0), intLit("minhash_signature", "numPerms", args(1)),
        longLit("minhash_signature", "seed", args(2)))
    }
    reg("simhash64", "simhash64(hashes) - 64-bit SimHash of a hash array") { args =>
      arity("simhash64", 1, args)
      SimHash64(args(0))
    }
    reg("content_anchors",
      "content_anchors(text, width, stride) - winnowing substring fingerprints") { args =>
      arity("content_anchors", 3, args)
      ContentAnchors(args(0), intLit("content_anchors", "width", args(1)),
        intLit("content_anchors", "stride", args(2)))
    }
    reg("anchor_contexts",
      "anchor_contexts(text, width, stride, maxExtend) - positioned winnowing anchors with bounded context") {
      args =>
        arity("anchor_contexts", 4, args)
        AnchorContexts(args(0), intLit("anchor_contexts", "width", args(1)),
          intLit("anchor_contexts", "stride", args(2)),
          intLit("anchor_contexts", "maxExtend", args(3)))
    }
    reg("packed_sign_bits",
      "packed_sign_bits(vec, dim, nBits, seed) - sign-LSH hyperplane bits packed to a long") {
      args =>
        arity("packed_sign_bits", 4, args)
        PackedSignBits(args(0), intLit("packed_sign_bits", "dim", args(1)),
          intLit("packed_sign_bits", "nBits", args(2)),
          longLit("packed_sign_bits", "seed", args(3)))
    }
    reg("sorted_intersect_size",
      "sorted_intersect_size(a, b) - merge-intersection size of two sorted long arrays") { args =>
      arity("sorted_intersect_size", 2, args)
      SortedIntersectSize(args(0), args(1))
    }
    reg("cosine_sim",
      "cosine_sim(a, b) - cosine similarity of two numeric arrays (zero-norm -> 0.0)") { args =>
      arity("cosine_sim", 2, args)
      CosineSim(args(0), args(1))
    }
  }
}
