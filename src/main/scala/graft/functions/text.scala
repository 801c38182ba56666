package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the dedup pipeline — all built-in
  * (codegen'd) functions; no UDFs in the hot path.
  *
  * Reference analogue: venue_author_preprocess.R:18-39 (regex cleanup +
  * lowercase) and wordlist.py:21-34 (whitespace tokenization), re-expressed as
  * Catalyst column expressions.
  */
object text {

  /** Let-bind `v` once and evaluate `body(v)` against it: the one-element
    * `transform` acts as a `let`. Catalyst's codegen subexpression
    * elimination refuses to hoist subtrees that appear under CASE WHEN
    * branches, so an expression like `tokens(text)` (itself a CASE WHEN)
    * referenced by several derived columns — or, worse, inside a
    * higher-order-function lambda, where interpreted evaluation re-runs the
    * argument subtree PER ELEMENT — is otherwise recomputed at every
    * reference. Measured: t01 quality metrics 6x faster, d06 fingerprints
    * 10x faster under this shape.
    */
  def let(v: Column)(body: Column => Column): Column =
    element_at(transform(array(v), body), 1)

  /** Lowercase, strip non-alphanumerics to spaces, collapse runs, trim.
    * Whitespace/punctuation-only edits ("shuffle_ws" dups) normalize away.
    */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "[^\\p{L}\\p{N}]+", " "))

  /** Whitespace tokens of normalized text; empty text -> empty array. */
  def tokens(c: Column): Column = {
    val n = normalize(c)
    when(length(n) === 0, array().cast("array<string>")).otherwise(split(n, " "))
  }

  /** 64-bit hashes of word k-shingles (distinct). Documents shorter than k
    * tokens contribute a single whole-document shingle so short docs still
    * compare (reference sentinel analogue: wordlist.py:24-27 — empty field
    * gets a token that can only match itself... here short docs hash whole).
    */
  def shingleHashes(toks: Column, k: Int): Column = {
    val whole = array(xxhash64(concat_ws(" ", toks)))
    val grams = array_distinct(
      transform(
        sequence(lit(0), size(toks) - k),
        i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(k))))
      )
    )
    when(size(toks) < k, whole).otherwise(grams)
  }

  /** Per-token 64-bit hashes, multiplicity preserved (SimHash weights). */
  def tokenHashes(toks: Column): Column = transform(toks, t => xxhash64(t))

  /** Distinct word k-grams of RAW space-split text (no normalization) — the
    * gram space the d02/d08/d10 SQL oracles re-derive with DuckDB list
    * comprehensions. The token array is LET-BOUND once per row: interpreted
    * HOF lambdas re-evaluate argument subtrees per element, so a bare
    * `slice(split(text), i, k)` re-splits the whole text for EVERY gram —
    * O(tokens²) per document (the d06/t01 lesson, ~10x measured).
    *
    * Documents shorter than k tokens contribute their whole text as a single
    * gram (the [[shingleHashes]] sentinel), so short docs still compare by
    * exact equality. Without the guard, `sequence(0, size-k)` runs DESCENDING
    * for size < k and `slice(toks, 0, k)` throws at runtime — the oracles'
    * gram comprehensions carry the matching CASE branch.
    */
  def wordGrams(c: Column, k: Int): Column =
    let(split(c, " ")) { toks =>
      val whole = array(concat_ws(" ", toks))
      val grams = array_distinct(
        transform(
          sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k)))
        )
      )
      when(size(toks) < k, whole).otherwise(grams)
    }

  /** Exact-substring anchors via content-defined winnowing fingerprints (see
    * ContentAnchors): two docs sharing any exact normalized substring of
    * length >= width + stride - 1 are GUARANTEED to share an anchor hash.
    */
  def windowAnchors(c: Column, width: Int, stride: Int): Column =
    ContentAnchors(normalize(c), width, stride)

  /** Jaccard of two set-valued (already distinct) arrays; both-empty -> 1.0. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = (size(a) + size(b)).cast("double") - inter
    when(uni === 0d, lit(1.0)).otherwise(inter / uni)
  }

  /** Hamming distance between two 64-bit fingerprints (built-in bit_count). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Last whitespace token of a string (reference family_name.R:6-7 —
    * `tail(strsplit(name, ' ')[[1]], 1)`, the family-name extractor). Null
    * in, null out; empty/whitespace-only text yields an empty string, like
    * R's split of "" yielding character(0) folded to "". Negative
    * element_at indexes from the end — no second split or size() pass.
    */
  def lastToken(c: Column): Column =
    // trim first: Spark's split keeps trailing empty fields ("a ".split ->
    // ["a",""]), which would make the last "token" of trailing-space text ""
    let(split(trim(c), "\\s+")) { toks =>
      when(size(toks) === 0, lit("")).otherwise(element_at(toks, -1))
    }
}
