package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multiset token-bag similarity with IDF weighting — the faithful
  * re-expression of the reference's central feature operator
  * (c_org.py:18-44): per-id token bags as maps token->count, pairwise
  * multiset intersection (Σ min counts), and the derived feature columns
  *   overlap, share_dummy, jaccard_similarity_metric = ov/(|a|+|b|-ov),
  *   logIDF = Σ_k log(idf_k * min_cnt_k + 1), logTFIDF = logIDF/(|a|*|b|),
  * with IDF(tok) = N_total / doc_count(tok) computed over the whole corpus
  * (IDF.py:15-17 — N/count, NO log at build time; the log applies at use,
  * c_org.py:27).
  *
  * Everything is built-in higher-order functions (map_from_entries,
  * map_zip_with, aggregate) — no UDFs, per SURVEY §2.11.
  */
object TokenSim {

  /** Token bag as map token->count, built in ONE pass per row: sort the
    * array (O(len log len)) and run-length encode the runs — each run start
    * is a distinct token, its length the count. (The naive
    * distinct-then-recount form rescans the array once per distinct token:
    * O(len^2), ~10^8 comparisons for a 10k-token document.)
    */
  def tokenBag(tokens: Column): Column = {
    // run-length encode a SORTED array bound as a lambda variable. The
    // binding matters: interpreted higher-order functions re-evaluate
    // argument subtrees on every lambda call (no CSE), so referencing
    // array_sort(tokens) directly inside the filter would re-sort the whole
    // array per element — O(n^2 log n). `transform(array(sorted), s => ...)`
    // is the `let`: the sort runs once and `s` is a plain variable lookup.
    def fromSorted(s: Column): Column = {
      val n = size(s)
      // 1-based positions that start a run of equal tokens
      val starts = filter(sequence(lit(1), n), i => i === 1 || element_at(s, i) =!= element_at(s, i - 1))
      // each run's length = next start - this start (sentinel n+1 closes the last run)
      val entries = zip_with(
        starts,
        concat(slice(starts, lit(2), greatest(size(starts) - 1, lit(0))), array(n + 1)),
        (cur, nxt) => struct(element_at(s, cur).as("tok"), (nxt - cur).cast("int").as("cnt"))
      )
      when(n === 0, map_from_entries(array().cast("array<struct<tok:string,cnt:int>>")))
        .otherwise(map_from_entries(entries))
    }
    element_at(transform(array(array_sort(tokens)), s => fromSorted(s)), 1)
  }

  /** IDF table (tok, idf) over docs(id, tokens): idf = N / doc_count(tok).
    * The reference materializes it once across all splits and reuses it
    * (Makefile:49-56).
    */
  def idfTable(docs: DataFrame, tokensCol: String = "tokens"): DataFrame = {
    val n = docs.count()
    docs
      .select(explode(array_distinct(col(tokensCol))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
      .select(col("tok"), (lit(n.toDouble) / col("df")).as("idf"))
  }

  /** Pairwise multiset features over candidate pairs.
    * pairs: (id1, id2); docs: (id, tokens array<string>); idf: (tok, idf).
    * Output: (id1, id2, overlap, share_dummy, jaccard_similarity_metric,
    * logIDF, logTFIDF) — the c_org.py:34-39 feature block, keyed not
    * positional.
    *
    * IDF delivery scales with vocabulary size: up to `maxIdfMapTerms` the
    * table rides as one broadcast map row (the reference's in-process dict,
    * c_org.py:15-16) — small ONLY, because Catalyst map lookup is a linear
    * scan, making the map path O(|intersection| * vocab) per pair, and a
    * single giant row would blow row/broadcast limits anyway. Above the
    * threshold the shared tokens are exploded and equi-joined against the
    * IDF table on `tok` (plain shuffle join, any vocabulary size). Both
    * paths produce identical values — the spec pins them against each other.
    */
  def pairFeatures(
      pairs: DataFrame,
      docs: DataFrame,
      idf: DataFrame,
      maxIdfMapTerms: Int = 4096
  ): DataFrame = {
    val bags = docs.select(col("id"), tokenBag(col("tokens")).as("bag"),
      size(col("tokens")).as("len"))
    val joined = pairs
      .join(bags.select(col("id").as("id1"), col("bag").as("bag1"), col("len").as("len1")), "id1")
      .join(bags.select(col("id").as("id2"), col("bag").as("bag2"), col("len").as("len2")), "id2")

    // multiset intersection: min count per shared token (Counter & Counter).
    // NB: `least` skips nulls, so a token present in only one bag must be
    // zeroed explicitly or it would leak its full count into the overlap.
    val interMap = map_filter(
      map_zip_with(col("bag1"), col("bag2"),
        (_, c1, c2) => when(c1.isNull || c2.isNull, lit(0)).otherwise(least(c1, c2))),
      (_, v) => v > 0
    )
    val overlap = aggregate(map_values(interMap), lit(0), (a, x) => a + x)

    val base = joined
      .withColumn("inter", interMap)
      .withColumn("overlap", overlap)

    // vocabulary-size probe: one cheap limited count, not a full scan
    val idfFitsInMap = idf.limit(maxIdfMapTerms + 1).count() <= maxIdfMapTerms

    val withLogIdf =
      if (idfFitsInMap) {
        val idfMap = broadcast(
          idf.agg(map_from_entries(collect_list(struct(col("tok"), col("idf")))).as("m"))
        )
        base
          .crossJoin(idfMap)
          .withColumn(
            "logIDF",
            aggregate(
              transform(
                map_entries(col("inter")),
                e => log(coalesce(element_at(col("m"), e.getField("key")), lit(1.0)) * e.getField("value") + 1)
              ),
              lit(0.0),
              (a, x) => a + x
            )
          )
          .drop("m")
      } else {
        // large-vocabulary path: explode shared tokens, equi-join on tok,
        // re-aggregate per pair (empty intersections contribute 0.0).
        // Dedup the (id1,id2) keys BEFORE exploding: the groupBy sum would
        // otherwise multiply logIDF by the duplicate count for callers that
        // pass repeated pairs, diverging from the broadcast-map path (which
        // computes each row independently). `inter` is a pure function of the
        // pair, so one exploded copy per key is exact for every duplicate.
        val contrib = base
          .select(col("id1"), col("id2"), col("inter"))
          .dropDuplicates("id1", "id2")
          .select(col("id1"), col("id2"), explode(map_entries(col("inter"))).as("e"))
          .select(col("id1"), col("id2"), col("e.key").as("tok"), col("e.value").as("cnt"))
          .join(idf, Seq("tok"), "left_outer")
          .groupBy(col("id1"), col("id2"))
          .agg(sum(log(coalesce(col("idf"), lit(1.0)) * col("cnt") + 1)).as("logIDF"))
        base
          .join(contrib, Seq("id1", "id2"), "left_outer")
          .withColumn("logIDF", coalesce(col("logIDF"), lit(0.0)))
      }

    // ANSI mode errors on ANY divide-by-zero; empty bags are legal input
    // (reference sentinel: wordlist.py:24-27), so guard the denominators
    val denomJ = (col("len1") + col("len2") - col("overlap")).cast("double")
    val denomT = col("len1").cast("double") * col("len2")
    withLogIdf
      .withColumn("share_dummy", (col("overlap") > 0).cast("int"))
      .withColumn(
        "jaccard_similarity_metric",
        when(denomJ =!= 0d, col("overlap").cast("double") / denomJ).otherwise(lit(0.0))
      )
      .withColumn("logTFIDF",
        when(denomT =!= 0d, col("logIDF") / denomT).otherwise(lit(0.0)))
      .select("id1", "id2", "overlap", "share_dummy", "jaccard_similarity_metric", "logIDF", "logTFIDF")
  }
}
