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
  * and broadcast (IDF.py:15-17 — N/count, NO log at build time; the log
  * applies at use, c_org.py:27).
  *
  * Everything is built-in higher-order functions (map_from_entries,
  * map_zip_with, aggregate) — no UDFs, per SURVEY §2.11.
  */
object TokenSim {

  /** token bag as map token->count from an array of tokens */
  def tokenBag(tokens: Column): Column =
    map_from_entries(
      transform(
        array_distinct(tokens),
        t => struct(t, size(filter(tokens, x => x === t)))
      )
    )

  /** IDF table (tok, idf) over docs(id, tokens): idf = N / doc_count(tok).
    * Broadcastable small table — the reference materializes it once across
    * all splits and reuses it (Makefile:49-56).
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
    */
  def pairFeatures(pairs: DataFrame, docs: DataFrame, idf: DataFrame): DataFrame = {
    val idfMap = broadcast(
      idf.agg(map_from_entries(collect_list(struct(col("tok"), col("idf")))).as("m"))
    )
    val bags = docs.select(col("id"), tokenBag(col("tokens")).as("bag"),
      size(col("tokens")).as("len"))
    val joined = pairs
      .join(bags.select(col("id").as("id1"), col("bag").as("bag1"), col("len").as("len1")), "id1")
      .join(bags.select(col("id").as("id2"), col("bag").as("bag2"), col("len").as("len2")), "id2")
      .crossJoin(idfMap)

    // multiset intersection: min count per shared token (Counter & Counter).
    // NB: `least` skips nulls, so a token present in only one bag must be
    // zeroed explicitly or it would leak its full count into the overlap.
    val interMap = map_filter(
      map_zip_with(col("bag1"), col("bag2"),
        (_, c1, c2) => when(c1.isNull || c2.isNull, lit(0)).otherwise(least(c1, c2))),
      (_, v) => v > 0
    )
    val overlap = aggregate(map_values(interMap), lit(0), (a, x) => a + x)
    val logIdf = aggregate(
      transform(
        map_entries(interMap),
        e => log(coalesce(element_at(col("m"), e.getField("key")), lit(1.0)) * e.getField("value") + 1)
      ),
      lit(0.0),
      (a, x) => a + x
    )

    // ANSI mode errors on ANY divide-by-zero; empty bags are legal input
    // (reference sentinel: wordlist.py:24-27), so guard the denominators
    val denomJ = (col("len1") + col("len2") - col("overlap")).cast("double")
    val denomT = col("len1").cast("double") * col("len2")
    joined
      .withColumn("overlap", overlap)
      .withColumn("share_dummy", (col("overlap") > 0).cast("int"))
      .withColumn(
        "jaccard_similarity_metric",
        when(denomJ =!= 0d, col("overlap").cast("double") / denomJ).otherwise(lit(0.0))
      )
      .withColumn("logIDF", logIdf)
      .withColumn("logTFIDF",
        when(denomT =!= 0d, col("logIDF") / denomT).otherwise(lit(0.0)))
      .select("id1", "id2", "overlap", "share_dummy", "jaccard_similarity_metric", "logIDF", "logTFIDF")
  }
}
