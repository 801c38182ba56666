package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Cols._

/** Corpus-curation operators as standalone library calls: PII scrubbing and
  * near-duplicate cluster retention over any (integral id, text) document
  * table. These are the reusable forms behind the c01/c02/c03 driver
  * queries; the reference analogue is the post-clustering keep/drop pass a
  * training-data pipeline runs after dedup (keep one representative per
  * duplicate cluster, scrub identifying spans before publication).
  */
object Curation {

  /** Scrub patterns — restricted to the Java∩RE2 common regex dialect
    * (character classes, bounded repetition, `\b`; no lookaround or
    * backreferences) so Spark's java.util.regex and an RE2-based engine
    * (DuckDB, Go) match the exact same spans.
    */
  val emailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val ipv4Re = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  val phoneRe = """\b\d{3}-\d{4}\b"""

  /** Redact email / IPv4 / phone spans to typed placeholders. Map-side,
    * codegen'd regexp engine; null text stays null.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  /** Per-pattern match counts on the UNscrubbed text:
    * struct(n_emails, n_ips, n_phones).
    */
  def piiCounts(text: Column): Column = struct(
    regexp_count(text, lit(emailRe)).cast("int").as("n_emails"),
    regexp_count(text, lit(ipv4Re)).cast("int").as("n_ips"),
    regexp_count(text, lit(phoneRe)).cast("int").as("n_phones"))

  /** Near-dup cluster retention labeling: d10's MinHash-LSH pair graph
    * (exact word-3-gram Jaccard >= tauTenths/10), connected components
    * labeled by the numeric min id (ids are zero-padded to 20 chars — the
    * full non-negative bigint width, so no id can truncate — for CC's
    * lexicographic min contract and cast back), then keep the LONGEST
    * document per cluster (RAW whitespace token count desc, id asc
    * tiebreak — raw, not normalized, so an independent SQL engine's
    * split-on-space count ranks identically). Singletons keep themselves.
    * `idCol` must be integral and non-negative (the zero-pad order
    * embedding).
    *
    * Output: (idCol, cluster, n_tokens, kept 1|0). Shape: one bucket
    * shuffle into the capped pair emitter, O(log n) CC rounds, one keyed
    * join + one per-cluster window — nothing quadratic, skew-capped
    * upstream. The pair edges are eagerly localCheckpoint'ed before CC so
    * its size probe + star rounds reuse one materialization instead of
    * re-running the shingle/signature/verify DAG (CC.run itself pins the
    * same way on its iterative path).
    */
  def keepBest(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      tauTenths: Int = 7): DataFrame = {
    val base = docs.select(
      col(idCol).cast("bigint").as(idCol),
      size(split(col(textCol), " ")).cast("bigint").as("n_tokens"))
    val pairs = DocNearDup.lshJaccardPairs(docs, idCol, textCol, tauTenths = tauTenths)
    def pad(c: Column) = lpad(c.cast("string"), 20, "0")
    val edges = pairs
      .select(pad($"id1").as("src"), pad($"id2").as("dst"))
      .localCheckpoint(true)
    val comp = graft.plans.ConnectedComponents
      .run(spark, edges)
      .select($"id".cast("bigint").as(idCol), $"component".cast("bigint").as("cluster"))
    val w = Window.partitionBy($"cluster").orderBy($"n_tokens".desc, col(idCol))
    base.join(comp, Seq(idCol), "left")
      .withColumn("cluster", coalesce($"cluster", col(idCol)))
      .withColumn("rn", row_number().over(w))
      .select(col(idCol), $"cluster", $"n_tokens",
        when($"rn" === 1, 1).otherwise(0).as("kept"))
  }

  /** Token-budget mixture sampling: build a training mixture by selecting,
    * per source, a deterministic pseudo-random subset of documents whose
    * token counts greedily fill that source's token quota — the
    * domain-reweighting step of corpus assembly (source weights → token
    * budgets), distinct from d09's fixed-RATE strata and t03's pack-all
    * sharding. Selection order is md5 of the id (the d09 contract): the
    * same doc draws the same priority on every rerun/backfill, so the
    * mixture is reproducible and independent of physical layout. The doc
    * that straddles the quota boundary is kept (greedy prefix, the t03
    * convention: a row survives iff its source's budget was not already
    * exhausted before it). Token count is the raw whitespace split
    * (d03/t03 token space). Sources absent from `quotas` get
    * `defaultQuota`; null text drops the row (no token count → never
    * selected).
    *
    * Output: (idCol, sourceCol, n_tokens, cum) with `cum` the running
    * token total at and including this row in selection order.
    *
    * Scale shape: one per-source window shuffle — hash partition on
    * source, local sort by (priority, id); no global sort, no join. Skew
    * bound: a source's rows must window on one partition-task; at 10^12
    * docs shard the window key like t03's packing discussion (the quota
    * then applies per (source, shard) slice).
    */
  def mixtureSample(
      docs: DataFrame,
      quotas: Map[String, Long],
      defaultQuota: Long,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    require(defaultQuota >= 0 && quotas.values.forall(_ >= 0), "quotas must be non-negative")
    val quotaMap =
      if (quotas.isEmpty) lit(null).cast("map<string,bigint>")
      else map(quotas.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val w = Window.partitionBy(col(sourceCol)).orderBy($"priority", col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(
        col(idCol),
        col(sourceCol),
        size(split(col(textCol), " ")).cast("bigint").as("n_tokens"),
        md5(col(idCol).cast("string")).as("priority"))
      .where($"n_tokens".isNotNull)
      .withColumn("cum", sum($"n_tokens").over(w))
      .where($"cum" - $"n_tokens" <
        coalesce(element_at(quotaMap, col(sourceCol)), lit(defaultQuota)))
      .select(col(idCol), col(sourceCol), $"n_tokens", $"cum")
  }

  /** Corpus-frequency boilerplate removal — the C4/RefinedWeb-style "drop
    * every line that repeats across documents" pass, over a corpus whose
    * unit of repetition is the aligned `chunkTokens`-token span (the
    * transcript/documents tables carry no newlines; a fixed token grid
    * makes the unit deterministic and re-derivable by an independent
    * engine). A chunk is boilerplate when it appears in at least `minDf`
    * DISTINCT documents; trailing tokens past the last full chunk are
    * always kept.
    *
    * Output: (idCol, n_chunks, n_boiler, clean_text) — chunk counts per doc
    * and the document re-assembled in chunk order with boilerplate spans
    * removed (single-space joined, empty parts dropped). Null-text docs are
    * excluded, matching the other curation passes.
    *
    * Scale shape: one keyed aggregate on the chunk string (map-side
    * partial count-distinct via the (chunk, doc) pre-distinct), one
    * shuffle join back, one per-doc aggregation — linear in corpus tokens,
    * no cartesian, no global sort. At 10^12 docs the chunk-df table is the
    * only wide shuffle and is exactly the IDF-table shape (A3).
    */
  def removeBoilerplate(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      chunkTokens: Int = 10,
      minDf: Int = 2): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val k = chunkTokens
    // let-bind the split (HOF lesson: a bare split inside transform's lambda
    // re-splits the text per chunk); guard the sequence for docs shorter
    // than one chunk — sequence(0, -1) runs DESCENDING (the t04 lesson)
    val chunked = docs.where(col(textCol).isNotNull).select(
      col(idCol),
      graft.functions.text.let(split(col(textCol), " ")) { t =>
        val nFull = floor(size(t) / lit(k)).cast("int")
        struct(
          when(nFull === 0, array().cast("array<string>"))
            .otherwise(transform(sequence(lit(0), nFull - 1),
              i => concat_ws(" ", slice(t, i * k + 1, lit(k))))).as("chunks"),
          concat_ws(" ", slice(t, nFull * k + 1, size(t) - nFull * k)).as("rem"))
      }.as("s"))
      .select(col(idCol), col("s.chunks").as("chunks"), col("s.rem").as("rem"))
    // posexplode_outer keeps zero-chunk docs (short texts) in the frame
    val occ = chunked.select(col(idCol), col("rem"),
      posexplode_outer(col("chunks")).as(Seq("pos", "chunk")))
    val dfCounts = occ.where(col("chunk").isNotNull)
      .groupBy(col("chunk")).agg(countDistinct(col(idCol)).as("df"))
    val flagged = occ.join(dfCounts, Seq("chunk"), "left")
      .withColumn("boiler", coalesce(col("df") >= minDf, lit(false)))
    flagged
      .groupBy(col(idCol), col("rem"))
      .agg(
        count(col("chunk")).cast("int").as("n_chunks"),
        sum(col("boiler").cast("int")).cast("int").as("n_boiler"),
        // collect_list skips nulls: zero-chunk docs aggregate to an empty list
        array_sort(collect_list(when(!col("boiler") && col("chunk").isNotNull,
          struct(col("pos"), col("chunk"))))).as("kept"))
      .select(
        col(idCol),
        col("n_chunks"),
        col("n_boiler"),
        array_join(
          filter(
            concat(transform(col("kept"), s => s.getField("chunk")), array(col("rem"))),
            x => length(x) > 0),
          " ").as("clean_text"))
  }
}
