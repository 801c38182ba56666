package graft.ops

import org.apache.spark.ml.feature.{Word2Vec, Word2VecModel}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained document embeddings — the reference's Doc2Vec stage
  * (doc2vec.py:44-120: gensim PV-DM, 50 dims, trained over title+abstract,
  * then per-document vectors feed pair features doc2vec_pair_native.py:94-122).
  * MLlib has no Doc2Vec; the survey's mapping (SURVEY §2.8 M8) is
  * ml.feature.Word2Vec with doc vectors as the average of word vectors —
  * which is exactly what Word2VecModel.transform emits for a token-array
  * column. The resulting (id, vec) frame feeds every Ann entry point
  * (ivfTopK/lshTopK/nearDupPairs), closing the raw-text -> trained-embedding
  * -> ANN path end-to-end.
  */
object DocEmbed {

  /** Train word vectors over tokenized docs. Defaults mirror the reference
    * (50 dims, seed 2018 — classifier.py:57 pins the same seed). The input
    * is sorted into a single partition before fitting: Word2Vec's SGD
    * consumes sentences in partition order, so a pinned order makes training
    * reproducible run-to-run on the same data (distributed training with
    * numPartitions > 1 trades that for speed, as the reference's workers=8
    * did — callers opt in via `numPartitions`).
    */
  def train(
      docs: DataFrame,
      idCol: String = "id",
      tokensCol: String = "tokens",
      dim: Int = 50,
      iters: Int = 5,
      minCount: Int = 1,
      seed: Long = 2018L,
      numPartitions: Int = 1
  ): Word2VecModel = {
    val input = docs.select(col(idCol), col(tokensCol))
    // numPartitions > 1 = the distributed-training opt-in: skip the
    // single-partition global sort (it would serialize the whole corpus
    // through one task) and let Word2Vec spread SGD over the partitions.
    // OpsSpec gates that this path preserves downstream ANN recall.
    val prepared = if (numPartitions <= 1) input.orderBy(col(idCol)).coalesce(1) else input
    new Word2Vec()
      .setInputCol(tokensCol)
      .setOutputCol("docvec")
      .setVectorSize(dim)
      .setMinCount(minCount)
      .setMaxIter(iters)
      .setSeed(seed)
      .setNumPartitions(numPartitions)
      .fit(prepared)
  }

  /** Per-document vectors (mean of word vectors — Word2VecModel.transform's
    * documented semantics), shaped (id, vec array<float>) for the Ann ops.
    */
  def docVectors(
      model: Word2VecModel,
      docs: DataFrame,
      idCol: String = "id",
      tokensCol: String = "tokens"
  ): DataFrame =
    model
      .transform(docs.select(col(idCol), col(tokensCol)))
      .select(col(idCol).as("id"),
        transform(vector_to_array(col("docvec")), x => x.cast("float")).as("vec"))
}
