package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.PairClassifier
import graft.pipeline.Dedup
import graft.synth.Synth

/** RF+GBT ensemble pair classifier (classifier.py parity): trained on
  * planted-truth labels over candidate-pair features, block-level split,
  * held-out F1 must beat the trivial all-dup baseline.
  */
class PairClassifierSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "classifier-spec")
  import spark.implicits._

  test("ensemble learns dup vs non-dup pairs; holds up on held-out blocks") {
    val scfg = Synth.Config(nClusters = 250, boilerClusters = 1, boilerSize = 10)
    val cfg = Dedup.Config()
    val transcripts = Synth.transcripts(spark, scfg).toDF
    val truth = Synth.truth(spark, scfg).toDF

    val docs = Dedup.assemble(transcripts).cache()
    val sigs = Dedup.signatures(Dedup.shingle(docs, cfg), cfg).cache()
    // candidates WITHOUT the exact-verify gate: classifier replaces the gate.
    // Use a loosened config so both positives and negatives flow through.
    val loose = cfg.copy(simhashEnabled = false, substringEnabled = false)
    val lsh = Dedup.lshCandidates(sigs, loose).distinct()
    // LSH candidates are nearly all true dups; add hash-shuffled adjacent
    // pairs as background negatives (classifier.py trains on all block pairs,
    // which are overwhelmingly negative)
    val w = org.apache.spark.sql.expressions.Window.orderBy(xxhash64($"conv_id"))
    val negs = sigs.select($"conv_id")
      .withColumn("nxt", lead($"conv_id", 1).over(w))
      .where($"nxt".isNotNull)
      .select(least($"conv_id", $"nxt").as("id1"), greatest($"conv_id", $"nxt").as("id2"))
    val cands = lsh.union(negs).distinct()

    val t1 = truth.select($"conv_id".as("id1"), $"cluster_id".as("c1"))
    val t2 = truth.select($"conv_id".as("id2"), $"cluster_id".as("c2"))
    val labeled = PairClassifier
      .featurize(cands, sigs, docs)
      .join(t1, "id1").join(t2, "id2")
      .withColumn("label", ($"c1" === $"c2").cast("int"))
      .withColumn("block", $"c1") // block-level split on truth cluster
      .cache()
    val nPos = labeled.where($"label" === 1).count()
    val nNeg = labeled.where($"label" === 0).count()
    info(s"pairs: $nPos pos / $nNeg neg")
    assert(nPos > 50 && nNeg > 50, s"need both classes among candidates: $nPos/$nNeg")

    val (train, test) = PairClassifier.blockSplit(labeled, "block", 0.8, seed = 2018L)
    val models = PairClassifier.train(train, numTrees = 30, gbtIters = 15)
    val pred = PairClassifier.predict(models, test.drop("label"))
      .join(test.select($"id1", $"id2", $"label"), Seq("id1", "id2"))
      .cache()

    val tp = pred.where($"dup" === 1 && $"label" === 1).count().toDouble
    val fp = pred.where($"dup" === 1 && $"label" === 0).count().toDouble
    val fn = pred.where($"dup" === 0 && $"label" === 1).count().toDouble
    val p = if (tp + fp == 0) 0 else tp / (tp + fp)
    val r = if (tp + fn == 0) 0 else tp / (tp + fn)
    val f1 = if (p + r == 0) 0 else 2 * p * r / (p + r)
    info(f"held-out: P=$p%.3f R=$r%.3f F1=$f1%.3f")
    assert(f1 >= 0.9, f"ensemble F1 $f1%.3f should be high on separable features")

    // determinism: same seed, same predictions
    val models2 = PairClassifier.train(train, numTrees = 30, gbtIters = 15)
    val pred2 = PairClassifier.predict(models2, test.drop("label"))
    assert(pred.select("id1", "id2", "dup").exceptAll(pred2.select("id1", "id2", "dup")).isEmpty)

    // M7 parity: feature importances are exposed and non-trivial
    val imp = models.rf.featureImportances.toArray
    info(s"feature importances: ${PairClassifier.featureCols.zip(imp).mkString(", ")}")
    assert(imp.sum > 0.999 && imp.count(_ > 0) >= 2)

    // S10 parity: model sink/scan round-trip preserves predictions
    val mdir = java.nio.file.Files.createTempDirectory("graft-model").toString
    models.rf.write.overwrite().save(s"$mdir/rf")
    val reloaded = org.apache.spark.ml.classification.RandomForestClassificationModel.load(s"$mdir/rf")
    assert(reloaded.numTrees == models.rf.numTrees)

    // M5 parity: grid-search CV picks a model with a high PR-area
    val (cvModel, metrics) = PairClassifier.tuneRF(
      train, numTreesGrid = Seq(10), maxDepthGrid = Seq(3, 5), folds = 2)
    info(s"CV avg areaUnderPR per grid point: ${metrics.mkString(", ")}")
    assert(metrics.max > 0.9, metrics.mkString(","))
    assert(cvModel.bestModel.isInstanceOf[org.apache.spark.ml.classification.RandomForestClassificationModel])
  }
}
