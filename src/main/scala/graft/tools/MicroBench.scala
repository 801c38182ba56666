package graft.tools

import org.apache.spark.sql.functions._

import graft.Cols._
import graft.Sessions
import graft.functions.{text => T, MinHashSignature, SimHash64}
import graft.pipeline.Dedup
import graft.synth.Synth

/** Stage-internal microbenchmark: isolates synth / assemble / tokenize /
  * shingle / minhash / simhash costs so optimization targets the real
  * bottleneck instead of a guess.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cores, "microbench")
    val scfg = Synth.Config(nClusters = args.headOption.map(_.toInt).getOrElse(8000))

    def timed(name: String)(f: => Any): Unit = {
      val s0 = System.nanoTime()
      val r = f
      println(f"[micro] $name%-16s ${(System.nanoTime() - s0) / 1e9}%8.2f s  ($r)")
    }

    val transcripts = Synth.transcripts(spark, scfg).toDF.cache()
    timed("synth+cache")(transcripts.count())
    val docs = Dedup.assemble(transcripts).cache()
    timed("assemble")(docs.count())
    timed("tokens_builtin")(docs.select(sum(size(T.tokens($"doc")))).first().get(0))
    timed("shingle_builtin")(docs
      .select(size(T.shingleHashes(T.tokens($"doc"), 5)).as("n"))
      .agg(sum($"n")).first().get(0))
    val sh = docs.select($"conv_id", graft.functions.ShingleHashes($"doc", 5).as("shingles")).cache()
    timed("shingle_fused")(sh.select(sum(size($"shingles"))).first().get(0))
    timed("minhash128")(sh.select(MinHashSignature($"shingles", 128, 42L).as("s"))
      .select(sum(element_at($"s", 1))).first().get(0))
    timed("simhash")(sh.select(SimHash64($"shingles").as("s")).agg(bit_xor($"s")).first().get(0))
    timed("minhash2nd")(sh.select(MinHashSignature($"shingles", 128, 42L).as("s"))
      .select(sum(element_at($"s", 2))).first().get(0))
    spark.stop()
  }
}
