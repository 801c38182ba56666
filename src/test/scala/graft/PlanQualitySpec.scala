package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gates — the "would this survive a 100x scale-up"
  * checks: predicate pushdown reaches the parquet scan, column pruning keeps
  * ReadSchema minimal, small dimensions broadcast, hot expressions stay
  * inside whole-stage codegen.
  */
class PlanQualitySpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "plan-spec")
  val sf = "/root/testdata/sf0.001"

  private def formatted(df: org.apache.spark.sql.DataFrame): String = {
    val plan = df.queryExecution.executedPlan
    plan.toString + "\n" + df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("filter + projection are pushed into the parquet scan") {
    val df = SparkEntry.queries("q02_filter_project")(spark, sf)
    val s = formatted(df)
    assert(s.contains("PushedFilters:") && s.contains("l_quantity"), s.take(2000))
    assert(s.contains("GreaterThan(l_quantity,45.0)"), "quantity filter must reach the scan")
    // pruned schema: only 4 referenced columns read, not all 11
    val readSchema = "ReadSchema:.*".r.findFirstIn(s).getOrElse("")
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_extendedprice"),
      s"scan must prune unused columns: $readSchema")
  }

  test("small dimension tables broadcast in the join query") {
    val df = SparkEntry.queries("q03_join_agg")(spark, sf)
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"), s.take(3000))
  }

  test("semi/anti joins use join strategies, not subquery re-scans") {
    val anti = SparkEntry.queries("q05_anti")(spark, sf).queryExecution.executedPlan.toString
    assert(anti.contains("LeftAnti"), anti.take(2000))
    val semi = SparkEntry.queries("q06_semi")(spark, sf).queryExecution.executedPlan.toString
    assert(semi.contains("LeftSemi"), semi.take(2000))
  }

  test("assemble->signatures is a single shuffle with map-side signature compute") {
    val t = graft.synth.Synth.transcripts(spark, graft.synth.Synth.Config(nClusters = 10)).toDF
    val sigs = graft.pipeline.Dedup.signatures(
      graft.pipeline.Dedup.shingle(graft.pipeline.Dedup.assemble(t), graft.pipeline.Dedup.Config()),
      graft.pipeline.Dedup.Config())
    val s = sigs.queryExecution.executedPlan.toString
    // exactly ONE exchange: the groupBy(conv_id) assembly shuffle; shingling +
    // minhash + simhash are computed directly above it, no extra shuffle
    assert("Exchange".r.findAllIn(s).size == 1, s.take(3000))
    // shinglehashes collapses into the aggregate's result projection (it is
    // not printed); the signature expressions sit in the project right above
    assert(s.contains("minhashsignature") && s.contains("simhash64"))
    // custom expressions themselves are WSCG-capable (proven over a codegen
    // source in FunctionsSpec); the span break here is collect_list's object
    // aggregate, which is inherent to the assembly shape
  }

  test("aggregations use partial (map-side) aggregation") {
    val df = SparkEntry.queries("q01_agg")(spark, sf)
    val s = df.queryExecution.executedPlan.toString
    // two HashAggregate nodes (partial + final) around the exchange
    assert("HashAggregate".r.findAllIn(s).size >= 2, s.take(2000))
  }
}
