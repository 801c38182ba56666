package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's flagship smoke contract: SparkEntry.entry(spark) must return
  * a non-empty DataFrame (the dedup cluster assignment).
  */
class EntrySpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "entry-spec")

  test("entry returns non-empty cluster assignment") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSet == Set("conv_id", "component"))
    assert(df.count() > 0)
  }
}
