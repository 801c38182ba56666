package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Align

/** Positional zip-join (J8) under its explicit ordering contract. */
class AlignSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "align-spec")
  import spark.implicits._

  test("zip-join aligns rows by rank of each side's own ordering") {
    val left = Seq((3, "c"), (1, "a"), (2, "b")).toDF("lid", "lval").repartition(3)
    val right = Seq((30, "z"), (10, "x"), (20, "y")).toDF("rid", "rval").repartition(2)
    val out = Align.zipJoin(left, right, Seq($"lid"), Seq($"rid".desc))
      .orderBy("rn").as[(Long, Int, String, Int, String)].collect()
    // left asc by lid zips against right DESC by rid
    assert(out.toSeq == Seq(
      (0L, 1, "a", 30, "z"),
      (1L, 2, "b", 20, "y"),
      (2L, 3, "c", 10, "x")))
  }

  test("shorter side truncates the zip (inner semantics)") {
    val left = (1 to 10).map(i => (i, s"l$i")).toDF("lid", "lval")
    val right = (1 to 4).map(i => (i, s"r$i")).toDF("rid", "rval")
    val out = Align.zipJoin(left, right, Seq($"lid"), Seq($"rid"))
    assert(out.count() == 4)
  }

  test("alignment is partitioning-invariant at larger scale") {
    val left = (1 to 5000).map(i => (i, i * 2)).toDF("lid", "ldouble")
    val right = (1 to 5000).map(i => (i, i * 3)).toDF("rid", "rtriple")
    val out = Align.zipJoin(left.repartition(13), right.repartition(7), Seq($"lid"), Seq($"rid"))
    // row i pairs lid=i+1 with rid=i+1 regardless of physical layout
    assert(out.where($"lid" =!= $"rid").count() == 0)
    assert(out.count() == 5000)
  }

  test("dense index survives a downstream coalesce(1) (stage-fusing write path)") {
    // regression: Verify writes every query with coalesce(1); a runtime
    // TaskContext partition-id lookup sees partition 0 for EVERY fused
    // parent partition, zeroing all offsets — the pid must ride in the data
    val left = (1 to 2000).map(i => (i, i * 2)).toDF("lid", "ldouble").repartition(11)
    val right = (1 to 2000).map(i => (i, i * 3)).toDF("rid", "rtriple").repartition(5)
    val out = Align.zipJoin(left, right, Seq($"lid"), Seq($"rid")).coalesce(1).cache()
    assert(out.count() == 2000)
    assert(out.where($"lid" =!= $"rid").count() == 0)
    out.unpersist()
  }

  test("overlapping column names are rejected with a clear error") {
    val df = Seq((1, "a")).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Align.zipJoin(df, df, Seq($"id"), Seq($"id"))
    }
    assert(e.getMessage.contains("disjoint"))
  }
}
