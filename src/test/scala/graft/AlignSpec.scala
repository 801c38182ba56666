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

  // ---------- asOfJoin ----------

  private def asOfFixture = (
    // probes: (event_id, key, ts)
    Seq((1L, "u1", 100L), (2L, "u1", 50L), (3L, "u2", 100L), (4L, "u3", 10L))
      .toDF("event_id", "k", "ts"),
    // refs: (key, ts, ref_id) — u1 has refs at 40,40,100; u2 at 99; u3 none
    Seq(("u1", 40L, 10L), ("u1", 40L, 11L), ("u1", 100L, 12L), ("u2", 99L, 13L))
      .toDF("k", "ts", "ref_id")
  )

  test("asOfJoin: reserved scratch column names are rejected with a clear error") {
    val (probes, refs) = asOfFixture
    val e1 = intercept[IllegalArgumentException] {
      Align.asOfJoin(probes.withColumn("__graft_asof_tag", lit(1)), refs, Seq("k"), "ts")
    }
    assert(e1.getMessage.contains("__graft_asof_tag"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Align.asOfJoin(probes, refs.withColumn("__graft_asof_tie0", lit(1)),
        Seq("k"), "ts", rightTie = Seq("ref_id"))
    }
    assert(e2.getMessage.contains("__graft_asof_tie0"), e2.getMessage)
  }

  test("asOfJoin: strict latest-preceding match per key, null when none") {
    val (probes, refs) = asOfFixture
    val out = Align.asOfJoin(probes, refs, Seq("k"), "ts", rightTie = Seq("ref_id"))
      .select($"event_id", $"matched.ref_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // probe 1 (u1@100): ref@100 excluded under strict <; ties at 40 → max ref_id 11
    assert(out(1L) == 11L)
    assert(out(2L) == 11L) // u1@50: the 40s precede, 100 does not
    assert(out(3L) == 13L) // u2@100 → ref@99
    assert(out(4L) == -1L) // u3: no refs at all
  }

  test("asOfJoin inclusive=true admits the equal-ts reference row") {
    val (probes, refs) = asOfFixture
    val out = Align
      .asOfJoin(probes, refs, Seq("k"), "ts", rightTie = Seq("ref_id"), inclusive = true)
      .where($"event_id" === 1L).select($"matched.ref_id").collect()
    assert(out.head.getLong(0) == 12L)
  }

  test("asOfJoin: null-ts probes match nothing; null-ts references never leak") {
    val probes = Seq((1L, "u", Some(100L)), (2L, "u", Option.empty[Long]))
      .toDF("event_id", "k", "ts")
    val refs = Seq(("u", Option.empty[Long], 7L), ("u", Some(10L), 8L))
      .toDF("k", "ts", "ref_id")
    val out = Align.asOfJoin(probes, refs, Seq("k"), "ts", rightTie = Seq("ref_id"))
      .select($"event_id", $"matched.ref_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out(1L) == 8L) // the null-ts ref (7) is dropped, not carried
    assert(out(2L) == -1L) // a probe without an event time matches nothing
  }

  test("asOfJoin: null join keys follow equi-join semantics — null never matches null") {
    val probes = Seq((1L, Some("u"), 100L), (2L, Option.empty[String], 100L))
      .toDF("event_id", "k", "ts")
    val refs = Seq((Option.empty[String], 10L, 7L), (Some("u"), 10L, 8L))
      .toDF("k", "ts", "ref_id")
    val out = Align.asOfJoin(probes, refs, Seq("k"), "ts", rightTie = Seq("ref_id"))
      .select($"event_id", $"matched.ref_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out(1L) == 8L) // keyed probe matches only the keyed reference
    assert(out(2L) == -1L) // a window partition would have paired the nulls
  }

  test("asOfJoin output is layout-invariant and keeps all probe rows/columns") {
    val probes = (1 to 500).map(i => (i.toLong, s"k${i % 7}", (i * 13 % 997).toLong, s"p$i"))
      .toDF("event_id", "k", "ts", "payload")
    val refs = (1 to 300).map(i => (s"k${i % 7}", (i * 29 % 997).toLong, i.toLong))
      .toDF("k", "ts", "ref_id")
    def run(p: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      Align.asOfJoin(p, r, Seq("k"), "ts", rightTie = Seq("ref_id"))
        .select($"event_id", $"payload", $"matched.ref_id".as("rid"))
        .collect().map(x => (x.getLong(0), x.getString(1), if (x.isNullAt(2)) -1L else x.getLong(2)))
        .toSet
    val a = run(probes, refs)
    val b = run(probes.repartition(11), refs.repartition(3))
    assert(a == b && a.size == 500)
  }
}
