package graft.tools

import graft.{Sessions, SparkEntry}

/** Plan-inspection harness for single driver queries: prints the formatted
  * physical plan (pushed filters, codegen spans) and per-rep wall times so a
  * slow query's cost can be attributed before optimizing it.
  *
  * Usage: runMain graft.tools.QueryProfile <queryName> [sfDir] [reps]
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: QueryProfile <queryName> [sfDir] [reps]"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name; have ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = Sessions.local(cpus, s"graft-profile-$name")
    try {
      fn(spark, sfDir).explain("formatted")
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"[profile] $name rep $r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    } finally spark.stop()
  }
}
