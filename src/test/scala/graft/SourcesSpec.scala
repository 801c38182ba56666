package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.synth.Synth

/** Source/sink coverage (SURVEY §2.1): CSV with header, JSON lines, and
  * parquet round-trips preserve the transcript rows; multi-file union scans
  * read shards as one table.
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "sources-spec")

  private def checksum(df: org.apache.spark.sql.DataFrame): Long =
    // cast turn_idx: schema inference widens JSON ints to bigint, and
    // xxhash64 is width-sensitive
    df.select(col("conv_id"), col("turn_idx").cast("long"), col("text"))
      .agg(bit_xor(xxhash64(col("conv_id"), col("turn_idx"), col("text")))).first().getLong(0)

  test("csv/json/parquet round-trips preserve rows; multi-path scan unions shards") {
    val t = Synth.transcripts(spark, Synth.Config(nClusters = 40)).toDF
      .drop("ts") // csv timestamp formatting differs; scope to data columns
      .cache()
    val base = checksum(t)
    val dir = Files.createTempDirectory("graft-src").toString

    // NB: the CSV WRITER trims unquoted whitespace by default
    // (ignoreLeading/TrailingWhiteSpace=true) — disable for fidelity
    t.write.option("header", true)
      .option("ignoreLeadingWhiteSpace", false).option("ignoreTrailingWhiteSpace", false)
      .csv(s"$dir/csv")
    val csv = spark.read.option("header", true).option("inferSchema", true).csv(s"$dir/csv")
    assert(checksum(csv) == base, "csv round-trip")

    t.write.json(s"$dir/json")
    assert(checksum(spark.read.json(s"$dir/json")) == base, "json round-trip")

    t.write.parquet(s"$dir/pq")
    assert(checksum(spark.read.parquet(s"$dir/pq")) == base, "parquet round-trip")

    // multi-file union scan (S4): shards written separately, read as one
    val (a, b) = (t.where(col("turn_idx") % 2 === 0), t.where(col("turn_idx") % 2 === 1))
    a.write.parquet(s"$dir/shards/a")
    b.write.parquet(s"$dir/shards/b")
    val union = spark.read.parquet(s"$dir/shards/a", s"$dir/shards/b")
    assert(checksum(union) == base, "multi-path scan must union shards")

    // filename -> label inference (reference: block name from basename,
    // label.py:17 / dual_marry.py:9): input_file_name + regex
    val labeled = union.withColumn(
      "shard",
      regexp_extract(input_file_name(), "/shards/([ab])/", 1)
    )
    val byShard = labeled.groupBy(col("shard")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byShard.keySet == Set("a", "b"))
    assert(byShard("a") == a.count() && byShard("b") == b.count())
  }
}
