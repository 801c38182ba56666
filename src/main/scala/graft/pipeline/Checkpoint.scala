package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-stage checkpointing with lineage + metrics manifests — the Spark
  * re-expression of the reference's Make checkpoint semantics
  * (Makefile:221-223: `.SECONDARY` keeps intermediates, `.DELETE_ON_ERROR`
  * guarantees no partial outputs are trusted; mtime-based recompute):
  *
  *   - each stage writes `warehouse/<stage>/` as Parquet plus a manifest
  *     `warehouse/_manifest/<stage>.json` recording the stage's input
  *     fingerprint, row count, wall time, and per-partition-file lineage
  *     (file, bytes) — the Iceberg-manifest-shaped metadata layer; the real
  *     Iceberg catalog binding drops into TableIO without touching callers;
  *   - the manifest is written only AFTER a successful Parquet commit, via
  *     atomic rename: a killed run leaves data without manifest, which is
  *     treated as absent and rebuilt (no partial output is ever trusted);
  *   - a stage re-runs iff its manifest is missing or its input fingerprint
  *     (config + upstream fingerprints) changed — Make's mtime dependency
  *     check made content-addressed.
  */
object TableIO {

  final case class Manifest(
      stage: String,
      fingerprint: String,
      rows: Long,
      wallMs: Long,
      files: Seq[(String, Long)] // (file name, bytes) per partition file
  ) {
    def toJson: String = {
      def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      val fs = files.map { case (f, b) => s"""{"file":${q(f)},"bytes":$b}""" }.mkString("[", ",", "]")
      s"""{"stage":${q(stage)},"fingerprint":${q(fingerprint)},"rows":$rows,"wall_ms":$wallMs,"files":$fs}"""
    }
  }

  private def manifestPath(warehouse: String, stage: String) =
    Paths.get(s"$warehouse/_manifest/$stage.json")

  def readManifest(warehouse: String, stage: String): Option[(String, Long)] = {
    val p = manifestPath(warehouse, stage)
    if (!Files.exists(p)) None
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      val fp = """"fingerprint":"([^"]*)"""".r.findFirstMatchIn(s).map(_.group(1))
      val rows = """"rows":(\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
      for (f <- fp; r <- rows) yield (f, r)
    }
  }

  def writeManifest(warehouse: String, m: Manifest): Unit = {
    val dir = Paths.get(s"$warehouse/_manifest")
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".${m.stage}.json.tmp")
    Files.write(tmp, m.toJson.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(warehouse, m.stage), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Zip packaging sink (S9, Makefile:30-32,45-47: `zip -9 result.json` for
    * submission): writes the frame as a single JSON-lines file and wraps it
    * in a deflate-compressed zip — artifact packaging for the final (small)
    * result table, not a data-scale sink. Returns the zip path.
    */
  def packageZip(df: DataFrame, outZip: String, entryName: String = "result.json"): String = {
    val tmp = Files.createTempDirectory("graft-zip").toString
    df.coalesce(1).write.mode("overwrite").json(tmp)
    val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".json")).head
    val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(Paths.get(outZip)))
    try {
      zos.setLevel(9)
      zos.putNextEntry(new java.util.zip.ZipEntry(entryName))
      Files.copy(part.toPath, zos)
      zos.closeEntry()
    } finally zos.close()
    outZip
  }

  /** content fingerprint of a parquet input path: (name, size) of each file */
  def pathFingerprint(path: String): String = {
    val f = new java.io.File(path)
    val entries =
      if (f.isDirectory) f.listFiles().filter(_.isFile).map(x => s"${x.getName}:${x.length}").sorted
      else Array(s"${f.getName}:${f.length}")
    java.lang.Long.toHexString(
      entries.foldLeft(0xcbf29ce484222325L)((h, e) => graft.functions.MinHashImpl.mix64(h ^ e.hashCode.toLong))
    )
  }
}

/** Runs named stages with skip-if-complete semantics. */
final class StageRunner(spark: SparkSession, warehouse: String, verbose: Boolean = true) {
  private val completed = scala.collection.mutable.Map[String, String]() // stage -> fingerprint

  /** Fingerprint of a stage = hash of its own config + upstream stage
    * fingerprints (content-addressed lineage).
    */
  def fingerprintOf(config: String, upstream: Seq[String]): String = {
    val s = (config +: upstream.sorted).mkString("|")
    java.lang.Long.toHexString(
      s.foldLeft(0xcbf29ce484222325L)((h, c) => graft.functions.MinHashImpl.mix64(h ^ c.toLong))
    )
  }

  def fingerprint(stage: String): String = completed.getOrElse(stage, "?")

  /** Execute (or skip) a stage; returns the stage's DataFrame read from its
    * checkpoint table, so downstream plans never re-execute upstream lineage.
    */
  def stage(name: String, config: String, upstream: Seq[String] = Nil)(build: => DataFrame): DataFrame = {
    val fp = fingerprintOf(config, upstream.map(fingerprint))
    val dir = s"$warehouse/$name"
    TableIO.readManifest(warehouse, name) match {
      case Some((oldFp, rows)) if oldFp == fp =>
        if (verbose) println(s"[checkpoint] skip $name (fingerprint $fp, $rows rows)")
        completed(name) = fp
        spark.read.parquet(dir)
      case _ =>
        val t0 = System.nanoTime()
        // capture the write's own numOutputRows metric instead of re-reading
        // the checkpoint just to count (at warehouse scale that second read
        // doubles the stage's I/O). QueryExecutionListener events arrive
        // async on the listener bus, hence the latch; a missing metric falls
        // back to the old count-the-output read.
        @volatile var written = -1L
        val latch = new java.util.concurrent.CountDownLatch(1)
        val listener = new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
            qe.executedPlan.metrics.get("numOutputRows").foreach(m => written = m.value)
            latch.countDown()
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit =
            latch.countDown()
        }
        spark.listenerManager.register(listener)
        try {
          build.write.mode("overwrite").parquet(dir)
          latch.await(30, java.util.concurrent.TimeUnit.SECONDS)
        } finally spark.listenerManager.unregister(listener)
        val wallMs = (System.nanoTime() - t0) / 1000000
        val out = spark.read.parquet(dir)
        val rows = if (written >= 0) written else out.count()
        val files = new java.io.File(dir)
          .listFiles()
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length))
          .toSeq
          .sortBy(_._1)
        TableIO.writeManifest(warehouse, TableIO.Manifest(name, fp, rows, wallMs, files))
        if (verbose) println(s"[checkpoint] built $name (fingerprint $fp, $rows rows, ${wallMs}ms, ${files.size} files)")
        completed(name) = fp
        out
    }
  }
}

/** The dedup pipeline over checkpointed stages — every stage boundary is a
  * resumable table; a mid-pipeline kill resumes from the last complete stage
  * with byte-identical results (deterministic stages + content-addressed
  * fingerprints).
  */
object CheckpointedDedup {
  def run(
      spark: SparkSession,
      transcripts: DataFrame,
      inputFingerprint: String,
      warehouse: String,
      cfg: Dedup.Config = Dedup.Config(),
      verbose: Boolean = true
  ): Dedup.Result = {
    val r = new StageRunner(spark, warehouse, verbose)
    val cfgStr = cfg.toString
    val docs = r.stage("docs", s"assemble|$cfgStr|$inputFingerprint")(Dedup.assemble(transcripts))
    val sigs = r.stage("sigs", s"signatures|$cfgStr", Seq("docs"))(
      Dedup.signatures(Dedup.shingle(docs, cfg), cfg)
    )
    val cands = r.stage("candidates", s"candidates|$cfgStr", Seq("sigs"))(
      Dedup.candidates(sigs, cfg)
    )
    val pairs = r.stage("pairs", s"verify|$cfgStr", Seq("candidates", "sigs"))(
      Dedup.verify(cands, sigs, cfg)
    )
    val clusters = r.stage("clusters", s"cluster|$cfgStr", Seq("pairs", "sigs"))(
      Dedup.cluster(spark, sigs, pairs, ccCheckpointDir = Some(s"$warehouse/_cc_checkpoint"))
    )
    Dedup.Result(docs, sigs, pairs, clusters)
  }
}
