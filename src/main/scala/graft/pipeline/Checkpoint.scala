package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
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

  /** All metadata IO goes through the Hadoop FileSystem API, so the
    * warehouse can live on any cluster filesystem (hdfs://, s3a://, file:/)
    * — the local-path java.io/java.nio calls this replaces were dead on
    * anything but a single machine. The Hadoop conf comes from the active
    * Spark session (which carries the cluster's fs.* settings).
    */
  private[pipeline] def hadoopConf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf()).getOrElse(new Configuration())

  private[pipeline] def fsOf(p: Path): FileSystem = p.getFileSystem(hadoopConf)

  private def manifestPath(warehouse: String, stage: String) =
    new Path(s"$warehouse/_manifest/$stage.json")

  def readManifest(warehouse: String, stage: String): Option[(String, Long)] = {
    val p = manifestPath(warehouse, stage)
    val fs = fsOf(p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
      val fp = """"fingerprint":"([^"]*)"""".r.findFirstMatchIn(s).map(_.group(1))
      val rows = """"rows":(\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
      for (f <- fp; r <- rows) yield (f, r)
    }
  }

  def writeManifest(warehouse: String, m: Manifest): Unit = {
    val dir = new Path(s"$warehouse/_manifest")
    val fs = fsOf(dir)
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".${m.stage}.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(m.toJson.getBytes(StandardCharsets.UTF_8)) finally out.close()
    // FileContext.rename(OVERWRITE) is the atomic-replace primitive on HDFS
    // and posix local filesystems (FileSystem.rename has no overwrite mode)
    FileContext.getFileContext(dir.toUri, hadoopConf)
      .rename(tmp, manifestPath(warehouse, m.stage), Options.Rename.OVERWRITE)
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
    val p = new Path(path)
    val fs = fsOf(p)
    val st = fs.getFileStatus(p)
    val entries =
      if (st.isDirectory)
        fs.listStatus(p).filter(_.isFile).map(x => s"${x.getPath.getName}:${x.getLen}").sorted
      else Array(s"${st.getPath.getName}:${st.getLen}")
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
        // async on the listener bus, hence the latch. The listener bus is
        // SHARED across the session and delivery is async, so events from
        // other actions (a prior stage's count(), a concurrent query) can
        // arrive while this stage's write runs — accept only the event whose
        // executed plan is a file-write command targeting THIS stage's
        // directory. A missing/unmatched metric falls back to the old
        // count-the-output read.
        @volatile var written = -1L
        val latch = new java.util.concurrent.CountDownLatch(1)
        val listener = new org.apache.spark.sql.util.QueryExecutionListener {
          // fs-qualified target: path comparison must survive scheme/authority
          // differences (file: vs none, trailing slash) between how the write
          // command and this class spell the same directory
          private val target = {
            val p = new Path(dir)
            TableIO.fsOf(p).makeQualified(p)
          }
          private def isOurWrite(qe: org.apache.spark.sql.execution.QueryExecution): Boolean =
            qe.executedPlan match {
              // match the write STRUCTURALLY on the command's own outputPath:
              // a plan-STRING containment test silently never matches when
              // spark.sql.maxToStringFields truncates the rendered plan,
              // burning the full latch timeout + a re-count every stage
              case exec: org.apache.spark.sql.execution.command.DataWritingCommandExec =>
                exec.cmd match {
                  case c: org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand =>
                    TableIO.fsOf(c.outputPath).makeQualified(c.outputPath) == target
                  case _ => false
                }
              // any other write plan shape (e.g. a future V2 path): keep the
              // old substring heuristic as a fallback rather than never match
              case p =>
                p.getClass.getSimpleName.contains("Command") && p.toString.contains(dir)
            }
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
            if (isOurWrite(qe)) {
              qe.executedPlan.metrics.get("numOutputRows").foreach(m => written = m.value)
              latch.countDown()
            }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit =
            if (isOurWrite(qe)) latch.countDown()
        }
        spark.listenerManager.register(listener)
        try {
          build.write.mode("overwrite").parquet(dir)
          latch.await(10, java.util.concurrent.TimeUnit.SECONDS)
        } finally spark.listenerManager.unregister(listener)
        val wallMs = (System.nanoTime() - t0) / 1000000
        val out = spark.read.parquet(dir)
        val rows = if (written >= 0) written else out.count()
        val dirPath = new Path(dir)
        val files = TableIO.fsOf(dirPath)
          .listStatus(dirPath)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .map(f => (f.getPath.getName, f.getLen))
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
    // the clusters stage is PERSISTED parquet at this point, so no live
    // lineage references the CC loop's reliable checkpoints — reclaim them
    // (they total one full edge-set copy per run and are never
    // reference-tracked by Spark's cleaner)
    graft.plans.ConnectedComponents.cleanCheckpoints(spark, s"$warehouse/_cc_checkpoint")
    Dedup.Result(docs, sigs, pairs, clusters)
  }
}
