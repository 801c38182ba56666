package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `binary` payloads with typed metadata. The Spark-side plumbing
  * (schema, partition-friendly batch shapes, per-frame explode, feature
  * columns) is real and tested; the codec step is STUBBED with a
  * deterministic fake decoder — the image/audio libraries are not in this
  * container, so `decodeStub` is the clearly-marked seam where a real codec
  * (e.g. javax.imageio / JNI ffmpeg per executor) drops in.
  */
object Multimodal {

  /** payload schema: (asset_id, modality, meta struct, bytes) */
  final case class Asset(
      asset_id: String,
      modality: String, // image | audio | video
      width: Int, // image/video
      height: Int,
      sample_rate: Int, // audio
      n_frames: Int, // video frames / audio windows
      bytes: Array[Byte]
  )

  /** Deterministic synthetic binary corpus: payload bytes are a pure function
    * of (seed, asset), sized per modality, so specs and benches need no
    * external media. Every byte stream begins with a 16-byte fake header
    * (magic, width, height, frames) that decodeStub parses — standing in for
    * a real container format.
    */
  def synth(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, math.max(spark.sparkContext.defaultParallelism, 4)).map { i =>
      val mix = graft.functions.MinHashImpl.mix64(seed ^ i)
      val modalities = Array("image", "audio", "video")
      val modality = modalities(((mix & 0x7fffffff) % 3).toInt)
      val w = 16 + (math.abs(mix >> 8) % 48).toInt
      val h = 16 + (math.abs(mix >> 16) % 48).toInt
      val sr = if (modality == "audio") 16000 else 0
      val frames = modality match {
        case "video" => 4 + (math.abs(mix >> 24) % 12).toInt
        case "audio" => 8
        case _       => 1
      }
      val bodyLen = modality match {
        case "image" => w * h
        case "audio" => 256 * frames
        case "video" => w * h * frames / 8
      }
      val bytes = new Array[Byte](16 + bodyLen)
      // fake header: magic 'G','R', width, height, frames (little-endian u16)
      bytes(0) = 'G'; bytes(1) = 'R'
      bytes(2) = (w & 0xff).toByte; bytes(3) = ((w >> 8) & 0xff).toByte
      bytes(4) = (h & 0xff).toByte; bytes(5) = ((h >> 8) & 0xff).toByte
      bytes(6) = (frames & 0xff).toByte; bytes(7) = ((frames >> 8) & 0xff).toByte
      var j = 16
      var s = mix
      while (j < bytes.length) {
        s = graft.functions.MinHashImpl.mix64(s)
        bytes(j) = (s & 0xff).toByte
        j += 1
      }
      Asset(s"asset$i", modality, w, h, sr, frames, bytes)
    }.toDF
  }

  /** STUB DECODE — the seam for a real codec. Parses the deterministic fake
    * header and returns (ok, width, height, frames). A real implementation
    * replaces the body of this function only; schema and callers are final.
    */
  def decodeStub(df: DataFrame): DataFrame = {
    val hdrOk = expr("substring(bytes, 1, 2) = X'4752'") // 'G','R'
    def u16(off: Int) = // little-endian u16 from the binary column
      (expr(s"ascii(substring(bytes, ${off + 1}, 1))") +
        expr(s"ascii(substring(bytes, ${off + 2}, 1))") * 256).cast("int")
    df.withColumn(
      "decoded",
      struct(
        hdrOk.as("ok"),
        u16(2).as("dec_width"),
        u16(4).as("dec_height"),
        u16(6).as("dec_frames")
      )
    )
  }

  /** Frame sampling for video/audio payloads: explode (asset_id, frame_idx,
    * frame_bytes) taking every `stride`-th frame — the batch shape a
    * downstream vision/audio encoder consumes. Pure built-ins: the body is
    * sliced with substring arithmetic on the binary column.
    */
  def sampleFrames(df: DataFrame, stride: Int = 2): DataFrame = {
    val d = decodeStub(df)
    val frames = d.withColumn("frame_size",
      when(col("modality") === "video", (length(col("bytes")) - 16) / col("decoded.dec_frames"))
        .when(col("modality") === "audio", lit(256))
        .otherwise(length(col("bytes")) - 16))
    frames
      .withColumn(
        "frame_idx",
        explode(sequence(lit(0), col("decoded.dec_frames") - 1, lit(stride)))
      )
      .withColumn(
        "frame_bytes",
        expr("substring(bytes, 17 + frame_idx * frame_size, frame_size)")
      )
      .select(col("asset_id"), col("modality"), col("frame_idx"), col("frame_bytes"))
  }

  /** Per-payload feature extraction that is NOT stubbed: a 16-bin byte-value
    * histogram over the body as array<int> — a real reduction over binary
    * data standing in for pixel statistics, and a usable near-dup signal.
    * Typed Dataset map (built-ins can't fold binary efficiently); returns
    * (asset_id, hist array<int>[16]).
    */
  def histograms(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    df.select(col("asset_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .map { case (id, bytes) =>
        val h = new Array[Int](16)
        var i = 16
        while (i < bytes.length) { h((bytes(i) & 0xff) >> 4) += 1; i += 1 }
        (id, h)
      }
      .toDF("asset_id", "hist")
  }
}
