package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with a typed metadata struct. The Spark-side contract —
 * schema, batch shape, partition sizing — is real and tested; the actual
 * codec step is STUBBED with a deterministic fake (this container has no
 * image/audio libraries), clearly marked below. On a real cluster the stub
 * body is replaced by the decode call; every plan shape stays identical.
 *
 * Scale notes: payload rows are fat — `repartitionByBytes` targets a fixed
 * number of payload bytes per task so executors don't OOM on 100 MB
 * videos; metadata-only transforms `select` away the binary column first
 * so Parquet never scans payloads it doesn't need (column pruning does the
 * rest).
 */
object Multimodal {

  /** Canonical multimodal schema fragment. */
  val mediaMeta: StructType = StructType(Seq(
    StructField("media_type", StringType),  // image | audio | video
    StructField("mime", StringType),
    StructField("width", IntegerType),      // images/video
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),// audio
    StructField("duration_ms", LongType)))  // audio/video

  /**
   * Wrap a table with a synthesized binary payload derived from a text
   * column — the deterministic stand-in for reading real media blobs.
   * @return original columns + (payload: binary, media: struct)
   */
  def synthesizePayloads(df: DataFrame, textCol: String = "text"): DataFrame = {
    val payload = to_binary(sha2(col(textCol), 512), lit("hex"))
    df.withColumn("payload", payload)
      .withColumn("media", struct(
        lit("image").as("media_type"),
        lit("image/x-fake").as("mime"),
        (pmod(xxhash64(col(textCol)), lit(1920)) + 32).cast("int").as("width"),
        (pmod(xxhash64(col(textCol), lit(1)), lit(1080)) + 32).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("long").as("duration_ms")))
  }

  /**
   * STUB — deterministic fake "decode + feature extract".
   *
   * Real deployment: an `mapInArrow`/Pandas-UDF batch calling the codec
   * (PIL/ffmpeg) per payload, batch size bounded by bytes not rows. Here
   * the "features" are a pure function of the payload bytes (xxhash64
   * folds), so tests can assert the full plumbing — schema, nullability,
   * determinism, partition shape — end to end.
   *
   * @return (…, features: array<double> of length `dim`)
   */
  def extractFeatures(df: DataFrame, dim: Int = 8,
      payloadCol: String = "payload"): DataFrame = {
    val feats = (0 until dim).map { i =>
      // fold payload bytes + lane index into [-1, 1]
      (pmod(xxhash64(col(payloadCol), lit(i)), lit(2000001L)).cast("double")
        / 1000000.0 - 1.0)
    }
    df.withColumn("features", array(feats: _*))
  }

  /** STUB — "resize": metadata-only transform; real impl would re-encode
   *  the payload. Keeps the contract that resize never reads other rows. */
  def resize(df: DataFrame, maxSide: Int): DataFrame = {
    val w = col("media.width")
    val h = col("media.height")
    val scale = least(lit(maxSide) / greatest(w, h).cast("double"), lit(1.0))
    df.withColumn("media", struct(
      col("media.media_type"), col("media.mime"),
      ceil(w * scale).cast("int").as("width"),
      ceil(h * scale).cast("int").as("height"),
      col("media.sample_rate"), col("media.duration_ms")))
  }

  /** STUB — frame sampling contract for video: emits `n` (frame_idx, ts_ms)
   *  rows per payload; real impl decodes the frames. Output-linear. */
  def sampleFrames(df: DataFrame, n: Int, idCol: String): DataFrame =
    df.select(col(idCol), col("media"),
        posexplode(sequence(lit(0), lit(n - 1))).as(Seq("frame_idx", "_")))
      .select(col(idCol), col("frame_idx"),
        (col("frame_idx") * coalesce(col("media.duration_ms"), lit(40L * n)) / n)
          .cast("long").as("ts_ms"))

  /**
   * Partition payload rows so each task holds ≈`targetBytes` of payload —
   * the knob that keeps 100 MB media rows from OOMing an executor at
   * 100 TB. Uses a cheap aggregate for the total, then repartitions.
   */
  def repartitionByBytes(df: DataFrame, targetBytes: Long,
      payloadCol: String = "payload"): DataFrame = {
    val total = df.agg(sum(length(col(payloadCol)))).head().getLong(0)
    val parts = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    df.repartition(parts)
  }
}
