package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (BASELINE.json north star): media as opaque
  * `binary` payloads + typed metadata, with decode / feature-extraction as
  * batched per-partition transforms.
  *
  * The container ships no image/audio codecs, so `decodeStub` is a
  * deterministic fake decoder (clearly marked); the Spark-side plumbing —
  * binary columns, schema, partition-batched iteration, feature struct — is
  * real and is what a cluster deployment would keep, swapping only the
  * decoder body. Per-partition mapPartitions amortizes any decoder init cost
  * (model weights, codec contexts) across a whole batch, the same shape
  * `mapInPandas`/Arrow batching gives PySpark. */
object Multimodal {

  case class MediaRow(media_id: Long, media_type: String, payload: Array[Byte])
  case class MediaFeatures(
      media_id: Long, media_type: String, n_bytes: Int,
      width: Int, height: Int, checksum: Long)

  /** Fake a media corpus from documents: UTF-8 payload bytes + a type tag.
    * At scale this is `spark.read.format("binaryFile")` or parquet with a
    * binary column; the downstream plumbing is identical. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        concat(lit("img/type"), col("doc_id") % 3).as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** STUB decoder: a real deployment replaces the body with an image/audio
    * codec call. Deterministic fake: "dimensions" derived from payload bytes.
    * Batched per partition so decoder init happens once per task, not row. */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
    // (decoder init would go here — once per partition)
    rows.map { r =>
      val checksum = graft.functions.Fnv.hash64(r.payload)
      MediaFeatures(r.media_id, r.media_type, r.payload.length,
        width = 64 + (math.abs(checksum % 1024)).toInt,
        height = 64 + (math.abs((checksum >> 10) % 1024)).toInt,
        checksum = checksum)
    }
  }

  def extractFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions(decodeStub).toDF()
  }

  /** STUB resize: deterministic integer box-fit of decoded dimensions to
    * `maxDim` (a real deployment calls the image library's resampler; the
    * aspect-preserving geometry and the map-only plumbing are what stays). */
  def resizeStub(f: MediaFeatures, maxDim: Int): MediaFeatures = {
    val longest = math.max(f.width, f.height)
    if (longest <= maxDim) f
    else f.copy(
      width = math.max(1, f.width * maxDim / longest),
      height = math.max(1, f.height * maxDim / longest))
  }

  case class Frame(media_id: Long, media_type: String, frame_idx: Int,
      n_bytes: Int, checksum: Long)

  /** STUB frame sampling: treat the payload as fixed-size frames and keep
    * every k-th (a video decoder would seek keyframes; the explode shape —
    * one media row → many frame rows, batched per partition — is the real
    * plumbing a cluster job keeps). */
  def frameSample(rows: Iterator[MediaRow], frameBytes: Int, everyK: Int)
      : Iterator[Frame] =
    rows.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex
        .filter { case (_, i) => i % everyK == 0 }
        .map { case (chunk, i) =>
          Frame(r.media_id, r.media_type, i, chunk.length,
            graft.functions.Fnv.hash64(chunk))
        }
    }

  def sampleFrames(spark: SparkSession, dir: String,
      frameBytes: Int = 64, everyK: Int = 2): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions(frameSample(_, frameBytes, everyK)).toDF()
  }

  val queries: Seq[Q] = Seq(
    // Payload metadata aggregation per media type; the binary column rides
    // the whole plan as opaque bytes (never stringified).
    Q("q42_media_meta",
      """SELECT 'img/type' || CAST(doc_id % 3 AS VARCHAR) AS media_type,
        |       count(*) AS n_media,
        |       CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
        |       CAST(max(strlen(text)) AS BIGINT) AS max_bytes
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      mediaTable(s, d).toDF()
        .groupBy(col("media_type"))
        .agg(
          count(lit(1)).as("n_media"),
          sum(length(col("payload"))).cast("bigint").as("total_bytes"),
          max(length(col("payload"))).cast("bigint").as("max_bytes"))
        .orderBy(col("media_type"))
    },

    // Decode + feature extraction through the stub decoder (rows-only:
    // checksum/dimensions are decoder-specific).
    Q.rowsOnly("q43_media_features") { (s, d) =>
      extractFeatures(s, d)
        .groupBy(col("media_type"))
        .agg(
          count(lit(1)).as("n"),
          round(avg(col("width")), 2).as("avg_width"),
          round(avg(col("height")), 2).as("avg_height"),
          sum(col("n_bytes")).as("total_bytes"))
        .orderBy(col("media_type"))
    },

    // Frame sampling + resize (the remaining multimodal transforms): one
    // media row explodes to sampled frame rows per partition, decoded dims
    // are box-fit to 256 — per-type frame statistics (rows-only: stub
    // checksums). The oracle-equivalent COUNT shape is pinned by
    // MultimodalSpec against the payload sizes.
    Q.rowsOnly("q55_media_frames") { (s, d) =>
      val spark = s
      import spark.implicits._
      val frames = sampleFrames(s, d, frameBytes = 64, everyK = 2)
      val resized = extractFeatures(s, d)
        .map(r => resizeStub(MediaFeatures(
          r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4),
          r.getLong(5)), 256))
        .toDF()
      frames.groupBy(col("media_type"))
        .agg(
          count(lit(1)).as("n_frames"),
          countDistinct(col("media_id")).as("n_media"),
          sum(col("n_bytes")).as("sampled_bytes"),
          countDistinct(col("checksum")).as("n_distinct_frames"))
        .join(
          resized.groupBy(col("media_type"))
            .agg(max(greatest(col("width"), col("height"))).as("max_dim_resized")),
          "media_type")
        .orderBy(col("media_type"))
    }
  )
}
