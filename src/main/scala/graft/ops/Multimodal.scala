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

  /** STUB decode of one media row: a real deployment replaces the body with
    * an image/audio codec call. Deterministic fake: "dimensions" derived from
    * payload bytes (width/height ∈ [64, 1087]). */
  def decodeOne(r: MediaRow): MediaFeatures = {
    val checksum = graft.functions.Fnv.hash64(r.payload)
    MediaFeatures(r.media_id, r.media_type, r.payload.length,
      width = 64 + (math.abs(checksum % 1024)).toInt,
      height = 64 + (math.abs((checksum >> 10) % 1024)).toInt,
      checksum = checksum)
  }

  /** Batched per partition so decoder init happens once per task, not row. */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
    // (decoder init would go here — once per partition)
    rows.map(decodeOne)
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

  case class MediaSummary(media_type: String, n_frames: Int,
      sampled_bytes: Long, r_width: Int, r_height: Int)

  /** Decode + frame-sample + resize in ONE per-partition pass (one scan of
    * the corpus, one decoder init per task — at real media sizes decoding
    * twice is the cost that matters, so the combined extraction is the
    * production shape; `extractFeatures`/`sampleFrames` stay as the
    * single-purpose entry points). */
  def summarize(rows: Iterator[MediaRow], frameBytes: Int, everyK: Int,
      maxDim: Int): Iterator[MediaSummary] =
    rows.map { r =>
      val resized = resizeStub(decodeOne(r), maxDim)
      val frames = frameSample(Iterator.single(r), frameBytes, everyK).toSeq
      MediaSummary(r.media_type, frames.size,
        frames.iterator.map(_.n_bytes.toLong).sum,
        resized.width, resized.height)
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

    // Decode + feature extraction through the stub decoder. Oracle-checked
    // via the q49/q64 property pattern: counts and byte totals are engine-
    // independent (DuckDB recomputes them from the payload source), the
    // decoder-specific outputs are verified IN-ENGINE as invariant booleans —
    // dimensions inside the decoder's documented [64, 1087] range, and the
    // 64-bit checksum injective over this corpus's distinct payloads (the
    // n_distinct_payloads column equals DuckDB's count(DISTINCT text) only
    // if no two payloads collided).
    Q("q43_media_features",
      """SELECT 'img/type' || CAST(doc_id % 3 AS VARCHAR) AS media_type,
        |       count(*) AS n,
        |       CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
        |       count(DISTINCT text) AS n_distinct_payloads,
        |       CAST(1 AS BOOLEAN) AS dims_ok
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      extractFeatures(s, d)
        .groupBy(col("media_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("n_bytes")).cast("bigint").as("total_bytes"),
          countDistinct(col("checksum")).as("n_distinct_payloads"),
          (min(col("width")) >= 64 && max(col("width")) <= 1087 &&
            min(col("height")) >= 64 && max(col("height")) <= 1087)
            .as("dims_ok"))
        .orderBy(col("media_type"))
    },

    // Frame sampling + resize in one combined per-partition decode (one
    // corpus scan — the previous two-scan shape decoded everything twice).
    // Frame counts and sampled byte totals follow from payload length alone
    // (64-byte frames, every 2nd kept), so DuckDB recomputes them
    // arithmetically from strlen — a genuine cross-check that the explode
    // plumbing chunked the real bytes correctly; the stub-specific resize
    // geometry is verified in-engine as a boolean (box-fit never exceeds
    // 256 and never collapses below 1).
    Q("q55_media_frames",
      """WITH m AS (
        |  SELECT 'img/type' || CAST(doc_id % 3 AS VARCHAR) AS media_type,
        |         strlen(text) AS nb,
        |         CAST((strlen(text) + 63) // 64 AS BIGINT) AS nchunks
        |  FROM documents),
        |f AS (
        |  SELECT media_type,
        |         (nchunks + 1) // 2 AS kept,
        |         64 * ((nchunks + 1) // 2)
        |           - CASE WHEN (nchunks - 1) % 2 = 0
        |                  THEN 64 * nchunks - nb ELSE 0 END AS sampled
        |  FROM m)
        |SELECT media_type, count(*) AS n_media,
        |       CAST(sum(kept) AS BIGINT) AS n_frames,
        |       CAST(sum(sampled) AS BIGINT) AS sampled_bytes,
        |       CAST(1 AS BOOLEAN) AS resize_ok
        |FROM f GROUP BY media_type ORDER BY media_type""".stripMargin) { (s, d) =>
      val spark = s
      import spark.implicits._
      mediaTable(s, d)
        .mapPartitions(summarize(_, frameBytes = 64, everyK = 2, maxDim = 256))
        .toDF()
        .groupBy(col("media_type"))
        .agg(
          count(lit(1)).as("n_media"),
          sum(col("n_frames")).cast("bigint").as("n_frames"),
          sum(col("sampled_bytes")).cast("bigint").as("sampled_bytes"),
          (max(greatest(col("r_width"), col("r_height"))) <= 256 &&
            min(least(col("r_width"), col("r_height"))) >= 1).as("resize_ok"))
        .orderBy(col("media_type"))
    }
  )
}
