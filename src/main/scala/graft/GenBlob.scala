package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev utility (round-15, fifth corpus SHAPE): BLOB MASS. The four prior
  * shape boards (Zipfian df, Pareto length, language mix, near-dup chains)
  * all stress the text/graph families; the multimodal family
  * (q42/q43/q55 — binary payload metadata, stub decode, frame sampling)
  * had only ever seen the driver corpus, where the median "payload" is
  * ~300 BYTES. Real multimodal corpora invert that: few rows, payloads of
  * 10⁵–10⁷ bytes each, and total cost dominated by bytes moved and
  * scanned, not by row count — the regime where per-partition batching,
  * opaque-binary columns (never stringified), and one-scan fused
  * extraction either pay off or fall over (VERDICT r14 directive 6).
  *
  * Construction: [[NDocsPerMult]]·mult documents, each a payload of
  * ~1.5k–4.6k tokens of 64 hex chars (4 concatenated xxhash64 draws), so
  * payloads run ~100–300 KB — ~450× the driver corpus per-doc, ~90× its
  * total byte mass at mult=1 from 5× FEWER rows. 1% of docs (family
  * position 99 of each 100) byte-duplicate their predecessor's payload,
  * so exact-dedup / savings queries stay non-degenerate at blob mass.
  * Token content is unique per (seed doc, position) — cross-doc shingle
  * df is 1 apart from the duplicate pairs, so the near-dup pair family is
  * near-empty BY DESIGN (its oracles agreeing on tiny results is itself
  * evidence; the stress here is byte mass, not candidate generation).
  *
  * Determinism: payloads are pure arithmetic on (seed_id, position);
  * lang / source keep the driver universes via xxhash64 draws (derived
  * from doc_id, NOT seed_id — duplicate payloads may disagree on
  * metadata, as real mirrored media do).
  *
  *   sbt "runMain graft.GenBlob /root/testdata/sf0.1 /tmp/blob01 1"
  */
object GenBlob {

  private val NDocsPerMult = 1000
  private val HashesPerTok = 4 // 4 x ~16 hex chars = ~64-char tokens

  def main(args: Array[String]): Unit = {
    val (src, out) = (args(0), args(1))
    val mult = if (args.length > 2) args(2).toInt else 1
    require(mult >= 1)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "GenBlob got a pre-existing SparkSession; run it in a fresh JVM")
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))

    val nDocs = NDocsPerMult.toLong * mult
    val d = col("doc_id")
    // payload seed: position 99 of each 100-doc family reuses its
    // predecessor's seed -> byte-identical payload, distinct doc_id
    val seed = when(pmod(d, lit(100L)) === 99, d - 1).otherwise(d)
    // 1536..4607 tokens/doc (uniform via a hash draw) ~> 100-300 KB
    val nTok = pmod(xxhash64(seed, lit("blen")), lit(3072L)) + lit(1536L)
    val tok = (j: org.apache.spark.sql.Column) => concat(
      (0 until HashesPerTok).map(k =>
        hex(xxhash64(seed, lit("btok"), j, lit(k)))): _*)
    val docs = spark.range(0, nDocs).select(
        col("id").as("doc_id"),
        concat_ws(" ",
          transform(sequence(lit(0L), nTok - 1), tok)).as("text"),
        element_at(array(Seq("en", "en", "en", "en", "zh", "es", "fr",
          "de").map(lit): _*), (pmod(xxhash64(d, lit("lang")), lit(8L)) + 1)
          .cast("int")).as("lang"),
        concat(lit("src"), pmod(xxhash64(d, lit("srcn")), lit(20L)))
          .as("source"))
      .withColumn("n_chars", length(col("text")))

    val tmp = s"$out/_tmp_documents"
    docs.coalesce(1).write.mode("overwrite").parquet(tmp)
    import scala.jdk.CollectionConverters._
    val part = scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(tmp))) { st =>
      st.iterator().asScala.filter(_.toString.endsWith(".parquet")).next()
    }
    java.nio.file.Files.move(part,
      java.nio.file.Paths.get(s"$out/documents.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    graft.streaming.EventStreams.wipe(java.nio.file.Paths.get(tmp))

    Tables.names.filterNot(_ == "documents").foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$src/$t.parquet"),
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      println(s"[genblob] $t copied from $src")
    }

    // shape report: byte mass is the design — and the 1% duplicate
    // families must be EXACT (distinct payloads == nDocs - nDocs/100).
    // The scan MUST be batch-bounded: at mult=10 the default 4096-row
    // vector wants ~a row group's 100+ MB of payload contiguous per task
    // and the reserve-doubling kills a default-heap JVM (round-16 find —
    // the engine-level fix below is what every graft main now applies)
    Tables.tuneVectorBatch(spark, out)
    val st = Tables.documents(spark, out).agg(
      count(lit(1)).as("docs"),
      sum(length(col("text"))).as("bytes"),
      min(length(col("text"))).cast("long").as("minb"),
      max(length(col("text"))).cast("long").as("maxb"),
      count_distinct(col("text")).as("distinct_payloads")).head()
    println(s"[genblob] ${st.getLong(0)} docs, ${st.getLong(1)} payload " +
      s"bytes (per-doc ${st.getLong(2)}..${st.getLong(3)}), " +
      s"${st.getLong(4)} distinct payloads (expect " +
      s"${nDocs - nDocs / 100}) -> $out/documents.parquet")
    spark.stop()
  }
}
