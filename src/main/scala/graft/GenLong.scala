package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, SparkSession}

/** Dev utility (round-14, VERDICT r13 directive 8 stretch — second corpus
  * SHAPE): synthesize a corpus whose per-document LENGTH is Pareto-tailed.
  * The driver corpus is uniformly short (mean 54 tokens, max 100) and the
  * Zipfian board ([[GenSkew]]) stresses shingle document-frequency at the
  * same short lengths — neither exercises the per-document axis a real
  * pretraining mix has: books and code files thousands of times longer
  * than the median page. Length is its own failure mode, orthogonal to
  * df: a single input row that explodes into 30k shingle/gram/window rows
  * (partition skew no byte statistic on the INPUT predicts), per-pair
  * verify kernels whose cost is the SET SIZE (a near-dup pair of 30k-token
  * docs costs 500× the median pair), window functions ordered within a
  * 30k-element document, and sequence-packing/truncation paths whose tail
  * behavior is invisible when every doc fits the context.
  *
  * Corpus model: driver schema (doc_id, text, lang, source, n_chars),
  * same lang/source universes, every other table byte-copied from `src`.
  * Token count per document is Pareto(α = 1.1, L_min = 40) by inverse CDF
  * len = L_min / (1−u)^(1/α), capped at 30000 — mean ≈ 430, p99 ≈ 2600,
  * a handful of cap-length giants per 5k docs. Each doc is its own unique
  * filler tokens (df = 1 — the stress is length, NOT df; the Zipfian
  * board owns that axis) plus three 8-token boilerplate blocks drawn
  * UNIFORMLY from 1000 templates (df ≈ 15 at 5k docs, the flat corpus's
  * regime) so banding/candidate paths stay exercised. ~1% of docs are
  * near-dups of their predecessor (the GenSkew convention: every keyed
  * part derives from `base` = doc_id−1 except a 4..36-token unique tail),
  * which at THIS shape includes near-dup pairs of cap-length documents —
  * the exact-Jaccard verify kernel's worst case.
  *
  * Determinism: every random choice is xxhash64 of (doc_id, salt) — same
  * bytes for the same (src, mult) on every run.
  *
  *   sbt "runMain graft.GenLong /root/testdata/sf0.1 /tmp/long01 1"
  *
  * mult multiplies the document count (ids stay dense 0..n·mult−1); the
  * GenSkew caveat applies — embeddings/events copy unscaled, so use
  * mult=1 for a full-board oracle run.
  */
object GenLong {

  private val Templates = 1000 // uniform boilerplate vocabulary (flat df)
  private val Alpha = 1.1 // Pareto shape: heavy tail, finite mean
  private val MinTokens = 40L
  private val CapTokens = 30000L

  /** Hash-derived uniform in [0,1): pmod(xxhash64(...), 2^30) / 2^30. */
  private def unif(cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(1L << 30)).cast("double") / (1L << 30)

  /** Pareto(α) token count by inverse CDF, capped. u < 1 by construction
    * so the pow denominator never hits zero. */
  private def paretoLen(cols: Column*): Column =
    least(lit(CapTokens),
      floor(lit(MinTokens.toDouble) / pow(lit(1.0) - unif(cols: _*),
        lit(1.0 / Alpha))).cast("long"))

  /** Uniform template rank in 0..Templates−1 (flat df — the length axis
    * must not smuggle in the skew axis). */
  private def tplRank(cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(Templates.toLong))

  /** One boilerplate block: 8 tokens "b<rank>t<j>" (GenSkew's token shape
    * so the two boards' template shingles are comparable). */
  private def block(rank: Column): Column =
    concat_ws(" ", (1 to 8).map(j => concat(lit("b"), rank,
      lit(s"t$j"))): _*)

  /** A run of `n` per-document-unique filler tokens "u<doc>p<from+j>". */
  private def filler(docId: Column, from: Long, n: Column): Column =
    concat_ws(" ", transform(sequence(lit(from), lit(from - 1) + n),
      j => concat(lit("u"), docId, lit("p"), j)))

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
      "GenLong got a pre-existing SparkSession; run it in a fresh JVM")
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))

    val nBase = Tables.load(spark, src, "documents").count()
    val d = col("doc_id")
    // ~1% near-dups of the predecessor (GenSkew convention): all keyed
    // parts derive from `base`, only the 4..36-token tail is the doc's
    // own — at this shape that manufactures near-dup pairs of up to
    // cap-length documents, the per-pair verify kernels' worst case.
    val isDup = d > 0 && pmod(xxhash64(d, lit("dup")), lit(100L)) === 0
    val base = when(isDup, d - 1).otherwise(d)
    val extra = lit(4L) + pmod(xxhash64(d, lit("len")), lit(33L))
    // bulk = Pareto(base) minus the 24 block tokens and 24 leading filler
    // tokens; floor at 0 so short draws degenerate to the block scaffold
    val bulk = greatest(lit(0L), paretoLen(base, lit("plen")) - 48L)
    val docs = spark.range(0, nBase * mult).select(
        col("id").as("doc_id"),
        concat_ws(" ",
          filler(base, 1, lit(8)),
          block(tplRank(base, lit(1), lit("tpl"))),
          filler(base, 9, lit(8)),
          block(tplRank(base, lit(2), lit("tpl"))),
          filler(base, 17, lit(8)),
          block(tplRank(base, lit(3), lit("tpl"))),
          filler(base, 25, bulk),
          // tail `from` sits past any reachable bulk index (25 + 30000)
          // so a dup's own tokens never collide with base-keyed bulk
          filler(d, 40000, extra)).as("text"),
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
    println(s"[genlong] documents x$mult (${nBase * mult} docs) -> " +
      s"$out/documents.parquet")

    Tables.names.filterNot(_ == "documents").foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$src/$t.parquet"),
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      println(s"[genlong] $t copied from $src")
    }

    // shape report: the numbers that justify the corpus's existence
    val toks = Tables.documents(spark, out)
      .select(size(split(col("text"), "[ \t\n\f\r]+")).cast("long").as("n"))
    val shape = toks.agg(
      count(lit(1)).as("docs"), sum(col("n")).as("tokens"),
      max(col("n")).as("max_tok"),
      expr("percentile(n, 0.5)").as("p50"),
      expr("percentile(n, 0.99)").as("p99")).head()
    println(s"[genlong] length shape: docs=${shape.getLong(0)} " +
      s"tokens=${shape.getLong(1)} max=${shape.getLong(2)} " +
      s"p50=${shape.getDouble(3)} p99=${shape.getDouble(4)} " +
      s"(driver corpus: mean 54, max 100)")
    spark.stop()
  }
}
