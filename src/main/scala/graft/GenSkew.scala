package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, SparkSession}

/** Dev utility (round-14, VERDICT r13 directive 3): synthesize a corpus
  * whose shingle document-frequency is ZIPFIAN — the shape the adaptive
  * exact-Jaccard/SimHash thresholds were never measured on. The flat-df
  * driver corpus (max shingle df 25, Σdf² linear in corpus size) is the
  * direct shared-shingle plan's best case; real web text carries
  * boilerplate (headers, licenses, navigation) whose shingles appear in
  * millions of documents, making the direct plan's Σdf² enumeration
  * quadratic in df while the PPJoin rarest-first prefix excludes exactly
  * those shingles. This generator reproduces that shape deterministically
  * so the direct-vs-prefix crossover can be MEASURED instead of argued.
  *
  * Corpus model: `documents` keeps the driver schema (doc_id, text, lang,
  * source, n_chars) with the same lang/source value universes; every
  * other table is copied byte-identical from `src`. Each document is
  * mostly unique filler tokens (so verified near-dup pairs stay RARE —
  * the stress lands on candidate generation, not on a blown-up answer)
  * plus `BlocksPerDoc` boilerplate blocks of `BlockTokens` tokens drawn
  * from `Templates` templates with Zipf(1) probability P(rank r) ∝ 1/r
  * via inverse-CDF r = ⌊T^u⌋ on a hash-derived uniform u. Template
  * blocks repeat verbatim across documents, so each template's
  * block-internal shingles have document frequency ≈ its draw count —
  * df(rank r) ≈ (docs·3)/(r·H_T): at mult=10 (50k docs) the hottest
  * shingle sits in ~20k documents vs 25 on the flat corpus.
  *
  * Determinism: every random choice is xxhash64 of (doc_id, position,
  * salt) — same output bytes for the same (src, mult) on every run.
  *
  *   sbt "runMain graft.GenSkew /root/testdata/sf0.1 /tmp/skew01 1"
  *
  * mult multiplies the document count (ids stay dense 0..n·mult-1).
  * NOTE on mult>1: embeddings/events are copied unscaled, so doc_id↔
  * vec_id coverage thins — fine for the text/pair family this corpus
  * exists to stress; use mult=1 for a full-board oracle run.
  */
object GenSkew {

  private val Templates = 1000 // Zipf vocabulary of boilerplate blocks
  private val BlocksPerDoc = 3
  private val BlockTokens = 8

  /** Hash-derived uniform in [0,1): pmod(xxhash64(...), 2^30) / 2^30. */
  private def unif(cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(1L << 30)).cast("double") / (1L << 30)

  /** Zipf(1) template rank in 1..T-1 by inverse CDF: ⌊T^u⌋. */
  private def zipfRank(cols: Column*): Column =
    floor(pow(lit(Templates.toDouble), unif(cols: _*))).cast("long")

  /** One boilerplate block: BlockTokens tokens "b<rank>t<j>". */
  private def block(rank: Column): Column =
    concat_ws(" ", (1 to BlockTokens).map(j => concat(lit("b"), rank,
      lit(s"t$j"))): _*)

  /** A run of `n` per-document-unique filler tokens "u<doc>p<from+j>". */
  private def filler(docId: Column, from: Int, n: Column): Column =
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
      "GenSkew got a pre-existing SparkSession; run it in a fresh JVM")
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))

    val nBase = Tables.load(spark, src, "documents").count()
    val d = col("doc_id")
    // ~1% of docs are NEAR-DUPS of their predecessor: every keyed part
    // except the tail derives from `base` = doc_id−1, so the pair shares
    // its first 48 tokens (46 shingles) and differs only in the two
    // unique tails (4..36 tokens each) — about half of those pairs land
    // at Jaccard ≥ 0.5, giving the q27/q44 oracles NONZERO verified
    // output on this corpus shape (0=0 would be sterile evidence).
    // Chained dups (base is itself a dup, P≈1e-4) simply don't match —
    // fewer pairs, never wrong ones.
    val isDup = d > 0 && pmod(xxhash64(d, lit("dup")), lit(100L)) === 0
    val base = when(isDup, d - 1).otherwise(d)
    // tail length 4..36 tokens keyed by the doc's OWN id, split around
    // the three blocks so block boundaries always meet unique tokens
    // (boundary shingles df≈1; only the 6 block-INTERNAL shingles per
    // block carry the Zipfian df)
    val extra = lit(4L) + pmod(xxhash64(d, lit("len")), lit(33L))
    val docs = spark.range(0, nBase * mult).select(
        col("id").as("doc_id"),
        concat_ws(" ",
          filler(base, 1, lit(8)),
          block(zipfRank(base, lit(1), lit("tpl"))),
          filler(base, 9, lit(8)),
          block(zipfRank(base, lit(2), lit("tpl"))),
          filler(base, 17, lit(8)),
          block(zipfRank(base, lit(3), lit("tpl"))),
          filler(d, 25, extra)).as("text"),
        // same value universes as the driver corpus, en-heavy like it
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
    println(s"[genskew] documents x$mult (${nBase * mult} docs) -> " +
      s"$out/documents.parquet")

    Tables.names.filterNot(_ == "documents").foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$src/$t.parquet"),
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      println(s"[genskew] $t copied from $src")
    }

    // shape report: the numbers that justify the corpus's existence
    val sh = ops.TextOps.shingles(Tables.documents(spark, out), "text", 3)
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val shape = dfreq.agg(
      count(lit(1)).as("shingles"),
      sum(col("df")).as("rows"),
      max(col("df")).as("max_df"),
      sum(col("df") * col("df")).as("sum_df2")).head()
    println(s"[genskew] shingle shape: distinct=${shape.getLong(0)} " +
      s"rows=${shape.getLong(1)} max_df=${shape.getLong(2)} " +
      s"sum_df2=${shape.getLong(3)} (flat corpus max_df≈25)")
    spark.stop()
  }
}
