package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, SparkSession}

/** Dev utility (round-14, VERDICT r13 directive 8 — third corpus SHAPE:
  * many-language mix). The driver corpus's `text` is synthetic latin
  * filler for every row, so the q28/q88 language classifier degenerates
  * (almost everything scores 'unknown'), the per-lang group-bys see a
  * benign 8-way split, and no document exercises the CJK branch or the
  * no-whitespace tokenization edge. This generator makes the LANGUAGE
  * axis real while deliberately keeping the other two stress axes flat
  * (df: every word-3-shingle contains a per-document-unique filler
  * token, so shingle df stays ≤ 2 for dup pairs plus a bounded uniform
  * template df — the Zipfian board owns the df axis; length: base-like
  * short docs — the Pareto board owns the length axis):
  *
  *  - content language per doc: zh 45%, en 20%, es 12%, fr 10%, de 8%,
  *    none 5% — a HEAVILY skewed mix (the zh majority skews every
  *    per-lang aggregate and the (source, lang) mixture frames).
  *  - zh documents carry three 12-char CJK template runs (drawn
  *    uniformly from 1000 templates) with NO internal whitespace — each
  *    run is ONE 12-char token to the whitespace tokenizer, exercising
  *    the CJK regexp branch of the classifier and the
  *    many-chars-per-token regime everywhere chars/token is computed.
  *  - latin documents interleave unique fillers with REAL stopwords of
  *    their content language (the same 7-word lists the classifier
  *    scores, hardcoded here deliberately: the classifier is the thing
  *    under test, the corpus just supplies discriminative material).
  *  - the `lang` LABEL is the content language 95% of the time and a
  *    uniform draw otherwise (and always a uniform draw for content-free
  *    docs) — so the q28 confusion matrix gains real off-diagonal mass
  *    instead of being trivially diagonal.
  *  - ~1% near-dups of the predecessor (the GenSkew/GenLong convention;
  *    `base` keys every shared part, so dup pairs share their content
  *    language and text blocks).
  *
  * Schema/universes match the driver corpus (doc_id, text, lang, source,
  * n_chars; lang ∈ {en,zh,es,fr,de}, source ∈ src0..src19); every other
  * table is byte-copied. Determinism: every choice is xxhash64 of
  * (doc_id, salt).
  *
  *   sbt "runMain graft.GenMix /root/testdata/sf0.1 /tmp/mix01 1"
  */
object GenMix {

  private val Templates = 1000 // uniform CJK-run vocabulary (bounded df)

  /** 1000 deterministic 12-char CJK template runs (chars from the same
    * U+4E00.. block the classifier's regexp matches). Constant-folded
    * into the plan as literals. */
  private val cjkTemplates: IndexedSeq[String] =
    (0 until Templates).map { r =>
      new String((0 until 12).map(j => (0x4E00 + (r * 31 + j * 7) % 2000)
        .toChar).toArray)
    }

  /** The q28 classifier's own stopword lists (TextOps.stop is private;
    * duplicated here on purpose — the corpus only needs to SUPPLY words
    * the classifier scores, and if the lists ever drift the mix board's
    * confusion matrix changes visibly rather than silently). */
  private val stops = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une", "est"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht"))

  private def unif100(cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(100L))

  /** One token from a literal vocabulary, hash-picked. */
  private def pick(vocab: Seq[String], cols: Column*): Column =
    element_at(array(vocab.map(lit): _*),
      (pmod(xxhash64(cols: _*), lit(vocab.size.toLong)) + 1).cast("int"))

  /** A run of `n` per-document-unique filler tokens "u<doc>p<from+j>". */
  private def filler(docId: Column, from: Int, n: Column): Column =
    concat_ws(" ", transform(sequence(lit(from), lit(from - 1) + n),
      j => concat(lit("u"), docId, lit("p"), j)))

  /** Latin-language body: 12 (unique-filler, stopword) token pairs — every
    * 3-shingle spans a unique token, so df never leaves the dup-pair
    * regime while stopword hits dominate the classifier score. */
  private def latinBody(lang: String, base: Column): Column =
    concat_ws(" ", (1 to 12).flatMap { i =>
      Seq(concat(lit("u"), base, lit(s"p$i")): Column,
        pick(stops(lang), base, lit(i), lit(s"sw$lang")))
    }: _*)

  /** zh body: unique fillers around three no-whitespace CJK template runs
    * (each run = ONE token to the whitespace tokenizer). */
  private def zhBody(base: Column): Column = {
    def run(i: Int) = pick(cjkTemplates, base, lit(i), lit("cjk"))
    concat_ws(" ",
      filler(base, 1, lit(4)), run(1),
      filler(base, 5, lit(4)), run(2),
      filler(base, 9, lit(4)), run(3),
      filler(base, 13, lit(4)))
  }

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
      "GenMix got a pre-existing SparkSession; run it in a fresh JVM")
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))

    val nBase = Tables.load(spark, src, "documents").count()
    val d = col("doc_id")
    val isDup = d > 0 && pmod(xxhash64(d, lit("dup")), lit(100L)) === 0
    val base = when(isDup, d - 1).otherwise(d)
    // content language, keyed by base so dup pairs share it:
    // zh 45 / en 20 / es 12 / fr 10 / de 8 / none 5
    val cl = unif100(base, lit("clang"))
    val contentLang = when(cl < 45, "zh").when(cl < 65, "en")
      .when(cl < 77, "es").when(cl < 87, "fr").when(cl < 95, "de")
      .otherwise("none")
    val body = when(contentLang === "zh", zhBody(base))
      .when(contentLang === "en", latinBody("en", base))
      .when(contentLang === "es", latinBody("es", base))
      .when(contentLang === "fr", latinBody("fr", base))
      .when(contentLang === "de", latinBody("de", base))
      .otherwise(filler(base, 1, lit(24)))
    val extra = lit(4L) + pmod(xxhash64(d, lit("len")), lit(33L))
    // label: content language 95% of the time; uniform over the five
    // real labels otherwise (always uniform for content-free docs) —
    // keyed by the doc's OWN id so a dup and its base can disagree
    val misdraw = unif100(d, lit("mis")) < 5
    val randLabel = pick(Seq("en", "zh", "es", "fr", "de"), d, lit("rl"))
    val docs = spark.range(0, nBase * mult).select(
        col("id").as("doc_id"),
        concat_ws(" ", body, filler(d, 1000, extra)).as("text"),
        when(contentLang === "none" || misdraw, randLabel)
          .otherwise(contentLang).as("lang"),
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
    println(s"[genmix] documents x$mult (${nBase * mult} docs) -> " +
      s"$out/documents.parquet")

    Tables.names.filterNot(_ == "documents").foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$src/$t.parquet"),
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      println(s"[genmix] $t copied from $src")
    }

    // shape report: label distribution × the engine's own classifier view
    val rep = ops.TextOps.withPredictedLang(Tables.documents(spark, out))
      .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"))
    println("[genmix] top label × predicted cells:")
    rep.limit(12).collect().foreach(r =>
      println(s"[genmix]   ${r.getString(0)} -> ${r.getString(1)}: ${r.getLong(2)}"))
    spark.stop()
  }
}
