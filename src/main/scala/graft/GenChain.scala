package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev utility (round-14, fourth corpus SHAPE): near-dup CHAINS. The
  * other shape boards stress candidate GENERATION (df skew, doc length,
  * language mix) but every near-dup component in them is a 2-doc pair or
  * a small template clique — transitive CLUSTERING never has to work.
  * Real corpora do the opposite all the time: versioned pages, serial
  * crawls and incremental edits form LONG CHAINS where only ADJACENT
  * revisions clear the similarity threshold, and the component is the
  * transitive closure — the regime where a dedup pipeline's connected-
  * components step earns its O(log diameter) bound (Graph.scala's
  * pointer jumping; GraphSpec pins the algorithm on a synthetic chain,
  * this corpus drives the WHOLE pipeline through it: shingle → pair →
  * cluster → canonical-keep → savings).
  *
  * Construction: documents partition into families of [[ChainLen]]
  * consecutive doc_ids; doc at family position p carries tokens
  * [p·Stride, p·Stride + Window) of its family's token stream
  * ("f<family>t<j>"). Adjacent positions overlap in Window − Stride
  * tokens; with 3-gram shingles that puts adjacent pairs at Jaccard
  * 30/46 ≈ 0.652 (≥ the 0.5 near-dup threshold) and skip-one pairs at
  * 22/54 ≈ 0.407 (< 0.5) — so the j ≥ 0.5 near-dup graph is EXACTLY a
  * length-63 path per family, and the true clusters are 64-doc
  * components of diameter 63. Every family token's df is ≤
  * Window/Stride = 5 (bounded — the pair enumeration stays linear; the
  * stress lands on the CLUSTERING, not the candidate join), and no two
  * docs are byte-identical (windows differ). j ≥ 0.9 queries correctly
  * find ZERO pairs here (adjacent tops out at 0.652) — their oracles
  * agreeing on empty is itself evidence.
  *
  * Determinism: token content is pure arithmetic on (doc_id); lang /
  * source / n_chars keep the driver universes via xxhash64 draws.
  *
  *   sbt "runMain graft.GenChain /root/testdata/sf0.1 /tmp/chain01 1"
  */
object GenChain {

  private val Window = 40 // tokens per doc
  private val Stride = 8 // token offset between adjacent positions

  def main(args: Array[String]): Unit = {
    val (src, out) = (args(0), args(1))
    val mult = if (args.length > 2) args(2).toInt else 1
    // optional 4th arg: family length = component size = diameter + 1
    // (default 64; 1024 drives the pipeline at GraphSpec's depth-10³
    // pointer-jump regime end-to-end)
    val ChainLen = if (args.length > 3) args(3).toInt else 64
    require(mult >= 1 && ChainLen >= 2)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "GenChain got a pre-existing SparkSession; run it in a fresh JVM")
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))

    val nBase = Tables.load(spark, src, "documents").count()
    val d = col("doc_id")
    // integer `div`, not `/`: Column `/` is double division, which is only
    // exact for doc_id < 2^53/ChainLen — family boundaries (and the
    // adjacent-pair J=0.652 design that depends on them) must hold for
    // ANY long doc_id (ADVICE r14)
    val fam = expr(s"doc_id div $ChainLen")
    val pos = pmod(d, lit(ChainLen.toLong))
    val docs = spark.range(0, nBase * mult).select(
        col("id").as("doc_id"),
        concat_ws(" ", transform(
          sequence(pos * Stride, pos * Stride + (Window - 1)),
          j => concat(lit("f"), fam, lit("t"), j))).as("text"),
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
    println(s"[genchain] documents x$mult (${nBase * mult} docs, " +
      s"families of $ChainLen) -> $out/documents.parquet")

    Tables.names.filterNot(_ == "documents").foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$src/$t.parquet"),
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      println(s"[genchain] $t copied from $src")
    }

    // shape report: the exact-Jaccard pair graph IS the design — count
    // adjacent (must be (ChainLen-1) per full family) and any non-adjacent
    // pairs at j >= 0.5 (must be zero)
    val sh = ops.TextOps.shingles(Tables.documents(spark, out), "text", 3)
    val pairs = ops.TextOps.exactJaccardPairsFrom(sh, minJac = 0.5)
      .select(col("doc_a"), col("doc_b"))
    val adj = pairs.filter(col("doc_b") === col("doc_a") + 1).count()
    val nonAdj = pairs.filter(col("doc_b") =!= col("doc_a") + 1).count()
    println(s"[genchain] j>=0.5 pairs: adjacent=$adj (expect ~" +
      s"${nBase * mult * (ChainLen - 1) / ChainLen}), non-adjacent=$nonAdj " +
      "(expect 0) -> components are pure paths of diameter " +
      s"${ChainLen - 1}")
    spark.stop()
  }
}
