package graft

import org.apache.spark.sql.functions._

/** Round-5 training-data operators: sequence packing (q102), hash-threshold
  * mixture sampling (q103), seeded shuffle shards (q104), JSONL corpus
  * round-trip (q105) and streaming ingest dedup (q106). Each is checked
  * against an independent driver-side recomputation on sf0.001 — the same
  * md5/packing arithmetic coded a second time, not a re-run of the plan.
  */
class PackingSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf0001)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Space-only trim, matching Spark's trim()/DuckDB's trim() — Java
    * String.trim also strips \t/\n and would diverge on such texts. */
  private def sqlTrim(s: String): String = s.replaceAll("^ +| +$", "")

  /** (doc_id, source, n_tokens) for every doc, the spec's own tokenizer. */
  private lazy val docTokens: Seq[(Long, String, Long)] =
    Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        sqlTrim(r.getString(2)).toLowerCase.split("\\s+").length.toLong))
      .toSeq

  test("q102: packing arithmetic matches a sequential driver-side reference") {
    val L = 64
    val expected = docTokens.groupBy(_._2).map { case (src, docs) =>
      val sorted = docs.sortBy(_._1)
      var off = 0L; var straddle = 0L
      sorted.foreach { case (_, _, n) =>
        if ((off + n - 1) / L > off / L) straddle += 1
        off += n
      }
      val total = sorted.map(_._3).sum
      (src, (sorted.size.toLong, total, (total + L - 1) / L, straddle))
    }
    val got = q("q102_sequence_pack").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (src, e) => assert(got(src) == e, s"source $src") }
  }

  test("q103: kept counts equal the md5-threshold reference, tier 3 keeps all") {
    val expected = docTokens.groupBy(_._2).map { case (src, docs) =>
      val tier = src.drop(3).toInt % 4
      val thr = Seq("4000", "8000", "c000", "ffffff")(tier)
      src -> docs.count { case (id, _, _) =>
        tier == 3 || md5hex(id.toString).take(4) < thr }.toLong
    }
    val got = q("q103_mixture_sample").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (src, e) => assert(got(src) == e, s"source $src") }
  }

  test("q104: shards partition the corpus and pin the within-shard order") {
    val rows = q("q104_shuffle_shards").collect()
    val total = docTokens.size.toLong
    assert(rows.map(_.getLong(1)).sum == total)
    assert(rows.map(_.getLong(2)).sum == docTokens.map(_._1).sum)
    // independent order checksum: rank docs by md5("42:" + id) per shard
    val expected = docTokens.map(_._1)
      .map(id => (id, md5hex(s"42:$id")))
      .groupBy(_._2.head)
      .map { case (shard, ds) =>
        shard.toString -> ds.sortBy(d => (d._2, d._1)).zipWithIndex
          .map { case ((id, _), i) => (i + 1L) * id }.sum % 1000000007L
      }
    rows.foreach { r =>
      assert(r.getLong(3) == expected(r.getString(0)), s"shard ${r.getString(0)}")
    }
    // 16 hex shards, roughly balanced (hash uniformity, loose bound)
    assert(rows.length == 16)
    assert(rows.map(_.getLong(1)).max <= 3 * rows.map(_.getLong(1)).min)
  }

  test("q105: JSONL round-trip preserves every text byte-exact") {
    val rows = q("q105_jsonl_corpus").collect()
    rows.foreach(r => assert(r.getLong(4) == r.getLong(1),
      s"len mismatch after roundtrip in ${r.getString(0)}"))
    // same audit computed straight from parquet must agree column-for-column
    val direct = Tables.documents(spark, sf0001)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text").cast("binary"))).as("n_uniq_texts"),
        sum(length(col("text"))).cast("long").as("sum_text_chars"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    rows.foreach { r =>
      assert(direct(r.getString(0)) ==
        ((r.getLong(1), r.getLong(2), r.getLong(3))), s"source ${r.getString(0)}")
    }
  }

  test("q107: line-dedup counts match a first-occurrence-wins reference") {
    val lines = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .flatMap { r =>
        val w = sqlTrim(r.getString(2)).toLowerCase.split("\\s+")
        w.grouped(10).zipWithIndex.map { case (g, i) =>
          (r.getLong(0), r.getString(1), i, g.mkString(" ")) }
      }
    val firstOwner = lines.groupBy(_._4).map { case (line, occ) =>
      line -> occ.map(o => (o._1, o._3)).min }
    val expected = lines.groupBy(_._2).map { case (src, ls) =>
      src -> ((ls.length.toLong,
        ls.count(l => firstOwner(l._4) == ((l._1, l._3))).toLong))
    }
    val got = q("q107_line_dedup").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (src, e) => assert(got(src) == e, s"source $src") }
  }

  test("q108: upsample fan-out matches the per-tier copy-count reference") {
    val expected = docTokens.groupBy(_._2).map { case (src, docs) =>
      val tier = src.drop(3).toInt % 3
      val copies = docs.map { case (id, _, _) =>
        val extra = if (md5hex(id.toString).take(4) < "8000") 1 else 0
        id -> (tier match {
          case 0 => 1
          case 1 => 1 + extra
          case _ => 2 + extra
        })
      }
      src -> ((copies.size.toLong, copies.map(_._2.toLong).sum,
        copies.map { case (id, k) => (1L to k).map(_ * id).sum }
          .sum % 1000000007L))
    }
    val got = q("q108_source_upsample").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (src, e) => assert(got(src) == e, s"source $src") }
  }

  test("q106: streaming dedup emits each doubled event exactly once") {
    val row = q("q106_stream_dedup").collect().head
    val n = Tables.events(spark, sf0001)
      .select(countDistinct(col("event_id"))).collect().head.getLong(0)
    assert(row.getLong(0) == n)
    assert(row.getBoolean(1), "dedup parity failed")
  }
}
