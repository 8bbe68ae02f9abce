package graft

import graft.ops.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  private def run(name: String) =
    Curation.queries.find(_.name == name).get.fn(spark, sf0001)

  /** The house tokenize (trim → lower → explicit whitespace class). */
  private def toks(text: String): Array[String] =
    text.trim.toLowerCase.split("[ \\t\\n\\f\\r]+", -1)

  private def docRows = Tables.documents(spark, sf0001)
    .select(col("doc_id"), col("text"), col("source"), col("lang"),
      col("n_chars")).collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
      r.getLong(4)))

  /** Exact 0.5-Jaccard pairs at sf0.001, straight from the shared kernel
    * query (its own spec pins it against a brute force). */
  private def pairs05: Set[(Long, Long)] =
    SparkEntry.queries("q27_ngram_jaccard")(spark, sf0001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("q316: histogram matches a driver union-find over the q27 pairs") {
    val ps = pairs05
    // union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    ps.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = parent.keys.toSeq.groupBy(find)
    val chars = docRows.map(r => r._1 -> r._5).toMap
    // per-component: size, chars dropped (all but min-id member).
    // `.values` BEFORE the map: mapping the Map to (size, chars) pairs
    // would rebuild a Map KEYED BY SIZE and collapse every equal-sized
    // component (the q315-spec bug class)
    val comp = members.values.toSeq.map { ms =>
      val keep = ms.min
      (ms.size.toLong, ms.filter(_ != keep).map(chars).sum)
    }
    val want = comp.groupBy(_._1).map { case (sz, xs) =>
      sz -> (xs.size.toLong, sz * xs.size, (sz - 1) * xs.size,
        xs.map(_._2).sum)
    }
    val got = run("q316_dedup_savings").collect().map(r =>
      r.getAs[Long]("cluster_size") -> (r.getAs[Long]("n_clusters"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_dropped"),
        r.getAs[Long]("chars_dropped"))).toMap
    assert(got.nonEmpty, "no near-dup clusters at sf0.001 — vacuous")
    assert(got == want)
  }

  test("q317: contamination report matches a driver 4-gram recount") {
    val grams = docRows.map { case (id, text, _, _, _) =>
      val w = toks(text)
      id -> (if (w.length < 4) Set.empty[String]
             else w.sliding(4).map(_.mkString(" ")).toSet)
    }.toMap
    val bench = grams.filter(_._1 % 97 == 0)
    val train = grams.filter(_._1 % 97 != 0)
    val want = bench.flatMap { case (bid, bg) =>
      val hits = train.toSeq
        .map { case (tid, tg) => tid -> (bg & tg).size }
        .filter(_._2 > 0)
      if (hits.isEmpty) None
      else Some(bid -> (hits.size.toLong, hits.map(_._2.toLong).sum,
        hits.map(_._2.toLong).max))
    }
    val got = run("q317_contamination_report").collect().map(r =>
      r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_train_docs"),
        r.getAs[Long]("n_shared_grams"), r.getAs[Long]("worst_overlap")))
      .toMap
    assert(got.nonEmpty, "no 4-gram contamination at sf0.001 — vacuous")
    assert(got == want)
  }

  test("q318: allocation is the optimal epoch-capped water-fill level") {
    val avail = docRows.groupBy(r => (r._3, r._4))
      .map { case (k, xs) => k -> xs.map(r => toks(r._2).length.toLong).sum }
    val target = avail.values.sum * 3 / 2
    def fill(l: Long): Long = avail.values.map(a => math.min(4 * a, l)).sum
    var (lo, hi) = (0L, avail.values.max * 4)
    while (lo < hi) {
      val mid = (lo + hi + 1) / 2
      if (fill(mid) <= target) lo = mid else hi = mid - 1
    }
    val level = lo
    val rows = run("q318_epoch_plan").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet
      == avail.keySet)
    rows.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      val a = avail(k)
      val alloc = math.min(4 * a, level)
      assert(r.getAs[Long]("avail_tok") == a, s"cell $k avail")
      assert(r.getAs[Long]("alloc_tok") == alloc, s"cell $k alloc")
      assert(r.getAs[Long]("epochs_micro") == alloc * 1000000L / a,
        s"cell $k epochs")
      assert(r.getAs[Boolean]("capped") == (4 * a <= level), s"cell $k cap")
    }
    // optimality: the level fits, one more does not (target < Σcap here)
    assert(fill(level) <= target && fill(level + 1) > target)
    // upsampling must actually engage: some cell above 1 epoch
    assert(rows.exists(_.getAs[Long]("epochs_micro") > 1000000L))
  }

  test("q319: histogram matches a driver bucket recount, shares exact") {
    val lens = docRows.map(r => (r._3, toks(r._2).length.toLong))
    val want = lens.groupBy(x => (x._1, x._2 / 16 * 16)).map {
      case ((src, blo), xs) =>
        (src, blo) -> (xs.length.toLong, xs.map(_._2).sum)
    }
    val bySrc = lens.groupBy(_._1).map { case (s, xs) =>
      s -> (xs.length.toLong, xs.map(_._2).sum)
    }
    val got = run("q319_seqlen_histogram").collect()
    assert(got.map(r => (r.getString(0), r.getAs[Long]("bucket_lo"))).toSet
      == want.keySet)
    got.foreach { r =>
      val k = (r.getString(0), r.getAs[Long]("bucket_lo"))
      val (nd, ts) = want(k)
      val (snd, snt) = bySrc(k._1)
      assert(r.getAs[Long]("n_docs") == nd, s"$k n_docs")
      assert(r.getAs[Long]("tok_sum") == ts, s"$k tok_sum")
      assert(r.getAs[Long]("doc_share_micro") == nd * 1000000L / snd)
      assert(r.getAs[Long]("tok_share_micro") == ts * 1000000L / snt)
    }
  }
}
