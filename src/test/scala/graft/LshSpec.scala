package graft

import graft.functions.Lsh
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** HyperplaneBands determinism + the banded-LSH recall contract backing the
  * q35_ann_lsh property booleans. */
class LshSpec extends SparkSpec {
  import spark.implicits._

  test("signatures are deterministic and shaped (bands longs, bits wide)") {
    val df = Seq(Tuple1(Array.fill(64)(0.5f))).toDF("v")
    val sig = df.select(Lsh.hyperplaneBands(col("v"), 8, 6, 64)).head().getSeq[Long](0)
    val sig2 = df.select(Lsh.hyperplaneBands(col("v"), 8, 6, 64)).head().getSeq[Long](0)
    assert(sig == sig2)
    assert(sig.length == 8)
    assert(sig.forall(h => h >= 0 && h < (1L << 6)))
  }

  test("identical vectors always share every band; negated vectors none") {
    val v = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val df = Seq(Tuple1(v), Tuple1(v.clone), Tuple1(v.map(-_))).toDF("v")
    val sigs = df.select(Lsh.hyperplaneBands(col("v"), 16, 6, 64)).collect()
      .map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1))
    // a negated vector flips every hyperplane sign (no projection is exactly
    // 0 for this input), so no band can collide
    assert(sigs(0).zip(sigs(2)).forall { case (a, b) => a != b })
  }

  test("plane vectors are deterministic, in [-1,1), and dim-sized") {
    val p1 = Lsh.planeVector(3, 64)
    val p2 = Lsh.planeVector(3, 64)
    assert(p1.sameElements(p2))
    assert(p1.length == 64)
    assert(p1.forall(x => x >= -1.0 && x < 1.0))
    assert(!Lsh.planeVector(4, 64).sameElements(p1))
  }

  test("q35 banded LSH finds every brute-force pair >= 0.5 on the test corpus") {
    // sf0.01: the smallest corpus with a cosine pair above the threshold
    val sf = "/root/testdata/sf0.01"
    val brute = SparkEntry.queries("q34_similar_pairs")(spark, sf)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.annLsh(spark, sf, threshold = 0.5)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "corpus should contain at least one similar pair")
    // LSH output is a subset of brute force by construction (exact cosine
    // re-check); the banding parameters are tuned so recall is total here.
    assert(lsh.subsetOf(brute))
    assert(lsh == brute, s"LSH missed pairs: ${brute -- lsh}")
  }

  test("q310 workload forecast matches a driver md5 LSH brute force") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val w = r.getString(1).replaceAll("^ +", "").replaceAll(" +$", "")
          .toLowerCase.split("[ \\t\\n\\f\\r]+", -1)
        if (w.length < 3) None
        else Some(r.getLong(0) ->
          (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" ")).distinct)
      }
    val sigs = docs.map { case (id, sh) =>
      id -> (0 until 16).map(h => sh.map(x => md5hex(s"$h:$x")).min)
    }
    val nd = sigs.length.toLong
    val want = Seq(2 -> 8, 4 -> 4, 8 -> 2, 16 -> 1).map { case (b, r) =>
      val buckets = sigs.flatMap { case (_, sg) =>
        (0 until b).map(j => (j, md5hex(sg.slice(j * r, j * r + r).mkString("|"))))
      }.groupBy(identity).map(_._2.length.toLong)
      val pairs2 = buckets.map(n => n * (n - 1)).sum // 2·cand_pairs
      (b, r) -> (buckets.size.toLong, buckets.max, pairs2 / 2,
        (BigInt(pairs2) * 1000000 / (BigInt(nd) * (nd - 1))).toLong)
    }.toMap
    val got = SparkEntry.queries("q310_lsh_workload")(
      spark, "/root/testdata/sf0.001").collect().map(r =>
      (r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band")) ->
        (r.getAs[Long]("n_buckets"), r.getAs[Long]("max_bucket"),
          r.getAs[Long]("cand_pairs"),
          r.getAs[Long]("workload_share_micro"))).toMap
    assert(got == want)
    // monotone cost axis: more, narrower bands can only add candidates
    val costs = Seq(2 -> 8, 4 -> 4, 8 -> 2, 16 -> 1).map(c => want(c)._3)
    assert(costs == costs.sorted, s"cost not monotone in band count: $costs")
  }
}
