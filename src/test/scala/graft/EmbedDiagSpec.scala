package graft

import org.apache.spark.sql.Row

/** Brute-force driver-side recounts for the embedding-space diagnostics
  * (ops.EmbedDiag): the 500×64 sf0.001 corpus is small enough to redo
  * every kNN exactly in plain Scala and compare the integer outputs
  * (ids, in-degrees, code counters) value-for-value. */
class EmbedDiagSpec extends SparkSpec {

  private lazy val vecs: Map[Long, Array[Double]] =
    Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i)
      nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def sq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf0001).collect()

  test("q321 hubness equals a brute-force kNN in-degree recount") {
    val qs = vecs.keys.filter(_ < 400).toSeq.sorted
    val indeg = collection.mutable.Map.empty[Long, Int]
    qs.foreach { q =>
      val top5 = vecs.keys.filter(_ != q).toSeq
        .map(c => (c, cosine(vecs(c), vecs(q))))
        .sortBy { case (id, sim) => (-sim, id) }.take(5)
      top5.foreach { case (id, _) => indeg(id) = indeg.getOrElse(id, 0) + 1 }
    }
    val expect = indeg.toSeq.sortBy { case (id, d) => (-d, id) }.take(20)
    val got = run("q321_knn_hubness").map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == expect.map { case (id, d) => (id, d.toLong) },
      s"hubness mismatch: got ${got.toSeq} expected $expect")
  }

  test("q322 radius outliers equal a brute-force 5th-NN distance recount") {
    val qs = vecs.keys.filter(_ < 400).toSeq
    val d5 = qs.map { q =>
      val ds = vecs.keys.filter(_ != q).toSeq
        .map(c => (sq(vecs(c), vecs(q)), c)).sorted
      (q, ds(4)._1)
    }
    val expect = d5.sortBy { case (q, d) => (-d, q) }.take(20)
    val got = run("q322_knn_radius_outliers")
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq == expect.map(_._1),
      s"outlier id set mismatch: got ${got.map(_._1).toSeq} " +
        s"expected ${expect.map(_._1)}")
    got.zip(expect).foreach { case ((_, g), (_, e)) =>
      assert(math.abs(g - e) < 1e-5, s"d5 drift: $g vs $e") }
  }

  test("q320 TwoNN rows: mu2 >= 1, d1 > 0, ratios match the brute recount") {
    val rows = run("q320_twonn_stats")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d1, d2, mu2) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(d1 > 0 && d2 >= d1 && mu2 >= 1.0, r.toString)
    }
    // spot-recount the first 25 query points exactly
    rows.take(25).foreach { r =>
      val q = r.getLong(0)
      val ds = vecs.keys.filter(_ != q).toSeq
        .map(c => (sq(vecs(c), vecs(q)), c)).sorted
      assert(math.abs(r.getDouble(3) - ds(1)._1 / ds(0)._1) < 1e-5,
        s"mu2 drift at $q")
    }
  }

  test("q323 saturation counters equal a driver quantization recount") {
    val dims = vecs.values.head.length
    val sat = Array.fill(dims)(0L); val zero = Array.fill(dims)(0L)
    val sum = Array.fill(dims)(0L); val sabs = Array.fill(dims)(0L)
    var n = 0L
    vecs.values.foreach { v =>
      val scale = v.map(math.abs).max / 127.0
      if (scale > 0) {
        n += 1
        v.zipWithIndex.foreach { case (x, i) =>
          val code = BigDecimal(x / scale)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          if (math.abs(code) == 127) sat(i) += 1
          if (code == 0) zero(i) += 1
          sum(i) += code; sabs(i) += math.abs(code)
        }
      }
    }
    val got = run("q323_quant_saturation")
    assert(got.length == dims)
    got.foreach { case Row(dim: Int, nc: Long, ns: Long, nz: Long,
        sc: Long, sa: Long) =>
      val i = dim - 1
      assert(nc == n && ns == sat(i) && nz == zero(i) &&
        sc == sum(i) && sa == sabs(i), s"dim $dim counters diverge")
    }
    // the per-vector argmax dimension quantizes to exactly +/-127, so
    // saturation mass is at least one per vector corpus-wide
    assert(got.map(_.getLong(2)).sum >= n)
  }
}
