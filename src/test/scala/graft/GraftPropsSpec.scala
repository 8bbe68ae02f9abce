package graft

import graft.functions.{ArrayMath, Lsh}
import graft.streaming.StatefulSessions
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties (SURVEY.md §5.3) for the custom kernels, with a
  * fixed seed so runs are reproducible. */
class GraftPropsSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(50)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)), p)
    assert(res.passed, res.status.toString)
  }

  private val vecGen: Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](16, Gen.chooseNum(-10f, 10f))

  test("property: dot product is symmetric, bit for bit") {
    val cases = Gen.listOfN(60, Gen.zip(vecGen, vecGen)).sample.get
    val df = cases.toDF("a", "b")
    val rows = df.select(
      ArrayMath.dot(col("a"), col("b")).as("ab"),
      ArrayMath.dot(col("b"), col("a")).as("ba")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("property: simhash is token-order invariant and deterministic") {
    val tokGen = Gen.listOfN(12, Gen.alphaNumStr.suchThat(_.nonEmpty))
    check(Prop.forAll(tokGen) { toks =>
      val shuffled = scala.util.Random.shuffle(toks)
      val df = Seq(Tuple1(toks), Tuple1(shuffled)).toDF("t")
      val hs = df.select(graft.functions.TextHash.simhash64(col("t")))
        .collect().map(_.getLong(0))
      hs(0) == hs(1)
    })
  }

  test("property: LSH planes are deterministic and band count is exact") {
    check(Prop.forAll(Gen.chooseNum(0, 1000), Gen.chooseNum(2, 128)) { (p, dim) =>
      Lsh.planeVector(p, dim).sameElements(Lsh.planeVector(p, dim)) &&
        Lsh.planeVector(p, dim).length == dim
    })
  }

  test("property: incremental session fold equals whole-batch fold") {
    val us = 60L * 1000 * 1000
    val evGen = Gen.listOfN(30,
      Gen.zip(Gen.chooseNum(0L, 600L), Gen.chooseNum(1, 100)))
      .map(_.map { case (minute, v) => (minute * us, v.toDouble) }
        .sortBy(x => x))
    check(Prop.forAll(evGen, Gen.chooseNum(0, 30)) { (events, splitAt) =>
      val (first, second) = events.splitAt(splitAt)
      val whole = StatefulSessions.fold(events, None)
      val (c1, open1) = StatefulSessions.fold(first, None)
      val (c2, open2) = StatefulSessions.fold(second, open1)
      (c1 ++ c2, open2) == whole
    })
  }

  test("property: interval-merge fold equals sequential gap-split on sorted input") {
    // independent reference: the textbook single-pass gap rule over
    // GLOBALLY sorted events — correct by construction when input is
    // sorted. The interval-merge fold must produce the same sessions from
    // the SAME events in ANY arrival order (late events, shuffles): that
    // arrival-order invariance is exactly what the streaming path needs
    // from watermark-admitted late data.
    val us = 60L * 1000 * 1000
    val evGen = Gen.listOfN(25,
      Gen.zip(Gen.chooseNum(0L, 400L), Gen.chooseNum(1, 9)))
      .map(_.map { case (minute, v) => (minute * us, v.toDouble) })
    check(Prop.forAll(evGen, Gen.chooseNum(0L, Long.MaxValue)) { (events, seed) =>
      val reference = events.sorted
        .foldLeft(Vector.empty[StatefulSessions.SessionState]) {
          case (acc, (t, v))
              if acc.nonEmpty && t - acc.last.lastTs < StatefulSessions.GapUs =>
            acc.init :+ acc.last.copy(lastTs = t,
              n = acc.last.n + 1, total = acc.last.total + v)
          case (acc, (t, v)) =>
            acc :+ StatefulSessions.SessionState(t, t, 1, v)
        }
      val shuffled = new scala.util.Random(seed).shuffle(events)
      val (closed, open) = StatefulSessions.fold(shuffled, None)
      (closed ++ open) == reference
    })
  }

  test("property: block-offset global cumsum equals the single-window form") {
    // Ranks.globalCumSum (q299's topology) against the direct
    // SQL-semantics reference — a driver-side prefix sum over the sorted
    // rows — on random values INCLUDING duplicate sort keys resolved by
    // the id tie-break, and partition counts that leave some range
    // partitions empty (parts > n). Few trials: each is a Spark job with
    // a shuffle + checkpoint.
    val rnd = new scala.util.Random(13L)
    (1 to 3).foreach { trial =>
      val n = 40 + rnd.nextInt(60)
      val rows = (0 until n).map(i =>
        (i.toLong, rnd.nextInt(8).toLong, 1L + rnd.nextInt(50)))
      val df = rows.toDF("id", "key", "v")
      val got = graft.ops.Ranks
        .globalCumSum(df, 7, col("v"), col("key").desc, col("id"))
        .select(col("id"), col("cum")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      var acc = 0L
      val want = rows.sortBy { case (id, k, _) => (-k, id) }.map { r =>
        acc += r._3; r._1 -> acc
      }.toMap
      assert(got == want, s"trial $trial ($n rows)")
    }
  }

  test("property: bloom pre-filter never drops a member on random key sets") {
    // beyond the corpus-key spec in ScalePatternsSpec: arbitrary long keys,
    // including negatives and near-collisions, must all survive a filter
    // built over them (false positives allowed, false negatives never) —
    // few trials, bigger sets: each trial is a pair of Spark jobs
    val rnd = new scala.util.Random(7L)
    (1 to 3).foreach { trial =>
      val keys = Seq.fill(500)(rnd.nextLong() >> (trial * 8)).distinct
      val build = keys.toDF("k")
      val surviving = graft.functions.BloomPrune
        .filterByKeys(build, col("k"), build, col("k"))
        .count()
      assert(surviving == keys.size,
        s"trial $trial: bloom dropped ${keys.size - surviving} of its own keys")
    }
  }
}
