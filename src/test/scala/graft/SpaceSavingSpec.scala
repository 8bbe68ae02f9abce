package graft

import org.apache.spark.sql.{Encoders, functions => F}
import graft.functions.SpaceSavingTopK

/** Space-Saving sketch guarantees on adversarial fixtures: exactness when
  * k covers the cardinality, heavy-hitter presence and upper/lower count
  * bounds under eviction, stability across partition layouts. */
class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(data: Seq[String], k: Int, parts: Int)
      : Seq[(String, Long, Long)] =
    data.toDF("v").repartition(parts)
      .agg(F.udaf(new SpaceSavingTopK(k), Encoders.STRING)(F.col("v")).as("sk"))
      .select(F.explode(F.col("sk")).as("e"))
      .select(F.col("e._1"), F.col("e._2"), F.col("e._3"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("k >= cardinality degenerates to exact counts with zero error") {
    val data = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(10)("c")
    for (parts <- Seq(1, 8)) {
      val got = sketch(data, k = 8, parts)
      assert(got == Seq(("a", 40L, 0L), ("b", 25L, 0L), ("c", 10L, 0L)))
    }
  }

  test("heavy hitters survive eviction; estimates bound true counts") {
    // one hot key at 60%, 50 cold keys sharing the rest — k far below
    // cardinality forces constant eviction
    val truth = Map("hot" -> 600) ++ (1 to 50).map(i => s"k$i" -> 8).toMap
    val data = scala.util.Random.shuffle(
      truth.toSeq.flatMap { case (v, n) => Seq.fill(n)(v) })
    val n = data.size
    val k = 8
    for (parts <- Seq(1, 4)) {
      val got = sketch(data, k, parts)
      assert(got.size <= k)
      // presence: every value with true frequency > n/k is reported
      val guaranteed = truth.collect { case (v, c) if c > n / k => v }
      assert(guaranteed.forall(v => got.exists(_._1 == v)),
        s"missing heavy hitter in $got")
      // bounds: est >= true >= est - err for every reported value
      got.foreach { case (v, est, err) =>
        val t = truth.getOrElse(v, 0).toLong
        assert(est >= t, s"$v: estimate $est below true count $t")
        assert(est - err <= t, s"$v: lower bound ${est - err} above true $t")
      }
      // and the hot key's estimate is tight (it is never evicted)
      val hot = got.find(_._1 == "hot").get
      assert(hot._2 - hot._3 <= 600 && hot._2 >= 600)
    }
  }

  test("grouped aggregate keeps one independent sketch per group (q85 shape)") {
    val rows = Seq.tabulate(60)(i => (s"g${i % 3}", s"u${i % 5}")) ++
      Seq.fill(20)(("g0", "hot"))
    val got = rows.toDF("g", "v").repartition(8)
      .groupBy("g")
      .agg(F.udaf(new SpaceSavingTopK(16), Encoders.STRING)(F.col("v")).as("sk"))
      .select(F.col("g"), F.explode(F.col("sk")).as("e"))
      .select(F.col("g"), F.col("e._1"), F.col("e._2"), F.col("e._3"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // k=16 > per-group cardinality -> exact per group, err 0 everywhere
    val truth = rows.groupBy(identity).map { case ((g, v), xs) => (g, v, xs.size.toLong) }
    assert(got.forall(_._4 == 0L))
    assert(got.map(t => (t._1, t._2, t._3)).toSet == truth.toSet)
    // groups must not bleed into each other: g1/g2 never saw "hot"
    assert(!got.exists(t => t._1 != "g0" && t._2 == "hot"))
  }

  test("merge keeps bounds when every partition sees disjoint values") {
    val data = (1 to 16).flatMap(i => Seq.fill(i * 5)(s"v$i"))
    val got = sketch(data, k = 4, parts = 8)
    assert(got.size <= 4)
    got.foreach { case (v, est, err) =>
      val t = v.drop(1).toInt * 5L
      assert(est >= t && est - err <= t, s"$v: ($est, $err) vs true $t")
    }
  }
}
