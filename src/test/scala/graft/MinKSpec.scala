package graft

import graft.functions.MinKByKey
import org.apache.spark.sql.functions._

/** The bounded min-k Aggregator behind q159: exact mergeability under any
  * partitioning is the whole contract — a partial that forgets a future
  * boundary element, or a merge that double-counts, silently corrupts the
  * sample at some partition layout and not others. */
class MinKSpec extends SparkSpec {

  private val agg = new MinKByKey(3)

  test("reduce keeps the k smallest under any arrival order") {
    val items = Seq(("f", 6L), ("a", 1L), ("c", 3L), ("b", 2L), ("e", 5L),
      ("a", 0L), ("d", 4L))
    val folded = items.foldLeft(agg.zero)(agg.reduce)
    assert(folded == items.sorted.take(3))
    // descending arrival exercises the eviction path on every step
    val desc = items.sortBy(_._1).reverse.foldLeft(agg.zero)(agg.reduce)
    assert(desc == items.sorted.take(3))
  }

  test("merge over arbitrary splits equals the global answer (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val hex = Gen.oneOf("0123456789abcdef".toSeq)
    val gen = for {
      n <- Gen.choose(0, 40)
      xs <- Gen.listOfN(n, for {
        s <- Gen.stringOfN(4, hex)
        i <- Gen.choose(0L, 99L)
      } yield (s, i))
      cut <- Gen.choose(0, n)
    } yield (xs, cut)
    val prop = Prop.forAll(gen) { case (xs, cut) =>
      val (l, r) = xs.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      agg.finish(merged) == xs.sorted.take(3)
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(300)
      .withInitialSeed(org.scalacheck.rng.Seed(42L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("null keys are ignored per the Spark aggregate convention") {
    val withNull = agg.reduce(agg.reduce(agg.zero, ("b", 1L)), (null, 2L))
    assert(withNull == Seq(("b", 1L)))
  }

  test("q159 equals an in-engine window reference at sf0.001") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf0001)
      .select(col("source"),
        md5(col("doc_id").cast("string").cast("binary")).as("h"),
        col("doc_id"))
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    val reference = docs.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 5)
      .select("source", "doc_id", "h", "rank")
      .orderBy("source", "rank").collect().toSeq
    val got = SparkEntry.queries("q159_stratified_sample")(spark, sf0001)
      .collect().toSeq
    assert(got == reference)
    assert(got.groupBy(_.getString(0)).forall(_._2.length == 5),
      "every source must contribute exactly k = 5 rows")
  }
}
