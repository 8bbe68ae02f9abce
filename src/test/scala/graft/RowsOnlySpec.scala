package graft

import org.apache.spark.sql.functions._

/** Invariants for the rows-only queries not already pinned by a dedicated
  * spec: the driver only checks their row counts, so semantics live here. */
class RowsOnlySpec extends SparkSpec {

  test("q21: seeded sample/split is deterministic, split is a partition") {
    def run() = SparkEntry.queries("q21_sample_split")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = run()
    val b = run()
    assert(a == b, "seeded sample/split must be reproducible run-to-run")
    val total = Tables.lineitem(spark, sf0001).count()
    assert(a("split_train") + a("split_test") == total) // exact partition
    val frac = a("sample_10pct").toDouble / total
    assert(frac > 0.08 && frac < 0.12, s"10% sample drew ${frac * 100}%")
  }

  test("q41: k-means yields 5 clusters partitioning all vectors, deterministic") {
    def run() = SparkEntry.queries("q41_kmeans_embeddings")(spark, sf0001)
      .collect().map(_.getLong(0)).toSeq
    val sizes = run()
    assert(sizes.length == 5)
    assert(sizes.sum == Tables.embeddings(spark, sf0001).count())
    assert(sizes == sizes.sorted.reverse) // declared ordering
    assert(sizes.forall(_ > 0))
    assert(run() == sizes) // seeded fit is reproducible
  }
}
