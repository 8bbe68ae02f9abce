package graft

import org.apache.spark.sql.functions._

/** Invariants behind the property-boolean queries (q49 pattern): the driver
  * hash-checks the emitted booleans, these tests pin the underlying
  * semantics — determinism and the raw quantities the booleans summarize. */
class RowsOnlySpec extends SparkSpec {

  test("q21: seeded sample/split properties hold and are deterministic") {
    def run() = SparkEntry.queries("q21_sample_split")(spark, sf0001).collect()
    val a = run().head
    assert(a.getAs[Long]("n_total") == Tables.lineitem(spark, sf0001).count())
    assert(a.getAs[Boolean]("sample_frac_ok"))
    assert(a.getAs[Boolean]("split_exact_ok"))
    assert(a.getAs[Boolean]("split_frac_ok"))
    assert(run().head == a, "seeded sample/split must be reproducible run-to-run")
  }

  test("q41: k-means partitions all vectors into 5 clusters beating k=1") {
    val r = SparkEntry.queries("q41_kmeans_embeddings")(spark, sf0001)
      .collect().head
    assert(r.getAs[Long]("n_vectors") == Tables.embeddings(spark, sf0001).count())
    assert(r.getAs[Long]("n_clusters") == 5L)
    assert(r.getAs[Boolean]("partition_ok"))
    assert(r.getAs[Boolean]("inertia_ok"))
  }

  test("q113: PCA invariants hold, cover every vector, and are deterministic") {
    def run() = SparkEntry.queries("q113_pca")(spark, sf0001).collect().head
    val r = run()
    assert(r.getAs[Long]("n_vectors") == Tables.embeddings(spark, sf0001).count())
    assert(r.getAs[Int]("k") == 8)
    assert(r.getAs[Boolean]("orthonormal_ok"))
    assert(r.getAs[Boolean]("variance_ok"))
    assert(r.getAs[Boolean]("projection_ok"))
    // covariance eigendecomposition has no RNG — rerun must be identical
    assert(run() == r, "PCA query must be reproducible run-to-run")
  }
}
