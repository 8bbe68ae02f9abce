package graft.ops

import graft.{Q, Tables}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

/** MLlib prediction surface (SURVEY.md §2.8) exercised on the test schema.
  * Model internals are not SQL-expressible → rows-only driver checks; exact
  * fit semantics are covered by unit tests on literal fixtures.
  *
  * Scale notes: tree-ensemble fits are MLlib's distributed implementation
  * (per-tree bagging over partitioned data); feature assembly is a map-only
  * projection. Grid sizes are kept smoke-budget-small here — the full
  * reference grid (27×3 fits) is available via pipeline.Model.crossValidate.
  */
object Ml {

  val queries: Seq[Q] = Seq(

    // RandomForestRegressor pipeline (model.py:24-43) predicting
    // l_extendedprice from quantity/discount/tax/flags. The assembled input
    // is cached: indexer passes, split finding and every tree-depth
    // iteration re-scan it (the reference's uncached 11-pass imputation
    // anti-pattern, SURVEY.md §4.1, applies to ML fits too).
    Q.rowsOnly("q40_rf_regression") { (s, d) =>
      val li = Tables.lineitem(s, d)
        .select("l_quantity", "l_discount", "l_tax", "l_returnflag",
          "l_linestatus", "l_extendedprice")
        .cache()
      try {
        // 10 trees × depth 5 on a 50% bagging fraction with 16 split bins:
        // the same estimator shape as the reference fit at a bench-bounded
        // cost (tree-stat aggregation scales with trees × nodes × bins).
        val (_, scored, r2, rmse) = graft.pipeline.Model.fitPredict(
          li, "l_extendedprice",
          Seq("l_quantity", "l_discount", "l_tax", "l_returnflag", "l_linestatus"),
          numTrees = 10, maxDepth = 5, maxBins = 16, subsamplingRate = 0.5)
        // drain the cached validation frame eagerly and unpersist it HERE:
        // fitPredict's contract makes the caller owner of `scored`, and a
        // library caller (Verify, REPL) has no Bench-style clearCache sweep
        // to fall back on. The result is a literal row — no live lineage
        // back to the unpersisted frame.
        val n = try scored.count() finally scored.unpersist(blocking = false)
        s.range(1).select(
          lit(n).as("n_scored"),
          round(lit(r2), 4).as("r2"),
          round(lit(rmse), 2).as("rmse"))
      } finally li.unpersist(blocking = false)
    },

    // KMeans over the embeddings table (seeded): cluster cardinalities.
    // array_to_vector is a codegen'd expression (no Dataset encoder
    // round-trip); caching keeps the k-means|| init + 20 Lloyd iterations
    // off the parquet scan.
    Q.rowsOnly("q41_kmeans_embeddings") { (s, d) =>
      val vecs = Tables.embeddings(s, d)
        .select(col("vec_id"), array_to_vector(col("embedding")).as("features"))
        .cache()
      try {
        val model = new KMeans().setK(5).setSeed(42L).setFeaturesCol("features")
          .fit(vecs)
        model.transform(vecs)
          .groupBy(col("prediction"))
          .agg(count(lit(1)).as("n"))
          .select(col("n"))
          .orderBy(desc("n"))
      } finally vecs.unpersist(blocking = false)
    }
  )
}
