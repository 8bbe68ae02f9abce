package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal distributed graph connectivity for the dedup pipeline: near-dup
  * PAIRS (q27/q36/q44/q51) become near-dup CLUSTERS, from which a training
  * corpus keeps one canonical doc per cluster.
  *
  * Min-label propagation: every node starts labeled with itself; each round
  * a node takes the minimum label among itself and its neighbors; fixpoint =
  * connected components (label = smallest node id in the component). The
  * loop is driver-coordinated — the standard shape for iterative algorithms
  * on DataFrames (GraphX/GraphFrames do the same under the hood):
  *  - rounds needed ≤ component diameter (near-dup clusters are small
  *    cliques, so 2-3 rounds in practice; the hard cap guards degenerate
  *    chains);
  *  - every round localCheckpoints its result: lineage would otherwise grow
  *    by two joins per round and replan from the source each time (at
  *    cluster scale, a HDFS checkpoint or a persisted table per round);
  *  - convergence test is an isEmpty on changed labels — it short-circuits
  *    at the first changed row rather than counting them all.
  */
object Graph {

  /** Connected components of an undirected graph given as (src, dst) edge
    * rows (direction ignored, self-loops fine). Returns (node, component)
    * where component = min node id in the component. Isolated nodes absent
    * from the edge list are absent from the output. */
  def connectedComponents(edges: DataFrame, maxIters: Int = 50): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val neighborMin = e.join(labels, e("dst") === labels("node"))
        .select(e("src").as("node"), col("component"))
      val next = labels.unionByName(neighborMin)
        .groupBy("node").agg(min(col("component")).as("component"))
        .localCheckpoint(true)
      converged = next.as("n")
        .join(labels.as("o"), col("n.node") === col("o.node"))
        .filter(col("n.component") =!= col("o.component"))
        .isEmpty
      labels = next
      iter += 1
    }
    // a silent cap-hit would return mid-propagation labels — one real
    // component reported as several, with nothing to tell the caller the
    // result is wrong. Fail loudly instead.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIters rounds — " +
          "component diameter exceeds the cap; raise maxIters")
    labels
  }
}
