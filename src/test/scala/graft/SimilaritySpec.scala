package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("knn: rank-1 neighbor of every query is itself with sim 1") {
    val emb = Tables.embeddings(spark, sf0001)
    val top = Similarity.knn(emb.filter(col("vec_id") < 5), emb, 3)
      .filter(col("rank") === 1).collect()
    assert(top.length == 5)
    top.foreach { r =>
      assert(r.getAs[Long]("query_id") == r.getAs[Long]("neighbor_id"))
      assert(r.getAs[Double]("sim") == 1.0)
    }
  }

  test("knn ordering matches hand-computed cosines on literal vectors") {
    def f(xs: Double*) = xs.map(_.toFloat).toArray
    val corpus = Seq(
      (0L, f(1, 0)), (1L, f(0.9, 0.1)), (2L, f(0, 1)), (3L, f(-1, 0)))
      .toDF("vec_id", "embedding")
    val q = corpus.filter(col("vec_id") === 0)
    val got = Similarity.knn(q, corpus, 4).select("neighbor_id", "rank")
      .collect().sortBy(_.getInt(1)).map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 1L, 2L, 3L))
  }

  test("ivf: every query finds itself rank-1 (self shares its own cell)") {
    val r = Similarity.ivfAnn(spark, sf0001, k = 8, probes = 2, topK = 3)
      .filter(col("rank") === 1).collect()
    assert(r.length == 5)
    r.foreach { row =>
      assert(row.getAs[Long]("query_id") == row.getAs[Long]("neighbor_id"))
      assert(row.getAs[Double]("sim") == 1.0)
    }
  }

  test("minhash-LSH candidates cover all exact-Jaccard near-dup pairs") {
    val exact = SparkEntry.queries("q27_ngram_jaccard")(spark, sf0001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Similarity.minHashCandidates(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(exact.subsetOf(cand),
      s"minhash banding missed exact pairs: ${exact -- cand}")
    // the driver-checked property query must agree: all covered
    val prop = SparkEntry.queries("q36_minhash_lsh")(spark, sf0001).collect().head
    assert(prop.getAs[Long]("n_exact") == exact.size.toLong)
    assert(prop.getAs[Boolean]("covered_ok"))
  }

  test("q101 matryoshka truncation: unit norms, rerank bound, determinism") {
    def run() = SparkEntry.queries("q101_matryoshka")(spark, sf0001).collect().head
    val r = run()
    // every embedding at sf0.001 has a nonzero 16-dim prefix
    assert(r.getAs[Long]("n_vecs") == Tables.embeddings(spark, sf0001).count())
    assert(r.getAs[Boolean]("norm_ok"))
    assert(r.getAs[Boolean]("rerank_ok"))
    assert(run() == r, "truncation harness must be deterministic run-to-run")
  }
}
