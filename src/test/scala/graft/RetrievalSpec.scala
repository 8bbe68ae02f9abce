package graft

import graft.ops.Retrieval
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {

  test("bm25: positive scores, self-consistent ranks, monotone ordering") {
    val rows = Retrieval.queries.find(_.name == "q132_bm25").get
      .fn(spark, sf0001).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 10))
    val scores = rows.map(_.getAs[Double]("bm25")).toSeq
    assert(scores.forall(_ > 0))
    assert(scores == scores.sorted.reverse, "bm25 must be non-increasing by rank")
    assert(!rows.map(_.getAs[Long]("doc_id")).contains(0L),
      "query doc excluded from its own result list")
  }

  test("bm25: a doc made only of query terms outranks a doc sharing none") {
    // direct sanity on the scorer itself: the top-ranked doc must share at
    // least one token with doc 0 (score > 0 requires a posting match)
    val scored = Retrieval.bm25Scores(spark, sf0001, 0L)
    assert(scored.filter(col("score") <= 0).count() == 0)
  }

  test("hybrid rrf: fused list dominated by docs present in either top-20") {
    val rows = Retrieval.queries.find(_.name == "q133_hybrid_rrf").get
      .fn(spark, sf0001).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 10))
    rows.foreach { r =>
      val rl = Option(r.getAs[Integer]("r_lex")).map(_.toInt)
      val rd = Option(r.getAs[Integer]("r_dense")).map(_.toInt)
      assert(rl.nonEmpty || rd.nonEmpty, "every fused doc came from a list")
      rl.foreach(v => assert(v >= 1 && v <= 20))
      rd.foreach(v => assert(v >= 1 && v <= 20))
      // recompute the fused score from the ranks: RRF is rank-determined
      val expect = rl.map(v => 1.0 / (60 + v)).getOrElse(0.0) +
        rd.map(v => 1.0 / (60 + v)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-6)
    }
    // a doc ranked #1 by BOTH retrievers (if any) must be fused #1; at
    // minimum the fused top doc's score must match the max attainable
    // from its own ranks — already covered by the recompute above.
    val rrfs = rows.map(_.getAs[Double]("rrf")).toSeq
    assert(rrfs == rrfs.sorted.reverse)
  }

  test("q157 eval: metric ranges, exact rel counts, metric consistency") {
    val rows = Retrieval.queries.find(_.name == "q157_retrieval_eval").get
      .fn(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("query_id")).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    // independent per-label corpus counts
    val counts = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") >= 5).groupBy("label").count()
      .collect().map(r => r.getAs[Int]("label") -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rel_corpus") == counts(r.getAs[Int]("query_label")))
      val top = r.getAs[Long]("n_rel_top10")
      assert(top >= 0 && top <= 10)
      val mrr = r.getAs[Double]("mrr")
      val rec = r.getAs[Double]("recall_at_10")
      val ndcg = r.getAs[Double]("ndcg_at_10")
      assert(mrr >= 0 && mrr <= 1 && rec >= 0 && rec <= 1 &&
        ndcg >= 0 && ndcg <= 1 + 1e-9)
      // the three metrics agree on whether ANY relevant doc was retrieved
      assert((mrr > 0) == (top > 0) && (ndcg > 0) == (top > 0) &&
        (rec > 0) == (top > 0))
      // mrr is exactly a reciprocal rank when nonzero
      if (mrr > 0) {
        val inv = 1.0 / mrr
        assert(math.abs(inv - math.round(inv)) < 1e-4 &&
          math.round(inv) >= 1 && math.round(inv) <= 10)
      }
    }
  }
}
