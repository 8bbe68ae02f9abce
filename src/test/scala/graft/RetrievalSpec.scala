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
}
