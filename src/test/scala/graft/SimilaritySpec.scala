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

  test("q143 product quantization: codes complete, measured quality bands") {
    val m = ops.Similarity.pqMetrics(spark, sf0001).head()
    val n = Tables.embeddings(spark, sf0001).count()
    assert(m.getAs[Long]("n_vectors") == n)
    assert(m.getAs[Long]("n_codes") == n * 4, "every vector carries m=4 codes")
    assert(m.getAs[Int]("min_code") >= 0 && m.getAs[Int]("max_code") < 16)
    // random embeddings are PQ's stress case: reconstruction keeps only a
    // modest share of the energy (measured mean_rel ~0.72 at sf0.001) and
    // non-self ADC recall@10 (leave-queries-out — no free self-hits) is
    // 0.08-0.16 vs a 0.005-0.02 chance floor — assert the measured bands
    // with margin on both sides (a too-GOOD mean_rel on this corpus
    // would mean the error math broke)
    val meanRel = m.getAs[Double]("mean_rel")
    assert(meanRel > 0.3 && meanRel < 0.85, s"mean_rel=$meanRel")
    assert(m.getAs[Double]("worst_rel") <= 1.1)
    val hit = m.getAs[Long]("n_hit").toDouble / m.getAs[Long]("n_exact")
    assert(hit >= 0.04, s"ADC recall $hit below band")
    // the driver-checked property row must agree
    val q = SparkEntry.queries("q143_product_quantization")(spark, sf0001)
      .collect().head
    assert(q.getAs[Boolean]("codes_ok") && q.getAs[Boolean]("recon_ok") &&
      q.getAs[Boolean]("recall_ok"))
  }

  test("q158 ivf-pq: complete top-10s, real pruning, recall above chance") {
    val m = ops.Similarity.ivfPqMetrics(spark, sf0001).head()
    val n = Tables.embeddings(spark, sf0001).count()
    assert(m.getAs[Long]("n_vectors") == n)
    assert(m.getAs[Long]("n_results") == 50L, "full top-10 per query")
    assert(m.getAs[Long]("n_answered") == 5L)
    // the IVF stage must actually prune: candidates strictly under half of
    // the 5·n brute-force scan (expectation probes/cells = 25%; measured
    // 0.25-0.38 across SFs)
    val cand = m.getAs[Long]("n_candidates")
    assert(cand * 2 < n * 5, s"candidates $cand of ${n * 5} not pruned")
    assert(cand >= 50, "probed cells must hold at least the answer lists")
    // leave-queries-out: no free self-hits; measured non-self IVF∘ADC
    // recall@10 is 0.06-0.16 across SFs vs the 0.005-0.02 chance floor
    val hit = m.getAs[Long]("n_hit").toDouble / m.getAs[Long]("n_exact")
    assert(hit >= 0.04, s"IVF-PQ recall $hit below band")
    val q = SparkEntry.queries("q158_ivf_pq")(spark, sf0001).collect().head
    assert(q.getAs[Boolean]("complete_ok") && q.getAs[Boolean]("pruning_ok") &&
      q.getAs[Boolean]("recall_ok"))
  }

  test("label separation: full pair matrix, cosines bounded, one pair replayed") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q201_label_separation")(spark, sf0001)
      .collect()
    val labels = Tables.embeddings(spark, sf0001)
      .select(col("label")).distinct().count().toInt
    assert(rows.length == labels * (labels - 1) / 2, "every unordered pair")
    rows.foreach { r =>
      val c = r.getAs[Double]("centroid_cos")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(r.getAs[Int]("label_a") < r.getAs[Int]("label_b"))
    }
    // replay one pair centroid-cosine from raw vectors on the driver
    val (la, lb) = (rows.head.getAs[Int]("label_a"),
      rows.head.getAs[Int]("label_b"))
    def centroid(l: Int): Array[Double] = {
      val vs = Tables.embeddings(spark, sf0001)
        .filter(col("label") === l).select(col("embedding"))
        .collect().map(_.getSeq[Float](0).toArray)
      val out = new Array[Double](vs.head.length)
      vs.foreach(v => v.indices.foreach(i => out(i) += v(i)))
      out
    }
    val (ca, cb) = (centroid(la), centroid(lb))
    val dot = ca.indices.map(i => ca(i) * cb(i)).sum
    val cosRef = dot / math.sqrt(ca.map(x => x * x).sum * cb.map(x => x * x).sum)
    assert(math.abs(rows.head.getAs[Double]("centroid_cos") - cosRef) < 1e-5)
  }

  test("dim profile: one row per dimension, IQR nonneg, count = corpus size") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q205_embedding_dim_profile")(spark, sf0001)
      .collect()
    val n = Tables.embeddings(spark, sf0001).count()
    val dims = Tables.embeddings(spark, sf0001)
      .select(size(col("embedding"))).head().getInt(0)
    assert(rows.length == dims)
    assert(rows.map(_.getAs[Int]("dim")).toSeq == (1 to dims))
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Double]("iqr") >= 0)
      assert(r.getAs[Double]("v_min") <= r.getAs[Double]("p50") &&
        r.getAs[Double]("p50") <= r.getAs[Double]("v_max"))
    }
  }

  test("mmr greedy: diversity beats redundant relevance on a rigged case") {
    // candidates: 1 and 2 are near-duplicates with top relevance; 3 is
    // slightly less relevant but orthogonal to both. Pure top-2 takes
    // {1, 2}; MMR (λ=0.7) must take {1, 3}.
    val rel = Seq((1L, 0.95), (2L, 0.94), (3L, 0.80))
    def sym(m: Map[(Long, Long), Double]) = m ++ m.map { case ((a, b), v) =>
      (b, a) -> v }
    val sim = sym(Map((1L, 2L) -> 0.99, (1L, 3L) -> 0.05, (2L, 3L) -> 0.05))
    assert(Similarity.mmrSelect(rel, sim, k = 2, lambda = 0.7)
      == Vector(1L, 3L))
    // with λ=1 MMR degrades to pure relevance ranking
    assert(Similarity.mmrSelect(rel, sim, k = 2, lambda = 1.0)
      == Vector(1L, 2L))
    // ties break to the lower id; k caps at the shortlist size
    val flat = Seq((4L, 0.5), (5L, 0.5))
    val simFlat = sym(Map((4L, 5L) -> 0.0))
    assert(Similarity.mmrSelect(flat, simFlat, k = 9, lambda = 0.7)
      == Vector(4L, 5L))
  }

  test("q297: int8 ranking is complete, ranked, and close to float top-10") {
    val rows = graft.SparkEntry.queries("q297_int8_ann")(spark, sf0001)
      .collect()
    assert(rows.length == 50, "5 queries x top-10")
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to 10),
        s"query $q ranks must be 1..10")
      // int dots non-increasing down the ranking (exact BIGINTs)
      val dots = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("int_dot"))
      assert(dots.zip(dots.tail).forall { case (a, b) => a >= b })
      // one overlap value per query, and int8 error is small enough that
      // the quantized top-10 keeps most of the float top-10 (measured 8-9
      // of 10 at sf0.001/sf0.01 on 64-dim embeddings; 5 is the loud-failure
      // floor, not the expectation)
      val common = rs.map(_.getAs[Long]("n_common")).distinct
      assert(common.length == 1)
      assert(common.head >= 5 && common.head <= 10,
        s"query $q: n_common ${common.head} out of [5, 10]")
    }
  }

  test("q285 calibration survives a template-collision corpus (selection-bias find, round 14)") {
    // The round-14 skew-board find: testing MinHash unbiasedness over the
    // CANDIDATE population fails on template-heavy corpora, because
    // banding selects pairs whose estimate fluctuated high. This fixture
    // reproduces the adversarial shape in miniature: 30 docs share an
    // 8-word boilerplate block (pairwise exact j ~= 0.27 — below the 0.5
    // dedup bar, yet 2-wide/8-band LSH admits ~46% of those pairs as
    // candidates, each conditioned upward — this very fixture drove
    // candidate-population mae past 0.2, which is why BOTH bands now
    // live on the ground-truth population), plus 10 genuine near-dup
    // pairs at j ~= 0.65. The q285 contract must hold: bias AND mae
    // measured on the GROUND-TRUTH j >= 0.5 pairs (selection-free).
    val common = (1 to 8).map(i => s"c$i").mkString(" ")
    val template = (0 until 30).map { d =>
      (d.toLong, "tpl", common + " " + (1 to 8).map(i => s"t${d}u$i").mkString(" "))
    }
    val dups = (0 until 10).flatMap { i =>
      val base = (1 to 15).map(j => s"d${i}w$j").mkString(" ")
      Seq((100L + 2 * i, "dup", base + " endA"),
        (101L + 2 * i, "dup", base + " endB"))
    }
    val docs = (template ++ dups).toDF("doc_id", "source", "text")
    val dir = ops.Sources.scratchDir(spark, "graft_q285_skew")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q285_minhash_estimator")(spark, dir.toString)
      .head()
    assert(r.getAs[Long]("n_docs") == 50)
    // the 10 crafted near-dup pairs are the ONLY j >= 0.5 pairs
    assert(r.getAs[Long]("n_exact05") == 10,
      s"fixture drifted: ${r.getAs[Long]("n_exact05")} ground-truth pairs")
    // the fixture is adversarial only if template collisions actually
    // reach the candidate set beyond the 10 true pairs
    val sh = ops.TextOps.shingles(
      Tables.documents(spark, dir.toString), "text", 3).localCheckpoint(true)
    val nCand = ops.Similarity.minHashCandidatesFrom(sh).count()
    assert(nCand > 30, s"only $nCand candidates — template collisions missing")
    assert(r.getAs[Boolean]("est_unbiased"),
      "ground-truth bias crossed 0.1 — the selection-free population " +
        "must be unbiased on ANY corpus shape (Broder '97)")
    assert(r.getAs[Boolean]("est_calibrated"),
      "ground-truth mae crossed 0.2 — per-pair E|est - j| <= se <= 0.125, " +
        "so the 0.2 band must hold on ANY corpus shape")
  }
}
