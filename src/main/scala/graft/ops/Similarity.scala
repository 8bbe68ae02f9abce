package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings.embedding: array<float>`
  * (BASELINE.json north star). Everything is higher-order-function based —
  * `zip_with`/`aggregate` fold in ascending index order, exactly like
  * DuckDB's list_* fold, so cosine values are bit-comparable across engines.
  *
  * Scale notes: brute-force kNN is the correctness baseline (O(Q·N·dim),
  * query side broadcast — no shuffle). The scale path is LSH: random
  * hyperplane signatures bucket the corpus with one shuffle on the bucket
  * key; candidate generation is then a bucket-local join. MinHash-LSH plays
  * the same role for set similarity (near-dup text).
  */
object Similarity {

  /** Elementwise dot product in double precision, sequential fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity, null on zero norm (ANSI-safe). */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(null)).otherwise(dot(a, b) / d)
  }

  /** Brute-force top-k cosine neighbors for each query vector. */
  def knn(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("sim_raw"), asc("neighbor_id"))
    c.crossJoin(broadcast(q))
      .withColumn("sim_raw", cosine(col("cv"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("sim_raw"), 6).as("sim"),
        col("rank"))
  }

  /** Random-hyperplane LSH signature: `planes` pseudo-random hyperplanes
    * derived deterministically from (planeId, dim) via xxhash64 — sign bits
    * packed into a long. Hamming-close signatures ⇒ cosine-close vectors. */
  def hyperplaneSignature(emb: Column, planes: Int, dim: Int): Column = {
    val bits = (0 until planes).map { p =>
      // plane component h(p, i) mapped to [-1, 1); dot(plane, emb) sign bit
      val proj = (0 until dim).map { i =>
        val h = xxhash64(lit(p * 131071 + i))
        (h % 1000000).cast("double") / 1000000.0 * emb(i).cast("double")
      }.reduce(_ + _)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  val queries: Seq[Q] = Seq(

    // Brute-force cosine kNN (correctness baseline; oracle recomputes the
    // identical double-precision fold via DuckDB list lambdas).
    Q("q33_knn_cosine",
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        |sims AS (
        |  SELECT q.query_id, c.neighbor_id,
        |         list_sum(list_transform(range(1, len(cv) + 1),
        |             i -> CAST(cv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
        |         / (sqrt(list_sum(list_transform(range(1, len(cv) + 1),
        |                i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))
        |          * sqrt(list_sum(list_transform(range(1, len(qv) + 1),
        |                i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))))
        |           AS sim_raw
        |  FROM c CROSS JOIN q)
        |SELECT query_id, neighbor_id, round(sim_raw, 6) AS sim, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |            ORDER BY sim_raw DESC, neighbor_id) AS INT) AS rank
        |  FROM sims)
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      knn(emb.filter(col("vec_id") < 5), emb, 10)
        .orderBy("query_id", "rank")
    },

    // All near-duplicate embedding pairs above a cosine threshold.
    // Norms are computed once per vector *before* the O(n²) join (3× fewer
    // folds in the hot loop); the oracle normalizes identically so the
    // per-pair dot product is the same double-precision fold in both engines.
    Q("q34_similar_pairs",
      """WITH n AS (
        |  SELECT vec_id,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |           sqrt(list_sum(list_transform(embedding,
        |                y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS nv
        |  FROM embeddings
        |  WHERE list_sum(list_transform(embedding,
        |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))) > 0),
        |sims AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |         list_sum(list_transform(range(1, len(a.nv) + 1),
        |             i -> a.nv[i] * b.nv[i])) AS sim_raw
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b, round(sim_raw, 6) AS sim
        |FROM sims WHERE sim_raw >= 0.5 ORDER BY vec_a, vec_b""".stripMargin) { (s, d) =>
      val normed = Tables.embeddings(s, d)
        .withColumn("nrm", norm(col("embedding")))
        .filter(col("nrm") * col("nrm") > 0)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double") / col("nrm")).as("nv"))
      val a = normed.select(col("vec_id").as("vec_a"), col("nv").as("na"))
      val b = normed.select(col("vec_id").as("vec_b"), col("nv").as("nb"))
      a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
        .withColumn("sim_raw", dot(col("na"), col("nb")))
        .filter(col("sim_raw") >= 0.5)
        .select(col("vec_a"), col("vec_b"), round(col("sim_raw"), 6).as("sim"))
        .orderBy("vec_a", "vec_b")
    },

    // ANN scale path: 16-bit random-hyperplane LSH bucketing, then exact
    // cosine only within buckets. Deterministic but hash-function-specific
    // → rows-only check; recall vs brute force is asserted in unit tests.
    Q.rowsOnly("q35_ann_lsh") { (s, d) =>
      val emb = Tables.embeddings(s, d)
        .withColumn("sig", hyperplaneSignature(col("embedding"), 16, 64))
      val a = emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea"), col("sig"))
      val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb"), col("sig"))
      a.join(b, Seq("sig")).filter(col("vec_a") < col("vec_b"))
        .withColumn("sim", round(cosine(col("ea"), col("eb")), 6))
        .filter(col("sim") >= 0.5)
        .select(col("sig"), col("vec_a"), col("vec_b"), col("sim"))
        .orderBy("vec_a", "vec_b")
    },

    // MinHash-LSH near-dup candidates on documents: 3-gram shingles →
    // 16 minhashes (xxhash64 with per-function salt) → 4 bands of 4 →
    // banded join. Engine-hash-specific → rows-only; banding recall is
    // unit-tested against q27's exact Jaccard pairs.
    Q.rowsOnly("q36_minhash_lsh") { (s, d) =>
      val numHashes = 16
      val bandSize = 4
      val sh = TextOps.shingles(Tables.documents(s, d), "text", 3)
      val mins = (0 until numHashes).map(i =>
        min(xxhash64(lit(i), col("shingle"))).as(s"mh_$i"))
      val minhashes = sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      val bands = (0 until numHashes / bandSize).map { bnd =>
        val cols = (0 until bandSize).map(j => col(s"mh_${bnd * bandSize + j}"))
        minhashes.select(col("doc_id"), lit(bnd).as("band"),
          xxhash64(cols: _*).as("band_hash"))
      }.reduce(_.union(_))
      val a = bands.select(col("doc_id").as("doc_a"), col("band"), col("band_hash"))
      val bb = bands.select(col("doc_id").as("doc_b"), col("band"), col("band_hash"))
      a.join(bb, Seq("band", "band_hash")).filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
        .orderBy("doc_a", "doc_b")
    }
  )
}
