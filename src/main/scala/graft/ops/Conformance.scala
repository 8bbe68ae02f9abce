package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** SQL-semantics conformance batteries — queries whose POINT is pinning
  * the engine's edge-case semantics (three-valued logic, hash-bucketed
  * batching) against the DuckDB reference, so a regression in either
  * engine's behavior surfaces as a hash mismatch rather than silent
  * drift. */
object Conformance {

  val queries: Seq[Q] = Seq(

    // Three-valued-logic torture: every NULL behavior an aggregate
    // pipeline silently depends on, measured on a frame with injected
    // NULLs (quantity 50 → NULL): aggregates skip NULLs (count/sum/avg/
    // min/max/distinct), COUNT(*) doesn't, null-safe equality (<=> ≙
    // IS NOT DISTINCT FROM) matches NULLs, comparisons with NULL are
    // UNKNOWN and fail WHERE, and GROUP BY collects NULLs into ONE
    // group. One partial-aggregated scan per returnflag plus a
    // domain-bounded distinct-group count.
    Q("q191_null_semantics",
      """WITH f AS (
        |  SELECT l_returnflag AS g,
        |         nullif(CAST(l_quantity AS BIGINT), 50) AS q
        |  FROM lineitem),
        |a AS (
        |  SELECT g, count(*) AS n_rows,
        |         CAST(count(*) - count(q) AS BIGINT) AS n_null,
        |         CAST(count(q) AS BIGINT) AS n_not_null,
        |         CAST(sum(q) AS BIGINT) AS sum_q,
        |         round(avg(q), 6) AS avg_q,
        |         CAST(min(q) AS BIGINT) AS min_q,
        |         CAST(max(q) AS BIGINT) AS max_q,
        |         CAST(count(DISTINCT q) AS BIGINT) AS n_distinct,
        |         CAST(sum(CASE WHEN q IS NOT DISTINCT FROM NULL
        |                       THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_nullsafe_null,
        |         CAST(sum(CASE WHEN q > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_cmp_true
        |  FROM f GROUP BY 1),
        |ng AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n_groups
        |  FROM (SELECT g, q FROM f GROUP BY g, q) GROUP BY 1)
        |SELECT a.g, n_rows, n_null, n_not_null, sum_q, avg_q, min_q,
        |       max_q, n_distinct, n_nullsafe_null, n_cmp_true, n_groups
        |FROM a JOIN ng ON a.g = ng.g ORDER BY a.g""".stripMargin) { (s, d) =>
      val f = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("g"),
          nullif(col("l_quantity").cast("long"), lit(50L)).as("q"))
        .localCheckpoint(true) // aggregate battery + group census share it
      val a = f.groupBy(col("g")).agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("q"))).cast("long").as("n_null"),
        count(col("q")).cast("long").as("n_not_null"),
        sum(col("q")).cast("long").as("sum_q"),
        round(avg(col("q")), 6).as("avg_q"),
        min(col("q")).cast("long").as("min_q"),
        max(col("q")).cast("long").as("max_q"),
        countDistinct(col("q")).cast("long").as("n_distinct"),
        sum(when(col("q") <=> lit(null), 1).otherwise(0)).cast("long")
          .as("n_nullsafe_null"),
        sum(when(col("q") > 0, 1).otherwise(0)).cast("long")
          .as("n_cmp_true"))
      val ng = f.groupBy(col("g"), col("q")).agg(count(lit(1)))
        .groupBy(col("g")).agg(count(lit(1)).cast("long").as("n_groups"))
      a.join(ng, "g")
        .select(col("g"), col("n_rows"), col("n_null"), col("n_not_null"),
          col("sum_q"), col("avg_q"), col("min_q"), col("max_q"),
          col("n_distinct"), col("n_nullsafe_null"), col("n_cmp_true"),
          col("n_groups"))
        .orderBy(col("g"))
    },

    // Inference micro-batch padding audit — the GPU-batching economics of
    // a fixed-shape serving tier: docs hash into 16 shards × 16 buckets
    // (both pure map-side md5 digits — NO ranking window, so no per-shard
    // funnel at any scale), each bucket is padded to its longest doc, and
    // the per-shard report totals the padding waste a max-length batch
    // layout would burn. Two-level aggregate, exact integers throughout;
    // only the waste ratio rounds.
    Q("q192_padding_audit",
      """WITH h AS (
        |  SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
        |         substr(md5(CAST(doc_id AS VARCHAR)), 2, 1) AS bucket,
        |         n_chars
        |  FROM documents),
        |b AS (
        |  SELECT shard, bucket, count(*) AS n, CAST(sum(n_chars) AS BIGINT)
        |           AS sum_chars,
        |         CAST(max(n_chars) AS BIGINT) AS max_chars
        |  FROM h GROUP BY 1, 2)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_buckets,
        |       CAST(sum(n) AS BIGINT) AS n_docs,
        |       CAST(sum(sum_chars) AS BIGINT) AS sum_chars,
        |       CAST(sum(n * max_chars - sum_chars) AS BIGINT) AS pad_chars,
        |       round(CAST(sum(n * max_chars - sum_chars) AS DOUBLE)
        |             / sum(n * max_chars), 6) AS pad_ratio
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val h = md5(col("doc_id").cast("string").cast("binary"))
      val b = Tables.documents(s, d)
        .select(substring(h, 1, 1).as("shard"),
          substring(h, 2, 1).as("bucket"), col("n_chars"))
        .groupBy(col("shard"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).cast("long").as("sum_chars"),
          max(col("n_chars")).cast("long").as("max_chars"))
      b.groupBy(col("shard"))
        .agg(count(lit(1)).cast("long").as("n_buckets"),
          sum(col("n")).cast("long").as("n_docs"),
          sum(col("sum_chars")).cast("long").as("sum_chars"),
          sum(col("n") * col("max_chars") - col("sum_chars")).cast("long")
            .as("pad_chars"),
          round(sum(col("n") * col("max_chars") - col("sum_chars"))
            .cast("double")
            / sum(col("n") * col("max_chars")).cast("double"), 6)
            .as("pad_ratio"))
        .orderBy(col("shard"))
    }
  )
}
