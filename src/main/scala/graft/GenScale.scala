package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility (round-9 scale smoke): synthesize an N×-replicated copy of
  * a testdata SF dir so the full board can run at 10× the bench scale
  * without new driver data. Each fact table unions N key-shifted
  * replicas — every BIGINT key column is offset by replica·(max(key)+1),
  * preserving referential integrity (orders→customer,
  * lineitem→orders/part/supplier, events/documents/embeddings ids) while
  * multiplying row counts; the tiny dimension tables (region, nation)
  * copy through unchanged. Value/timestamp columns repeat verbatim, so
  * densities (events per hour, docs per shard) scale with the data —
  * the stress direction a 100 TB cluster run would take. Outputs single
  * `.parquet` FILES matching the driver layout `Tables.load` expects.
  *
  *   sbt "runMain graft.GenScale /root/testdata/sf0.1 /tmp/sf1 10"
  */
object GenScale {

  private val keyCols: Map[String, Seq[String]] = Map(
    "region" -> Nil,
    "nation" -> Nil,
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def main(args: Array[String]): Unit = {
    val (src, out, mult) = (args(0), args(1), args(2).toInt)
    require(mult >= 1)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    Tables.names.foreach { t =>
      val base = Tables.load(spark, src, t)
      val keys = keyCols(t)
      val scaled =
        if (keys.isEmpty || mult == 1) base
        else {
          val offs = keys.map { k =>
            k -> (base.agg(max(col(k))).head().getLong(0) + 1L)
          }.toMap
          (0 until mult).map { i =>
            keys.foldLeft(base) { (df, k) =>
              df.withColumn(k, col(k) + lit(i * offs(k)))
            }
          }.reduce(_ unionByName _)
        }
      // single part file, renamed into the `<table>.parquet` layout
      val tmp = s"$out/_tmp_$t"
      scaled.coalesce(1).write.mode("overwrite").parquet(tmp)
      import scala.jdk.CollectionConverters._
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .iterator().asScala.filter(_.toString.endsWith(".parquet")).next()
      java.nio.file.Files.move(part,
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      graft.streaming.EventStreams.wipe(java.nio.file.Paths.get(tmp))
      println(s"[genscale] $t x$mult -> $out/$t.parquet")
    }
    spark.stop()
  }
}
