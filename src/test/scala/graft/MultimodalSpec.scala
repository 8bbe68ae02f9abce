package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("media table keeps payloads as opaque bytes with typed metadata") {
    val mt = Multimodal.mediaTable(spark, sf0001)
    assert(mt.schema("payload").dataType.typeName == "binary")
    val n = mt.count()
    assert(n == Tables.documents(spark, sf0001).count())
  }

  test("stub decoder is deterministic and partition-batched") {
    val a = Multimodal.extractFeatures(spark, sf0001)
      .orderBy("media_id").collect()
    val b = Multimodal.extractFeatures(spark, sf0001)
      .orderBy("media_id").collect()
    assert(a.sameElements(b))
    // dimensions derive from payload bytes: same payload -> same dims
    val r = a.head
    assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("height") >= 64)
  }

  test("decodeStub FNV checksum matches a reference implementation") {
    val payload = "hello".getBytes("UTF-8")
    val row = Multimodal.MediaRow(1L, "img/type0", payload)
    val feat = Multimodal.decodeStub(Iterator(row)).next()
    var expect = 1469598103934665603L
    payload.foreach { b => expect ^= b; expect *= 1099511628211L }
    assert(feat.checksum == expect)
    assert(feat.n_bytes == 5)
  }
}
