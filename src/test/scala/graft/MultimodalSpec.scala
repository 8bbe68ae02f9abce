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

  test("frame sampling keeps every k-th fixed-size chunk; resize box-fits") {
    val payload = Array.tabulate[Byte](300)(_.toByte)
    val frames = Multimodal.frameSample(
      Iterator(Multimodal.MediaRow(7L, "img/type1", payload)),
      frameBytes = 64, everyK = 2).toSeq
    // 300 bytes -> chunks of 64,64,64,64,44 (5) -> indices 0,2,4 kept
    assert(frames.map(_.frame_idx) == Seq(0, 2, 4))
    assert(frames.map(_.n_bytes) == Seq(64, 64, 44))
    assert(frames.forall(_.media_id == 7L))
    val big = Multimodal.MediaFeatures(1L, "t", 0, 1024, 512, 0L)
    val r = Multimodal.resizeStub(big, 256)
    assert(r.width == 256 && r.height == 128) // aspect preserved
    val small = Multimodal.MediaFeatures(1L, "t", 0, 100, 50, 0L)
    assert(Multimodal.resizeStub(small, 256) == small) // no upscale
    // distributed counts line up with per-payload arithmetic
    val n = Multimodal.sampleFrames(spark, sf0001).count()
    val expect = Tables.documents(spark, sf0001)
      .select(octet_length(col("text")).as("b")).collect()
      .map(r2 => (math.ceil(r2.getInt(0) / 64.0).toInt + 1) / 2).sum
    assert(n == expect)
  }

  test("decodeStub FNV checksum matches a reference implementation") {
    val payload = "hello".getBytes("UTF-8")
    val row = Multimodal.MediaRow(1L, "img/type0", payload)
    val feat = Multimodal.decodeStub(Iterator(row)).next()
    // independent FNV-1a 64 fold (unsigned bytes)
    var expect = 0xcbf29ce484222325L
    payload.foreach { b => expect ^= (b & 0xffL); expect *= 0x100000001b3L }
    assert(feat.checksum == expect)
    assert(feat.n_bytes == 5)
  }
}
