package graft

import graft.core.Tables
import graft.llm.Multimodal

class MultimodalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("binary payload table decodes to deterministic metadata per partition") {
    val docs = Tables.load(spark, sf, "documents").limit(50)
    val media = Multimodal.asMediaTable(docs)
    val meta = Multimodal.decodeMeta(media).collect()
    assert(meta.length === 50)
    val expected = docs.collect().map { r =>
      val bytes = r.getAs[String]("text").getBytes("UTF-8")
      r.getAs[Long]("doc_id") -> bytes.length.toLong
    }.toMap
    meta.foreach { m =>
      assert(m.byte_len === expected(m.media_id))
      assert(m.content_hash.length === 32)
      assert(m.width === (m.byte_len % 640) + 1)
    }
  }

  test("decode runs distributed (partition count > 1, no driver collect)") {
    val docs = Tables.load(spark, sf, "documents").repartition(4)
    val meta = Multimodal.decodeMeta(Multimodal.asMediaTable(docs))
    assert(meta.rdd.getNumPartitions === 4)
    assert(meta.count() === 500)
  }

  test("frame sampling emits ordinal+offset rows per payload") {
    val docs = Tables.load(spark, sf, "documents").limit(5)
    val frames = Multimodal.sampleFrames(Multimodal.asMediaTable(docs), everyNBytes = 64)
    val byDoc = frames.collect().groupBy(_.getLong(0))
    assert(byDoc.nonEmpty)
    byDoc.values.foreach { rows =>
      val ords = rows.map(_.getInt(1)).sorted
      assert(ords.toSeq === (0 until rows.length))
      assert(rows.map(_.getLong(2)).forall(_ % 64 === 0))
    }
  }
}
