package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema contracts, mapPartitions batch shape,
  * frame sampling boundaries. Decode/resize are stubs by design (no
  * codecs in this environment) — what is tested is everything a real
  * codec would rely on.
  */
class MultimodalSpec extends SparkSpec {

  private def media() = {
    import spark.implicits._
    Seq(
      (1L, "0123456789abcdef0123456789abcdef".getBytes, "image/png"),
      (2L, "tiny".getBytes, "image/jpg"),
      (3L, Array.empty[Byte], "image/gif"))
      .toDF("media_id", "payload", "format")
  }

  test("decodeFeatures keeps one row per input with the feature schema") {
    val out = Multimodal.decodeFeatures(media())
    assert(out.schema.fieldNames.toSeq ===
      Seq("media_id", "format", "n_bytes", "width", "height", "channels"))
    assert(out.count() === 3)
    val r = out.filter(col("media_id") === 1).collect().head
    assert(r.getLong(2) === 32L)
    assert(r.getInt(3) >= 64 && r.getInt(4) >= 64) // stub dims in range
  }

  test("resizeStub emits target dims and a smaller-or-equal payload") {
    val out = Multimodal.resizeStub(media(), targetW = 8, targetH = 8).collect()
    assert(out.forall(r => r.getInt(2) == 8 && r.getInt(3) == 8))
    val in = media().collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    out.foreach { r =>
      assert(r.getAs[Array[Byte]](4).length <= in(r.getLong(0)).length ||
        in(r.getLong(0)).isEmpty)
    }
  }

  test("sampleFrames: boundaries, count, and content") {
    import spark.implicits._
    val one = Seq((1L, "abcdefghij")).toDF("media_id", "payload")
    // frameSize=4, stride=3 over 10 chars -> frames at 1,4,7: abcd defg ghij
    val frames = Multimodal.sampleFrames(one, frameSize = 4, stride = 3)
      .orderBy("frame_no").collect()
      .map(r => (r.getLong(1), r.getString(2)))
    assert(frames.toSeq === Seq((0L, "abcd"), (1L, "defg"), (2L, "ghij")))
    // payload shorter than one frame -> zero rows (no descending-sequence trap)
    val short = Seq((2L, "ab")).toDF("media_id", "payload")
    assert(Multimodal.sampleFrames(short, 4, 3).count() === 0)
  }
}
