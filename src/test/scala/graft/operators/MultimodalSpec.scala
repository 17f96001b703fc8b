package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Seq(
    (1L, "fake-image-bytes-aaaa".getBytes("UTF-8"), "image"),
    (2L, "fake-video-bytes-with-more-content-bbbb".getBytes("UTF-8"), "video"),
    (3L, Array.emptyByteArray, "image"))
    .toDF("media_id", "payload", "media_type")

  test("decodeMeta: per-partition batch decode produces typed metadata, deterministic") {
    val m1 = Multimodal.decodeMeta(media).collect().map(m => m.media_id -> m).toMap
    val m2 = Multimodal.decodeMeta(media).collect().map(m => m.media_id -> m).toMap
    assert(m1(1L).byte_len === "fake-image-bytes-aaaa".length)
    assert(m1(3L).byte_len === 0)
    assert(m1(1L).checksum === m2(1L).checksum) // stub decode is deterministic
    assert(m1(1L).width >= 16 && m1(1L).height >= 16)
  }

  test("sampleFrames: chunk-index explosion shape") {
    val frames = Multimodal.sampleFrames(media, chunkSize = 8, every = 1)
      .filter(col("media_id") === 2L).collect()
    assert(frames.length === 4) // 39 bytes / 8 ≈ 4 full chunks
    assert(frames.map(_.getAs[Int]("offset")).toSet === Set(0, 8, 16, 24))
  }

  test("resizeStub: binary-in binary-out, size tracks target area, deterministic") {
    val small = Multimodal.resizeStub(media, targetW = 16, targetH = 16).toDF()
    assert(small.count() === media.count())
    // every output row carries the target dims; payload emptiness and the
    // shrink bound track the input (empty in -> empty out)
    val rows = small.collect()
    assert(rows.forall(r => r.getAs[Int]("width") === 16 && r.getAs[Int]("height") === 16))
    val inSizes = media.collect().map(r =>
      r.getAs[Long]("media_id") ->
        Option(r.getAs[Array[Byte]]("payload")).map(_.length).getOrElse(0)).toMap
    rows.foreach { r =>
      val out = r.getAs[Array[Byte]]("payload").length
      val in = inSizes(r.getAs[Long]("media_id"))
      assert(out <= in, s"resize grew ${r.getAs[Long]("media_id")}: $in -> $out")
      assert((out > 0) === (in > 0), "payload emptiness must track the input")
    }
    // pure function of the input: identical payloads on recompute
    val again = Multimodal.resizeStub(media, 16, 16).toDF()
    assert(small.exceptAll(again).count() === 0)
  }

  test("featureStub composes with the similarity operators end-to-end") {
    // duplicate payloads -> identical unit vectors -> cosine 1.0 pair;
    // the multimodal -> embedding -> near-dup pipeline is a composition
    val withDup = media.union(
      Seq((4L, "fake-image-bytes-aaaa".getBytes("UTF-8"), "image"))
        .toDF("media_id", "payload", "media_type"))
    val vecs = Multimodal.featureStub(withDup, dim = 16).toDF()
    assert(vecs.count() === 4)
    // deterministic across runs
    val again = Multimodal.featureStub(withDup, dim = 16).toDF()
    assert(vecs.exceptAll(again).count() === 0)
    val pairs = Similarity.cosinePairs(vecs, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === Set((1L, 4L))) // exactly the payload duplicates
  }
}
