package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}

/** Multimodal columns (builder brief): image/audio/video as opaque `binary`
  * columns with typed metadata, batch-decoded per partition.
  *
  * The Spark-side plumbing — schema, partition-parallel decode, stable
  * output shape — is real; the codec itself is a clearly-marked
  * deterministic STUB (no image/audio libraries exist in this container).
  * Swapping [[DecodeStub]] for a real decoder changes no plan shape: decode
  * stays a `mapPartitions` over binary payloads, metadata stays columnar.
  *
  * Scale notes: payloads never pass through a shuffle here — decode is
  * map-side; downstream joins should carry only (id, features/meta) with the
  * binary column pruned (column pruning keeps it out of the scan unless
  * selected).
  */
object Multimodal {

  /** One media row: id + opaque payload + declared type. */
  case class MediaRow(media_id: Long, payload: Array[Byte], media_type: String)

  /** Decoded metadata — the stand-in for width/height/duration etc. */
  case class MediaMeta(media_id: Long, media_type: String, byte_len: Int,
                       checksum: Long, width: Int, height: Int)

  /** STUB decoder: deterministic pseudo-metadata derived from the payload
    * bytes. A real implementation would parse the container format here —
    * per-partition, so codec state is reused across a batch.
    */
  object DecodeStub {
    def decode(r: MediaRow): MediaMeta = {
      val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
      var h = 1125899906842597L // deterministic FNV-ish rolling checksum
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      // fake dimensions from the checksum — replace with real header parse
      MediaMeta(r.media_id, r.media_type, bytes.length, h,
        width = 16 + (math.abs(h) % 1920).toInt,
        height = 16 + (math.abs(h / 7) % 1080).toInt)
    }
  }

  /** Batch decode: binary-typed DataFrame → typed metadata Dataset.
    * mapPartitions so a real codec initializes once per partition, not per
    * row (the Pandas-UDF batch-shape analog in Scala).
    */
  def decodeMeta(media: DataFrame): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    media
      .select(col("media_id").cast("long"), col("payload").cast("binary"),
        col("media_type").cast("string"))
      .as(Encoders.product[MediaRow])
      .mapPartitions { it: Iterator[MediaRow] => it.map(DecodeStub.decode) }
  }

  /** Frame-sampling plumbing: emit `every`-th chunk index of the payload as
    * (media_id, frame_no, offset) — the row-multiplying shape of real frame
    * extraction with the codec stubbed to fixed-size chunks.
    */
  def sampleFrames(media: DataFrame, chunkSize: Int, every: Int): DataFrame =
    media
      .select(col("media_id"), length(col("payload").cast("binary")).as("n_bytes"))
      .select(col("media_id"),
        explode(sequence(lit(0),
          greatest((col("n_bytes") / chunkSize).cast("int") - 1, lit(0)),
          lit(every))).as("frame_no"))
      .withColumn("offset", col("frame_no") * chunkSize)

  /** A resized media row: id + transformed payload + the target dims. */
  case class ResizedMedia(media_id: Long, payload: Array[Byte],
                          width: Int, height: Int)

  /** Resize plumbing: payload → payload at (`targetW`, `targetH`), batch
    * per partition — binary in, binary out, the transform-in-place shape
    * of a real thumbnailing pass (decoder + scaler would initialize once
    * per partition). The scaler is a deterministic STUB: the output
    * payload is the input sampled at a stride proportional to the area
    * ratio (so output size tracks target area the way a real re-encode
    * roughly would), which keeps downstream size accounting and the plan
    * shape honest without codecs in the container.
    */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    implicit val enc = Encoders.product[ResizedMedia]
    media
      .select(col("media_id").cast("long"), col("payload").cast("binary"),
        col("media_type").cast("string"))
      .as(Encoders.product[MediaRow])
      .mapPartitions { it: Iterator[MediaRow] =>
        it.map { r =>
          val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
          val meta = DecodeStub.decode(r)
          val areaRatio = (targetW.toLong * targetH).toDouble /
            (meta.width.toLong * meta.height)
          val outLen = math.max(1, math.min(bytes.length,
            math.round(bytes.length * areaRatio).toInt))
          val out = new Array[Byte](if (bytes.isEmpty) 0 else outLen)
          var i = 0
          while (i < out.length) {
            out(i) = bytes((i.toLong * bytes.length / out.length).toInt)
            i += 1
          }
          ResizedMedia(r.media_id, out, targetW, targetH)
        }
      }
  }

  /** One media embedding row — shaped exactly like the `embeddings` table
    * (`vec_id`, `embedding: Array[Float]`) so the output plugs straight
    * into the similarity/dedup operators.
    */
  case class MediaVec(vec_id: Long, embedding: Array[Float])

  /** Feature-extraction plumbing: payload → `dim`-float embedding, batch
    * per partition (a real model would load once per partition and run
    * batched inference — the Pandas-UDF batch shape in Scala). The
    * "model" is a deterministic STUB: a seeded rolling hash per dimension,
    * L2-normalized, so downstream ANN/dedup results are reproducible. The
    * output feeds [[Similarity]] unchanged — the multimodal →
    * embedding → near-dup/ANN pipeline is a composition, not a new
    * operator.
    */
  def featureStub(media: DataFrame, dim: Int): Dataset[MediaVec] = {
    implicit val enc = Encoders.product[MediaVec]
    media
      .select(col("media_id").cast("long"), col("payload").cast("binary"),
        col("media_type").cast("string"))
      .as(Encoders.product[MediaRow])
      .mapPartitions { it: Iterator[MediaRow] =>
        it.map { r =>
          val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
          val v = new Array[Float](dim)
          var d = 0
          while (d < dim) {
            var h = 1125899906842597L ^ (d * 0x9E3779B97F4A7C15L)
            var i = 0
            while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
            v(d) = ((h % 1000003L).toFloat / 1000003f)
            d += 1
          }
          val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
          val unit = if (norm == 0) v else v.map(x => (x / norm).toFloat)
          MediaVec(r.media_id, unit)
        }
      }
  }
}
