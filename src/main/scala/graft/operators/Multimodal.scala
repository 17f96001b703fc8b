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
}
