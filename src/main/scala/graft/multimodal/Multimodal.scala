package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (driver extension surface): media carried as
  * opaque `binary` payloads with typed metadata, processed in per-partition
  * batches.
  *
  * The decode step is a clearly-marked deterministic STUB — this container
  * has no image/audio codecs — but everything Spark-side is real and
  * oracle-tested: the binary schema, the typed Dataset boundary, the
  * `mapPartitions` batch shape (the JVM analog of arrow-batched
  * `mapInPandas`: one iterator per partition, so a real decoder would
  * amortize model/codec init across the batch exactly like a Pandas UDF
  * does), and the feature-column contract.
  *
  * At 100 TB: payloads never shuffle — features are extracted map-side and
  * only the (small) feature rows flow on; repartition BEFORE extraction by
  * whatever key downstream joins need, so the expensive pass is also the
  * co-locating one.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])

  final case class MediaFeatures(doc_id: Long, n_bytes: Long,
      b0: Int, b1: Int, b2: Int, b3: Int, checksum: Long,
      width: Int, height: Int)

  private val P = 1000000007L

  /** Wrap documents as a media table: binary payload + mime metadata. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), lit("text/plain").as("mime"),
      col("text").cast("binary").as("payload"))

  /** STUB decode: stands in for an image codec (none in this container).
    * Deterministic fake dimensions derived from payload length; a real
    * deployment swaps this body for the codec call — the signature and
    * the batch shape around it are the real contract.
    */
  def decodeImageStub(payload: Array[Byte]): (Int, Int) =
    (payload.length % 640, payload.length % 480)

  /** Per-partition batched feature extraction over the opaque payloads:
    * byte stats + rolling checksum + (stubbed) decoded dimensions.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition init would go here (codec/model load, once per batch)
      batch.map { m =>
        val p = m.payload
        def b(i: Int): Int = if (i < p.length) p(i) & 0xff else -1
        var checksum = 0L
        var i = 0
        while (i < p.length) { checksum = (checksum + (p(i) & 0xff)) % P; i += 1 }
        val (w, h) = decodeImageStub(p)
        MediaFeatures(m.doc_id, p.length.toLong, b(0), b(1), b(2), b(3),
          checksum, w, h)
      }
    }
  }
}
