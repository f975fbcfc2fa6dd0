package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media items are opaque `binary` columns with
  * typed metadata; decode/feature-extract runs as a batched mapPartitions
  * kernel over the binary column (the Scala analog of `mapInPandas` —
  * per-partition batches, decoder state initialized once per partition).
  *
  * The actual image/audio decode is STUBBED (no codec libraries in this
  * container): `decodeStub` derives deterministic fake dimensions/signature
  * from the bytes. The Spark-side plumbing — schema, binary encoding,
  * batching shape, kernel signature — is real and is verified two ways:
  * the relational twin below is oracle-checked, and a ScalaTest asserts
  * kernel ≡ relational.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, blob: Array[Byte])
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int,
                                 height: Int, channels: Int, sig: String)

  val BatchSize = 64

  /** The stub decoder a real implementation would replace (libjpeg /
    * ffmpeg / PIL equivalent). Deterministic in the bytes. */
  def decodeStub(m: MediaRow): MediaFeatures = {
    val n = m.blob.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val sig = md.digest(m.blob).take(4).map("%02x".format(_)).mkString
    MediaFeatures(m.doc_id, n, n % 640, (n * 7) % 480, 3, sig)
  }

  /** Real plumbing: binary column → batched mapPartitions kernel. */
  def featurizeKernel(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaRow]
      .mapPartitions { it =>
        // decoder init would happen here, once per partition
        it.grouped(BatchSize).flatMap(batch => batch.map(decodeStub))
      }
      .toDF()
  }

  /** Resize stub: a real implementation scales pixel buffers; the stub
    * rescales the fake dimensions deterministically (aspect-preserving
    * integer arithmetic), keeping the batch/kernel shape identical. */
  def resizeStub(f: MediaFeatures, maxSide: Int): MediaFeatures = {
    val side = math.max(math.max(f.width, f.height), 1)
    if (side <= maxSide) f
    else f.copy(width = f.width * maxSide / side, height = f.height * maxSide / side)
  }

  /** Frame-sample stub for video-like payloads: pick every k-th "frame"
    * (byte offset) deterministically. Returns (doc_id, frame_idx, byte). */
  def frameSampleKernel(spark: SparkSession, docs: DataFrame, k: Int = 64): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaRow]
      .flatMap { m =>
        m.blob.indices.by(k).map(i => (m.doc_id, i, m.blob(i).toInt & 0xff))
      }
      .toDF("doc_id", "frame_idx", "byte")
  }

  /** Relational twin of frameSampleKernel (oracle-checkable; byte ==
    * ascii(char) holds because the corpus is ASCII — the kernel itself is
    * byte-correct for any payload). */
  def frameSampleRelational(docs: DataFrame, k: Int = 64): DataFrame = {
    val idx = sequence(lit(0), greatest(length(col("text")) - 1, lit(0)), lit(k))
    // empty payloads yield NO frames (the kernel and oracle agree; without
    // the guard, sequence(0, greatest(-1, 0)) would emit a frame_idx=0 row)
    docs.filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"), explode(idx).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        ascii(expr("substr(text, frame_idx + 1, 1)")).as("byte"))
  }

  /** Relational twin of the kernel (same arithmetic in Column expressions)
    * — this is what the DuckDB oracle checks; ScalaTest asserts the kernel
    * produces identical rows. */
  def featurizeRelational(docs: DataFrame): DataFrame = {
    val blob = col("text").cast("binary")
    val n = length(blob)
    docs.select(
      col("doc_id"),
      n.as("n_bytes"),
      (n % 640).as("width"),
      ((n * 7) % 480).as("height"),
      lit(3).as("channels"),
      substring(md5(blob), 1, 8).as("sig"))
  }
}
