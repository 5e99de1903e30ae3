package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Multimodal-column plumbing (SURVEY.md §2c): media payloads ride as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract runs batched per partition.
  *
  * The decode step itself is a clearly-marked deterministic STUB (the
  * image/audio codecs aren't in this container); everything around it —
  * schema, binary column handling, batched `mapPartitions` shape (the
  * Scala twin of `mapInPandas`), partitioning — is real and tested.
  */
object Multimodal {

  /** A media payload: raw bytes + routing metadata. */
  case class MediaBlob(doc_id: Long, format: String, blob: Array[Byte])

  /** Stubbed "decoded" features derived deterministically from the bytes. */
  case class MediaFeatures(
      doc_id: Long,
      format: String,
      size_bytes: Long,
      checksum: Long,
      width: Long,
      height: Long,
      feature: Array[Float])

  /** JVM twin of [[TextFunctions.polyhash]] over raw bytes (docs here are
    * UTF-8 ASCII, so byte codes == codepoints and the two agree).
    */
  def polyhashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31L + (bytes(i) & 0xffL)) % TextFunctions.HashMod
      i += 1
    }
    h
  }

  /** documents → (doc_id, format, blob, meta struct). The blob is the raw
    * payload (UTF-8 bytes here); format fans out deterministically so the
    * routing path is exercised.
    */
  def asBlobs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("format"),
      encode(col("text"), "UTF-8").as("blob"))

  /** Column-level metadata extraction — the SQL-expressible face of the
    * pipeline (oracle-checked as `mm_meta`). Integer-only arithmetic.
    */
  def meta(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .withColumn("format",
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video"))
      .withColumn("blob", encode(col("text"), "UTF-8"))
      .withColumn("size_bytes", octet_length(col("blob")).cast("long"))
      .withColumn("checksum", TextFunctions.polyhash(col("text")))
      .withColumn("width", lit(16L) + col("checksum") % 320L)
      .withColumn("height", lit(16L) + expr("checksum DIV 320") % 200L)
      .withColumn("n_frames",
        when(col("format") === "video", lit(1L) + col("checksum") % 16L).cast("long"))
      .withColumn("sample_rate",
        when(col("format") === "audio", lit(8000L) + (col("checksum") % 4L) * 8000L).cast("long"))
      .select("doc_id", "format", "size_bytes", "checksum", "width", "height",
        "n_frames", "sample_rate")

  /** Frame-sampling plumbing for video payloads — the stage that turns a
    * video blob into a bounded per-frame work list BEFORE any decode:
    * every `stride`-th frame index (frame 0 always included) with its
    * integer byte window (offset, length) computed from the metadata.
    * This frame table is what a real pipeline hands the batched decoder
    * ([[decodeFeatures]]); the table itself is exact integer arithmetic,
    * so it is fully oracle-checked (`mm_framesample`). The explode is
    * narrow (no shuffle) and the fan-out is bounded by n_frames/stride
    * per doc — at 100 TB the work list stays proportional to the frames
    * you sample, never the bytes you store.
    */
  def frameSample(docs: DataFrame, stride: Int = 4): DataFrame = {
    require(stride >= 1, s"frameSample: stride must be >= 1, got $stride")
    meta(docs).filter(col("format") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong))))
      .withColumn("frame_len", expr("size_bytes DIV n_frames"))
      .withColumn("byte_offset", col("frame_idx") * col("frame_len"))
      .select("doc_id", "n_frames", "frame_idx", "byte_offset", "frame_len")
  }

  /** Audio segmentation work list — the overlapping-window analogue of
    * [[frameSample]] (the pre-stage every STFT/VAD/feature pipeline runs
    * BEFORE any decode): 10 ms windows (sample_rate/100 samples) at 50%
    * hop over each audio payload, each row an exact integer
    * (offset, length) with the tail window truncated at the payload end.
    * Narrow explode, fan-out bounded by n_samples/hop per doc; exact
    * integer arithmetic end to end, so fully oracle-checked
    * (`mm_audiowindow`).
    */
  def audioWindows(docs: DataFrame): DataFrame =
    meta(docs).filter(col("format") === "audio")
      .withColumn("win_len", expr("sample_rate DIV 100"))
      .withColumn("hop", expr("(sample_rate DIV 100) DIV 2"))
      .withColumn("sample_offset",
        explode(sequence(lit(0L), col("size_bytes") - 1, col("hop"))))
      .withColumn("win_idx", expr("sample_offset DIV hop"))
      .withColumn("win_actual", least(col("win_len"), col("size_bytes") - col("sample_offset")))
      .select("doc_id", "sample_rate", "size_bytes", "win_idx",
        "sample_offset", "win_len", "win_actual")

  /** STUB decoder: a real implementation would hand `batch` to a native
    * codec (libjpeg/ffmpeg) in one call — that's why the iterator is
    * batched. Here it derives a deterministic 8-float "feature" from the
    * bytes so the plumbing is testable end to end.
    */
  private def decodeBatch(batch: Seq[MediaBlob]): Seq[MediaFeatures] =
    batch.map { m =>
      val checksum = polyhashBytes(m.blob)
      val feature = Array.tabulate(8)(i => ((checksum >> (4 * i)) & 0xff).toFloat / 255.0f)
      MediaFeatures(m.doc_id, m.format, m.blob.length.toLong, checksum,
        16L + checksum % 320L, 16L + (checksum / 320L) % 200L, feature)
    }

  /** Batched per-partition decode — the Scala analogue of `mapInPandas`:
    * the executor iterates fixed-size batches so a native decoder gets
    * amortized calls and bounded memory. Narrow (no shuffle); repartition
    * upstream by `format` if codec affinity matters.
    */
  def decodeFeatures(spark: SparkSession, blobs: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    blobs.as[MediaBlob].mapPartitions { it =>
      it.grouped(batchSize).flatMap(decodeBatch)
    }
  }
}
