package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads travel as opaque binary
  * columns with typed metadata; decode/feature-extract runs as batched
  * per-partition logic so a real decoder (image/audio libs) can amortize
  * native setup per partition, not per row.
  *
  * The decode itself is a STUB (media libraries are not available in this
  * environment): `fakeDecode` derives deterministic pseudo-metadata from the
  * raw bytes. The Spark-side plumbing — binary schema, partition batching,
  * typed output — is real and is what a production decoder would drop into.
  */
object Media {

  /** Raw media record: opaque bytes + carrier metadata. */
  case class MediaRaw(media_id: Long, bytes: Array[Byte], mime: String)

  /** Decoded metadata record (what a real image decode would emit).
    * first_cp is the first code point of the decoded payload — code-point
    * (not raw-byte) semantics so the metadata is encoding-stable for
    * multi-byte text payloads.
    */
  case class MediaMeta(media_id: Long, n_bytes: Long, first_cp: Int,
                       fake_width: Int, fake_height: Int)

  /** STUB decoder: deterministic pseudo-decode of an image payload.
    * A real implementation would hand `raw.bytes` to an image library here.
    */
  def fakeDecode(raw: MediaRaw): MediaMeta = {
    // only the first code point is needed: decode a bounded prefix (a
    // UTF-8 code point is at most 4 bytes; 8 guarantees the first decodes
    // intact) instead of materializing a String of the whole payload —
    // O(1) per row instead of O(payload)
    val n = math.min(raw.bytes.length, 8)
    val s = new String(raw.bytes, 0, n, "UTF-8")
    val cp = if (s.isEmpty) 0 else s.codePointAt(0)
    MediaMeta(raw.media_id, raw.bytes.length.toLong, cp,
      (raw.bytes.length % 640).toInt, (cp * 7) % 480)
  }

  /** Batched decode over partitions: the iterator shape lets a real decoder
    * initialize native context once per partition.
    */
  def decodeAll(ds: Dataset[MediaRaw]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition init of a real decoder would go here
      it.map(fakeDecode)
    }
  }


  /** The docs-as-media projection every pipeline shares. */
  private def asMediaRaw(docs: DataFrame, mime: String)
                        (implicit spark: SparkSession): Dataset[MediaRaw] = {
    import spark.implicits._
    // null text maps to an EMPTY payload at the source, in one place: a
    // 100 TB feed from external writers carries nullable text, and a null
    // byte array would NPE inside every processor on the executor. The
    // oracle twins coalesce identically (empty-payload metadata, not NULL).
    docs.select(col("doc_id").as("media_id"),
      coalesce(col("text"), lit("")).cast("binary").as("bytes"),
      lit(mime).as("mime")).as[MediaRaw]
  }

  /** Builds a media table from the documents table (text bytes standing in
    * for an image payload) and runs the decode pipeline.
    */
  def decodeDocuments(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeAll(asMediaRaw(docs, "image/fake")(spark)).toDF()

  /** Frame-sampling stats for a video-like payload: fixed-size frames,
    * every `stride`-th frame kept. */
  case class MediaFrameStats(media_id: Long, n_frames_total: Long, n_frames_sampled: Long,
                             sampled_bytes: Long)

  /** STUB frame sampler: chunks the payload into `frameSize`-byte frames and
    * keeps every `stride`-th frame (a real video pipeline would seek
    * keyframes here). The chunking and batch shape are real.
    */
  def frameSample(raw: MediaRaw, frameSize: Int, stride: Int): MediaFrameStats = {
    require(frameSize >= 1 && stride >= 1, s"frameSize/stride must be >= 1, got $frameSize/$stride")
    // every output is arithmetic on the payload LENGTH — computing them
    // without materializing per-frame byte arrays keeps per-row memory
    // O(1) (the previous grouped(..).toArray copied the payload twice).
    // Every frame is frameSize bytes except a short last frame; it is
    // sampled iff its index is a stride multiple.
    val len = raw.bytes.length.toLong
    val nFrames = (len + frameSize - 1) / frameSize
    val nSampled = if (nFrames == 0) 0L else (nFrames + stride - 1) / stride
    val shortLast = nFrames > 0 && (nFrames - 1) % stride == 0
    val lastDeficit = if (shortLast) nFrames * frameSize - len else 0L
    MediaFrameStats(raw.media_id, nFrames, nSampled,
      nSampled * frameSize - lastDeficit)
  }

  /** STUB feature extractor: a fake fixed-dim embedding from the payload
    * head (a real image model would run here, batched per partition). */
  case class MediaFeature(media_id: Long, feat_dim: Int, feat_sum: Long)

  def featureExtract(raw: MediaRaw, dim: Int): MediaFeature = {
    // fail fast at entry like the sibling stubs — a bad dim would
    // otherwise throw per-row inside the executor with no parameter context
    require(dim >= 1, s"dim must be >= 1, got $dim")
    // code-point semantics (see MediaMeta.first_cp): stable for multi-byte
    // text. Only the first `dim` code points are needed; 4*dim+4 bytes
    // guarantee at least dim complete code points (or payload end), so the
    // decode is bounded instead of O(payload). feat_dim reports the
    // CONFIGURED width (the stub contract) even when the payload is
    // shorter — the fake embedding is zero-padded, not truncated.
    val n = math.min(raw.bytes.length, 4 * dim + 4)
    val s = new String(raw.bytes, 0, n, "UTF-8")
    val head = s.codePoints().limit(dim).toArray
    MediaFeature(raw.media_id, dim, head.map(_.toLong).sum)
  }

  /** Aspect-preserving resize plan: source dims from the (stub) decode,
    * destination dims fit inside the target box. All arithmetic is integer
    * (rational scale via cross-multiplication, floor division) so the plan
    * is bit-reproducible by any engine — a real resampler would consume
    * these dims; the byte estimate assumes 3 bytes/pixel.
    *
    * A source so narrow that the scaled dimension floors to 0 yields a
    * 0-width (or 0-height) plan with out_bytes = 0 — consumers treat such
    * plans as degenerate-skip rows, the same contract as the w/h <= 0
    * case.
    */
  case class MediaResized(media_id: Long, src_width: Int, src_height: Int,
                          dst_width: Int, dst_height: Int, out_bytes: Long)

  def resizePlan(raw: MediaRaw, targetW: Int, targetH: Int): MediaResized = {
    require(targetW >= 1 && targetH >= 1, s"target dims must be >= 1, got ${targetW}x$targetH")
    val m = fakeDecode(raw)
    val (w, h) = (m.fake_width, m.fake_height)
    val (dw, dh) =
      if (w <= 0 || h <= 0) (0, 0)
      // limited by height iff w/h <= tw/th  ⟺  w*th <= h*tw (integer-exact)
      else if (w.toLong * targetH <= h.toLong * targetW)
        ((w.toLong * targetH / h).toInt, targetH)
      else (targetW, (h.toLong * targetW / w).toInt)
    MediaResized(raw.media_id, w, h, dw, dh, dw.toLong * dh * 3L)
  }

  /** Resize pipeline over the documents-as-media table. */
  def resizeDocuments(spark: SparkSession, docs: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    import spark.implicits._
    asMediaRaw(docs, "image/fake")(spark)
      .mapPartitions(_.map(resizePlan(_, targetW, targetH)))
      .toDF()
  }

  /** Frame-sampling pipeline over the documents-as-media table. */
  def frameStatsDocuments(spark: SparkSession, docs: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    import spark.implicits._
    asMediaRaw(docs, "video/fake")(spark)
      .mapPartitions(_.map(frameSample(_, frameSize, stride)))
      .toDF()
  }

  /** Feature-extraction pipeline over the documents-as-media table. */
  def featuresDocuments(spark: SparkSession, docs: DataFrame, dim: Int): DataFrame = {
    import spark.implicits._
    asMediaRaw(docs, "image/fake")(spark)
      .mapPartitions(_.map(featureExtract(_, dim)))
      .toDF()
  }
}
