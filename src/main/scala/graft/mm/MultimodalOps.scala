package graft.mm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal-column handling: media as opaque `binary` payloads with
  * typed metadata, plus decode / feature-extraction / frame-sampling
  * plumbing (BASELINE north star).
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * deterministic fake (byte-level statistics standing in for pixels —
  * clearly marked below); everything Spark-side is real and tested:
  * the binary column, the metadata schema, pushdown-friendly
  * byte-slicing expressions, and the partition-batched feature
  * extractor. The payload is the document text's bytes, which keeps
  * every derived value reproducible in the DuckDB oracle (the fixture
  * ships no real media column).
  *
  * Scale: metadata and frame sampling are scan-side expressions (no
  * shuffle); feature extraction is mapPartitions — one JVM-side batch
  * loop per partition, the same batch shape a vectorized decode UDF
  * would use, and the natural place a real codec would slot in.
  */
object MultimodalOps {

  /** The documents table with an opaque binary payload + metadata
    * struct — the storage schema a media corpus would use.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        col("source").as("origin"),
        col("lang").as("tag"),
        col("n_chars").cast("long").as("declared_size")).as("meta"))

  /** Payload metadata scan: sizes, header bytes, declared-vs-actual
    * consistency — the validation pass run before any decode.
    */
  def mmMetadata(s: SparkSession, dir: String): DataFrame =
    withPayload(Tables.documents(s, dir)).select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      lower(hex(substring(col("payload"), 1, 4))).as("header_hex"),
      col("meta.origin").as("origin"),
      (length(col("payload")) === col("meta.declared_size")).as("size_ok"))

  /** Frame sampling: 4 evenly spaced 32-byte "frames" per payload,
    * fingerprinted — the video-keyframe access pattern. Byte offsets
    * are exact: payloads are ASCII, so the oracle's substr-on-text
    * slices the same bytes.
    */
  private val NFrames = 4
  private val FrameLen = 32

  def mmFrameSample(s: SparkSession, dir: String): DataFrame = {
    val n = length(col("payload"))
    val frames = (0 until NFrames).map { i =>
      val pos = lit(1) + ((n - FrameLen) * i / (NFrames - 1))
      struct(lit(i).as("frame_idx"),
        md5(substring(col("payload"), pos, lit(FrameLen))).as("frame_md5"))
    }
    withPayload(Tables.documents(s, dir))
      .filter(length(col("payload")) >= FrameLen)
      .select(col("doc_id"), explode(array(frames: _*)).as("f"))
      .select(col("doc_id"), col("f.frame_idx").as("frame_idx"),
        col("f.frame_md5").as("frame_md5"))
  }

  /** Feature extraction over payload batches via mapPartitions.
    *
    * STUB DECODE: a real pipeline would decode the codec here
    * (libjpeg/ffmpeg — absent in this container). The deterministic
    * stand-in computes byte statistics and a 16-bin byte histogram
    * "embedding" — same signature, schema, and batch shape as a real
    * decoder, so swapping one in touches only the marked lines.
    * No SQL oracle (the fake-decode loop is JVM code, not SQL);
    * MultimodalSpec pins the values.
    */
  def mmFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withPayload(Tables.documents(s, dir))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (docId, bytes) =>
          // -- begin fake decode (replace with real codec) --
          val n = bytes.length.max(1)
          val mean = bytes.map(b => (b & 0xff).toLong).sum.toDouble / n
          val hist = new Array[Long](16)
          bytes.foreach(b => hist((b & 0xff) >> 4) += 1)
          val embedding = hist.map(c => c.toFloat / n)
          // -- end fake decode --
          (docId, bytes.length.toLong, math.round(mean * 1e6) / 1e6, embedding)
        }
      }
      .toDF("doc_id", "n_bytes", "mean_byte", "embedding")
  }

  val all: Seq[Q] = Seq(
    Q("mm_metadata",
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  lower(hex(encode(substr(text, 1, 4)))) AS header_hex,
        |  source AS origin,
        |  octet_length(encode(text)) = n_chars AS size_ok
        |FROM documents""".stripMargin)(mmMetadata),
    Q("mm_frame_sample",
      s"""SELECT doc_id, frame_idx,
         |  md5(substr(text, 1 + CAST(floor((length(text) - $FrameLen) * frame_idx / ${NFrames - 1}) AS INT), $FrameLen)) AS frame_md5
         |FROM documents, (SELECT unnest(range(0, $NFrames)) AS frame_idx)
         |WHERE length(text) >= $FrameLen""".stripMargin)(mmFrameSample),
    Q.noOracle("mm_features")(mmFeatures),
  )
}
