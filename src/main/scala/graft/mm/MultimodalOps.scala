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

  /** STUB DECODE: a real pipeline would decode the codec here
    * (libjpeg/ffmpeg — absent in this container). The deterministic
    * stand-in computes integer byte statistics — byte count, byte
    * sum, 16-bin high-nibble histogram — same signature and batch
    * shape as a real decoder, so swapping one in touches only this
    * function.
    */
  private def decodeStats(bytes: Array[Byte]): (Long, Long, Array[Long]) = {
    // -- begin fake decode (replace with real codec) --
    var sum = 0L
    val hist = new Array[Long](16)
    bytes.foreach { b =>
      sum += (b & 0xff).toLong
      hist((b & 0xff) >> 4) += 1
    }
    (bytes.length.toLong, sum, hist)
    // -- end fake decode --
  }

  /** Feature extraction over payload batches via mapPartitions — the
    * typed API: float-vector embedding (16-bin byte histogram,
    * normalized), the shape a downstream ANN/near-dup stage consumes.
    * MultimodalSpec pins the values; [[mmFeaturesFlat]] is the
    * registry/oracle face of the same decode.
    */
  def mmFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withPayload(Tables.documents(s, dir))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (docId, bytes) =>
          val (len, sum, hist) = decodeStats(bytes)
          val n = len.max(1L)
          val mean = sum.toDouble / n
          val embedding = hist.map(c => c.toFloat / n)
          (docId, len, math.round(mean * 1e6) / 1e6, embedding)
        }
      }
      .toDF("doc_id", "n_bytes", "mean_byte", "embedding")
  }

  /** The driver-facing shape of [[mmFeatures]]: the mapPartitions
    * decode emits integer-exact stats, and every derived double is a
    * single rounded division computed in Spark SQL — so each value is
    * one IEEE op on identical integers in both engines, and the
    * output is flat scalar columns the correctness dump can sort
    * (an array<float> column is unsortable by the pandas differ).
    */
  def mmFeaturesFlat(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stats = withPayload(Tables.documents(s, dir))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (docId, bytes) =>
        val (len, sum, hist) = decodeStats(bytes)
        (docId, len, sum, hist)
      })
      .toDF("doc_id", "n_bytes", "byte_sum", "hist")
    val n = greatest(col("n_bytes"), lit(1)).cast("double")
    val bins = (0 until 16).map(i =>
      round(element_at(col("hist"), i + 1) / n, 6).as(f"f$i%02d"))
    stats.select(col("doc_id") +: col("n_bytes") +:
      round(col("byte_sum") / n, 6).as("mean_byte") +: bins: _*)
  }

  /** Nearest-neighbor "resize": keep every [[ResizeStride]]-th byte —
    * the downsampling plumbing (image thumbnail / audio decimation)
    * the prompt-side decode would feed. Real resizes interpolate
    * inside the codec; the Spark-side contract (binary in, smaller
    * binary out, fingerprint + sizes) is what this pins. Map-only.
    */
  private val ResizeStride = 4

  def mmResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withPayload(Tables.documents(s, dir))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (docId, bytes) =>
        // -- begin fake resize (replace with real interpolation) --
        val small = Iterator.range(0, bytes.length, ResizeStride)
          .map(bytes).toArray
        // -- end fake resize --
        (docId, bytes.length.toLong, small.length.toLong, small)
      })
      .toDF("doc_id", "n_bytes", "n_resized", "resized")
      .select(col("doc_id"), col("n_bytes"), col("n_resized"),
        md5(col("resized")).as("resized_md5"))
  }

  /** Waveform statistics over the payload interpreted as unsigned
    * 8-bit PCM (centered at 128): RMS energy, peak amplitude, and
    * silence ratio — the audio-side triage pass (clipped, silent, or
    * dead channels are dropped before transcription). The batch loop
    * emits exact integer sums; every double is one rounded IEEE op
    * on identical integers in both engines.
    */
  private val SilenceAmp = 8

  def mmWaveform(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stats = withPayload(Tables.documents(s, dir))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (docId, bytes) =>
        // -- begin fake decode (a real one would parse WAV/FLAC) --
        var sumsq = 0L
        var peak = 0L
        var silent = 0L
        bytes.foreach { b =>
          val amp = ((b & 0xff) - 128).toLong
          sumsq += amp * amp
          if (math.abs(amp) > peak) peak = math.abs(amp)
          if (math.abs(amp) < SilenceAmp) silent += 1
        }
        // -- end fake decode --
        (docId, bytes.length.toLong, sumsq, peak, silent)
      })
      .toDF("doc_id", "n_samples", "sumsq", "peak", "n_silent")
    val n = greatest(col("n_samples"), lit(1)).cast("double")
    stats.select(col("doc_id"), col("n_samples"),
      round(sqrt(col("sumsq") / n), 6).as("rms"),
      col("peak"),
      round(col("n_silent") / n, 6).as("silence_ratio"))
  }

  /** ViT-style patch extraction: the payload is interpreted as a
    * row-major [[PatchImgW]]-bytes-wide "image" and tiled into
    * [[PatchSize]]×[[PatchSize]] patches (full patches only — the
    * ragged edge is the codec's problem, as in a real vision
    * preprocessor that center-crops first). Per patch: grid
    * coordinates, mean "pixel", and an md5 fingerprint of the patch
    * bytes in row-major order — exactly the (batch, grid_h, grid_w,
    * patch_dim) tensor layout a vision tower consumes, flattened to
    * rows. The strided gather is the real access pattern; only the
    * pixel decode is the documented fake. Map-only (a generator per
    * payload, no shuffle); the patch loop is the same partition-batch
    * shape as [[mmFeaturesFlat]].
    */
  private val PatchImgW = 16
  private val PatchSize = 8

  def mmPatches(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withPayload(Tables.documents(s, dir))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (docId, bytes) =>
        // -- begin fake decode (real code would decode pixels here) --
        val rows = bytes.length / PatchImgW // full image rows only
        val gridH = rows / PatchSize
        val gridW = PatchImgW / PatchSize
        for {
          pr <- 0 until gridH
          pc <- 0 until gridW
        } yield {
          val patch = Array.tabulate(PatchSize * PatchSize) { k =>
            val r = k / PatchSize
            val c = k % PatchSize
            bytes((pr * PatchSize + r) * PatchImgW + pc * PatchSize + c)
          }
          val mean = patch.map(_ & 0xff).sum.toDouble / patch.length
          (docId, pr.toLong, pc.toLong,
            math.rint(mean * 1e6) / 1e6, patch)
        }
        // -- end fake decode --
      }
      .toDF("doc_id", "patch_row", "patch_col", "mean_px", "patch")
      .select(col("doc_id"), col("patch_row"), col("patch_col"),
        col("mean_px"), md5(col("patch")).as("patch_md5"))
  }

  private val patchesOracle = {
    // one image row of the patch: PatchSize chars starting at the
    // row-major offset; the patch string is the concat of PatchSize
    // such rows (ASCII fixture ⇒ substr slices bytes)
    val rowExprs = (0 until PatchSize).map { r =>
      s"substr(text, (pr * $PatchSize + $r) * $PatchImgW + pc * $PatchSize + 1, $PatchSize)"
    }
    val patchStr = rowExprs.mkString(" || ")
    s"""WITH g AS (
       |  SELECT doc_id, text,
       |    CAST(FLOOR(length(text) / ($PatchImgW * $PatchSize.0)) AS BIGINT)
       |      AS grid_h
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, text, pr, pc FROM g,
       |    unnest(range(0, grid_h)) AS u(pr),
       |    unnest(range(0, ${PatchImgW / PatchSize})) AS w(pc)),
       |s AS (
       |  SELECT doc_id, pr AS patch_row, pc AS patch_col,
       |    $patchStr AS patch
       |  FROM p)
       |SELECT doc_id, patch_row, patch_col,
       |  round(list_sum(list_transform(range(1, ${PatchSize * PatchSize} + 1),
       |    i -> ascii(substr(patch, CAST(i AS INT), 1))))
       |    / ${PatchSize * PatchSize}.0, 6) AS mean_px,
       |  md5(patch) AS patch_md5
       |FROM s""".stripMargin
  }

  /** Voice-activity segmentation: maximal runs of non-silent samples
    * (|amp| ≥ [[SilenceAmp]], the [[mmWaveform]] PCM convention) of at
    * least [[MinSegLen]] samples, indexed in time order — the
    * pre-transcription pass that turns raw audio into utterance
    * segments (and the classic gaps-and-islands shape, here as one
    * linear generator per payload instead of the window-chain a SQL
    * engine needs). Map-only flatMap; segment counts are
    * payload-bounded.
    */
  private val MinSegLen = 4

  def mmVadSegments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withPayload(Tables.documents(s, dir))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (docId, bytes) =>
        // -- begin fake decode (real code would run a VAD model) --
        val segs = Vector.newBuilder[(Long, Long)] // (start, len)
        var start = -1
        var i = 0
        while (i <= bytes.length) {
          val voiced = i < bytes.length &&
            math.abs(((bytes(i) & 0xff) - 128)) >= SilenceAmp
          if (voiced && start < 0) start = i
          if (!voiced && start >= 0) {
            if (i - start >= MinSegLen) segs += ((start.toLong, (i - start).toLong))
            start = -1
          }
          i += 1
        }
        // -- end fake decode --
        segs.result().zipWithIndex.map { case ((st, len), idx) =>
          (docId, idx + 1L, st, len)
        }
      }
      .toDF("doc_id", "seg_idx", "seg_start", "seg_len")
  }

  private val vadOracle =
    s"""WITH b AS (
       |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos
       |  FROM documents, unnest(range(1, length(text) + 1)) AS u(i)
       |  WHERE abs(ascii(substr(text, CAST(i AS INT), 1)) - 128) >= $SilenceAmp),
       |v AS (
       |  SELECT doc_id, pos,
       |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM b),
       |seg AS (
       |  SELECT doc_id, MIN(pos) AS seg_start, COUNT(*) AS seg_len
       |  FROM v GROUP BY doc_id, grp),
       |k AS (SELECT * FROM seg WHERE seg_len >= $MinSegLen)
       |SELECT doc_id,
       |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY seg_start)
       |    AS BIGINT) AS seg_idx,
       |  seg_start, CAST(seg_len AS BIGINT) AS seg_len
       |FROM k""".stripMargin

  val all: Seq[Q] = Seq(
    Q("mm_patches", patchesOracle)(mmPatches),
    Q("mm_vad_segments", vadOracle)(mmVadSegments),
    Q("mm_resize",
      s"""SELECT doc_id, length(text) AS n_bytes,
         |  CAST(ceil(length(text) / $ResizeStride.0) AS BIGINT) AS n_resized,
         |  md5(array_to_string(list_transform(
         |    range(1, length(text) + 1, $ResizeStride),
         |    i -> substr(text, i, 1)), '')) AS resized_md5
         |FROM documents""".stripMargin)(mmResize),
    Q("mm_waveform",
      s"""WITH b AS (
         |  SELECT doc_id, length(text) AS n_samples,
         |    list_transform(range(1, length(text) + 1),
         |      i -> ascii(substr(text, i, 1)) - 128) AS amps
         |  FROM documents)
         |SELECT doc_id, n_samples,
         |  round(sqrt(CAST(coalesce(list_sum(list_transform(amps, x -> x * x)), 0)
         |      AS BIGINT)
         |    / CAST(greatest(n_samples, 1) AS DOUBLE)), 6) AS rms,
         |  CAST(coalesce(list_max(list_transform(amps, x -> abs(x))), 0)
         |    AS BIGINT) AS peak,
         |  round(CAST(len(list_filter(amps, x -> abs(x) < $SilenceAmp)) AS BIGINT)
         |    / CAST(greatest(n_samples, 1) AS DOUBLE), 6) AS silence_ratio
         |FROM b""".stripMargin)(mmWaveform),
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
    Q("mm_features", {
      // ASCII fixture text ⇒ ascii(char) == byte value; high-nibble
      // histogram via x // 16 (bins 8–15 are provably 0 for ASCII but
      // kept: the contract is 16 bins regardless of payload).
      val binCols = (0 until 16).map(i =>
        f"round(len(list_filter(bytes, x -> x // 16 = $i)) / CAST(greatest(n_bytes, 1) AS DOUBLE), 6) AS f$i%02d")
      s"""WITH b AS (
         |  SELECT doc_id, length(text) AS n_bytes,
         |    list_transform(range(1, length(text) + 1),
         |      i -> ascii(substr(text, i, 1))) AS bytes
         |  FROM documents)
         |SELECT doc_id, n_bytes,
         |  round(list_sum(bytes) / CAST(greatest(n_bytes, 1) AS DOUBLE), 6) AS mean_byte,
         |  ${binCols.mkString(",\n  ")}
         |FROM b""".stripMargin
    })(mmFeaturesFlat),
  )
}
