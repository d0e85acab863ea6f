package graft.mm

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video as opaque `binary`
  * payloads with typed metadata, processed per-partition in batches.
  *
  * The decode step ([[decode]]) reads REAL formats where a dependency-free
  * parser can: PNG (8-bit gray/RGB/RGBA, zlib inflate + all five scanline
  * filters), baseline JPEG (T.81 sequential DCT — Huffman entropy decode,
  * integer IDCT, chroma subsampling, restart markers), BMP (24-bit) and
  * PPM (P6/P3) payloads yield actual dimensions and pixel statistics
  * ([[ImageCodecs]], fixture images under data/fixtures); AVI video
  * payloads yield actual geometry, frame counts and per-frame pixel
  * statistics ([[VideoCodecs]] — uncompressed BGR24 or Motion-JPEG
  * frames through the same JPEG decoder). Compressed inter-frame codecs
  * (H.264 etc.) remain out of dependency-free scope and fall back to the
  * clearly-marked deterministic stub ([[fakeDecode]]), which also
  * replays non-media payloads; everything around the seam — schema
  * contract, batch iteration, partition sizing, output shape — is the
  * real Spark plumbing a decode stage needs, and is what the tests cover.
  *
  * Scale notes: media processing is CPU-bound per row and must never
  * shuffle payloads. [[decodeFeatures]] is a mapPartitions over the scan —
  * zero shuffles; repartition by file/byte-range BEFORE this stage if the
  * source skews. Metadata-only queries (octet lengths, magic bytes) stay
  * pure-column and never deserialize payloads into the JVM heap beyond the
  * scan batch.
  */
object Multimodal {

  /** Canonical schema of a multimodal asset table. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("n_bytes", LongType))))))

  /** Column-only metadata extraction — no decode, codegen-friendly:
    * payload size, leading byte ("magic"), and a cheap checksum. */
  def payloadMeta(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"),
      col("media_type"),
      length(col("payload")).cast("long").as("n_bytes"),
      // first RAW byte as unsigned int — going through a string cast would
      // UTF-8-decode and collapse any non-ASCII lead byte (0xFF JPEG,
      // 0x89 PNG, …) to U+FFFD, breaking format sniffing
      conv(hex(substring(col("payload"), 1, 1)), 16, 10).cast("int").as("magic_byte"),
      crc32(col("payload")).as("payload_crc"))

  /** Decoded feature record produced per asset. In a real deployment
    * `width/height/n_frames` come from the codec; here they are a
    * DETERMINISTIC FAKE derived from payload bytes (stub decode), so the
    * pipeline is testable end-to-end without media libraries. */
  case class AssetFeatures(asset_id: Long, media_type: String,
                           width: Int, height: Int, n_frames: Int,
                           feature_norm: Double)

  /** Decode one asset: REAL formats first — PNG/JPEG/BMP/PPM parse to
    * actual dimensions and Rec.709 mean luminance from actual pixels
    * ([[ImageCodecs]]); AVI parses to actual geometry, REAL frame count
    * and mean luminance over every frame ([[VideoCodecs]] — BGR24 `DIB `
    * rasters or Motion-JPEG frames through the same JPEG decoder) — then
    * the deterministic byte-fold stub ([[fakeDecode]]) for everything
    * else (text-backed synthetic assets, formats whose codecs aren't in
    * this environment). The strict header validation in both codec
    * objects is what makes the sniff safe on arbitrary payloads. */
  def decode(id: Long, mediaType: String, payload: Array[Byte]): AssetFeatures =
    ImageCodecs.decode(payload) match {
      case Some(img) =>
        AssetFeatures(id, mediaType, img.width, img.height,
          n_frames = 1, feature_norm = img.meanLuma)
      case None => VideoCodecs.decode(payload) match {
        case Some(v) =>
          AssetFeatures(id, mediaType, v.width, v.height,
            n_frames = v.nFrames, feature_norm = v.meanLuma)
        case None => fakeDecode(id, mediaType, payload)
      }
    }

  /** STUB DECODER — stands in for what no dependency-free parser covers
    * (video decode + resize + embed) and replays non-media payloads
    * deterministically. [[decode]] routes real PNG/JPEG/BMP/PPM payloads
    * to [[ImageCodecs]] instead. Replace with a codec bridge (JNI/FFI or
    * vectorized Python via Arrow) in production; the signature (bytes →
    * features) and the batching around it are the contract. */
  def fakeDecode(id: Long, mediaType: String, payload: Array[Byte]): AssetFeatures = {
    val n = payload.length
    val sum = payload.foldLeft(0L)((a, b) => a + (b & 0xff))
    AssetFeatures(
      asset_id = id,
      media_type = mediaType,
      width = (sum % 640).toInt + 1,
      height = (n % 480) + 1,
      n_frames = if (mediaType == "video") (n % 24) + 1 else 1,
      feature_norm = (sum % 1000) / 1000.0)
  }

  /** Batched per-partition decode: the mapPartitions keeps the iterator
    * lazy (no partition-wide materialization) — constant memory per task
    * regardless of partition row count. */
  def decodeFeatures(assets: DataFrame): Dataset[AssetFeatures] = {
    implicit val enc = Encoders.product[AssetFeatures]
    assets.select("asset_id", "media_type", "payload")
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          decode(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2))
        }
      }
  }

  /** Resize planning: target dimensions that fit an asset into a
    * `maxDim`-square preserving aspect ratio (floor semantics, min 1px;
    * assets already inside the box keep their dims). A pure integer-math
    * projection — the real resample happens in the decode stage; THIS is
    * what the pipeline plans/partitions by, so it stays codegen-friendly
    * and oracle-checkable. */
  def resizePlan(w: Column, h: Column, maxDim: Int): Column = {
    val m = greatest(w, h)
    def fit(side: Column) =
      when(m <= maxDim, side)
        .otherwise(greatest(floor(side * maxDim / m).cast("int"), lit(1)))
    struct(fit(w).as("new_width"), fit(h).as("new_height"))
  }

  /** Frame sampling plumbing: one row per sampled frame index (every
    * `stride`-th frame of each decoded asset, first frame always). The
    * downstream contract of a video pipeline — (asset, frame_idx) rows that
    * a decode stage fills with pixels — expressed as a pure generator, so
    * the fan-out happens engine-side and partitions freely. */
  def sampleFrames(features: Dataset[AssetFeatures], stride: Int): DataFrame = {
    require(stride > 0)
    // zero-frame assets (corrupt/empty media) emit no rows: a null array
    // is dropped by explode, where sequence(0, -1) would throw
    features.toDF().select(
      col("asset_id"), col("media_type"), col("n_frames"),
      explode(when(col("n_frames") > 0,
        sequence(lit(0), col("n_frames") - 1, lit(stride)))).as("frame_idx"))
  }

  /** One analysis window of a decoded PCM16 asset: integer-exact energy
    * (sum of squared samples) per fixed-size window — the row shape
    * silence-trimming / voice-activity stages threshold and join on. */
  case class AudioWindow(asset_id: Long, sample_rate: Int, channels: Int,
                         n_samples: Long, window_idx: Long, energy_sq: Long)

  /** Batched per-partition WAV decode → per-window energy rows. Payloads
    * that are not well-formed PCM16 WAV are dropped (strict
    * [[AudioCodecs.decodeWav]] validation); assets never shuffle — the
    * fan-out to windows happens AFTER decode inside the same task, and
    * only the fixed-width feature rows flow on. */
  def audioWindowEnergies(assets: DataFrame, windowSize: Int): Dataset[AudioWindow] = {
    require(windowSize > 0)
    implicit val enc = Encoders.product[AudioWindow]
    assets.select("asset_id", "payload")
      .mapPartitions { rows: Iterator[Row] =>
        rows.flatMap { r =>
          AudioCodecs.decodeWav(r.getAs[Array[Byte]](1)).iterator.flatMap { a =>
            a.windowEnergies(windowSize).iterator.zipWithIndex.map {
              case (e, w) => AudioWindow(r.getLong(0), a.sampleRate,
                a.channels, a.nSamples.toLong, w.toLong, e)
            }
          }
        }
      }
  }

  /** Energy-threshold voice-activity segments over per-window energy
    * rows ([[audioWindowEnergies]]' shape): a window is ACTIVE iff
    * `4·energy_sq ≥ peak(asset)` — a relative gate, scale-free and a
    * pure integer compare — and consecutive active windows merge
    * gaps-and-islands style (`window_idx − row_number`, the winnow-span
    * technique on the time axis). Silent assets (peak 0) emit nothing.
    * Output: (asset_id, seg_start, seg_end, n_windows, seg_energy_sq). */
  def vadSegments(windows: DataFrame): DataFrame = {
    val peak = windows.groupBy(col("asset_id"))
      .agg(max(col("energy_sq")).as("__peak"))
    val byAsset = org.apache.spark.sql.expressions.Window
      .partitionBy(col("asset_id")).orderBy(col("window_idx"))
    windows.join(peak, Seq("asset_id"))
      .filter(col("energy_sq") * 4 >= col("__peak") && col("__peak") > 0)
      .withColumn("__grp", col("window_idx") - row_number().over(byAsset))
      .groupBy(col("asset_id"), col("__grp"))
      .agg(min(col("window_idx")).as("seg_start"),
        max(col("window_idx")).as("seg_end"),
        count(lit(1)).as("n_windows"),
        sum(col("energy_sq")).as("seg_energy_sq"))
      .select(col("asset_id"), col("seg_start"), col("seg_end"),
        col("n_windows"), col("seg_energy_sq"))
  }

  /** Adapt the synthetic `documents` table into an asset table whose
    * payloads are REAL WAV containers (document bytes wrapped as mono
    * PCM16 via [[AudioCodecs.wrapPcm16]]) — deterministic in the text, so
    * an external oracle can replay every downstream feature from the same
    * bytes while the engine exercises the genuine RIFF walk. */
  def documentsAsWavAssets(docs: DataFrame): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    docs.select(col("doc_id"), col("text").cast("binary"))
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .map { r: Row =>
        (r.getLong(0), AudioCodecs.wrapPcm16(r.getAs[Array[Byte]](1)))
      }(enc)
      .toDF("asset_id", "payload")
      .select(col("asset_id"), lit("audio").as("media_type"), col("payload"),
        struct(lit("wav-synth").as("source"),
          length(col("payload")).cast("long").as("n_bytes")).as("meta"))
  }

  /** Adapt the synthetic `documents` table into a MIXED asset table:
    * every third document's bytes wrap into a REAL RGB8 PNG container
    * ([[ImageCodecs.wrapRgbPng]], media_type "image") and ride the
    * genuine chunk-walk + inflate + unfilter decode path; every
    * third-plus-one document wraps into a REAL uncompressed AVI
    * ([[VideoCodecs.wrapBgrAvi]], media_type "video") and rides the
    * genuine RIFF walk + per-frame BGR raster path; the rest stay text
    * payloads on the stub path. Deterministic in the text, so an
    * external oracle replays all three branches from the same source
    * bytes — the image/video twins of [[documentsAsWavAssets]]. */
  def documentsAsMixedAssets(docs: DataFrame): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.BINARY)
    docs.select(col("doc_id"), col("text").cast("binary"))
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .map { r: Row =>
        val (id, bytes) = (r.getLong(0), r.getAs[Array[Byte]](1))
        if (id % 3 == 0) (id, "image", ImageCodecs.wrapRgbPng(bytes))
        else if (id % 3 == 1) (id, "video", VideoCodecs.wrapBgrAvi(bytes))
        else (id, "text", bytes)
      }(enc)
      .toDF("asset_id", "media_type", "payload")
      .select(col("asset_id"), col("media_type"), col("payload"),
        struct(lit("mixed-synth").as("source"),
          length(col("payload")).cast("long").as("n_bytes")).as("meta"))
  }

  /** Adapt the synthetic `documents` table into an asset table (text bytes
    * as payload) — the test-harness source for the multimodal path. */
  def documentsAsAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      lit("text").as("media_type"),
      col("text").cast("binary").as("payload"),
      struct(col("source").as("source"),
        length(col("text")).cast("long").as("n_bytes")).as("meta"))
}
