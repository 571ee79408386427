package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque bytes + typed metadata. In a real pipeline the
  * `media` column holds an encoded image/audio/video payload read from
  * parquet/tar shards; here it is derived deterministically from fixture
  * text so the Spark-side plumbing is fully exercised. */
case class MediaRecord(media_id: Long, media: Array[Byte], mime: String, n_bytes: Long)

/** Output of the (stubbed) decoder: per-object features. */
case class MediaFeatures(media_id: Long, width: Int, height: Int,
    n_frames: Int, feature: Array[Float])

/** Multimodal-column operators: treat image/audio/video as opaque `binary`
  * columns with typed metadata, and run decode / feature-extract /
  * frame-sample as partition-batched functions.
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * environment): `decodeStub` produces deterministic fake dimensions and
  * features from the bytes. Everything around it — binary schema, batch
  * iteration shape (`mapPartitions`, the Scala analog of `mapInPandas`
  * batches), partitioning, metadata projection — is real and tested.
  */
object Multimodal {

  /** Wrap a text column as a fake encoded media payload (UTF-8 bytes) with
    * metadata — stands in for reading image bytes from a shard. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(payloadCol).cast("binary").as("media"),
      lit("application/octet-stream").as("mime"),
      octet_length(col(payloadCol).cast("binary")).cast("long").as("n_bytes"))

  /** Metadata + content fingerprint without decoding: byte length, md5
    * content hash, 64-bit prefix hash. Pure projections — at 100 TB this
    * is a single scan with full column pruning. */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("mime"), col("n_bytes"),
      md5(col("media")).as("content_md5"),
      xxhash64(col("media")).as("content_hash64"))

  /** Fixed-size frame/chunk sampling of the payload: one row per
    * `chunkBytes`-sized slice, via sequence+transform+posexplode (codegen'd
    * HOFs, no UDF). The video-frame-sampling plumbing: at scale the explode
    * multiplies rows before any shuffle, so downstream aggs see
    * pre-pruned columns only. */
  def frameSample(media: DataFrame, chunkBytes: Int): DataFrame = {
    val nChunks = ceil(col("n_bytes").cast("double") / chunkBytes).cast("int")
    media
      .select(col("media_id"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => substring(col("media"), (i * chunkBytes + 1).cast("int"), lit(chunkBytes)))))
      .select(col("media_id"), col("pos").as("frame_id"),
        col("col").as("frame_bytes"),
        octet_length(col("col")).cast("long").as("frame_len"))
  }

  /** Scene-change detection over the frame stream: a frame opens a new
    * scene when ≥ `minDiffBytes` of its bytes differ from the previous
    * frame (the classic pixel/byte-delta cut detector; the first frame
    * always opens scene 1). Byte comparison runs on the hex rendering so
    * the DuckDB oracle replays it character-for-character; frames of
    * unequal length count the unmatched tail as differing. scene_id is a
    * per-media running sum of cut flags — every window here is
    * PARTITIONED BY media (frames per clip are bounded by clip length,
    * never corpus-scale), and the rollup is one keyed aggregate.
    *
    * Returns (media_id, scene_id, n_frames, first_frame, rep_md5) —
    * rep_md5 fingerprints each scene's opening frame. */
  def sceneDetect(media: DataFrame, chunkBytes: Int,
      minDiffBytes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byMedia = Window.partitionBy(col("media_id")).orderBy(col("frame_id"))
    val run = byMedia.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withPrev = frameSample(media, chunkBytes)
      .select(col("media_id"), col("frame_id"),
        hex(col("frame_bytes")).as("h"))
      .select(col("media_id"), col("frame_id"), col("h"),
        lag(col("h"), 1).over(byMedia).as("hp"))
    val nb = (greatest(length(col("h")), length(col("hp"))) / lit(2)).cast("int")
    val nDiff = size(filter(sequence(lit(0), nb - 1),
      i => !(col("h").substr(i * 2 + 1, lit(2)) <=>
        col("hp").substr(i * 2 + 1, lit(2)))))
    val flagged = withPrev.select(col("media_id"), col("frame_id"), col("h"),
      when(col("hp").isNull, lit(1L))
        .when(nDiff >= minDiffBytes, lit(1L)).otherwise(lit(0L)).as("chg"))
    flagged
      .select(col("media_id"), col("frame_id"), col("h"),
        sum(col("chg")).over(run).as("scene_id"))
      .groupBy(col("media_id"), col("scene_id"))
      .agg(count(lit(1)).as("n_frames"), min(col("frame_id")).as("first_frame"),
        min(struct(col("frame_id"), col("h"))).as("m"))
      .select(col("media_id"), col("scene_id"), col("n_frames"),
        col("first_frame").cast("long").as("first_frame"),
        md5(col("m.h")).as("rep_md5"))
  }

  /** Overlapping-window sampling of the payload — the audio shape
    * (window > hop ⇒ consecutive windows share bytes, e.g. STFT input
    * framing), where [[frameSample]] is the non-overlapping video shape.
    * One row per hop offset below n_bytes; the tail window may be short.
    * Same codegen'd HOF + posexplode plumbing, zero shuffles. */
  def windowSample(media: DataFrame, windowBytes: Int, hopBytes: Int): DataFrame = {
    require(hopBytes >= 1 && windowBytes >= hopBytes,
      "need windowBytes >= hopBytes >= 1")
    val nWins = ceil(col("n_bytes").cast("double") / hopBytes).cast("int")
    media
      .select(col("media_id"),
        posexplode(transform(sequence(lit(0), nWins - 1),
          i => substring(col("media"), (i * hopBytes + 1).cast("int"), lit(windowBytes)))))
      .select(col("media_id"), col("pos").as("win_id"),
        col("col").as("win_bytes"),
        octet_length(col("col")).cast("long").as("win_len"))
  }

  /** One resized media payload. */
  case class ResizedMedia(media_id: Long, resized: Array[Byte], n_bytes_out: Long)

  /** STUB resize, batch-shaped like [[decodeStub]]: keeps every
    * `stride`-th byte of the payload (a deterministic stand-in for an
    * image downsample kernel — swap the loop body for a real resampler;
    * the partition-batched iteration, binary schema, and size bookkeeping
    * are the production shape). */
  def resizeStub(spark: SparkSession, media: DataFrame, stride: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    require(stride >= 1, "stride >= 1")
    media.select(col("media_id"), col("media"), col("mime"), col("n_bytes"))
      .as[MediaRecord]
      .mapPartitions { batch =>
        batch.map { rec =>
          val out = rec.media.indices.by(stride).map(rec.media(_)).toArray
          ResizedMedia(rec.media_id, out, out.length.toLong)
        }
      }
  }

  /** STUB decoder, batch-shaped: iterates each partition once (the way a
    * vectorized `mapInPandas` decode batches Arrow record batches) and
    * emits deterministic fake dimensions/features derived from the bytes.
    * Replace the body marked STUB with a real codec call in production. */
  def decodeStub(spark: SparkSession, media: DataFrame, featureDim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("media"), col("mime"), col("n_bytes"))
      .as[MediaRecord]
      .mapPartitions { batch =>
        batch.map { rec =>
          // STUB: a real implementation decodes rec.media with a codec and
          // measures true dimensions; this derives them from byte content
          // deterministically so tests are stable.
          val n = rec.media.length
          val w = 16 + (n % 64)
          val h = 16 + ((n / 64) % 64)
          val frames = 1 + (n % 4)
          val feat = Array.tabulate(featureDim) { i =>
            val b = if (n == 0) 0 else rec.media(i % n) & 0xff
            (b.toFloat + i) / 255f
          }
          MediaFeatures(rec.media_id, w, h, frames, feat)
        }
      }
  }

  /** ViT-style 2D patch extraction: interpret the payload as a row-major
    * `width`-byte-wide pixel grid and cut it into `patch`×`patch` tiles,
    * one output row per complete tile with its (patch-row, patch-col)
    * grid position — the tokenization step of a vision transformer,
    * where [[frameSample]] is the 1-D video analog.
    *
    * Each tile's bytes are gathered by `patch` fixed substrings (one per
    * pixel row) concatenated — a static codegen'd expression tree, no
    * UDF. Incomplete trailing rows/tiles are dropped (the crop-to-grid
    * convention). Per-row HOF + posexplode: zero shuffles at any corpus
    * size, and the explode multiplies rows only after column pruning. */
  /** WebDataset-style shard manifest: media objects are laid out in
    * `media_id` order and cut into shards of `shardBytes`; each object is
    * assigned the shard where its FIRST byte lands, plus its offset in it
    * — the write plan for tar/parquet shard emission. The global running
    * byte count is the two-level distributed prefix sum
    * ([[graft.ops.TwoLevelRank.prefixSum]]: intra-bucket windows in
    * parallel, one tiny bucket-totals window, broadcast rejoin) — never a
    * corpus-wide single-task `Window.orderBy`. */
  def shardManifest(media: DataFrame, shardBytes: Long,
      bucketSize: Int = 64): DataFrame = {
    val base = media.select(
      col("media_id"),
      col("n_bytes").cast("long").as("n_bytes"))
    graft.ops.TwoLevelRank.prefixSum(base, Nil, Nil,
        (col("media_id") / bucketSize).cast("long"), Seq("media_id"),
        col("n_bytes"), "__before", broadcastPrefix = true)
      .select(
        col("media_id"), col("n_bytes"),
        (col("__before") / shardBytes).cast("long").as("shard_id"),
        (col("__before") % shardBytes).as("shard_offset"))
  }

  def patchSample(media: DataFrame, width: Int, patch: Int): DataFrame = {
    require(width >= patch && patch >= 1 && width % patch == 0,
      "need width % patch == 0, patch >= 1")
    val cols = width / patch
    // complete patch-rows: each consumes `patch` full pixel rows of `width` bytes
    val pRows = (col("n_bytes") / (width.toLong * patch)).cast("int")
    val nPatches = pRows * cols
    val tile = (pi: Column) => {
      val pr = (pi / cols).cast("int")
      val pc = (pi % cols).cast("int")
      (0 until patch)
        .map(r => substring(col("media"),
          ((pr * patch + r) * width + pc * patch + 1).cast("int"), lit(patch)))
        .reduce(concat(_, _))
    }
    media
      .select(col("media_id"), col("n_bytes"),
        posexplode(when(nPatches >= 1,
            transform(sequence(lit(0), nPatches - 1), tile))
          .otherwise(array().cast("array<binary>"))))
      .select(col("media_id"),
        (col("pos") / cols).cast("long").as("patch_row"),
        (col("pos") % cols).cast("long").as("patch_col"),
        col("col").as("patch_bytes"))
  }
}
