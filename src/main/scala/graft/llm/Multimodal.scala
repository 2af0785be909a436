package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The actual codec work (JPEG decode, audio resample, …) is STUBBED —
  * the container has no media libraries — behind [[FakeCodec]], a
  * deterministic stand-in. Everything Spark-side is real: schemas, the
  * mapPartitions batch shape (mirroring an Arrow-batched `mapInPandas`
  * pipeline), partition sizing, and the metadata columns.
  *
  * Scale notes: media rows are large (MBs); the decode stage must run with
  * small `spark.sql.files.maxPartitionBytes` (or an explicit repartition on
  * row count) so a partition of binaries fits executor memory, and the
  * decode output (features) should be projected away from the raw bytes as
  * early as possible so downstream stages don't shuffle blobs.
  */
object Multimodal {

  case class MediaMeta(
      media_id: Long,
      media_type: String, // image | audio | video
      byte_len: Long,
      content_hash: String,
      width: Int, // stub-decoded
      height: Int,
      n_frames: Int)

  case class MediaFeature(media_id: Long, feature: Array[Double])

  /** Deterministic fake decoder — replace with a real codec. Derives
    * "decoded" properties purely from the bytes so tests are stable. */
  object FakeCodec {
    def dims(bytes: Array[Byte]): (Int, Int) = {
      val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
      val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
      (64 + b0 % 192, 64 + b1 % 192)
    }
    def frames(bytes: Array[Byte]): Int =
      1 + (bytes.length % 16)
    /** Stub "embedding": 8 moments of the byte distribution. */
    def feature(bytes: Array[Byte]): Array[Double] = {
      if (bytes.isEmpty) return Array.fill(8)(0.0)
      val out = new Array[Double](8)
      var i = 0
      while (i < bytes.length) {
        out(i % 8) += (bytes(i) & 0xff) / 255.0
        i += 1
      }
      out.map(v => math.round(v / bytes.length * 1e6) / 1e6)
    }
  }

  /** Pure-columnar metadata (no decode): byte length + content hash.
    * Oracle-verifiable (octet_length/md5 exist in DuckDB). */
  def binaryMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("byte_len", octet_length(col(binCol)))
      .withColumn("content_hash", md5(col(binCol)))

  /** Resize planning, fully columnar: per asset, the stub-decoded source
    * dimensions (the [[FakeCodec.dims]] byte math expressed as plan
    * columns — first two payload bytes via `hex`, portable to any
    * engine), the fit-inside-target scale factor (never upscaling), and
    * the output dimensions. The pixel work itself belongs to the codec
    * stage ([[decodeMeta]]'s bounded mapPartitions); planning resize
    * AHEAD of decode is what lets a pipeline budget decode output bytes
    * and drop no-op resizes (scale = 1) before paying any codec CPU.
    *
    * Rounding: out dims use half-up on positive doubles — identical to
    * DuckDB's half-away-from-zero there. Map-only single scan. */
  def resizePlan(df: DataFrame, idCol: String, binCol: String,
                 targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0, s"target=$targetW x $targetH")
    // missing bytes read as 0, matching FakeCodec.dims on short payloads
    def byteAt(i: Int): Column =
      when(octet_length(col(binCol)) > i,
        conv(substring(hex(col(binCol)), i * 2 + 1, 2), 16, 10).cast("int"))
        .otherwise(lit(0))
    val w = (lit(64) + byteAt(0) % 192).as("width")
    val h = (lit(64) + byteAt(1) % 192).as("height")
    df.select(col(idCol), w, h)
      .withColumn("scale",
        least(lit(1.0), lit(targetW.toDouble) / col("width").cast("double"),
          lit(targetH.toDouble) / col("height").cast("double")))
      .select(col(idCol), col("width"), col("height"),
        round(col("width").cast("double") * col("scale"), 0)
          .cast("int").as("out_w"),
        round(col("height").cast("double") * col("scale"), 0)
          .cast("int").as("out_h"),
        round(col("scale"), 6).as("scale"))
  }

  /** Fuzzy binary-asset fingerprint: SimHash over overlapping byte
    * shingles — the codec-free near-duplicate signature for media
    * payloads ([[binaryMeta]]'s content hash catches only EXACT copies;
    * re-muxed/retagged assets differ in a few bytes and need a
    * locality-sensitive signature; perceptual hashes need a decoder this
    * container doesn't ship — byte-shingle SimHash is the portable
    * stand-in with the same blocking/pairing machinery).
    *
    * Shingling runs on the BASE64 text of the payload (both engines
    * render RFC-4648 without line breaks): windows of `window` chars
    * every `stride` chars (defaults 8/4 = 6 bytes every 3 — byte-aligned
    * since 4 base64 chars = 3 bytes). The signature is the shared
    * [[graft.functions.SimHashUtil]] kernel, so
    * [[Dedup.simhashPairs]]' chunk blocking, density cap, and hamming
    * verification compose unchanged. Payloads shorter than one window
    * emit no signature.
    *
    * Map-only single scan (codegen'd scalar per row, no shuffle); the
    * pair stage inherits simhashPairs' bounded-join shape. At 100 TB the
    * signature (16 chars) replaces the blob in every downstream
    * exchange — run [[binaryMeta]]+exact dedup first, then this on the
    * survivors. */
  def binarySimhash(df: DataFrame, idCol: String, binCol: String,
                    window: Int = 8, stride: Int = 4): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"window=$window stride=$stride")
    // Spark's base64 emits RFC-2045 MIME chunking (CRLF every 76 chars);
    // strip it so the shingle stream matches the RFC-4648 text DuckDB
    // and most other engines render. Windowing is the codegen'd
    // CharWindows kernel — the transform/sequence/substr HOF chain ran
    // interpreted and cost ~10× (11.5 s → see SCALE.md) at bench scale.
    val b64 = translate(base64(col(binCol)), "\r\n", "")
    val shingles =
      graft.functions.CharWindows.charWindows(b64, window, stride)
    graft.core.Tables.spread(df)
      .filter(length(b64) >= window)
      .select(col(idCol),
        graft.functions.SimHashUtil.simhash64(shingles).as("simhash_bits"))
  }

  /** Decode stage: mapPartitions over (id, bytes) in fixed-size batches —
    * the Scala analogue of an Arrow-batched `mapInPandas` decode. The
    * batching bound (`batchSize`) is what keeps peak memory flat when rows
    * are megabytes. */
  def decodeMeta(spark: SparkSession, df: DataFrame, idCol: String,
                 binCol: String, mediaType: String,
                 batchSize: Int = 64): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            val (w, h) = FakeCodec.dims(bytes)
            MediaMeta(id, mediaType, bytes.length.toLong,
              md5Hex(bytes), w, h, FakeCodec.frames(bytes))
          }
        }
      }
  }

  /** Feature extraction stage (stub embedding per media row). */
  def extractFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                      binCol: String, batchSize: Int = 64): Dataset[MediaFeature] = {
    implicit val enc = Encoders.product[MediaFeature]
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            MediaFeature(id, FakeCodec.feature(bytes))
          }
        }
      }
  }

  /** Frame sampling: one output row per sampled frame index (every
    * `stride`-th frame of the stub-decoded frame count). Columnar —
    * the explode happens before any decode so Spark can pipeline it. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   stride: Int): DataFrame = {
    val nFrames = lit(1) + octet_length(col(binCol)) % 16
    df.select(col(idCol), col(binCol))
      .withColumn("frame_idx",
        explode(sequence(lit(0), nFrames - 1, lit(stride))))
      .select(col(idCol), col("frame_idx"))
  }

  private def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    d.map("%02x".format(_)).mkString
  }
}
