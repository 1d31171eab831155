package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: opaque `BinaryType` payloads + typed metadata, with
  * decode/feature steps as batched per-partition transforms.
  *
  * Two decoders are REAL pure-JVM codecs: uncompressed 24-bpp BMP
  * (header walk + padded scanline traversal) and PCM16 WAV (RIFF chunk
  * walk). Compressed formats (JPEG/PNG/MP3) would need codec libraries
  * that are not in this container, so their kernel stays a clearly
  * marked deterministic fake; the plumbing (schema, batching, partition
  * shape) is identical for both, so a JNI or Arrow decoder slots in.
  */
object Multimodal {
  /** Typed metadata carried alongside every binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image/jpeg, audio/wav, ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Wrap a binary column with extracted metadata (header sniffing is a
    * cheap codegen-friendly expression — no decode needed). */
  def withMeta(df: DataFrame, bin: String): DataFrame = df.withColumn("meta", struct(
    when(substring(col(bin), 1, 3) === lit(Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte)), "image/jpeg")
      .when(substring(col(bin), 1, 4) === lit("PNG".getBytes("ISO-8859-1")), "image/png")
      .when(substring(col(bin), 1, 4) === lit("RIFF".getBytes("ISO-8859-1")), "audio/wav")
      .otherwise("application/octet-stream").as("media_type"),
    lit(null).cast(IntegerType).as("width"),   // filled by decode
    lit(null).cast(IntegerType).as("height"),
    octet_length(col(bin)).cast(LongType).as("n_bytes")))

  /** Feature-extraction output schema: id + fixed-size float vector. */
  def featureSchema(idField: StructField, dim: Int): StructType =
    StructType(Seq(idField, StructField("feature", ArrayType(FloatType, containsNull = false))))

  /** Decode one payload into a feature vector of `dim` floats.
    *
    * ??? STUB ???  — a real implementation calls the image/audio codec
    * here (JPEG decode → resize → channel means, or PCM frames → FFT
    * band energies). This deterministic fake hashes byte windows so the
    * pipeline (batching, schema, shuffles) is fully exercisable.
    */
  private def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (payload == null || payload.isEmpty) return out
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    val norm = math.max(1, payload.length / dim)
    var j = 0
    while (j < dim) { out(j) /= norm; j += 1 }
    out
  }

  /** Batched decode: one pass per partition, rows processed in batches of
    * `batchSize` — the same shape an Arrow/mapInPandas decoder uses, so a
    * real codec slots in without changing the plan. Input needs `idCol`
    * (long) + `binCol` (binary); output is (id, feature[dim]). */
  def decodeFeatures(df: DataFrame, idCol: String, binCol: String,
                     dim: Int = 64, batchSize: Int = 256): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val outSchema = featureSchema(StructField(idCol, LongType), dim)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary: a real decoder amortizes codec init over the batch
        batch.iterator.map { row =>
          val id = row.getLong(idIdx)
          val payload = row.getAs[Array[Byte]](binIdx)
          Row(id, decodeStub(payload, dim).toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }

  // ---- real pure-JVM decoders -------------------------------------------

  /** Decoded BMP: dimensions from the info header, mean over the actual
    * pixel bytes (scanline padding excluded). */
  final case class BmpInfo(width: Int, height: Int, bpp: Int, pixelMean: Double)

  /** Uncompressed 24-bpp BMP decoder: BITMAPFILEHEADER ("BM", pixel-data
    * offset at byte 10) + BITMAPINFOHEADER (width/height/bpp at 18/22/28,
    * all little-endian), rows padded to 4 bytes, bottom-up (negative
    * height = top-down). Returns None for anything it can't walk. */
  def decodeBmp(payload: Array[Byte]): Option[BmpInfo] = {
    if (payload == null || payload.length < 54 ||
      payload(0) != 'B' || payload(1) != 'M') return None
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val bpp = buf.getShort(28) & 0xFFFF
    val compression = buf.getInt(30)
    val height = math.abs(rawHeight)
    if (width <= 0 || height == 0 || bpp != 24 || compression != 0) return None
    val rowSize = (width * 3 + 3) / 4 * 4
    if (dataOffset.toLong + rowSize.toLong * height > payload.length) return None
    var sum = 0L
    var row = 0
    while (row < height) {
      var i = dataOffset + row * rowSize
      val end = i + width * 3 // pad bytes excluded
      while (i < end) { sum += payload(i) & 0xFF; i += 1 }
      row += 1
    }
    Some(BmpInfo(width, height, bpp, sum.toDouble / (width.toLong * height * 3)))
  }

  /** Decoded WAV: fmt-chunk fields + PCM16 sample stats. */
  final case class WavInfo(channels: Int, sampleRate: Int, bits: Int,
                           nSamples: Int, rms: Double, peak: Int)

  /** PCM16 WAV decoder: RIFF/WAVE signature then a real chunk walk —
    * "fmt " for channels/rate/bits, "data" for samples (chunks are
    * word-aligned). Returns None unless PCM (format tag 1) 16-bit. */
  def decodeWav(payload: Array[Byte]): Option[WavInfo] = {
    if (payload == null || payload.length < 44) return None
    def tag(at: Int) = new String(payload, at, 4, "ISO-8859-1")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var channels, rate, bits, fmtTag = 0
    var dataAt, dataLen = -1
    while (pos + 8 <= payload.length) {
      val id = tag(pos)
      val len = buf.getInt(pos + 4)
      if (len < 0 || pos + 8 + len > payload.length) return None
      id match {
        case "fmt " if len >= 16 =>
          fmtTag = buf.getShort(pos + 8) & 0xFFFF
          channels = buf.getShort(pos + 10) & 0xFFFF
          rate = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22) & 0xFFFF
        case "data" => dataAt = pos + 8; dataLen = len
        case _ =>
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (fmtTag != 1 || bits != 16 || channels <= 0 || dataAt < 0) return None
    val n = dataLen / 2
    var sumSq = 0.0
    var peak = 0
    var i = 0
    while (i < n) {
      val s = buf.getShort(dataAt + 2 * i).toInt
      sumSq += s.toDouble * s
      if (math.abs(s) > peak) peak = math.abs(s)
      i += 1
    }
    Some(WavInfo(channels, rate, bits, n,
      if (n == 0) 0.0 else math.sqrt(sumSq / n), peak))
  }

  /** Per-payload media stats via the REAL decoders: sniff the magic,
    * decode, emit one typed row per input. Unknown/undecodable payloads
    * keep media_type "application/octet-stream" with null stats. Same
    * batched mapPartitions shape as [[decodeFeatures]]. */
  def decodeMedia(df: DataFrame, idCol: String, binCol: String,
                  batchSize: Int = 256): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("media_type", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixel_mean", DoubleType),
      StructField("sample_rate", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("rms", DoubleType)))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val id = row.getLong(idIdx)
          val payload = row.getAs[Array[Byte]](binIdx)
          decodeBmp(payload) match {
            case Some(b) =>
              Row(id, "image/bmp", b.width, b.height, b.pixelMean, null, null, null)
            case None => decodeWav(payload) match {
              case Some(w) =>
                Row(id, "audio/wav", null, null, null, w.sampleRate, w.nSamples, w.rms)
              case None =>
                Row(id, "application/octet-stream", null, null, null, null, null, null)
            }
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  // ---- deterministic fixtures (for specs and the oracle gate) -----------

  /** Build a real bottom-up 24-bpp BMP whose pixel bytes cycle through
    * `codes` in scanline order (padding zeroed). */
  def synthBmp(codes: Array[Int], width: Int, height: Int): Array[Byte] = {
    val rowSize = (width * 3 + 3) / 4 * 4
    val dataSize = rowSize * height
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var k = 0
    var row = 0
    while (row < height) {
      var x = 0
      while (x < width * 3) {
        buf.put((codes(k % codes.length) & 0xFF).toByte)
        k += 1; x += 1
      }
      var pad = rowSize - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      row += 1
    }
    buf.array()
  }

  /** Build a real mono PCM16 WAV with `n` samples cycling through
    * `codes` as (code - 128) * 128. */
  def synthWav(codes: Array[Int], sampleRate: Int, n: Int): Array[Byte] = {
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("ISO-8859-1")).putInt(36 + dataLen)
      .put("WAVE".getBytes("ISO-8859-1"))
    buf.put("fmt ".getBytes("ISO-8859-1")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
    buf.put("data".getBytes("ISO-8859-1")).putInt(dataLen)
    var i = 0
    while (i < n) {
      buf.putShort((((codes(i % codes.length) & 0xFF) - 128) * 128).toShort)
      i += 1
    }
    buf.array()
  }

  /** Frame-sampling plumbing for video-like payloads: split a binary blob
    * into fixed-size frame windows (offsets are real; decode is the stub). */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   frameBytes: Int, everyNth: Int): DataFrame =
    df.select(col(idCol), posexplode(split_binary_frames(col(binCol), frameBytes, everyNth)))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")

  /** Expression-level frame splitter: substr windows over the blob. */
  private def split_binary_frames(bin: org.apache.spark.sql.Column,
                                  frameBytes: Int, everyNth: Int) = {
    val nFrames = floor(octet_length(bin) / (frameBytes.toLong * everyNth)).cast("int")
    transform(sequence(lit(0), greatest(nFrames - 1, lit(0))),
      i => substring(bin, (i * frameBytes * everyNth + 1).cast("int"), lit(frameBytes)))
  }
}
