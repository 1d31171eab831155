package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: opaque `BinaryType` payloads + typed metadata, with
  * decode/feature steps as batched per-partition transforms.
  *
  * The actual codec libraries are not available in this container, so the
  * decode kernel is STUBBED (deterministic fake — clearly marked below).
  * Everything around it is real Spark plumbing: schema, batching,
  * partition sizing, and the mapPartitions batch shape match what a JNI
  * or Python (mapInPandas/Arrow) decoder would plug into.
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
