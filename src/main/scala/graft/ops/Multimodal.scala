package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs batched over partitions.
  *
  * The container ships no media codecs, so [[FakeDecoder]] stands in
  * for the real decode step — it is DETERMINISTIC (byte-histogram
  * features), and everything around it (schema, binary slicing,
  * partition batching, feature vector shape) is real and tested: a
  * production deployment swaps `decoder` for one that calls an actual
  * codec, nothing else changes.
  *
  * Scale: media bytes never leave executors, all transforms are
  * per-row/per-partition (no shuffle); frame sampling is pure
  * expression work (binary substring), and feature extraction batches
  * rows per partition exactly like an inference step would.
  */
object Multimodal {

  val MediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("n_bytes", LongType),
    StructField("sha256", StringType)))

  /** Wrap a binary payload column with typed metadata. */
  def asMedia(payload: Column, kind: String): Column =
    struct(
      payload.as("bytes"),
      struct(lit(kind).as("kind"),
        length(payload).cast("long").as("n_bytes"),
        lower(sha2(payload, 256)).as("sha256")).as("meta"))

  /** Fixed-size frame sampling over a binary payload (expression-only:
    * binary substring, no decode). 1-based positions, last frame may
    * be short. */
  def sampleFrames(payload: Column, frameSize: Int): Column = {
    val n = length(payload)
    val frames = transform(
      sequence(lit(0), ceil(n.cast("double") / frameSize).cast("int") - 1),
      i => substring_index_bytes(payload, i, frameSize))
    // empty payload: sequence(0, -1) would step backwards to [0, -1]
    // and fabricate two frames; ceil(0/f) = 0 frames is the contract
    when(n > 0, frames)
      .when(n === 0, array().cast(ArrayType(BinaryType)))
  }

  private def substring_index_bytes(payload: Column, i: Column, frameSize: Int) =
    payload.substr(i * frameSize + 1, lit(frameSize))

  /** STUB of the real media decode: deterministic 16-dim byte
    * histogram (high-nibble buckets, L1-normalized). A real deployment
    * replaces this with an actual image/audio decoder; the signature
    * (bytes → float features) is the contract. */
  trait MediaDecoder extends Serializable {
    def features(bytes: Array[Byte]): Array[Float]
  }

  object FakeDecoder extends MediaDecoder {
    def features(bytes: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](16)
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xF0) >> 4) += 1f
        i += 1
      }
      if (bytes.length > 0) {
        var j = 0
        while (j < 16) { hist(j) /= bytes.length; j += 1 }
      }
      hist
    }
  }

  /** Batched feature extraction: (id, bytes) → (id, features),
    * decoder applied per partition (the inference batch shape). */
  def extractFeatures(df: DataFrame, idCol: String, bytesCol: String,
      decoder: MediaDecoder = FakeDecoder): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("features", ArrayType(FloatType))))
    val input = df.select(col(idCol).cast("long"), col(bytesCol))
    input.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        // a real corpus carries null payloads (failed fetches); the
        // decoder never sees them — null features, row preserved
        val bytes = r.getAs[Array[Byte]](1)
        Row(r.getLong(0),
          if (bytes == null) null else decoder.features(bytes).toSeq)
      }
    }(Encoders.row(schema))
  }
}
