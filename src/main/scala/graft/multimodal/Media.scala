package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by per-partition batch
  * operators (the Scala analogue of `mapInPandas` — one expensive
  * "codec" init per partition, then iterator-streamed rows, constant
  * memory).
  *
  * The actual byte decoding is a clearly-marked STUB (no image/audio
  * codecs in this container): `fakeDecode` derives deterministic
  * pseudo-features from the byte content. Everything AROUND the stub —
  * schema contracts, partition-preserving iterator transform, batch
  * shape, metadata propagation — is the real production plumbing and
  * is tested.
  */
object Media {

  /** Canonical media table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),      // image | audio | video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("sample_rate", IntegerType), StructField("n_frames", IntegerType))))))

  /** STUB — stands in for a real codec (e.g. JPEG decode → CHW floats).
    * Deterministic FNV-1a-seeded pseudo-features so tests can assert
    * shape + determinism. Replace the body with a real decoder binding
    * to productionize; the call sites don't change. */
  def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      out(j) = ((h & 0xffffffL).toFloat / 0xffffffL.toFloat) * 2f - 1f
      j += 1
    }
    out
  }

  /** Per-partition batched decode: binary → feature vector. The codec
    * handle is created once per partition (the expensive-init pattern
    * that motivates mapPartitions over a per-row UDF), rows stream
    * through an iterator — no partition-wide materialization. */
  def decodeFeatures(df: DataFrame, dim: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields.filterNot(_.name == "bytes") :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = Encoders.row(outSchema)
    val bytesIdx = df.schema.fieldIndex("bytes")
    val keepIdx = df.schema.fields.zipWithIndex.collect {
      case (f, i) if f.name != "bytes" => i
    }
    df.mapPartitions { rows =>
      // [codec init would happen here, once per partition]
      rows.map { r =>
        val feats = fakeDecode(r.getAs[Array[Byte]](bytesIdx), dim)
        Row.fromSeq(keepIdx.map(r.get).toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** STUB resize: a real implementation re-encodes pixels; the stub
    * rewrites the metadata and passes bytes through — the schema/
    * metadata contract is what downstream operators depend on. */
  def resize(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("meta", struct(
      lit(w).as("width"), lit(h).as("height"),
      col("meta.sample_rate").as("sample_rate"),
      col("meta.n_frames").as("n_frames")))

  /** Frame sampling for video rows: every `stride`-th frame index up
    * to `meta.n_frames`, each decoded (stub) to a feature vector →
    * one row per sampled frame. Declarative explode — the shuffle-free
    * fan-out shape. */
  def sampleFrames(df: DataFrame, stride: Int, dim: Int = 16): DataFrame = {
    val frames = df
      .filter(col("kind") === "video" && col("meta.n_frames") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(stride))))
    val fdf = frames.select(col("media_id"), col("frame_idx"), col("bytes"))
    val enc = Encoders.row(StructType(Seq(
      StructField("media_id", LongType), StructField("frame_idx", IntegerType),
      StructField("frame_features", ArrayType(FloatType, containsNull = false)))))
    fdf.mapPartitions { rows =>
      rows.map { r =>
        val b = r.getAs[Array[Byte]](2)
        val idx = r.getInt(1)
        // stub: frame idx salts the decode so frames differ deterministically
        val salted = b :+ (idx & 0xff).toByte :+ ((idx >> 8) & 0xff).toByte
        Row(r.getLong(0), idx, fakeDecode(salted, dim).toSeq)
      }
    }(enc)
  }

  /** Deterministic synthetic media table (tests / demos). */
  def synthetic(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val bytes = Array.tabulate[Byte](64 + i % 32)(j => ((i * 31 + j) % 251).toByte)
      Row(i.toLong, kind, bytes, Row(64, 48, 16000, if (kind == "video") 12 else 0))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), mediaSchema)
  }
}
