package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus a decode/feature-extract stage.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked DETERMINISTIC STUB — what is real (and what matters on
  * a cluster) is the Spark-side plumbing: binary column schema, batch
  * shape (mapPartitions processes a partition's rows in one pass, the
  * Scala analogue of `mapInPandas` batches), output schema declared up
  * front, and per-partition parallelism with no driver involvement.
  */
object Multimodal {

  /** Typed media wrapper: payload + metadata, media type derived
    * deterministically from the id. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("source").as("origin"),
        col("n_chars").as("claimed_size")).as("meta"))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("payload_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("features", ArrayType(FloatType)),
    StructField("features_q", ArrayType(LongType))))

  /** STUB decoder: a real implementation would call an image/audio codec
    * here (`???` in spirit); this deterministic fake derives "decoded"
    * dimensions and a 4-dim feature vector from the bytes so tests have
    * stable expectations. Runs per-partition — the batch boundary where
    * a vectorized codec (or `mapInPandas` in PySpark) would sit.
    *
    * Alongside the float `features` it emits `features_q`: the same
    * signal computed purely in INTEGER space (`byte*10000 + nBytes`).
    * Downstream checks compare `features_q`, never the floats — float32
    * arithmetic is not bit-reproducible across engines, integers are
    * (same rule as llm/Similarity.scala's quantized dot products).
    *
    * Note the deliberate Tungsten exit: `.rdd.mapPartitions` leaves
    * whole-stage codegen for the codec batch boundary (the JVM analogue
    * of `mapInPandas`). That cost is confined to this one stage; callers
    * get a DataFrame with a declared schema back, so everything
    * downstream re-enters codegen. */
  def decodeAndFeaturize(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("doc_id", "media_type", "payload").rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val mt = r.getString(1)
          val payload = r.getAs[Array[Byte]](2)
          // --- stubbed decode: deterministic fake, NOT a real codec ---
          val n = payload.length
          val width = 64 + (n % 577)
          val height = 64 + ((n * 31) % 419)
          val channels = if (mt == "audio") 1 else 3
          val qs = Array.tabulate(4) { i =>
            val b = if (n > i) payload(i) & 0xff else 0
            b.toLong * 10000L + n
          }
          val features = qs.map(q => q.toFloat / 10000.0f)
          Row(id, mt, n.toLong, width, height, channels, features.toSeq,
            qs.toSeq)
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }
}
