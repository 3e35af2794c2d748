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

  /** Aspect-preserving resize SPEC: target-box output dimensions
    * computed from the decoded dims — the metadata half of a resize
    * (the pixel resample itself would sit in the mapPartitions codec
    * stage next to the decode stub). Pure per-row integer/double math,
    * scan-shaped. */
  def resizeSpec(decoded: DataFrame, target: Int = 224): DataFrame =
    decoded
      .withColumn("scale",
        least(lit(target.toDouble) / col("width"),
          lit(target.toDouble) / col("height")))
      .withColumn("out_width",
        floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height",
        floor(col("height") * col("scale")).cast("int"))
      .withColumn("is_upscale", col("scale") > 1.0)

  /** Frame SAMPLING plan for video/audio payloads: the payload is
    * treated as fixed-size frames and every `stride`-th frame index is
    * emitted as its own row with its byte offset and lead byte — the
    * row-shape a real frame extractor would feed to a batch decoder.
    * `sequence(0, n-1, stride)` + explode keeps it codegen'd (no
    * interpreted HOF in the hot path; the array is tiny and
    * immediately exploded).
    *
    * Empty payloads are filtered out BEFORE the explode: with n_frames=0
    * Spark's `sequence(0, -1, stride)` throws "Illegal sequence
    * boundaries" at runtime (DuckDB's generate_series would instead
    * return an empty list, silently dropping the row), so the explicit
    * filter keeps both engines on the same no-row semantics and keeps a
    * single empty document from killing the job.
    *
    * ASCII-ONLY ASSUMPTION (same caveat as the decode stub): the lead
    * byte is read via `substr` on the UTF-8-DECODED payload, which is
    * character-indexed — correct only while one char == one byte. A
    * byte-true version would slice the binary column directly, but the
    * DuckDB oracle has no portable blob-byte→int, so the char-indexed
    * form is the engine-portable contract and non-ASCII payloads are
    * out of scope for this stub stage. */
  def frameSample(media: DataFrame, frameBytes: Int = 16,
                  stride: Int = 3): DataFrame =
    media
      .withColumn("payload_bytes",
        octet_length(col("payload")).cast("long"))
      .filter(col("payload_bytes") > 0)
      .withColumn("n_frames",
        expr(s"(payload_bytes + ${frameBytes - 1}) div $frameBytes"))
      .withColumn("frame_idx",
        explode(expr(s"sequence(0L, n_frames - 1, $stride)")))
      .withColumn("frame_offset", col("frame_idx") * frameBytes)
      .withColumn("frame_lead_byte",
        ascii(decode(col("payload"), "UTF-8")
          .substr((col("frame_offset") + 1).cast("int"), lit(1))))
      .select("doc_id", "media_type", "payload_bytes", "n_frames",
        "frame_idx", "frame_offset", "frame_lead_byte")

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
