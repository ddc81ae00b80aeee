package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.2 north-star set).
  *
  * Media (image/audio/video frames) travel as opaque `binary` columns
  * with a typed metadata struct alongside — exactly how the reference
  * moves JPEG frames through Kafka (`frame_data` bytes + width/height/
  * fps — /root/reference producer/video_producer.py:116-124). The
  * decode/feature-extract stage is a batched `mapPartitions` (the
  * Scala analog of `mapInPandas`): rows stream through in bounded
  * batches so a real decoder would amortize model/codec init per
  * batch, exactly like a vectorized UDF.
  *
  * Two codecs serve the [[Multimodal.MediaCodec]] seam: `StubCodec`
  * (deterministic pseudo-dims from the bytes — what the ORACLE checks,
  * since the test payloads are the documents' UTF-8 bytes, not images)
  * and [[graft.adapters.ImageIoMedia.ImageIoCodec]], a REAL JPEG/PNG
  * decoder on the JDK's javax.imageio — `AdaptersSpec` proves it drops
  * into `extractFeatures` unchanged with true dimensions. The
  * Spark-side plumbing — binary schema, batch shape, partition-local
  * iteration, metadata struct — is identical under either.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, kind: String)

  /** Seam for a real decoder (JavaCV / ImageIO on a real cluster). */
  trait MediaCodec extends Serializable {
    def decode(bytes: Array[Byte]): MediaMeta
  }

  /** Deterministic fake: pseudo-dims from payload size and content. */
  object StubCodec extends MediaCodec {
    def decode(bytes: Array[Byte]): MediaMeta = {
      val w = 16 + (bytes.length % 625)
      val h = 16 + ((if (bytes.isEmpty) 0 else bytes.head & 0xff) % 465)
      MediaMeta(w, h, "stub")
    }
  }

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, first_byte: Int, last_byte: Int,
      width: Int, height: Int)

  final case class AudioFeatures(
      doc_id: Long, n_samples: Int, peak: Int, rms: Double, n_sign_changes: Int)

  /** Audio-shaped feature extraction: treat the payload's first
    * `window` bytes as centered 8-bit samples and compute the signal
    * stats a curation pipeline gates on (peak, RMS, sign-change
    * count ≈ zero-crossing rate). Same batched partition-local stage
    * as [[extractFeatures]] — a real PCM/codec decoder drops into the
    * per-batch seam; the byte→sample arithmetic is the real, tested
    * plumbing (oracle-checked value-for-value since payloads are the
    * documents' ASCII bytes). The pivot is 96, not 128: ASCII text
    * never exceeds 127, so a 128 pivot would make every sample
    * negative and the sign-change stat vacuously zero — at 96,
    * lowercase letters sit above the axis and spaces/digits below,
    * so crossings genuinely exercise the stat. */
  def extractAudioFeatures(ds: Dataset[MediaRow], window: Int = 64,
      batchSize: Int = 64): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val samples = r.payload.take(window).map(b => (b & 0xff) - 96)
          val n = samples.length
          val peak = if (n == 0) 0 else samples.map(math.abs).max
          val rms = if (n == 0) 0.0
            else math.sqrt(samples.map(s => s.toLong * s).sum.toDouble / n)
          val changes = samples.sliding(2).count {
            case Array(a, b) => a * b < 0
            case _ => false
          }
          AudioFeatures(r.doc_id, n, peak,
            BigDecimal(rms).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
            changes)
        }
      }
    }
  }

  /** Batched partition-local decode: the mapInPandas-shaped stage. */
  def extractFeatures(ds: Dataset[MediaRow], codec: MediaCodec,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // A real codec would decode the whole batch in one native call.
        batch.map { r =>
          val meta = codec.decode(r.payload)
          MediaFeatures(
            r.doc_id, r.payload.length,
            // empty-payload value matches the oracle's ascii('') = 0
            // (a 0 first byte is indistinguishable from NUL there too)
            if (r.payload.isEmpty) 0 else r.payload.head & 0xff,
            if (r.payload.isEmpty) 0 else r.payload.last & 0xff,
            meta.width, meta.height)
        }
      }
    }
  }
}

object MultimodalQueries {

  import QueryDef.sql

  val defs: Seq[QueryDef] = Seq(

    // ---- binary payload + metadata struct + batched decode stage ----
    sql(
      "q_multimodal_features",
      """SELECT doc_id,
        |       CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
        |       ascii(substr(text, 1, 1)) AS first_byte,
        |       ascii(substr(text, length(text), 1)) AS last_byte,
        |       CAST(16 + octet_length(CAST(text AS BLOB)) % 625 AS INT) AS width,
        |       16 + ascii(substr(text, 1, 1)) % 465 AS height
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[Multimodal.MediaRow]
      Multimodal.extractFeatures(media, Multimodal.StubCodec)
        .toDF()
        .orderBy("doc_id")
    },

    // ---- audio-shaped sample statistics over the binary payload ----
    sql(
      "q_multimodal_audio",
      """WITH s AS (SELECT doc_id,
        |  list_transform(range(1, least(length(text), 64) + 1),
        |                 i -> ascii(substr(text, i, 1)) - 96) AS smp
        |  FROM documents WHERE doc_id % 2 = 0)
        |SELECT doc_id,
        |       CAST(len(smp) AS INT) AS n_samples,
        |       CAST(coalesce(list_max(list_transform(smp, x -> abs(x))), 0) AS INT) AS peak,
        |       coalesce(round(sqrt(list_sum(list_transform(smp, x -> x * x)) * 1.0
        |                           / len(smp)), 6), 0.0) AS rms,
        |       CAST(len(list_filter(range(1, len(smp)),
        |                 i -> smp[i] * smp[i+1] < 0)) AS INT) AS n_sign_changes
        |FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = Tables(s, dir, "documents")
        .where(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[Multimodal.MediaRow]
      Multimodal.extractAudioFeatures(media).toDF().orderBy("doc_id")
    },

    // ---- metadata-struct projection over the binary column ----
    sql(
      "q_multimodal_meta",
      """SELECT doc_id, kind, n_bytes, tag
        |FROM (SELECT doc_id,
        |             'doc' AS kind,
        |             CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
        |             source || '/' || lang AS tag
        |      FROM documents)
        |WHERE n_bytes > 100
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(
          col("doc_id"),
          struct(
            lit("doc").as("kind"),
            octet_length(col("text").cast("binary")).as("n_bytes"),
            concat(col("source"), lit("/"), col("lang")).as("tag")).as("meta"))
        .where(col("meta.n_bytes") > 100)
        .select(col("doc_id"), col("meta.kind").as("kind"),
          col("meta.n_bytes").as("n_bytes"), col("meta.tag").as("tag"))
        .orderBy("doc_id")
    }
  )
}
