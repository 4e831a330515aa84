package graft.multimodal

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.QDef

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The Spark-side plumbing is real and tested — schema (binary +
  * struct metadata), per-partition batch processing (mapPartitions:
  * the Scala analogue of mapInPandas batches — one iterator per
  * partition, so a real decoder could amortize model/codec init per
  * partition, not per row), partitioning, and the exploding
  * frame-sample generator. The byte-level decode itself is a STUB:
  * no image/audio codecs exist in this environment, so payloads use
  * a deterministic synthetic container format ("GRFT" magic + typed
  * header) and "decoding" parses that header. Swapping in a real
  * codec changes only the marked functions, not the dataflow.
  */
object Media {

  val MAGIC = 0x47524654 // "GRFT"
  val KINDS = Seq("image", "audio", "video")

  final case class MediaMeta(kind: String, width: Int, height: Int,
      sample_rate: Int, duration_ms: Int, payload_len: Int)
  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])

  // ---- synthetic container format (the stub boundary) ---------------

  /** STUB-FORMAT encoder: deterministic fake payload for media_id. */
  def encode(mediaId: Long): Array[Byte] = {
    val kind = KINDS((mediaId % 3).toInt)
    val width = if (kind == "image" || kind == "video") 64 + (mediaId % 8).toInt * 32 else 0
    val height = if (kind == "image" || kind == "video") 64 + (mediaId % 5).toInt * 32 else 0
    val rate = if (kind == "audio") 8000 * (1 + (mediaId % 3).toInt) else 0
    val dur = if (kind != "image") 1000 + (mediaId % 10).toInt * 500 else 0
    val payloadLen = 256 + (mediaId % 7).toInt * 64
    val buf = ByteBuffer.allocate(24 + payloadLen)
    buf.putInt(MAGIC).put(KINDS.indexOf(kind).toByte).put(0.toByte).putShort(0)
    buf.putInt(width).putInt(height).putInt(rate).putInt(dur)
    var i = 0
    while (i < payloadLen) { buf.put(((mediaId * 131 + i * 31) % 251).toByte); i += 1 }
    buf.array()
  }

  /** STUB-DECODE: parses the synthetic header. A real implementation
    * replaces this body with an actual codec call; the signature and
    * the per-partition batching around it stay identical. */
  def decodeBytes(content: Array[Byte]): Option[MediaMeta] = {
    if (content == null || content.length < 24) return None
    val buf = ByteBuffer.wrap(content)
    if (buf.getInt() != MAGIC) return None
    val kind = KINDS(buf.get().toInt)
    buf.get(); buf.getShort()
    Some(MediaMeta(kind, buf.getInt(), buf.getInt(), buf.getInt(), buf.getInt(),
      content.length - 24))
  }

  // ---- dataflow (real plumbing) -------------------------------------

  /** Deterministic synthetic corpus: (media_id, kind, content). */
  def syntheticMedia(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long]
      .mapPartitions(_.map { id =>
        MediaRow(id, KINDS((id % 3).toInt), encode(id))
      })
      .toDF()
  }

  /** Decode pass: one iterator per partition (batch-shaped — codec
    * init amortizes per partition). Adds a `meta` struct column. */
  def withDecodedMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("content"))
      .as[MediaRow]
      .mapPartitions { it =>
        // real impl: initialize codec/model HERE, once per partition
        it.map { r =>
          val m = decodeBytes(r.content)
          (r.media_id, r.kind, r.content, m)
        }
      }
      .toDF("media_id", "kind", "content", "meta")
  }

  /** Feature extraction: binary → dense Array[Float] embedding.
    * STUB: 64-bin byte histogram, L2-normalized — deterministic and
    * shaped exactly like a model-produced embedding (compatible with
    * ops.Similarity search). */
  def withFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("content"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.map { r =>
          val hist = new Array[Float](dim)
          val payload = r.content.drop(24)
          payload.foreach(b => hist(java.lang.Byte.toUnsignedInt(b) % dim) += 1f)
          val norm = math.sqrt(hist.map(x => x.toDouble * x).sum).toFloat max 1e-9f
          (r.media_id, hist.map(_ / norm))
        }
      }
      .toDF("media_id", "embedding")
  }

  /** Resize: rewrites the header dims and (stub) truncates payload
    * proportionally. Real impl: decode → resample → re-encode. */
  def resized(media: DataFrame, newW: Int, newH: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("content"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        val out = r.content.clone()
        val buf = ByteBuffer.wrap(out)
        buf.position(8); buf.putInt(newW).putInt(newH)
        MediaRow(r.media_id, r.kind, out)
      })
      .toDF()
  }

  /** Frame sampling: each video row explodes to `framesPer` frame
    * rows (frame_idx + per-frame byte slice). Generator-shaped
    * (flatMap): output cardinality is data-dependent, exactly how a
    * real frame sampler behaves. */
  def sampledFrames(media: DataFrame, framesPer: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("content"))
      .as[MediaRow]
      .flatMap { r =>
        if (r.kind != "video") Iterator.empty
        else {
          val payload = r.content.drop(24)
          val step = math.max(1, payload.length / framesPer)
          (0 until framesPer).iterator.map { f =>
            val slice = payload.slice(f * step, math.min((f + 1) * step, payload.length))
            (r.media_id, f, slice)
          }
        }
      }
      .toDF("media_id", "frame_idx", "frame_bytes")
  }

  // ---- driver-gate queries -----------------------------------------
  // The stub container is a CLOSED-FORM function of media_id, so the
  // oracle recomputes the header math in SQL and the gate verifies the
  // REAL dataflow end-to-end: the binary round-trip (encode → bytes →
  // mapPartitions decode), the frame-explode generator, and the aggs.
  // Swapping in a real codec would drop these back to rows-only.

  def mediaPipeline(spark: SparkSession, dir: String): DataFrame = {
    val media = syntheticMedia(spark, 300)
    val decoded = withDecodedMeta(media)
    decoded
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("meta.width")), 4).as("avg_width"),
        round(avg(col("meta.sample_rate")), 4).as("avg_sample_rate"),
        sum(col("meta.payload_len")).as("total_payload_bytes"))
      .orderBy("kind")
  }

  val mediaPipelineSql: String =
    """WITH ids AS (SELECT unnest(range(0, 300)) AS id),
      |m AS (SELECT id,
      |        CASE id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |        CASE WHEN id % 3 <> 1 THEN 64 + (id % 8) * 32 ELSE 0 END AS width,
      |        CASE WHEN id % 3 = 1 THEN 16000 ELSE 0 END AS sample_rate,
      |        256 + (id % 7) * 64 AS payload_len
      |      FROM ids)
      |SELECT kind, count(*) AS n, round(avg(width), 4) AS avg_width,
      | round(avg(sample_rate), 4) AS avg_sample_rate,
      | CAST(sum(payload_len) AS BIGINT) AS total_payload_bytes
      |FROM m GROUP BY kind ORDER BY kind""".stripMargin

  def mediaFrames(spark: SparkSession, dir: String): DataFrame =
    sampledFrames(syntheticMedia(spark, 300))
      .groupBy("media_id").agg(count(lit(1)).as("n_frames"),
        sum(length(col("frame_bytes"))).as("frame_bytes_total"))
      .orderBy("media_id")

  // video payload_len = 256 + (id%7)*64 is divisible by 4, so the 4
  // sampled slices tile the payload exactly: total bytes = payload_len.
  val mediaFramesSql: String =
    """WITH ids AS (SELECT unnest(range(0, 300)) AS id)
      |SELECT id AS media_id, CAST(4 AS BIGINT) AS n_frames,
      | CAST(256 + (id % 7) * 64 AS BIGINT) AS frame_bytes_total
      |FROM ids WHERE id % 3 = 2 ORDER BY media_id""".stripMargin

  val catalog: Seq[QDef] = Seq(
    QDef("q38_media_decode", mediaPipeline, Some(mediaPipelineSql)),
    QDef("q39_media_frames", mediaFrames, Some(mediaFramesSql)),
  )
}
