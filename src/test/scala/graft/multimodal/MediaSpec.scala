package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.Similarity

class MediaSpec extends SparkTestBase {

  lazy val media = Media.syntheticMedia(spark, 90)

  test("decode recovers the encoded metadata for every kind") {
    val decoded = Media.withDecodedMeta(media)
    assert(decoded.count() === 90)
    assert(decoded.filter(col("meta").isNull).count() === 0)
    // kinds cycle by id: image/audio/video
    val byKind = decoded.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind === Map("image" -> 30, "audio" -> 30, "video" -> 30))
    // images have dims, audio has sample rate, video has duration
    assert(decoded.filter(col("kind") === "image" && col("meta.width") <= 0).count() === 0)
    assert(decoded.filter(col("kind") === "audio" && col("meta.sample_rate") <= 0).count() === 0)
    assert(decoded.filter(col("kind") === "video" && col("meta.duration_ms") <= 0).count() === 0)
  }

  test("decode rejects malformed payloads instead of crashing") {
    assert(Media.decodeBytes(null).isEmpty)
    assert(Media.decodeBytes(Array[Byte](1, 2, 3)).isEmpty)
    assert(Media.decodeBytes(Array.fill[Byte](64)(0)).isEmpty) // wrong magic
  }

  test("feature extraction yields deterministic normalized embeddings") {
    import spark.implicits._
    val f1 = Media.withFeatures(media).orderBy("media_id")
      .select("embedding").as[Array[Float]].collect()
    val f2 = Media.withFeatures(media).orderBy("media_id")
      .select("embedding").as[Array[Float]].collect()
    assert(f1.length === 90)
    f1.zip(f2).foreach { case (a, b) => assert(a.sameElements(b)) }
    f1.foreach { v =>
      assert(v.length === 64)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5)
    }
  }

  test("extracted embeddings plug into the similarity operators") {
    val emb = Media.withFeatures(media)
      .withColumnRenamed("media_id", "vec_id")
    val topk = Similarity.bruteForceTopK(emb, 0L, 5)
    assert(topk.count() === 5)
  }

  test("resize rewrites dimensions; frame sampling explodes videos only") {
    val r = Media.withDecodedMeta(Media.resized(media, 32, 32))
    assert(r.filter(col("meta.width") =!= 32 || col("meta.height") =!= 32).count() === 0)

    val frames = Media.sampledFrames(media, framesPer = 4)
    assert(frames.count() === 30 * 4) // only the 30 videos explode
    assert(frames.filter(length(col("frame_bytes")) === 0).count() === 0)
  }
}
