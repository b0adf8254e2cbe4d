package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("G1 media blobs round-trip through parquet with schema intact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("blobs").toString + "/media"
    val blobs = Multimodal.syntheticBlobs(spark, 30)
    blobs.write.parquet(dir)
    val back = spark.read.parquet(dir).as[Multimodal.MediaBlob]
    assert(back.count() == 30)
    val m = back.collect().map(b => b.media_id -> b).toMap
    val orig = blobs.collect().map(b => b.media_id -> b).toMap
    assert(m.keySet == orig.keySet)
    assert(m(5L).payload.sameElements(orig(5L).payload))
    assert(m(5L).meta == orig(5L).meta)
  }

  test("G2 feature extraction is batched, deterministic, partition-preserving") {
    val blobs = Multimodal.syntheticBlobs(spark, 40, partitions = 4)
    val f1 = Multimodal.extractFeatures(blobs)
    assert(f1.rdd.getNumPartitions == 4)
    val a = f1.collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(blobs).collect().sortBy(_.media_id)
    assert(a.length == 40)
    assert(a.zip(b).forall { case (x, y) => x.features.sameElements(y.features) })
    // images decode to exactly 1 frame; av media to duration-derived counts
    assert(a.filter(_.kind == "image").forall(_.n_frames == 1))
    assert(a.filter(_.kind != "image").forall(_.n_frames >= 5))
  }

  test("G4 media retrieval: deterministic top-k per query, self excluded") {
    val blobs = Multimodal.syntheticBlobs(spark, 60)
    val out = Multimodal.mediaTopK(blobs, queryIds = Seq(0L, 1L), k = 3)
    val rows = out.collect()
    assert(rows.length == 6) // 2 queries × k
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
    val again = Multimodal.mediaTopK(blobs, queryIds = Seq(0L, 1L), k = 3).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("G3 frame sampling strides over the frame count") {
    val feats = Multimodal.extractFeatures(Multimodal.syntheticBlobs(spark, 12))
    val sampled = Multimodal.sampleFrames(feats, stride = 3).collect().toMap
    val frames = feats.collect().map(f => f.media_id -> f.n_frames).toMap
    sampled.foreach { case (id, idxs) =>
      assert(idxs == (0 until frames(id) by 3).toSeq)
    }
  }
}
