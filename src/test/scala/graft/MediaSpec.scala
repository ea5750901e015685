package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Media

class MediaSpec extends SparkSpec {

  test("fake media table conforms to the media schema") {
    val m = Media.fakeMediaFromDocuments(spark, "/root/testdata/sf0.001")
    assert(m.columns.toSeq == Seq("media_id", "kind", "bytes", "meta"))
    assert(m.count() == 500)
    assert(m.select("kind").distinct().count() == 3)
  }

  test("feature extraction: deterministic, normalized histogram") {
    val m = Media.fakeMediaFromDocuments(spark, "/root/testdata/sf0.001")
    val f = Media.extractFeatures(m)
    val row = f.orderBy("media_id").first()
    val feats = row.getSeq[Double](2)
    assert(feats.length == 16)
    assert(math.abs(feats.sum - 1.0) < 1e-9) // normalized
    // deterministic across runs
    val again = Media.extractFeatures(m).orderBy("media_id").first().getSeq[Double](2)
    assert(feats == again)
  }

  test("resize: schema preserved, payload bounded by w*h, metadata rewritten") {
    val m = Media.fakeMediaFromDocuments(spark, "/root/testdata/sf0.001")
    val r = Media.resize(m, 8, 4)
    assert(r.schema == Media.schema)
    val rows = r.select(length(col("bytes")).as("len"),
      col("meta.width"), col("meta.height"), col("meta.sample_rate")).collect()
    // all fake payloads exceed 8x4, so every row is genuinely resized
    assert(rows.forall(x => x.getInt(0) == 32))
    assert(rows.forall(x => x.getInt(1) == 8 && x.getInt(2) == 4))
    assert(rows.forall(x => x.getInt(3) == 16000), "untouched meta carried through")
    // short payload passes through AND keeps its original dims — the
    // metadata must never contradict the bytes
    import spark.implicits._
    val tiny = Seq((1L, "image", Array[Byte](1, 2, 3)))
      .toDF("media_id", "kind", "bytes")
      .withColumn("meta", struct(lit(3).as("width"), lit(1).as("height"),
        lit(null).cast("int").as("sample_rate"), lit(null).cast("int").as("n_frames")))
    val t = Media.resize(tiny, 8, 4)
      .select(length(col("bytes")), col("meta.width"), col("meta.height")).collect()(0)
    assert(t.getInt(0) == 3 && t.getInt(1) == 3 && t.getInt(2) == 1)
    // deterministic; Int-overflow-safe dims
    val big = Array.tabulate(1000)(i => (i % 127).toByte)
    assert(Media.resizeStub(big, 8, 4).toSeq == Media.resizeStub(big, 8, 4).toSeq)
    assert(Media.resizeStub(big, 65536, 65536).length == 1000, "w*h must not overflow Int")
  }

  test("frame sampling: n frames, in order, deterministic offsets") {
    val m = Media.fakeMediaFromDocuments(spark, "/root/testdata/sf0.001").limit(5)
    val frames = Media.sampleFramesTable(m, 4)
    val grouped = frames.groupBy("media_id").agg(count("*").as("n"))
    assert(grouped.filter(col("n") =!= 4).count() == 0)
    val idxs = frames.filter(col("media_id") === 0)
      .orderBy("frame_idx").select("frame_idx")
      .collect().map(_.getInt(0)).toSeq
    assert(idxs == Seq(0, 1, 2, 3))
  }

  test("nearDupPairs: one decode pass, per-modality joins, no cross-modality pairs") {
    import graft.fixtures.MediaGen
    import spark.implicits._
    // a solid image (dHash 0) and a constant clip (eHash 0) share a
    // signature VALUE — the unified API must still never pair them
    val media = Seq(
      (1L, MediaGen.bmp(9, 8, Seq.fill(72)((128, 128, 128)))),
      (2L, MediaGen.png(9, 8, Seq.fill(72)((128, 128, 128)))),
      (3L, MediaGen.wav(Seq.fill(1040)(1000.toShort), 8000, 1)),
      (4L, MediaGen.wav(Seq.fill(1040)(70.toShort), 8000, 1)))
      .toDF("media_id", "bytes")
    val got = Media.nearDupPairs(media, maxBucketSize = 100)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("image", 1L, 2L), ("audio", 3L, 4L)))
  }
}
