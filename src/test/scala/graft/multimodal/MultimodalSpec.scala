package graft.multimodal

import graft.SparkSpec
import Multimodal._

class MultimodalSpec extends SparkSpec {

  test("featurize is deterministic and partition-count independent") {
    val s = spark
    val a = featurize(syntheticCorpus(s, 100).repartition(1))
      .collect().sortBy(_.media_id)
    val b = featurize(syntheticCorpus(s, 100).repartition(8))
      .collect().sortBy(_.media_id)
    assert(a.length == 100)
    a.zip(b).foreach { case (x, y) =>
      assert(x.media_id == y.media_id && x.kind == y.kind)
      assert(x.mean_intensity == y.mean_intensity)
      assert(x.histogram.toSeq == y.histogram.toSeq)
      assert(x.embedding.toSeq == y.embedding.toSeq)
    }
  }

  test("feature schema carries typed arrays and the histogram sums to the raster size") {
    val s = spark
    val df = featurize(syntheticCorpus(s, 10)).toDF()
    assert(df.schema("histogram").dataType.typeName == "array")
    assert(df.schema("embedding").dataType.typeName == "array")
    featurize(syntheticCorpus(s, 10)).collect().foreach { f =>
      assert(f.histogram.sum == 256) // 16x16 resized raster
      assert(f.embedding.length == 8)
    }
  }

  test("sampleFrames emits only video rows at the requested stride") {
    val s = spark
    import s.implicits._
    val corpus = syntheticCorpus(s, 30)
    val frames = sampleFrames(corpus, stride = 2).collect()
    val videos = corpus.filter($"kind" === "video").collect()
    assert(frames.nonEmpty)
    assert(frames.map(_.media_id).toSet == videos.map(_.media_id).toSet)
    videos.foreach { v =>
      val mine = frames.filter(_.media_id == v.media_id)
      assert(mine.length == (v.n_frames + 1) / 2)
      assert(mine.map(_.frame_idx).toSeq == Iterator.range(0, v.n_frames, 2).toSeq)
    }
  }

  test("resize preserves corner pixels; decode stub is total on any payload") {
    val px = Codecs.decodeImage(Array[Byte](1, 2, 3), 4, 4)
    assert(px.length == 16 && px.forall(p => p >= 0 && p <= 255))
    val r = Codecs.resize(px, 4, 4, 2, 2)
    assert(r(0) == px(0)) // nearest-neighbour keeps origin
    val empty = Codecs.decodeImage(Array.empty[Byte], 4, 4)
    assert(empty.length == 16 && empty.forall(_ == 0)) // no mod-by-zero
  }
}
