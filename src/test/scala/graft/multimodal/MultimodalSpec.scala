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

  test("decodeImage decodes a real PNG via javax.imageio, exact luma values") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    val img = new BufferedImage(4, 2, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4) {
      val g = 32 * (y * 4 + x) // pure gray gradient -> luma == g exactly
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    // native dimensions: decoded as-is
    val px = Codecs.decodeImage(png, 4, 2)
    assert(px.toSeq == (0 until 8).map(_ * 32))
    // metadata dims differ: decoded then nearest-neighbour resized
    val rs = Codecs.decodeImage(png, 2, 1)
    assert(rs.toSeq == Seq(0, 64))
    // and through the full featurize pipeline on a real-PNG corpus
    val s = spark
    import s.implicits._
    val corpus = s.createDataset(Seq(MediaFile(1L, "image", png, 4, 2, 1)))
    val f = featurize(corpus).collect().head
    assert(f.histogram.sum == 256 && f.n_bytes == png.length)
  }

  test("audio framing is partition-count independent and drops the ragged tail") {
    val s = spark
    val base = syntheticCorpus(s, 60)
    val a = analyzeAudio(base, 64).collect().sortBy(_.media_id)
    val b = analyzeAudio(base.repartition(7), 64).collect().sortBy(_.media_id)
    assert(a.nonEmpty && a.sameElements(b))
    // only audio rows; full frames only (n_samples/64 of them)
    assert(a.forall(_.media_id % 3 == 1))
    assert(a.forall(x => x.n_frames == x.n_samples / 64))
  }

  test("audioFrameEnergies matches analyzeAudio's rollup frame-for-frame") {
    val s = spark
    val base = syntheticCorpus(s, 60)
    val byMedia = audioFrameEnergies(base, 64).collect()
      .groupBy(_.media_id).view.mapValues(_.sortBy(_.f)).toMap
    analyzeAudio(base, 64).collect().foreach { a =>
      val fr = byMedia(a.media_id)
      assert(fr.length == a.n_frames)
      assert(fr.map(_.f).toSeq == (0 until a.n_frames))
      assert(fr.map(_.e).sum == a.total_energy)
    }
    assert(byMedia.keySet == analyzeAudio(base, 64).collect().map(_.media_id).toSet)
  }

  test("VAD islands merge exactly the consecutive above-threshold frames") {
    // hand-built media: 6 full frames with energies straddling the
    // threshold in the pattern hi hi lo hi lo hi -> segments [0,1] [3] [5]
    val s = spark
    import s.implicits._
    val frameLen = 4
    // per-frame energy of constant byte v is 4*v^2: v=100 -> 40000 (hi), v=1 -> 4 (lo)
    val bytes = Array(100, 100, 1, 100, 1, 100)
      .flatMap(v => Array.fill(frameLen)(v.toByte))
    val corpus = s.createDataset(Seq(MediaFile(7L, "audio", bytes, 1, 1, 1)))
    val fr = audioFrameEnergies(corpus, frameLen).collect().sortBy(_.f)
    assert(fr.map(_.e).toSeq == Seq(40000L, 40000L, 4L, 40000L, 4L, 40000L))
    val active = fr.filter(_.e >= 40000L)
    val islands = active.map(x => x.f - (active.indexWhere(_.f == x.f) + 1))
    assert(active.groupBy(x => islands(active.indexOf(x))).values
      .map(_.map(_.f).toSeq.sorted).toSet == Set(Seq(0, 1), Seq(3), Seq(5)))
  }

  test("scene cuts partition each video's frames contiguously, mass-preserving") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val scenes = graft.Queries.queries("multimodal_video_scene_cuts")(s, sf0001)
      .collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("scene_id"),
        r.getAs[Int]("f_start"), r.getAs[Int]("f_end"),
        r.getAs[Int]("n_frames"), r.getAs[Long]("scene_sum")))
      .groupBy(_._1)
    val frames = analyzeFrames(syntheticCorpus(s, 200), 1).collect()
      .groupBy(_.media_id)
    assert(scenes.keySet == frames.keySet)
    scenes.foreach { case (m, ss) =>
      val chain = ss.sortBy(_._2)
      assert(chain.head._2 == 0 && chain.head._3 == 0,
        s"media $m: scene 0 must open at frame 0")
      assert(chain.map(_._2).toSeq == chain.indices,
        s"media $m: scene ids must be consecutive")
      chain.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._4 + 1,
          s"media $m: scene ${b._2} must open right after scene ${a._2}")
        case _ =>
      }
      chain.foreach { c =>
        assert(c._5 == c._4 - c._3 + 1, s"media $m scene ${c._2} count")
      }
      val fs = frames(m)
      assert(chain.map(_._5.toLong).sum == fs.length.toLong,
        s"media $m: scenes must cover every frame exactly once")
      assert(chain.map(_._6).sum == fs.map(_.frame_sum).sum,
        s"media $m: scene byte mass must equal total frame mass")
    }
  }

  test("aHash is exactly brightness-invariant below the clamp") {
    val s = spark
    import s.implicits._
    // 64-byte payload (one pixel per output cell at 8x8 from an 8x8
    // image): pixels all <= 239, so +16 never clamps -> the shifted
    // twin's mean moves exactly with the pixels and the hash is
    // IDENTICAL; a clamping corpus (+16 from 250) must differ
    val low = Array.tabulate(64)(i => ((i * 3) % 200).toByte)
    val corpus = s.createDataset(Seq(
      MediaFile(0L, "image", low, 8, 8, 1)))
    val h = imageAhashes(corpus, 16).collect().sortBy(_.media_id)
    assert(h.length == 2 && h(0).hash == h(1).hash)
    assert(h.forall(_.hash.length == 64))
    assert(h.map(_.variant).toSeq == Seq("base", "bright"))
    // clamped case: bytes near 255 (unsigned) flip bits near the mean
    val hi = Array.tabulate(64)(i => (200 + i % 56).toByte)
    val h2 = imageAhashes(
      s.createDataset(Seq(MediaFile(1L, "image", hi, 8, 8, 1))), 60)
      .collect().sortBy(_.media_id)
    assert(h2(0).hash != h2(1).hash,
      "a clamping shift must perturb the fingerprint")
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
