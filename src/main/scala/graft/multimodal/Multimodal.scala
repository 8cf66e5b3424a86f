package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media as opaque `binary` columns with typed metadata, and
  * decode / resize / feature-extract / frame-sample as per-partition
  * iterator transforms.
  *
  * The Spark-side shape is the real thing — schema, encoders, lazy
  * iterator-to-iterator mapPartitions (no per-partition materialization,
  * so executor memory is bounded by one element, not one partition), and
  * partition-count-independent results. [[Codecs.decodeImage]] decodes
  * real PNG/JPEG/GIF/BMP payloads through the JDK's `javax.imageio`;
  * formats this container has no codec for (and the synthetic corpus's
  * opaque bytes) fall back to a deterministic fake raster, keeping the
  * stage total on any input. In a PySpark deployment the same stage is
  * `mapInPandas` batches hitting a richer codec library; swapping the
  * decoder does not change any plumbing here.
  */
object Multimodal {

  /** A media object: opaque payload + typed metadata. `kind` selects the
    * decode path (image | audio | video).
    */
  final case class MediaFile(media_id: Long, kind: String, data: Array[Byte],
                             width: Int, height: Int, n_frames: Int)

  /** Per-media extracted features. */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                                 mean_intensity: Double, histogram: Array[Long],
                                 embedding: Array[Float])

  /** One sampled video frame (payload slice + its index). */
  final case class Frame(media_id: Long, frame_idx: Int, data: Array[Byte])

  object Codecs {

    /** Decode a payload to a `width × height` grayscale raster.
      *
      * Real path first: if the bytes parse as an image format the JDK's
      * `javax.imageio` ships codecs for (PNG/JPEG/GIF/BMP), decode it,
      * convert to integer luma, and nearest-neighbour-resize to the
      * metadata dimensions. Payloads that are NOT a known image (the
      * synthetic corpus, truncated uploads, exotic formats this
      * container lacks codecs for) fall back to the deterministic fake
      * raster pixel(i) = byte(i mod len) — total on any input, so a
      * poison payload degrades to noise features instead of failing the
      * pipeline.
      */
    def decodeImage(data: Array[Byte], width: Int, height: Int): Array[Int] = {
      decodeReal(data) match {
        case Some((px, w, h)) =>
          if (w == width && h == height) px
          else resize(px, w, h, width, height)
        case None =>
          val px = new Array[Int](width * height)
          if (data.isEmpty) return px // empty payload -> black raster, not a crash
          var i = 0
          while (i < px.length) { px(i) = data(i % data.length) & 0xff; i += 1 }
          px
      }
    }

    /** `javax.imageio` decode to (luma raster, width, height); None when
      * the bytes are not a decodable image. Luma = (299r+587g+114b)/1000
      * in integer arithmetic — deterministic across JVMs.
      */
    private[multimodal] def decodeReal(data: Array[Byte]): Option[(Array[Int], Int, Int)] =
      if (data.length < 8) None
      else try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(data))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val out = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              out(y * w + x) = (((rgb >> 16) & 0xff) * 299 +
                ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
              x += 1
            }
            y += 1
          }
          Some((out, w, h))
        }
      } catch { case _: Throwable => None }

    /** Nearest-neighbour resize of a row-major grayscale raster. */
    def resize(px: Array[Int], w: Int, h: Int, outW: Int, outH: Int): Array[Int] = {
      val out = new Array[Int](outW * outH)
      var y = 0
      while (y < outH) {
        val sy = y * h / outH
        var x = 0
        while (x < outW) {
          out(y * outW + x) = px(sy * w + (x * w / outW))
          x += 1
        }
        y += 1
      }
      out
    }

    /** 16-bin intensity histogram. */
    def histogram(px: Array[Int]): Array[Long] = {
      val bins = new Array[Long](16)
      var i = 0
      while (i < px.length) { bins(px(i) >> 4) += 1; i += 1 }
      bins
    }

    /** Tiny 8-dim feature embedding: mean, variance proxy, and 6
      * normalized histogram moments — deterministic real arithmetic.
      */
    def embed(px: Array[Int], hist: Array[Long]): Array[Float] = {
      val n = px.length.toDouble
      val mean = px.sum / n
      val varr = px.map(p => (p - mean) * (p - mean)).sum / n
      val h6 = (0 until 6).map(i => (hist(i * 2) + hist(i * 2 + 1)) / n)
      (Seq(mean / 255.0, math.sqrt(varr) / 255.0) ++ h6).map(_.toFloat).toArray
    }
  }

  /** Deterministic synthetic media corpus (no media files ship with the
    * test data): payload bytes from a per-id LCG, dimensions from the id.
    * `spark.range` is a parallel, splittable source — corpus generation
    * scales like any other scan.
    */
  def syntheticCorpus(spark: SparkSession, n: Long): Dataset[MediaFile] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      var s = id * 6364136223846793005L + 1442695040888963407L
      val len = 256 + (id % 512).toInt
      val data = new Array[Byte](len)
      var i = 0
      while (i < len) {
        s = s * 6364136223846793005L + 1442695040888963407L
        data(i) = (s >>> 56).toByte
        i += 1
      }
      MediaFile(id, kind, data, 32 + (id % 32).toInt, 32 + (id % 16).toInt,
        if (kind == "video") 8 + (id % 8).toInt else 1)
    }
  }

  /** decode → resize(16×16) → histogram → embed, one pass per partition.
    * Lazy iterator chain: constant memory per task regardless of
    * partition size — the property that matters when a partition holds
    * thousands of images at 100 TB.
    */
  def featurize(ds: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val px = Codecs.decodeImage(m.data, m.width, m.height)
        val small = Codecs.resize(px, m.width, m.height, 16, 16)
        val hist = Codecs.histogram(small)
        MediaFeatures(m.media_id, m.kind, m.data.length,
          small.sum / 256.0, hist, Codecs.embed(small, hist))
      }
    }
  }

  /** Uniform-stride frame sampling for video rows: the payload is split
    * into n_frames equal slices and every `stride`-th slice is emitted.
    * flatMap keeps the iterator lazy; non-video rows produce nothing.
    */
  def sampleFrames(ds: Dataset[MediaFile], stride: Int): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { m =>
      if (m.kind != "video" || m.n_frames <= 0) Iterator.empty
      else {
        val frameLen = math.max(1, m.data.length / m.n_frames)
        Iterator.range(0, m.n_frames, stride).map { f =>
          val from = f * frameLen
          Frame(m.media_id, f,
            m.data.slice(from, math.min(from + frameLen, m.data.length)))
        }
      }
    }
  }

  /** Per-media audio features from framed PCM analysis. */
  final case class AudioFeatures(media_id: Long, n_samples: Int, n_frames: Int,
                                 total_energy: Long, max_peak: Int,
                                 total_zc: Int, energy_digest: String)

  /** Audio path: payload bytes as signed 8-bit PCM, framed into
    * [[frameLen]]-sample tumbling windows (ragged tail dropped);
    * per-frame energy Σv², zero crossings, and peak, rolled up per
    * media with an md5 fingerprint of the frame-energy sequence (the
    * audio analog of the raster histogram digest). Pure integer
    * arithmetic — DuckDB-expressible, so the gate hash-checks it.
    * Same lazy flatMap shape as [[sampleFrames]]: constant memory per
    * task, non-audio rows produce nothing.
    */
  def analyzeAudio(ds: Dataset[MediaFile], frameLen: Int): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.flatMap { m =>
      // sub-frame payloads produce NO row (not a zero row): the oracle's
      // frame CTE has no rows for them either, and the two must agree
      // for any frameLen, not just ones below the corpus minimum
      if (m.kind != "audio" || m.data.length < frameLen) Iterator.empty
      else {
        val nF = m.data.length / frameLen
        val energies = new Array[Long](nF)
        var peak = 0
        var zc = 0
        var total = 0L
        var f = 0
        while (f < nF) {
          var e = 0L
          var i = f * frameLen
          while (i < (f + 1) * frameLen) {
            val v = m.data(i).toInt
            e += v.toLong * v
            if (math.abs(v) > peak) peak = math.abs(v)
            if (i > f * frameLen && (v >= 0) != (m.data(i - 1).toInt >= 0)) zc += 1
            i += 1
          }
          energies(f) = e
          total += e
          f += 1
        }
        val md = java.security.MessageDigest.getInstance("MD5")
        val digest = md.digest(energies.mkString(",")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map(b => f"$b%02x").mkString
        Iterator.single(AudioFeatures(m.media_id, m.data.length, nF,
          total, peak, zc, digest))
      }
    }
  }

  /** One framed-PCM energy reading (the per-frame granularity that
    * [[analyzeAudio]] rolls up).
    */
  final case class FrameEnergy(media_id: Long, f: Int, e: Long)

  /** Per-frame energies for the audio rows: the same framing and Σv²
    * arithmetic as [[analyzeAudio]] but emitted one row per frame, for
    * downstream segmentation. Lazy flatMap — constant memory per task.
    */
  def audioFrameEnergies(ds: Dataset[MediaFile], frameLen: Int): Dataset[FrameEnergy] = {
    import ds.sparkSession.implicits._
    ds.flatMap { m =>
      if (m.kind != "audio" || m.data.length < frameLen) Iterator.empty
      else Iterator.range(0, m.data.length / frameLen).map { f =>
        var e = 0L
        var i = f * frameLen
        while (i < (f + 1) * frameLen) {
          val v = m.data(i).toInt
          e += v.toLong * v
          i += 1
        }
        FrameEnergy(m.media_id, f, e)
      }
    }
  }

  /** One aHash fingerprint row: the 64-bit average-hash as a '0'/'1'
    * string (engine-portable, no signed-long bit-63 hazard).
    */
  final case class ImageHash(media_id: Long, variant: String, hash: String)

  /** Average-hash (aHash) fingerprints for the image rows: decode →
    * nearest-neighbour 8×8 resize → each bit is pixel > integer mean —
    * the standard perceptual fingerprint whose defining property is
    * brightness invariance. Each image also emits a +`shift`
    * brightness-shifted twin (clamped at 255, media_id + 1000): where
    * no pixel clamps the mean shifts exactly with the pixels and the
    * hash is IDENTICAL; clamping flips only bits near the mean, so
    * twins sit at small Hamming distance — the property the dedup gate
    * hashes. Lazy flatMap, constant memory per task.
    */
  def imageAhashes(ds: Dataset[MediaFile], shift: Int): Dataset[ImageHash] = {
    import ds.sparkSession.implicits._
    ds.flatMap { m =>
      if (m.kind != "image") Iterator.empty
      else {
        def hashOf(p: Array[Int]): String = {
          val mean = p.sum / p.length
          p.map(v => if (v > mean) '1' else '0').mkString
        }
        val px = Codecs.resize(
          Codecs.decodeImage(m.data, m.width, m.height),
          m.width, m.height, 8, 8)
        Iterator(
          ImageHash(m.media_id, "base", hashOf(px)),
          ImageHash(m.media_id + 1000, "bright",
            hashOf(px.map(v => math.min(v + shift, 255)))))
      }
    }
  }

  /** 16-point DCT-II basis rows for frequencies u = 0..7, fixed-point
    * round(cos((2x+1)·u·π/32)·2¹⁴). Generated ONCE here and rendered
    * into the oracle SQL as literals from this same array, so both
    * engines share identical integer tables by construction — no libm
    * in any per-row path.
    */
  val DctT: Array[Array[Long]] = Array.tabulate(8, 16)((u, x) =>
    math.round(math.cos((2 * x + 1) * u * math.Pi / 32) * 16384.0))

  /** Perceptual DCT hash (pHash) fingerprints: decode →
    * nearest-neighbour 16×16 resize → integer 2-D DCT-II (the
    * [[DctT]] fixed-point basis, all int64) → the 63 AC coefficients of
    * the top-left 8×8 block thresholded at their exact median (32nd
    * smallest) → a 63-char '0'/'1' hash. Where aHash keys on the pixel
    * mean, pHash keys on low-frequency STRUCTURE — and its defining
    * property is exact brightness invariance: a constant shift moves
    * only the DC coefficient, so the unclamped twin's 63 AC bits are
    * IDENTICAL (clamping perturbs a few low bits). Emits each image
    * plus a +`shift` clamped twin at media_id + 1000.
    */
  def imagePhashes(ds: Dataset[MediaFile], shift: Int): Dataset[ImageHash] = {
    import ds.sparkSession.implicits._
    ds.flatMap { m =>
      if (m.kind != "image") Iterator.empty
      else {
        def hashOf(p: Array[Int]): String = {
          val d = Array.ofDim[Long](8, 8)
          var u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              var acc = 0L
              var y = 0
              while (y < 16) {
                var x = 0
                while (x < 16) {
                  acc += p(y * 16 + x) * DctT(u)(x) * DctT(v)(y)
                  x += 1
                }
                y += 1
              }
              d(u)(v) = acc
              v += 1
            }
            u += 1
          }
          val ac = (for { u <- 0 until 8; v <- 0 until 8
                          if u != 0 || v != 0 } yield d(u)(v)).toArray
          val med = ac.sorted.apply(31) // median of 63 = 32nd smallest
          ac.map(c => if (c > med) '1' else '0').mkString
        }
        val px = Codecs.resize(
          Codecs.decodeImage(m.data, m.width, m.height),
          m.width, m.height, 16, 16)
        Iterator(
          ImageHash(m.media_id, "base", hashOf(px)),
          ImageHash(m.media_id + 1000, "bright",
            hashOf(px.map(v => math.min(v + shift, 255)))))
      }
    }
  }

  /** Per-sampled-frame features — the video leg of the surface. */
  final case class FrameFeatures(media_id: Long, frame_idx: Int,
                                 n_frame_bytes: Int, frame_sum: Long,
                                 frame_digest: String)

  /** Video path: [[sampleFrames]] (uniform stride over the n_frames
    * payload slices) followed by per-frame featurization — unsigned
    * byte sum plus an md5 fingerprint of the exact byte sequence, the
    * frame-level analog of the raster histogram digest. Pure integer
    * arithmetic over the synthetic corpus's LCG bytes, so the gate
    * hash-checks the whole sample→slice→digest chain (frame boundaries
    * included) against a DuckDB replay. Same lazy flatMap/map shape:
    * constant memory per task, non-video rows produce nothing.
    */
  def analyzeFrames(ds: Dataset[MediaFile], stride: Int): Dataset[FrameFeatures] = {
    import ds.sparkSession.implicits._
    sampleFrames(ds, stride).map { fr =>
      val u = fr.data.map(b => b & 0xFF)
      val md = java.security.MessageDigest.getInstance("MD5")
      val digest = md.digest(u.mkString(",")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString
      FrameFeatures(fr.media_id, fr.frame_idx, fr.data.length,
        u.foldLeft(0L)(_ + _), digest)
    }
  }

  /** The query-surface entry: synthetic corpus → features, projected to
    * stable scalar columns (rows-only checked — the decode stub is JVM
    * code, not SQL-expressible).
    */
  def pipelineSummary(spark: SparkSession, n: Long): Dataset[org.apache.spark.sql.Row] = {
    import spark.implicits._
    // Arrays are projected to scalar digests: the driver's comparator
    // sorts cell values and cannot hash array cells.
    featurize(syntheticCorpus(spark, n))
      .select($"media_id", $"kind", $"n_bytes",
        round($"mean_intensity", 6).as("mean_intensity"),
        aggregate($"histogram", lit(0L), (a, x) => a + x).as("hist_sum"),
        md5(concat_ws(",", $"histogram")).as("hist_digest"),
        round($"embedding".getItem(0).cast("double"), 6).as("emb_0"))
      .orderBy($"media_id")
  }
}
