package graft

import org.apache.spark.sql.functions.{col, expr, when}

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val payloads = Seq(
    (1L, "x" * 600),
    (2L, "abc")
  ).toDF("doc_id", "text")
    .select(col("doc_id"), col("text").cast("binary").as("payload"))

  test("metadata: byte length, md5, frame count — no decode") {
    val rows = Multimodal.metadata(payloads).collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Long]("byte_len") === 600L)
    assert(rows(1L).getAs[Long]("n_frames") === 3L)
    assert(rows(2L).getAs[String]("content_md5") === "900150983cd24fb0d6963f7d28e17f72")
  }

  test("extractFeatures drives the codec once per row via mapPartitions") {
    val feats = Multimodal.extractFeatures(payloads).collect().map(r => r.getLong(0) -> r).toMap
    assert(feats(2L).getAs[Int]("width") === 4) // 3 bytes % 640 + 1
    assert(feats(2L).getAs[Int]("channels") === 3)
    val meanAbc = ("abc".getBytes.map(_.toDouble).sum / 3)
    assert(math.abs(feats(2L).getAs[Double]("mean_intensity") - meanAbc) < 1e-9)
  }

  test("resize produces exact target-size payloads, deterministic bytes") {
    val out = Multimodal.resize(payloads, targetBytes = 16)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(out.values.forall(_.length == 16))
    assert(out(1L).forall(_ == 'x'.toByte)) // 600 x's shrink to 16 x's
    // "abc" upsampled to 16: position i maps to in(i*3/16 % 3)
    val expected = (0 until 16).map(i => "abc".charAt(i * 3 / 16 % 3).toByte).toArray
    assert(out(2L).toSeq === expected.toSeq)
    val empty = Seq((9L, "")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    assert(Multimodal.resize(empty, 8).collect().head.getAs[Array[Byte]](1).forall(_ == 0))
  }

  /** A real 4×2 PNG with known pixel values, encoded by the JDK itself. */
  private def pngBytes(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIoCodec decodes a real PNG: width, height, channels, mean") {
    // 4×2, left half black, right half white → mean = 255/2 over 3 bands.
    val png = pngBytes(4, 2, (x, _) => if (x < 2) 0x000000 else 0xffffff)
    val real = Seq((1L, png), (2L, pngBytes(3, 5, (_, _) => 0x808080)))
      .toDF("doc_id", "payload")
    val feats = Multimodal.extractFeatures(real, Multimodal.ImageIoCodec)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(feats(1L).getAs[Int]("width") === 4)
    assert(feats(1L).getAs[Int]("height") === 2)
    assert(feats(1L).getAs[Int]("channels") === 3)
    assert(math.abs(feats(1L).getAs[Double]("mean_intensity") - 127.5) < 1e-9)
    assert(feats(2L).getAs[Int]("width") === 3)
    assert(feats(2L).getAs[Int]("height") === 5)
    assert(math.abs(feats(2L).getAs[Double]("mean_intensity") - 128.0) < 1e-9)
    // Undecodable bytes surface as an error, not silent features.
    val junk = Seq((3L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    intercept[Exception] {
      Multimodal.extractFeatures(junk, Multimodal.ImageIoCodec).collect()
    }
  }

  test("resizeImages produces decodable PNGs at the target size") {
    val png = pngBytes(8, 8, (x, y) => if ((x + y) % 2 == 0) 0x000000 else 0xffffff)
    val withNull = Seq((1L, png), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val out = Multimodal.resizeImages(withNull, targetW = 4, targetH = 2)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1))).toMap
    assert(out(2L) === null)
    val (w, h, c, mean) = Multimodal.ImageIoCodec.decode(out(1L))
    assert((w, h, c) === ((4, 2, 3)))
    // checkerboard averages to mid-gray under area averaging
    assert(math.abs(mean - 127.5) < 16.0, s"mean $mean")
  }

  test("sampleFrames emits no frames for an empty payload") {
    val empty = Seq((9L, "")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    assert(Multimodal.sampleFrames(empty).count() === 0)
  }

  test("sampleFrames emits every stride-th 256-byte block") {
    val frames = Multimodal.sampleFrames(payloads, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).length))
    // doc 1: blocks 0,1,2 → sampled 0 and 2 (index within sampled list: 0,1)
    assert(frames.count(_._1 == 1L) === 2)
    assert(frames.filter(_._1 == 1L).map(_._3).toSeq === Seq(256, 88))
    assert(frames.count(_._1 == 2L) === 1)
  }

  test("audio energy: hand-built PCM16LE, full and trailing partial windows") {
    // samples 1, -2, 3, -4, 5 → win=2: (1+4), (9+16), (25 partial)
    val bb = java.nio.ByteBuffer.allocate(10).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(1, -2, 3, -4, 5).foreach(s => bb.putShort(s.toShort))
    val df = Seq((7L, bb.array())).toDF("doc_id", "payload")
    val out = Multimodal.audioEnergy(df, win = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(out === Array((0L, 2L, 5L), (1L, 2L, 25L), (2L, 1L, 25L)))
  }

  test("imageDhash: hand-computed bits on a real PNG, brightness-shift invariant") {
    // 9×8 image, one pixel per dHash cell: column x has gray 10·x except
    // column 5 drops to 0 — bits are the exact left<right comparisons.
    val grays = Array(10, 20, 30, 40, 50, 0, 60, 70, 80)
    val png = pngBytes(9, 8, (x, _) => { val g = grays(x); (g << 16) | (g << 8) | g })
    val sig = Multimodal.imageDhash(Seq((1L, png)).toDF("doc_id", "payload"))
      .collect().head.getLong(1)
    // per row y: bits x=0..7 → grays(x+1) > grays(x): T T T T F T T T
    val rowBits = (0 until 8).map(x => if (grays(x + 1) > grays(x)) 1L else 0L)
    val expected = (0 until 8).flatMap(y => rowBits.zipWithIndex.map {
      case (b, x) => b << (y * 8 + x)
    }).sum
    assert(sig === expected)
    // uniform +50 brightness: every comparison unchanged → same hash
    val brighter = pngBytes(9, 8, (x, _) => { val g = grays(x) + 50; (g << 16) | (g << 8) | g })
    val sig2 = Multimodal.imageDhash(Seq((1L, brighter)).toDF("doc_id", "payload"))
      .collect().head.getLong(1)
    assert(sig2 === sig)
  }

  test("image near-dup: 1-cell variants pair within Hamming 4, distinct bases don't") {
    // 5 quads (20 images): within-quad pairs are ≤ 2 bits from the base and
    // ≤ 4 pairwise by construction; different bases are unrelated grids.
    val ids = (0L until 20L).toDF("doc_id")
    val sigs = Multimodal.imageDhash(Multimodal.synthesizePatternPngs(ids))
      .withColumnRenamed("dhash", "sig")
    val pairs = graft.operators.Dedup.hammingPairs(sigs, bits = 64, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val withinQuad = pairs.filter { case (a, b, _) => a / 4 == b / 4 }
    val crossQuad = pairs.filter { case (a, b, _) => a / 4 != b / 4 }
    assert(withinQuad.length === 5 * 6, s"every within-quad pair must band: $withinQuad")
    assert(withinQuad.forall(_._3 <= 4))
    assert(crossQuad.isEmpty, s"distinct bases must not pair: ${crossQuad.toSeq}")
    // banding has FULL recall: equals the all-pairs Hamming computation
    val all = sigs.collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = for {
      (a, sa) <- all; (b, sb) <- all if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 4
    } yield (a, b, h.toLong)
    assert(pairs.toSet === brute.toSet)
    // composed with CC closure: each quad is one cluster, canonical = min id
    val clusters = graft.operators.Dedup.clusters(ids,
      graft.operators.Dedup.hammingPairs(sigs, 64, 4))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (0L until 20L).foreach { id =>
      assert(clusters(id) === ((id / 4 * 4, if (id % 4 == 0) 1L else 0L)))
    }
  }

  test("synthesizePatternPngs round-trips its analytic cell formula") {
    // the PNG decode must recover patternCell exactly (uniform 2×2 blocks,
    // lossless codec) — the invariant the SQL oracle rests on
    val png = Multimodal.synthesizePatternPngs(Seq(7L).toDF("doc_id"))
      .collect().head.getAs[Array[Byte]](1)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert((img.getWidth, img.getHeight) === ((18, 16)))
    for (gy <- 0 until 8; gx <- 0 until 9) {
      val v = Multimodal.patternCell(7L, gx, gy)
      assert((img.getRGB(gx * 2, gy * 2) & 0xff) === v)
      assert((img.getRGB(gx * 2 + 1, gy * 2 + 1) & 0xff) === v)
    }
  }

  test("audioFingerprint: hand-checked contour bits, gain-invariant, identical waveforms collide") {
    // samples 1,-2,3,-4,5,0 at win=2: energies 5, 25, 25 → bits
    // (25>5)=1, (25>25)=0 → sig=1, n_windows=3
    def pcm(samples: Seq[Int]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(samples.size * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(s => bb.putShort(s.toShort))
      bb.array()
    }
    val base = Seq(1, -2, 3, -4, 5, 0)
    val out = Multimodal.audioFingerprint(
      Seq((1L, pcm(base)), (2L, pcm(base.map(_ * 2))), // uniform gain 2×
        (3L, pcm(Seq(9, 9, 1, 0, 1, 0))))             // falling contour
      .toDF("doc_id", "payload"), win = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((1L, 3L)))
    assert(out(2L) === out(1L), "uniform gain must not change the signature")
    assert(out(3L) === ((0L, 3L))) // 162 > 1 > 1: both comparisons false
    // synthesized waveforms: same (id mod 200) in one duration class →
    // identical PCM → Hamming-0 pairs; the banding finds exactly them
    val ids = Seq(0L, 200L, 400L, 5L, 205L).toDF("doc_id") // one duration class
    val sigs = Multimodal.audioFingerprint(Multimodal.synthesizePcm(ids), win = 50)
    val pairs = graft.operators.Dedup.hammingPairs(
      sigs.select(col("doc_id"), col("sig")), 64, 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical waveforms (id ≡ id' mod 200) MUST collide at Hamming 0
    assert(Set((0L, 200L), (0L, 400L), (200L, 400L), (5L, 205L)).subsetOf(pairs))
  }

  test("synthesizeVideos/videoFrames: container round-trips frame counts and bytes") {
    val ids = Seq(0L, 1L, 2L, 30L).toDF("doc_id")
    val frames = Multimodal.videoFrames(Multimodal.synthesizeVideos(ids))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Array[Byte]](2))
      .toMap
    // family 0 → nf 6: variants 0/1 carry 6 frames, the trimmed variant 4
    val byDoc = frames.keys.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byDoc === Map(0L -> 6, 1L -> 6, 2L -> 4, 30L -> 8)) // family 10 → nf 8
    // frame indices are contiguous from 0
    assert(frames.keys.filter(_._1 == 2L).map(_._2).toSet === Set(0L, 1L, 2L, 3L))
    // every frame decodes as a real 18×14 image
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(frames((0L, 0L))))
    assert(img.getWidth === 18 && img.getHeight === 14)
    // the BMP re-encode is genuinely different BYTES from the PNG base
    assert(!java.util.Arrays.equals(frames((0L, 0L)), frames((1L, 0L))))
  }

  test("videoFrames fails loudly on truncated and trailing-byte containers") {
    val good = Multimodal.synthesizeVideos(Seq(0L).toDF("doc_id"))
      .collect().head.getAs[Array[Byte]]("payload")
    def parse(bytes: Array[Byte]): Unit =
      Multimodal.videoFrames(Seq((0L, bytes)).toDF("doc_id", "payload")).collect()
    parse(good) // sanity: the untampered container parses
    intercept[org.apache.spark.SparkException](parse(good.dropRight(3)))
    intercept[org.apache.spark.SparkException](parse(good :+ 0x7f.toByte))
  }

  test("frameDhash: BMP re-encode carries identical signatures; videoCell replays") {
    val ids = Seq(0L, 1L).toDF("doc_id")
    val fh = Multimodal.frameDhash(
      Multimodal.videoFrames(Multimodal.synthesizeVideos(ids)))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // identical rasters through different codecs → identical dHash per frame
    (0 until 6).foreach { fi =>
      assert(fh((0L, fi.toLong)) === fh((1L, fi.toLong)),
        s"frame $fi: PNG vs BMP re-encode must hash identically")
    }
    // the analytic replay predicts every bit (cells are uniform 2×2 blocks,
    // so each grid comparison reduces to the cell values themselves)
    val expected0 = (0 until 7).flatMap { gy =>
      (0 until 8).map { gx =>
        if (Multimodal.videoCell(0L, 0, gx + 1, gy) > Multimodal.videoCell(0L, 0, gx, gy))
          1L << (gy * 8 + gx)
        else 0L
      }
    }.sum
    assert(fh((0L, 0L)) === expected0)
    // 8×7 grid → 56 bits: the sign bit can never be set (oracle packs with
    // plain shifts)
    assert(fh.values.forall(_ >= 0L))
  }

  test("video near-dup: re-encoded and trimmed cuts pair, distinct families don't") {
    // families 7 and 8 (nf = 8 and 10) → 6 videos
    val ids = Seq(21L, 22L, 23L, 24L, 25L, 26L).toDF("doc_id")
    val fh = Multimodal.frameDhash(
      Multimodal.videoFrames(Multimodal.synthesizeVideos(ids)))
    val runs = graft.operators.Dedup.frameAlignedRuns(
      fh.select(col("doc_id"), col("frame_idx").as("pos"), col("dhash").as("h")),
      minRun = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // within family 7 (nf = 8): re-encode aligns full-length at diff 0,
    // trims align at length nf−2 with b_start 0 against a_start 2
    assert(runs((21L, 22L)) === ((0L, 0L, 8L)))
    assert(runs((21L, 23L)) === ((2L, 0L, 6L)))
    assert(runs((22L, 23L)) === ((2L, 0L, 6L)))
    assert(runs((24L, 25L)) === ((0L, 0L, 10L)))
    // no cross-family runs: unrelated content must not align
    assert(runs.keySet.forall { case (a, b) => a / 3 == b / 3 })
    val clusters = graft.operators.Dedup.clusters(
      ids,
      graft.operators.Dedup.frameAlignedRuns(
        fh.select(col("doc_id"), col("frame_idx").as("pos"), col("dhash").as("h")),
        minRun = 4).select(col("doc_a"), col("doc_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters === Map(21L -> 21L, 22L -> 21L, 23L -> 21L,
      24L -> 24L, 25L -> 24L, 26L -> 24L))
  }

  test("incremental video store: arrival-order ingests ≡ one-shot alignment") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vstore").toString + "/store"
    val ids = (21L to 26L).toDF("doc_id") // families 7 and 8
    val fh = Multimodal.frameDhash(
      Multimodal.videoFrames(Multimodal.synthesizeVideos(ids)))
      .select(col("doc_id"), col("frame_idx").as("pos"), col("dhash").as("h"))
    def runsOf(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val run1 = runsOf(graft.operators.Dedup.incrementalFrameRuns(
      fh.filter($"doc_id" % 2 === 0), dir))
    val run2 = runsOf(graft.operators.Dedup.incrementalFrameRuns(
      fh.filter($"doc_id" % 2 === 1), dir))
    val oneShot = runsOf(graft.operators.Dedup.frameAlignedRuns(fh, minRun = 4))
    assert(run1.intersect(run2).isEmpty)
    assert(run1.union(run2) === oneShot)
    // the family-7 re-encode pair (21 even-batch, 22 odd? 21 odd, 22 even)
    // straddles the boundary → its full-length run is cross-batch
    assert(run2.contains((21L, 22L, 0L, 0L, 8L)))
    // replay idempotence
    assert(runsOf(graft.operators.Dedup.incrementalFrameRuns(
      fh.filter($"doc_id" % 2 === 1), dir)).isEmpty)
    // scheme guard: a different frame-signature tag fails loudly
    val ex = intercept[IllegalStateException] {
      graft.operators.Dedup.incrementalFrameRuns(fh, dir,
        formatTag = "frames-other-v9")
    }
    assert(ex.getMessage.contains("frames-other-v9"))
  }

  test("frameAlignedRunsTolerant: bit-perturbed re-encodes still align; exact twin at ham 0 evidence") {
    import graft.operators.Dedup
    val fh = Multimodal.frameDhash(
      Multimodal.videoFrames(Multimodal.synthesizeVideos(Seq(21L, 22L, 23L).toDF("doc_id"))))
      .select(col("doc_id"), col("frame_idx").as("pos"), col("dhash").as("h"))
    // lossy stand-in: flip one signature bit per frame of the re-encoded
    // variant (a JPEG-grade perturbation exact equality cannot absorb)
    val noisy = fh.withColumn("h",
      when(col("doc_id") === 22L, expr("h ^ CAST(shiftleft(1, CAST(pos % 7 AS INT)) AS BIGINT)"))
        .otherwise(col("h")))
    def runsOf(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    // exact alignment loses the perturbed variant entirely...
    val exact = runsOf(Dedup.frameAlignedRuns(noisy, minRun = 4))
    assert(!exact.exists(r => r._1 == 22L || r._2 == 22L))
    assert(exact.contains((21L, 23L, 6L))) // unperturbed trim still pairs
    // ...the tolerant form recovers it at ham ≤ 2, full lengths
    val tol = runsOf(Dedup.frameAlignedRunsTolerant(noisy, minRun = 4, maxHamming = 2))
    assert(tol.contains((21L, 22L, 8L)) && tol.contains((22L, 23L, 6L))
      && tol.contains((21L, 23L, 6L)))
    // on unperturbed input the tolerant form ⊇ exact (equal here)
    assert(runsOf(Dedup.frameAlignedRunsTolerant(fh, minRun = 4, maxHamming = 2))
      === runsOf(Dedup.frameAlignedRuns(fh, minRun = 4)))
    // out-of-range frame index fails loudly, not silently mis-keyed
    val bad = Seq((1L, 1L << 20, 0L)).toDF("doc_id", "pos", "h")
    intercept[Exception] {
      Dedup.frameAlignedRunsTolerant(bad, minRun = 1).collect()
    }
  }

  test("audio energy of synthesized PCM matches the analytic waveform") {
    val ids = Seq(3L, 12L).toDF("doc_id")
    val out = Multimodal.audioEnergy(Multimodal.synthesizePcm(ids))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    def expected(id: Long): Map[(Long, Long), (Long, Long)] = {
      val n = ((id % 5) + 1) * 400
      (0L until n).groupBy(_ / 400).map { case (w, is) =>
        (id, w) -> (is.size.toLong,
          is.map { i =>
            val s = math.abs((i * 7L + id) % 200L - 100L) * 300L
            s * s
          }.sum)
      }
    }
    assert(out === expected(3L) ++ expected(12L))
  }

  test("imageRowProfile: decoded row profiles equal analytic patternCell row sums") {
    val ids = Seq(0L, 5L, 10L, 17L).toDF("doc_id")
    val out = Multimodal.imageRowProfile(Multimodal.synthesizePatternPngs(ids))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    ids.collect().map(_.getLong(0)).foreach { id =>
      val expected = (0 until 8).map(gy =>
        (0 until 9).map(gx => Multimodal.patternCell(id, gx, gy).toLong).sum)
      assert(out(id) === expected, s"id=$id")
    }
  }

  test("image-text alignment: true captions pass, swapped captions fail, both classes present") {
    val ids = (0L until 30L).toDF("doc_id")
    val aligned = Multimodal.imageTextAlignment(
      Multimodal.imageRowProfile(Multimodal.synthesizePatternPngs(ids)),
      Multimodal.captionProfile(Multimodal.synthesizeCaptions(ids)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(aligned.size === 30)
    (0L until 30L).foreach { id =>
      val expected = if (id % 7 == 3) 0L else 1L
      assert(aligned(id) === expected, s"id=$id")
    }
    // the text tower parses captions back to exact integer profiles
    val tp = Multimodal.captionProfile(Multimodal.synthesizeCaptions(Seq(4L).toDF("doc_id")))
      .head().getSeq[Long](1)
    assert(tp === (0 until 8).map(gy =>
      (0 until 9).map(gx => Multimodal.patternCell(4L, gx, gy).toLong).sum))
  }

  test("image-text alignment: RGB-scale norms trip the exact-BIGINT guard loudly; rescaled pass") {
    // 3-band per-cell sums reach ~6.9k per component → ‖·‖² ≈ 3.8e8 >
    // √(2⁶³/100) ≈ 3.0e8, where tauDen·dot² would wrap silently in
    // non-ANSI BIGINT arithmetic and flip the verdict — the guard must
    // raise instead (r7 advice).
    val big = Seq((1L, Array.fill(8)(6900L))).toDF("doc_id", "profile")
    val bigT = Seq((1L, Array.fill(8)(6900L))).toDF("doc_id", "tprofile")
    val ex = intercept[Exception] {
      Multimodal.imageTextAlignment(big, bigT).collect()
    }
    assert(ex.getMessage.contains("exact-BIGINT"), ex.getMessage)
    // dividing both towers by a common constant is verdict-preserving and
    // brings the norms back inside the exact window
    val small = Seq((1L, Array.fill(8)(69L))).toDF("doc_id", "profile")
    val smallT = Seq((1L, Array.fill(8)(69L))).toDF("doc_id", "tprofile")
    assert(Multimodal.imageTextAlignment(small, smallT)
      .head().getLong(2) === 1L)
  }

  test("mirror dedup: flips pair under the canonical signature, NOT under plain dHash") {
    val ids = (0L until 20L).toDF("doc_id")
    val pngs = Multimodal.synthesizeMirrorPngs(ids)
    val canon = Multimodal.imageDhashMirrorInvariant(pngs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every family's two variants share the canonical signature
    (0L until 10L).foreach { f =>
      assert(canon(2 * f) === canon(2 * f + 1), s"family $f")
    }
    // distinct families don't merge on this fixture
    assert(canon.values.toSet.size === 10)
    // and the PLAIN dHash misses every flip pair (the invariance is load-bearing)
    val plain = Multimodal.imageDhash(pngs, gridW = 8, gridH = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 10L).foreach { f =>
      assert(plain(2 * f) !== plain(2 * f + 1), s"family $f paired without invariance")
    }
  }

  test("orientation dedup: all four variants share the canonical; families distinct") {
    val ids = (0L until 24L).toDF("doc_id") // 6 families of 4
    val canon = Multimodal.imageDhashOrientationInvariant(
      Multimodal.synthesizeOrientedPngs(ids))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 6L).foreach { f =>
      val cs = (0 until 4).map(v => canon(4 * f + v)).toSet
      assert(cs.size === 1, s"family $f variants diverge: $cs")
    }
    assert(canon.values.toSet.size === 6)
  }

  test("vadSegments: hand-built silence splits into alternating labeled segments") {
    // 400 samples: 100 voiced (1000), 200 silent, 100 voiced → windows
    // at win=100: voice, silence, silence, voice
    val bb = java.nio.ByteBuffer.allocate(800)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 400).foreach { i =>
      bb.putShort(if (i < 100 || i >= 300) 1000.toShort else 0.toShort)
    }
    val pcm = Seq((1L, bb.array())).toDF("doc_id", "payload")
    val segs = Multimodal.vadSegments(pcm)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._2)
    assert(segs.toSeq === Seq(
      (1L, 0L, 1L, 100L * 1000000L),
      (0L, 1L, 2L, 0L),
      (1L, 3L, 1L, 100L * 1000000L)))
  }

  test("synthesizeSpeechPcm: silent blocks are true zeros, voiced carry the triangle") {
    val pcm = Multimodal.synthesizeSpeechPcm(Seq(4L).toDF("doc_id"))
      .head().getAs[Array[Byte]](1)
    val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(pcm.length === 2 * 2000) // (4 % 5 + 1) * 400 samples
    (0 until 2000).foreach { i =>
      val expected =
        if (((i + 4 * 50) / 200) % 2 == 0) math.abs((i * 7 + 4) % 200 - 100) * 300
        else 0
      assert(bb.getShort(i * 2) === expected.toShort, s"sample $i")
    }
  }

  test("shotBoundaries: cuts where the hash jumps, per-video lag, threshold inclusive") {
    // hand-built hashes: doc 1 static then one 10-bit jump; doc 2 all static
    val fh = Seq(
      (1L, 0L, 7L), (1L, 1L, 7L), (1L, 2L, 1023L ^ 7L), (1L, 3L, 1023L ^ 7L),
      (2L, 0L, 5L), (2L, 1L, 5L)
    ).toDF("doc_id", "frame_idx", "dhash")
    val cuts = Multimodal.shotBoundaries(fh)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(cuts.toSeq === Seq((1L, 2L, 10L))) // bit_count(1023) = 10, inclusive
  }

  test("shot videos: synthesized cuts land exactly at shot-length multiples") {
    val ids = Seq(5L, 6L).toDF("doc_id") // nf = 10 and 6 → shots 3,3,3,1 and 3,3
    val fh = Multimodal.frameDhash(Multimodal.videoFrames(
      Multimodal.synthesizeShotVideos(ids)))
    assert(fh.count() === 16) // 10 + 6 frames demuxed
    val cuts = Multimodal.shotBoundaries(fh)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(cuts(5L) === Seq(3L, 6L, 9L))
    assert(cuts(6L) === Seq(3L))
  }
}
