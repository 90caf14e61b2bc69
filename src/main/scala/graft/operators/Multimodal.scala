package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads modeled as opaque
  * `binary` columns with typed metadata, processed in partition-sized batches.
  *
  * The actual codec step is STUBBED ([[FakeCodec]] — this container has no
  * image/audio libraries); everything Spark-side is real: the schema
  * contract, the `mapPartitions` batch shape (one codec instance per
  * partition, streamed row iterator — exactly how a JNI/FFI decoder would be
  * driven at scale), and the partitioning behavior (per-row work, no
  * shuffle).
  */
object Multimodal {

  /** Cheap per-payload metadata — pure Catalyst expressions, no decode. */
  def metadata(df: DataFrame): DataFrame =
    df.select(
      col("doc_id"),
      length(col("payload")).cast("long").as("byte_len"),
      md5(col("payload")).as("content_md5"),
      (floor(length(col("payload")).cast("long") / 256) + 1).cast("long").as("n_frames"))

  /** The decode seam. A real implementation would wrap an image/audio codec
    * (initialized once per partition); the fake is deterministic so tests
    * can assert on it. */
  trait Codec extends Serializable {
    /** payload → (width, height, channels, meanIntensity) */
    def decode(payload: Array[Byte]): (Int, Int, Int, Double)
  }

  /** Deterministic stand-in codec for fixtures whose payloads are arbitrary
    * bytes (the synthetic `documents` fixture) — keeps the oracle path
    * engine-portable. For genuinely encoded payloads use [[ImageIoCodec]]. */
  object FakeCodec extends Codec {
    def decode(payload: Array[Byte]): (Int, Int, Int, Double) = {
      val n = payload.length
      val mean = if (n == 0) 0.0 else payload.map(b => (b & 0xff).toDouble).sum / n
      (n % 640 + 1, n % 480 + 1, 3, mean)
    }
  }

  /** Real image codec on the same seam — `javax.imageio` decodes PNG, BMP,
    * GIF and JPEG with zero external dependencies. mean_intensity is the
    * mean of all raster samples (every pixel, every band, 0–255), computed
    * on the decoded raster, so it is codec-deterministic for lossless
    * formats. Throws on undecodable payloads — a corrupt image in a real
    * pipeline should surface per-row, not silently produce features. */
  object ImageIoCodec extends Codec {
    // ImageIO defaults to a DISK-backed stream cache — every read/write
    // round-trips a temp file, which dominates decode time for small
    // images. Byte-array payloads never need it; memory-only is both
    // faster and container-friendly (no /tmp churn). Set once per JVM at
    // first codec touch (object init runs on each executor).
    javax.imageio.ImageIO.setUseCache(false)

    def decode(payload: Array[Byte]): (Int, Int, Int, Double) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, s"payload (${payload.length} bytes) is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      val raster = img.getRaster
      val c = raster.getNumBands
      var sum = 0.0d
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < c) { sum += raster.getSample(x, y, b); b += 1 }
          x += 1
        }
        y += 1
      }
      (w, h, c, sum / (w.toLong * h * c))
    }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("mean_intensity", DoubleType)))

  /** Feature extraction over (doc_id, payload) rows: one codec per
    * partition, rows streamed through it — the batch shape a real
    * decoder (or a `mapInPandas` UDF in the PySpark twin) would use. */
  def extractFeatures(df: DataFrame, codec: Codec = FakeCodec): DataFrame = {
    val spark = df.sparkSession
    val rows: Dataset[Row] = df.select(col("doc_id").cast("long"), col("payload"))
    val encoder = org.apache.spark.sql.Encoders.row(featureSchema)
    rows.mapPartitions { it =>
      // per-partition codec init happens here (stub has none)
      it.map { r =>
        val (w, h, c, m) = codec.decode(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), w, h, c, m)
      }
    }(encoder)
  }

  /** Resize plumbing: payload → fixed-size payload. The real implementation
    * is an image codec's scaler; the stub is deterministic linear
    * stretch-sampling (index i reads in[i·len/target], shrinking or
    * stretching as needed) so tests can assert exact output. NULL payloads
    * stay NULL. Runs in the same mapPartitions batch shape as
    * [[extractFeatures]]. */
  def resize(df: DataFrame, targetBytes: Int): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.select(col("doc_id").cast("long"), col("payload")).mapPartitions { it =>
      it.map { r =>
        if (r.isNullAt(1)) Row(r.getLong(0), null)
        else {
          val in = r.getAs[Array[Byte]](1)
          val out = new Array[Byte](targetBytes)
          if (in.nonEmpty) {
            var i = 0
            while (i < targetBytes) {
              out(i) = in((i.toLong * in.length / targetBytes).toInt)
              i += 1
            }
          }
          Row(r.getLong(0), out)
        }
      }
    }(encoder)
  }

  /** Deterministic real-PNG synthesis: one solid-gray PNG per input row,
    * dimensions and intensity derived from doc_id (width = id%16+1,
    * height = id%8+1, gray = id%256). Exists so the driver's correctness
    * gate can verify the REAL codec end-to-end: a SQL oracle that never
    * decodes anything predicts [[ImageIoCodec]]'s (width, height,
    * channels, mean) analytically. Same mapPartitions batch shape as the
    * decode side. */
  def synthesizePngs(ids: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col("doc_id").cast("long")).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // memory-only streams (see ImageIoCodec)
      it.map { r =>
        val id = r.getLong(0)
        val w = (id % 16).toInt + 1
        val h = (id % 8).toInt + 1
        val g = (id % 256).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (g << 16) | (g << 8) | g
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, bos.toByteArray)
      }
    }(encoder)
  }

  /** Real image resize on the [[resize]] seam: decode via `javax.imageio`,
    * scale with an area-averaging AWT filter, re-encode as PNG. Same
    * mapPartitions batch shape (per-row work, no shuffle); NULL payloads
    * stay NULL. Output payloads are valid PNGs of exactly
    * (targetW × targetH) — round-trippable through [[ImageIoCodec]]. */
  def resizeImages(df: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0, s"target dims must be positive, got ${targetW}x$targetH")
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.select(col("doc_id").cast("long"), col("payload")).mapPartitions { it =>
      it.map { r =>
        if (r.isNullAt(1)) Row(r.getLong(0), null)
        else {
          val in = r.getAs[Array[Byte]](1)
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(in))
          require(img != null, s"payload (${in.length} bytes) is not a decodable image")
          val scaled = img.getScaledInstance(
            targetW, targetH, java.awt.Image.SCALE_AREA_AVERAGING)
          val out = new java.awt.image.BufferedImage(
            targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.drawImage(scaled, 0, 0, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Row(r.getLong(0), bos.toByteArray)
        }
      }
    }(encoder)
  }

  /** Deterministic real-PNG synthesis with PLANTED NEAR-DUP structure —
    * the image-dedup fixture generator. Each doc_id becomes an 18×16 gray
    * PNG laid out as a 9×8 grid of 2×2 uniform blocks; the block values are
    * an analytic squared-then-mod formula of (doc_id div 4, gx, gy), so the
    * four doc_ids of a quad share one base pattern, and variants t=1..3
    * each perturb ONE distinct cell. A perturbed cell changes at most its
    * two adjacent [[imageDhash]] comparisons, so within-quad Hamming
    * distance is ≤ 2 vs the base and ≤ 4 pairwise — while different bases
    * are unrelated pseudo-random grids. A SQL oracle that never touches
    * binary replays the cell formula and predicts every dHash bit.
    *
    * Squared-then-mod mixing (not a linear fold) keeps neighboring bases'
    * grids uncorrelated — the [[graft.functions.TextHash.sampleKey]]
    * lattice lesson applied to pixels. */
  def synthesizePatternPngs(ids: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col("doc_id").cast("long")).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // memory-only streams (see ImageIoCodec)
      it.map { r =>
        val id = r.getLong(0)
        val img = new java.awt.image.BufferedImage(
          18, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var gy = 0
        while (gy < 8) {
          var gx = 0
          while (gx < 9) {
            val g = patternCell(id, gx, gy)
            val rgb = (g << 16) | (g << 8) | g
            img.setRGB(gx * 2, gy * 2, rgb); img.setRGB(gx * 2 + 1, gy * 2, rgb)
            img.setRGB(gx * 2, gy * 2 + 1, rgb); img.setRGB(gx * 2 + 1, gy * 2 + 1, rgb)
            gx += 1
          }
          gy += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, bos.toByteArray)
      }
    }(encoder)
  }

  /** The analytic cell formula behind [[synthesizePatternPngs]] — single
    * source for the synthesizer and its spec/oracle replays. */
  def patternCell(id: Long, gx: Int, gy: Int): Int = {
    val base = id / 4
    val variant = (id % 4).toInt
    val u = base * 53L + gx * 17L + gy * 29L + 11L
    val v0 = ((u * u) % 241L).toInt
    if (variant > 0 && gx == 2 * variant && gy == 2 * variant - 1) (v0 + 120) % 241
    else v0
  }

  /** Perceptual dHash over image payloads — the signature a LAION-style
    * image near-dup pipeline computes per image: decode, reduce to a
    * (gridW+1)×gridH grid of cell intensity sums, emit bit (x,y) = 1 iff
    * cell (x+1,y) is brighter than cell (x,y) (row-major, bit y·gridW+x).
    * Gradient comparisons survive brightness/contrast shifts, which is why
    * dHash (not a cryptographic hash) is the image-dedup workhorse.
    *
    * Integer-exact and engine-portable: cells compare via cross-multiplied
    * integer SUMS (`sum_b·n_a > sum_a·n_b`), never averaged doubles, so an
    * oracle replaying cell values analytically predicts every bit. Cell
    * (x,y) covers pixel columns [x·w/(gridW+1), (x+1)·w/(gridW+1)) × rows
    * [y·h/gridH, (y+1)·h/gridH) over ALL raster bands — when the image is
    * an exact multiple of the grid (the synthesis fixtures), cells are
    * equal-sized uniform blocks and the comparison reduces to the block
    * values themselves. Same [[Codec]]-seam shape as [[extractFeatures]]:
    * per-row decode in `mapPartitions`, no shuffle; the 8-byte signatures
    * then feed [[graft.operators.Dedup.hammingPairs]] banding. Default
    * 8×8 grid → 64-bit signature (bit 63 may set the sign; Hamming
    * arithmetic is sign-agnostic). */
  def imageDhash(df: DataFrame, gridW: Int = 8, gridH: Int = 8): DataFrame = {
    require(gridW >= 1 && gridH >= 1 && gridW.toLong * gridH <= 64,
      s"dHash grid ${gridW}x$gridH must fit 64 bits")
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("dhash", LongType)))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.select(col("doc_id").cast("long"), col("payload")).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val in = r.getAs[Array[Byte]](1)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(in))
        require(img != null, s"payload (${in.length} bytes) is not a decodable image")
        Row(r.getLong(0), dhashOf(img, gridW, gridH))
      }
    }(encoder)
  }

  /** Shared per-image dHash kernel over a decoded raster — bit (x,y) = 1
    * iff grid cell (x+1,y) is brighter than cell (x,y), via exact integer
    * cross-multiplied sums (see [[imageDhash]] for the full contract).
    * Single source for the whole-image and per-frame signature paths. */
  private def dhashOf(img: java.awt.image.BufferedImage,
      gridW: Int, gridH: Int): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    val bands = raster.getNumBands
    val cols = gridW + 1
    require(w >= cols && h >= gridH, s"image ${w}x$h smaller than dHash grid")
    val sums = Array.ofDim[Long](cols, gridH)
    val counts = Array.ofDim[Long](cols, gridH)
    var y = 0
    while (y < h) {
      val gy = (y.toLong * gridH / h).toInt
      var x = 0
      while (x < w) {
        val gx = (x.toLong * cols / w).toInt
        var s = 0L
        var b = 0
        while (b < bands) { s += raster.getSample(x, y, b); b += 1 }
        sums(gx)(gy) += s
        counts(gx)(gy) += bands
        x += 1
      }
      y += 1
    }
    var sig = 0L
    var gy = 0
    while (gy < gridH) {
      var gx = 0
      while (gx < gridW) {
        if (sums(gx + 1)(gy) * counts(gx)(gy) > sums(gx)(gy) * counts(gx + 1)(gy))
          sig |= 1L << (gy * gridW + gx)
        gx += 1
      }
      gy += 1
    }
    sig
  }

  /** Mirror-pair image synthesis — the horizontal-flip near-dup fixture
    * (flipped re-uploads are the classic dedup evader: every byte AND the
    * plain dHash change, the content doesn't). Families of two share one
    * 9×7 analytic grid ([[videoCell]] at frame 0 — the sign-safe 56-bit
    * raster shape): variant 0 is the base 18×14 PNG, variant 1 the
    * horizontally flipped raster (cell gx ← 8−gx). */
  def synthesizeMirrorPngs(ids: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col("doc_id").cast("long")).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val family = id / 2
        val flipped = id % 2 == 1
        val img = new java.awt.image.BufferedImage(
          18, 14, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var gy = 0
        while (gy < 7) {
          var gx = 0
          while (gx < 9) {
            val src = if (flipped) 8 - gx else gx
            val g = videoCell(family, 0, src, gy)
            val rgb = (g << 16) | (g << 8) | g
            img.setRGB(gx * 2, gy * 2, rgb); img.setRGB(gx * 2 + 1, gy * 2, rgb)
            img.setRGB(gx * 2, gy * 2 + 1, rgb); img.setRGB(gx * 2 + 1, gy * 2 + 1, rgb)
            gx += 1
          }
          gy += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, bos.toByteArray)
      }
    }(encoder)
  }

  /** Mirror-invariant perceptual signature: the MIN of the dHash over both
    * horizontal orientations — flip-invariant by construction (flipping
    * the image permutes the same two-hash set), so a flipped re-upload
    * lands in the same dedup bucket while the plain [[imageDhash]] misses
    * it (spec-pinned both ways). One decode per row; the flip is a pixel
    * copy, not a re-decode. Default 8×7 grid keeps the packed hash off
    * the sign bit (the m9 rule), so MIN compares identically as SQL
    * BIGINT `least`. Output: (doc_id, canon). */
  def imageDhashMirrorInvariant(df: DataFrame, gridW: Int = 8, gridH: Int = 7): DataFrame = {
    require(gridW >= 1 && gridH >= 1 && gridW.toLong * gridH <= 63,
      s"mirror-invariant dHash grid ${gridW}x$gridH must stay off the sign bit")
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("canon", LongType)))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.select(col("doc_id").cast("long"), col("payload")).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val in = r.getAs[Array[Byte]](1)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(in))
        require(img != null, s"payload (${in.length} bytes) is not a decodable image")
        val w = img.getWidth; val h = img.getHeight
        // TYPE_INT_RGB explicitly: a PNG decode can surface TYPE_CUSTOM
        // (0), which the BufferedImage constructor rejects
        val flip = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { flip.setRGB(w - 1 - x, y, img.getRGB(x, y)); x += 1 }
          y += 1
        }
        Row(r.getLong(0), math.min(dhashOf(img, gridW, gridH), dhashOf(flip, gridW, gridH)))
      }
    }(encoder)
  }

  /** [[synthesizeMirrorPngs]] extended to the axis-aligned orientation
    * group: families of FOUR share one grid — variant 0 base, 1 hflip
    * (gx ← 8−gx), 2 vflip (gy ← 6−gy), 3 the 180° rotation (both). */
  def synthesizeOrientedPngs(ids: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col("doc_id").cast("long")).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val family = id / 4
        val variant = (id % 4).toInt
        val img = new java.awt.image.BufferedImage(
          18, 14, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var gy = 0
        while (gy < 7) {
          var gx = 0
          while (gx < 9) {
            val sx = if (variant == 1 || variant == 3) 8 - gx else gx
            val sy = if (variant == 2 || variant == 3) 6 - gy else gy
            val g = videoCell(family, 1, sx, sy)
            val rgb = (g << 16) | (g << 8) | g
            img.setRGB(gx * 2, gy * 2, rgb); img.setRGB(gx * 2 + 1, gy * 2, rgb)
            img.setRGB(gx * 2, gy * 2 + 1, rgb); img.setRGB(gx * 2 + 1, gy * 2 + 1, rgb)
            gx += 1
          }
          gy += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, bos.toByteArray)
      }
    }(encoder)
  }

  /** [[imageDhashMirrorInvariant]] extended to the full axis-aligned
    * orientation group {identity, hflip, vflip, 180°}: canonical = MIN of
    * the dHash over all four — any of the four re-uploads of an image
    * lands on the same signature (the group is closed, so transforming
    * the input permutes the same four-hash set). One decode, three pixel
    * copies. Output: (doc_id, canon). */
  def imageDhashOrientationInvariant(df: DataFrame, gridW: Int = 8,
      gridH: Int = 7): DataFrame = {
    require(gridW >= 1 && gridH >= 1 && gridW.toLong * gridH <= 63,
      s"orientation-invariant dHash grid ${gridW}x$gridH must stay off the sign bit")
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("canon", LongType)))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.select(col("doc_id").cast("long"), col("payload")).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val in = r.getAs[Array[Byte]](1)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(in))
        require(img != null, s"payload (${in.length} bytes) is not a decodable image")
        val w = img.getWidth; val h = img.getHeight
        def transformed(fx: Boolean, fy: Boolean) = {
          val t = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              t.setRGB(if (fx) w - 1 - x else x, if (fy) h - 1 - y else y,
                img.getRGB(x, y))
              x += 1
            }
            y += 1
          }
          t
        }
        val canon = Seq((false, false), (true, false), (false, true), (true, true))
          .map { case (fx, fy) => dhashOf(transformed(fx, fy), gridW, gridH) }
          .min
        Row(r.getLong(0), canon)
      }
    }(encoder)
  }

  /** The analytic frame-cell formula behind [[synthesizeVideos]] — single
    * source for the synthesizer and its spec/oracle replays. `family` is
    * the shared-content group (doc_id div 3), `ci` the CONTENT frame index
    * (variant trims shift position but keep content indices). Squared-
    * then-mod mixing for uncorrelated grids (the [[patternCell]] lesson). */
  def videoCell(family: Long, ci: Int, gx: Int, gy: Int): Int = {
    // u is INJECTIVE over (family, ci, gx, gy): the cell offset
    // gx·17 + gy·29 + 13 ≤ 340 < 8209, and (family·10 + ci) is unique for
    // ci < 10 — so no two distinct frames share a pre-square value, and
    // the squared-then-mod mix decorrelates them completely. Two earlier
    // forms failed measurably: u² mod 241 directly collapses the frame-
    // hash space to 241 values (13 of 27 gate clusters falsely merged),
    // and a non-injective u with a wide modulus resurrects the lattice at
    // scale (131Δf + 41Δci ≡ 0 mod 1000003 has solutions within a 10k-
    // family probe corpus — 30 spurious full-length runs at 30k videos).
    // Overflow bound: u² must fit a long → u ≤ ⌊√Long.Max⌋ ≈ 3.037·10⁹,
    // and u ≈ family·82,090, so family < 3.6·10⁴ (with margin; any fixture
    // or probe corpus; a require keeps the failure loud — a silent wrap
    // would go negative through % and destroy the injectivity the formula
    // exists for, while the DuckDB oracle twin errors on BIGINT overflow
    // instead of wrapping).
    require(family >= 0 && family < 36000L,
      s"videoCell family $family outside the injective-square range")
    val u = (family * 10L + ci) * 8209L + gx * 17L + gy * 29L + 13L
    (((u * u) % 1000003L) % 241L).toInt
  }

  /** Frame count for a video family: 6/8/10 frames by family mod 3 — three
    * duration classes so run lengths differ across the fixture. */
  def videoFrameCount(family: Long): Int = 6 + (family % 3).toInt * 2

  /** Deterministic multi-frame video synthesis with PLANTED near-dup
    * structure — the video-dedup fixture generator (the
    * [[synthesizePatternPngs]] pattern extended to a frame SEQUENCE).
    * Container format: 4-byte big-endian frame count, then per frame a
    * 4-byte big-endian length + the encoded image bytes (the length-framed
    * layout any real demuxer emits).
    *
    * Each doc_id belongs to a family of three (family = doc_id div 3,
    * variant = doc_id mod 3) sharing one analytic content sequence
    * ([[videoCell]]; `nf` = [[videoFrameCount]] frames, each an 18×14 gray
    * image of 2×2 uniform blocks on a 9×7 grid):
    *  - variant 0: the base cut, frames 0..nf−1, PNG-encoded;
    *  - variant 1: a RE-ENCODED copy — identical rasters, BMP-encoded
    *    (genuinely different bytes through a different codec; a
    *    byte-hash dedup can never pair it, a perceptual one must);
    *  - variant 2: a TRIMMED cut — frames 2..nf−1 re-indexed from 0 (the
    *    leading-credits trim; pairs only through offset-tolerant temporal
    *    alignment, diff = −2).
    * Different families are unrelated pseudo-random grids. A SQL oracle
    * replays [[videoCell]] per (family, ci) and predicts every per-frame
    * dHash bit without touching binary. */
  def synthesizeVideos(ids: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col("doc_id").cast("long")).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // memory-only streams (see ImageIoCodec)
      it.map { r =>
        val id = r.getLong(0)
        val family = id / 3
        val variant = (id % 3).toInt
        val nf = videoFrameCount(family)
        val cis = if (variant == 2) 2 until nf else 0 until nf
        val format = if (variant == 1) "bmp" else "png"
        val frames = cis.map { ci =>
          val img = new java.awt.image.BufferedImage(
            18, 14, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var gy = 0
          while (gy < 7) {
            var gx = 0
            while (gx < 9) {
              val g = videoCell(family, ci, gx, gy)
              val rgb = (g << 16) | (g << 8) | g
              img.setRGB(gx * 2, gy * 2, rgb); img.setRGB(gx * 2 + 1, gy * 2, rgb)
              img.setRGB(gx * 2, gy * 2 + 1, rgb); img.setRGB(gx * 2 + 1, gy * 2 + 1, rgb)
              gx += 1
            }
            gy += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, format, bos)
          bos.toByteArray
        }
        val total = 4 + frames.map(4 + _.length).sum
        val bb = java.nio.ByteBuffer.allocate(total)
          .order(java.nio.ByteOrder.BIG_ENDIAN)
        bb.putInt(frames.size)
        frames.foreach { f => bb.putInt(f.length); bb.put(f) }
        Row(id, bb.array())
      }
    }(encoder)
  }

  /** Demux the [[synthesizeVideos]] container into per-frame rows:
    * (doc_id, frame_idx, frame_bytes). Same codec-seam shape as
    * [[extractFeatures]] — per-row parse in `mapPartitions`, no shuffle;
    * the frame fan-out is bounded by the container's own frame count.
    * Malformed containers (truncated lengths, trailing bytes) throw
    * per-row — corrupt media must surface, not silently drop frames. */
  def videoFrames(df: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", LongType),
      StructField("frame_bytes", BinaryType)))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.select(col("doc_id").cast("long"), col("payload")).mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.BIG_ENDIAN)
        require(bb.remaining >= 4, s"video $id: truncated container header")
        val n = bb.getInt
        val out = (0 until n).iterator.map { i =>
          require(bb.remaining >= 4, s"video $id: truncated frame $i length")
          val len = bb.getInt
          require(len >= 0 && bb.remaining >= len,
            s"video $id: frame $i claims $len bytes, ${bb.remaining} left")
          val f = new Array[Byte](len)
          bb.get(f)
          Row(id, i.toLong, f)
        }.toVector
        require(!bb.hasRemaining,
          s"video $id: ${bb.remaining} trailing bytes after $n frames")
        out.iterator
      }
    }(encoder)
  }

  /** Per-frame perceptual dHash over demuxed (doc_id, frame_idx,
    * frame_bytes) rows — [[imageDhash]]'s signature applied frame-wise, the
    * per-frame evidence a video near-dup pipeline aligns temporally
    * ([[graft.operators.Dedup.frameAlignedRuns]]). Default 8×7 grid → a
    * 56-bit signature that never sets the sign bit, so the SQL oracle can
    * pack the same bits with plain shifts. Output: (doc_id, frame_idx,
    * dhash). */
  def frameDhash(df: DataFrame, gridW: Int = 8, gridH: Int = 7): DataFrame = {
    require(gridW >= 1 && gridH >= 1 && gridW.toLong * gridH <= 64,
      s"dHash grid ${gridW}x$gridH must fit 64 bits")
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", LongType),
      StructField("dhash", LongType)))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.select(col("doc_id").cast("long"), col("frame_idx").cast("long"),
        col("frame_bytes")).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val in = r.getAs[Array[Byte]](2)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(in))
        require(img != null, s"frame (${in.length} bytes) is not a decodable image")
        Row(r.getLong(0), r.getLong(1), dhashOf(img, gridW, gridH))
      }
    }(encoder)
  }

  /** Deterministic SHOT-structured video synthesis — the shot-boundary
    * fixture: like [[synthesizeVideos]] (same length-framed container,
    * same 18×14 PNG frames of [[videoCell]] blocks) but frames within one
    * `shotLen`-frame shot are byte-identical (content index = frame div
    * shotLen — a static shot), so the sequence has real cut structure: a
    * cut is exactly where the shot index changes. Each doc is its own
    * video (family = doc_id); [[videoFrameCount]] keeps the three duration
    * classes, so the last shot can be partial. */
  def synthesizeShotVideos(ids: DataFrame, shotLen: Int = 3): DataFrame = {
    require(shotLen >= 1, s"shotLen must be positive, got $shotLen")
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col("doc_id").cast("long")).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val nf = videoFrameCount(id)
        val frames = (0 until nf).map { fi =>
          val si = fi / shotLen
          val img = new java.awt.image.BufferedImage(
            18, 14, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var gy = 0
          while (gy < 7) {
            var gx = 0
            while (gx < 9) {
              val g = videoCell(id, si, gx, gy)
              val rgb = (g << 16) | (g << 8) | g
              img.setRGB(gx * 2, gy * 2, rgb); img.setRGB(gx * 2 + 1, gy * 2, rgb)
              img.setRGB(gx * 2, gy * 2 + 1, rgb); img.setRGB(gx * 2 + 1, gy * 2 + 1, rgb)
              gx += 1
            }
            gy += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          bos.toByteArray
        }
        val total = 4 + frames.map(4 + _.length).sum
        val bb = java.nio.ByteBuffer.allocate(total)
          .order(java.nio.ByteOrder.BIG_ENDIAN)
        bb.putInt(frames.size)
        frames.foreach { f => bb.putInt(f.length); bb.put(f) }
        Row(id, bb.array())
      }
    }(encoder)
  }

  /** Shot-boundary (cut) detection over per-frame perceptual hashes — the
    * shot segmentation every video-curation pipeline runs before keyframe
    * selection: a cut is a consecutive-frame pair whose dHash Hamming
    * distance reaches `minHamming` (within a shot the signature is stable;
    * across a cut the grid re-randomizes). Input is [[frameDhash]]'s
    * (doc_id, frame_idx, dhash); output one row per detected cut:
    * (doc_id, cut_pos = first frame of the new shot, hamming).
    *
    * Scale shape: one per-video window (`lag` under the frame_idx total
    * order — videos are independent, skew bounded by frames-per-video)
    * and a codegen `bit_count(xor)` per consecutive pair; no joins, no
    * second pass. Composes upstream of [[graft.operators.Dedup]]'s
    * alignment (dedup whole videos) — this op instead SEGMENTS within a
    * video. */
  def shotBoundaries(frameHashes: DataFrame, minHamming: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frameHashes
      .select(col("doc_id"), col("frame_idx"), col("dhash"))
      .withColumn("__prev", lag(col("dhash"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .withColumn("hamming", expr("bit_count(dhash ^ __prev)").cast("long"))
      .filter(col("hamming") >= minHamming)
      .select(col("doc_id"), col("frame_idx").as("cut_pos"), col("hamming"))
  }

  /** Deterministic frame sampling: every `stride`-th 256-byte block of the
    * payload becomes a "frame" row — the video-sampling plumbing with the
    * decode stubbed to a slice. */
  def sampleFrames(df: DataFrame, stride: Int = 4): DataFrame = {
    // A zero-length payload has NO frames (the guard matters: without it
    // the -1/256 floor clamps to block 0 and emits one empty frame).
    val blocks =
      when(length(col("payload")) > 0,
        sequence(lit(0), floor((length(col("payload")) - 1) / 256).cast("int")))
        .otherwise(array().cast("array<int>"))
    df.select(
      col("doc_id"),
      posexplode(
        filter(
          transform(
            blocks,
            i => when(i % stride === 0, substring(col("payload"), i * lit(256) + 1, lit(256))))
          , x => x.isNotNull)).as(Seq("frame_idx", "frame_bytes")))
  }

  /** Synthesize PCM16LE audio payloads from ids: a doc-seeded integer
    * triangle wave, `(doc_id % 5 + 1)·400` samples, sample i =
    * `(|((i·7 + doc_id) mod 200) − 100|) · 300` (≤ 30000, int16-safe) —
    * deterministic bytes whose analytic form the oracle can replay without
    * touching binary. The audio sibling of [[synthesizePngs]]. */
  def synthesizePcm(ids: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col("doc_id").cast("long")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val n = ((id % 5) + 1).toInt * 400
        val bb = java.nio.ByteBuffer.allocate(n * 2)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var i = 0L
        while (i < n) {
          val s = (math.abs((i * 7L + id) % 200L - 100L) * 300L).toShort
          bb.putShort(s)
          i += 1L
        }
        Row(id, bb.array())
      }
    }(encoder)
  }

  /** [[synthesizePcm]] with SPEECH structure — alternating voiced/silent
    * stretches (200-sample blocks, phase-shifted per doc by 50·doc_id so
    * block edges straddle analysis windows differently across the corpus):
    * voiced samples carry the m4 triangle wave, silent blocks are true
    * zeros. The VAD fixture: [[synthesizePcm]]'s tone never goes quiet, so
    * a silence detector over it is vacuous. */
  def synthesizeSpeechPcm(ids: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col("doc_id").cast("long")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val n = ((id % 5) + 1).toInt * 400
        val bb = java.nio.ByteBuffer.allocate(n * 2)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var i = 0L
        while (i < n) {
          val voiced = ((i + id * 50L) / 200L) % 2L == 0L
          val s = if (voiced)
            (math.abs((i * 7L + id) % 200L - 100L) * 300L).toShort
          else 0.toShort
          bb.putShort(s)
          i += 1L
        }
        Row(id, bb.array())
      }
    }(encoder)
  }

  /** Voice-activity segmentation (VAD) — the silence-split every
    * speech-data pipeline runs before transcription/chunking: windowed
    * Σs² energies ([[audioEnergy]]) labeled voice/silence by an integer
    * energy floor, consecutive same-label windows collapsed into segments
    * by the gaps-and-islands key (win_idx − row_number per (doc, label) —
    * the t28/m9 island move on the time axis). Output one row per
    * segment: (doc_id, is_voice, start_win, n_windows, energy_total).
    *
    * Scale shape: the codec seam emits window rows (no shuffle), then one
    * per-(doc, label) window sort and one segment aggregate — clips are
    * independent, skew bounded by windows-per-clip. All-BIGINT. */
  def vadSegments(pcm: DataFrame, win: Int = 100, minEnergy: Long = 1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = audioEnergy(pcm, win)
      .withColumn("is_voice", (col("energy") >= minEnergy).cast("long"))
    val w = Window.partitionBy(col("doc_id"), col("is_voice"))
      .orderBy(col("win_idx"))
    e.withColumn("__isle", col("win_idx") - row_number().over(w))
      .groupBy(col("doc_id"), col("is_voice"), col("__isle"))
      .agg(min(col("win_idx")).as("start_win"),
        count(lit(1)).as("n_windows"),
        sum(col("energy")).as("energy_total"))
      .select(col("doc_id"), col("is_voice"), col("start_win"),
        col("n_windows"), col("energy_total"))
  }

  /** Temporal audio fingerprint over PCM16LE payloads — the energy-contour
    * signature an audio-dedup pipeline banding step consumes (the coarse
    * Shazam/chromaprint idea with the spectral axis stubbed to total
    * energy, matching this container's no-codec constraint): decode int16
    * samples, integer window energies Σs² per `win` samples, then bit w =
    * 1 iff energy(w+1) > energy(w) — [[imageDhash]]'s gradient trick on
    * the time axis, so the signature is GAIN-INVARIANT (uniform amplitude
    * scaling preserves every comparison; spec-pinned). Up to 63
    * comparisons pack into one 64-bit long; shorter clips leave high bits
    * 0, so callers should pair within a duration class (`n_windows` is
    * emitted for exactly that prefilter). The 8-byte signatures feed
    * [[graft.operators.Dedup.hammingPairs]] exactly like the image path.
    * Output: (doc_id, sig, n_windows). */
  def audioFingerprint(df: DataFrame, win: Int = 50): DataFrame = {
    require(win > 0)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("sig", LongType),
      StructField("n_windows", LongType)))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.select(col("doc_id").cast("long"), col("payload")).mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val nSamples = bytes.length / 2
        val nWin = (nSamples + win - 1) / win
        val energies = new Array[Long](nWin)
        var w = 0
        while (w < nWin) {
          val from = w * win
          val until = math.min(from + win, nSamples)
          var e = 0L
          var i = from
          while (i < until) { val s = bb.getShort(i * 2).toLong; e += s * s; i += 1 }
          energies(w) = e
          w += 1
        }
        var sig = 0L
        var b = 0
        while (b < math.min(nWin - 1, 63)) {
          if (energies(b + 1) > energies(b)) sig |= 1L << b
          b += 1
        }
        Row(r.getLong(0), sig, nWin.toLong)
      }
    }(encoder)
  }

  /** Windowed audio energy over PCM16LE payloads — the VAD / silence-
    * detection primitive: decode int16 samples, emit per (doc, window of
    * `win` samples) the BIGINT Σ s² (energy·win; kept as the exact integer
    * sum rather than an RMS double). Same [[Codec]]-seam shape: binary
    * decode in `mapPartitions`, per-row work, no shuffle — at scale the
    * window rows feed ordinary relational ops (thresholds, silence trims,
    * segment joins). Trailing partial windows are emitted with their true
    * `n_samples` (callers filter or rescale; dropping them silently would
    * hide audio tails). */
  def audioEnergy(df: DataFrame, win: Int = 400): DataFrame = {
    require(win > 0)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("win_idx", LongType),
      StructField("n_samples", LongType),
      StructField("energy", LongType)))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.select(col("doc_id").cast("long"), col("payload")).mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val nSamples = bytes.length / 2
        (0 until (nSamples + win - 1) / win).iterator.map { w =>
          val from = w * win
          val until = math.min(from + win, nSamples)
          var e = 0L
          var i = from
          while (i < until) {
            val s = bb.getShort(i * 2).toLong
            e += s * s
            i += 1
          }
          Row(id, w.toLong, (until - from).toLong, e)
        }
      }
    }(encoder)
  }

  /** Per-grid-row intensity profile from REAL decoded payloads — the
    * image-tower half of the CLIP-shape alignment check: decode on the
    * codec seam (per-row `mapPartitions`, no shuffle), reduce the raster
    * to `gridH` BIGINT row sums of per-cell mean intensities. Cell means
    * use integer division — exact on uniform cells (the synthesis
    * fixtures, where each cell is a constant block so the profile equals
    * the analytic [[patternCell]] row sum bit-for-bit); real photos
    * truncate sub-unit remainders, which cosine-style scoring absorbs.
    * Output: (doc_id, profile array<bigint> of length gridH). */
  def imageRowProfile(df: DataFrame, gridW: Int = 9, gridH: Int = 8): DataFrame = {
    require(gridW >= 1 && gridH >= 1, s"grid ${gridW}x$gridH invalid")
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("profile", ArrayType(LongType, containsNull = false))))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.select(col("doc_id").cast("long"), col("payload")).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val in = r.getAs[Array[Byte]](1)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(in))
        require(img != null, s"payload (${in.length} bytes) is not a decodable image")
        val w = img.getWidth
        val h = img.getHeight
        require(w >= gridW && h >= gridH, s"image ${w}x$h smaller than ${gridW}x$gridH grid")
        val raster = img.getRaster
        val bands = raster.getNumBands
        val sums = Array.ofDim[Long](gridW, gridH)
        val counts = Array.ofDim[Long](gridW, gridH)
        var y = 0
        while (y < h) {
          val gy = (y.toLong * gridH / h).toInt
          var x = 0
          while (x < w) {
            val gx = (x.toLong * gridW / w).toInt
            var s = 0L
            var b = 0
            while (b < bands) { s += raster.getSample(x, y, b); b += 1 }
            sums(gx)(gy) += s
            counts(gx)(gy) += bands
            x += 1
          }
          y += 1
        }
        val profile = (0 until gridH).map { gy =>
          var acc = 0L
          var gx = 0
          while (gx < gridW) { acc += sums(gx)(gy) / counts(gx)(gy); gx += 1 }
          acc
        }
        Row(r.getLong(0), profile)
      }
    }(encoder)
  }

  /** Synthesized captions for the [[synthesizePatternPngs]] corpus — each
    * caption literally describes its image's 8 grid-row sums ("rows r0 …
    * r7"), except ids with `id % 7 == 3`, which get id+4's caption — the
    * NEXT image FAMILY (the mislabeled-alt-text adversary a CLIP-filter
    * pipeline exists to catch). id+1 would be a VARIANT of the same
    * family (one shifted cell, cos² up to 0.9989 — measured 42/57 false
    * passes at the 0.99 bound), so the swap deliberately crosses
    * families, where the measured worst cos² is 0.957. The referenced
    * pattern needs no synthesized image — captions derive analytically
    * from [[patternCell]]. Output: (doc_id, caption). */
  def synthesizeCaptions(ids: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("caption", StringType)))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col("doc_id").cast("long")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val src = if (id % 7 == 3) id + 4 else id
        val rows = (0 until 8).map(gy =>
          (0 until 9).map(gx => patternCell(src, gx, gy).toLong).sum)
        Row(id, "rows " + rows.mkString(" "))
      }
    }(encoder)
  }

  /** The text-tower model seam of the alignment check: captions encode to
    * the same integer profile space the image tower emits. The stub
    * "encoder" parses the integers out of the structured caption (a real
    * deployment swaps in a text-embedding model at the same
    * (caption → array<bigint>) signature — the [[FakeCodec]] convention).
    * Output: (doc_id, tprofile array<bigint>). */
  def captionProfile(captions: DataFrame): DataFrame =
    captions.select(col("doc_id"),
      expr("transform(regexp_extract_all(caption, '[0-9]+', 0), x -> cast(x AS bigint))")
        .as("tprofile"))

  /** CLIP-shape image-text alignment filter (the LAION curation gate:
    * keep a (image, caption) pair only when the two towers' embeddings
    * agree). Joins the image profile against the caption profile on
    * doc_id and judges cos²(profile, tprofile) ≥ tauNum/tauDen via exact
    * integer cross-multiplication — `tauDen·dot² ≥ tauNum·‖a‖²·‖b‖²` in
    * BIGINT, no FP threshold hazard (profiles are non-negative, so the
    * squared comparison preserves the cosine ordering). A caption that
    * EXACTLY describes its image scores cos = 1 and always passes; a
    * swapped caption's profile decorrelates and fails at the default
    * 0.99 bound. Component magnitudes ≤ ~2.3k over 8 dims keep every
    * product under 2⁶³ (dot ≤ 8·2295² ≈ 4.2e7; tauDen·dot² ≈ 1.8e17) —
    * but that holds for the GRAYSCALE fixtures only: 3-band RGB per-cell
    * sums push ‖·‖² toward ~3.8e8 and tauDen·dot² past 2⁶³, where
    * non-ANSI Spark would wrap silently and flip the verdict. A per-row
    * guard raises instead: rows whose squared norms exceed
    * √(2⁶³/max(tauNum,tauDen)) (dot² ≤ ‖a‖²·‖b‖² bounds both sides of
    * the comparison) fail loudly — rescale profiles (a cosine is
    * scale-invariant, so dividing both towers by a constant preserves
    * every verdict) rather than widening to lossy doubles.
    *
    * Scale shape: one doc_id-keyed equi-join, per-row arithmetic — the
    * filter runs at scan speed; the expensive towers (decode, model)
    * stay in their own per-row stages. Output: (doc_id, dot, aligned). */
  def imageTextAlignment(profiles: DataFrame, tprofiles: DataFrame,
      dims: Int = 8, tauNum: Long = 99L, tauDen: Long = 100L): DataFrame = {
    require(dims >= 1 && tauDen > 0 && tauNum >= 0 && tauNum <= tauDen,
      s"bad alignment params dims=$dims tau=$tauNum/$tauDen")
    val p = (i: Int) => element_at(col("profile"), i + 1)
    val t = (i: Int) => element_at(col("tprofile"), i + 1)
    val dot = (0 until dims).map(i => p(i) * t(i)).reduce(_ + _)
    val na2 = (0 until dims).map(i => p(i) * p(i)).reduce(_ + _)
    val nb2 = (0 until dims).map(i => t(i) * t(i)).reduce(_ + _)
    // Exactness bound: the comparison needs tauDen·dot² and
    // tauNum·‖a‖²·‖b‖² in BIGINT; dot² ≤ ‖a‖²·‖b‖² (Cauchy–Schwarz), so
    // capping each squared norm at √(2⁶³/m) bounds BOTH products under 2⁶³.
    val m = math.max(math.max(tauNum, tauDen), 1L)
    val safeNorm2 = math.sqrt(Long.MaxValue.toDouble / m).toLong
    profiles.join(tprofiles, Seq("doc_id"))
      .select(col("doc_id"), dot.as("dot"), na2.as("__na2"), nb2.as("__nb2"))
      .select(col("doc_id"), col("dot"),
        when(col("__na2") > safeNorm2 || col("__nb2") > safeNorm2,
          raise_error(concat(
            lit("imageTextAlignment: profile norm² exceeds the exact-BIGINT " +
              s"bound $safeNorm2 for tau=$tauNum/$tauDen (doc_id="),
            col("doc_id").cast("string"),
            lit("); rescale both towers' profiles by a common constant"))))
          .otherwise(
            when(lit(tauDen) * col("dot") * col("dot") >=
              lit(tauNum) * col("__na2") * col("__nb2"), lit(1L))
              .otherwise(lit(0L))).as("aligned"))
  }
}
