package graft

import graft.sources.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def mediaDf = {
    val rows = java.util.Arrays.asList(
      Row(1L, "video", Row(null, null, 3500L, null, "h264"), Array[Byte](1, 2, 3)),
      Row(2L, "video", Row(null, null, 0L, null, "h264"), Array[Byte](9)),
      Row(3L, "video", Row(null, null, 99999L, null, "h264"), Array[Byte](4, 5)),
      Row(4L, "image", Row(64, 48, null, null, "png"), Array[Byte](7, 8)),
      Row(5L, "image", Row(null, null, null, null, null), null),
      Row(6L, "audio", Row(null, null, 2000L, 16000, "pcm"), Array[Byte](1, 1)))
    spark.createDataFrame(rows, Multimodal.mediaSchema)
  }

  test("perceptual hash: robust to small pixel edits, separates distinct images") {
    import spark.implicits._
    val (w, h) = (32, 32)
    // non-separable multi-component pattern: real images spread spectral
    // energy across the low-frequency grid (an axis-aligned or sawtooth
    // synthetic leaves most DCT coefficients ≈ 0, making bits
    // sign-of-noise — pHash's robustness contract assumes natural spectra)
    def gradient(seed: Int): Array[Byte] =
      Array.tabulate(w * h * 3) { i =>
        val p = i / 3; val x = p % w; val y = p / w
        val v = 128 +
          40 * math.sin(x / (2.5 + seed * 0.3) + y / 7.0 + seed) +
          35 * math.cos(x / 5.0 - y / (3.5 + seed * 0.2) + 2 * seed) +
          25 * math.sin((x + 2 * y) / (5.0 + seed * 0.5) - seed)
        (math.max(0, math.min(255, v.toInt))).toByte
      }
    def perturb(img: Array[Byte], edits: Int): Array[Byte] = {
      val out = img.clone()
      (0 until edits).foreach { e =>
        val p = (e * 977) % (w * h) * 3
        out(p) = ((out(p) + 12) & 0xFF).toByte
      }
      out
    }
    val imgs = Seq(
      (1L, gradient(0)), (2L, perturb(gradient(0), 8)),
      (3L, gradient(7)), (4L, gradient(13)))
      .toDF("asset_id", "pixels")
    val hashed = imgs.select(col("asset_id"),
        Multimodal.perceptualHash(col("pixels"), w, h).as("phash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(hashed(1L), hashed(2L)) <= 3,
      s"near-identical images far apart: ${hamming(hashed(1L), hashed(2L))}")
    assert(hamming(hashed(1L), hashed(3L)) >= 10,
      s"distinct images too close: ${hamming(hashed(1L), hashed(3L))}")
    assert(hamming(hashed(1L), hashed(4L)) >= 10)
  }

  test("quantized pHash twin: same near-dup structure as the float form") {
    import spark.implicits._
    // the gate fixtures themselves: decoded-PNG pixels == generated
    // pattern (lossless), so build pixels directly from the generator
    def pattern(seed: Int, noise: Int): Array[Byte] =
      Array.tabulate(32 * 32 * 3) { i =>
        val p = i / 3; val x = p % 32; val y = p / 32
        val base = if (((x / (4 + seed % 3)) + (y / (3 + seed % 4))) % 2 == 0)
          40 + 13 * seed else 215 - 11 * seed
        val n = if (noise != 0 && (x * 31 + y * 17) % 37 == 0) noise else 0
        math.max(0, math.min(255, base + n)).toByte
      }
    val imgs = graft.queries.MultimodalQueries.imageFixtures
      .map { case (name, s, nz) => (name, pattern(s, nz)) }
      .toDF("name", "pixels")
    def pairs(hashCol: org.apache.spark.sql.Column): Set[(String, String)] =
      Multimodal.imageNearDups(
          imgs.select(col("name"), hashCol.as("h")),
          maxHamming = 3, idCol = "name", hashCol = "h")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val fl = pairs(Multimodal.perceptualHash(col("pixels"), 32, 32))
    val qz = pairs(Multimodal.perceptualHashQuantized(col("pixels"), 32, 32))
    // same pair structure: base0/base0_copy/base0_noisy clique and the
    // base2/base2_noisy pair, nothing else — and float ≡ quantized
    assert(qz == fl, s"quantized $qz != float $fl")
    assert(qz.contains(("base0.png", "base0_copy.png")))
    assert(qz.contains(("base2.png", "base2_noisy.png")))
    assert(qz.forall { case (a, b) => a.take(5) == b.take(5) },
      s"cross-pattern false pair in $qz")
    // quantized hash is non-negative by construction (bits 0..62 only) —
    // the property the oracle's arithmetic >> relies on
    val qhashes = imgs.select(
        Multimodal.perceptualHashQuantized(col("pixels"), 32, 32))
      .collect().map(_.getLong(0))
    assert(qhashes.forall(_ >= 0L))
    // block-sum path (w,h > 32): on SMOOTH spectra (coefficients well
    // separated from the median — the blocky checker fixtures instead
    // put a dense tie cluster AT the median, where float-vs-integer
    // tie-breaking legitimately differs) the two forms agree bit-for-bit
    // up to cosine-quantization noise
    def smooth(seed: Int): Array[Byte] =
      Array.tabulate(64 * 64 * 3) { i =>
        val p = i / 3; val x = p % 64; val y = p / 64
        val v = 128 +
          40 * math.sin(x / (5.0 + seed * 0.3) + y / 14.0 + seed) +
          35 * math.cos(x / 10.0 - y / (7.0 + seed * 0.2) + 2 * seed)
        math.max(0, math.min(255, v.toInt)).toByte
      }
    val up = Seq((0, smooth(0)), (7, smooth(7)), (13, smooth(13)))
      .toDF("name", "pixels")
    val flUp = up.select(col("name"),
        Multimodal.perceptualHash(col("pixels"), 64, 64).as("h"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val qzUp = up.select(col("name"),
        Multimodal.perceptualHashQuantized(col("pixels"), 64, 64).as("h"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    flUp.foreach { case (n, h) =>
      assert(java.lang.Long.bitCount(h ^ qzUp(n)) <= 3,
        s"$n: float/quantized diverge at 64x64: ${java.lang.Long.bitCount(h ^ qzUp(n))}")
    }
  }

  test("imageNearDups pairs only the perceptually-near images") {
    import spark.implicits._
    val (w, h) = (32, 32)
    def img(seed: Int, shift: Int): Array[Byte] =
      Array.tabulate(w * h * 3) { i =>
        val p = i / 3; val x = p % w; val y = p / w
        val v = 128 +
          40 * math.sin(x / (2.5 + seed * 0.3) + y / 7.0 + seed) +
          35 * math.cos(x / 5.0 - y / (3.5 + seed * 0.2) + 2 * seed) +
          25 * math.sin((x + 2 * y) / (5.0 + seed * 0.5) - seed) +
          (if (p % 97 == 0) shift / 4.0 else 0)
        (math.max(0, math.min(255, v.toInt))).toByte
      }
    val media = Seq(
      (10L, img(0, 0)), (11L, img(0, 30)), // near-dup pair
      (20L, img(4, 0)), (30L, img(9, 0)))  // distinct singletons
      .toDF("asset_id", "pixels")
    val withHash = media.select(col("asset_id"),
      Multimodal.perceptualHash(col("pixels"), w, h).as("phash"))
    val pairs = Multimodal.imageNearDups(withHash, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((10L, 11L)), s"pairs: ${pairs.toSeq}")
  }

  test("imageNearDups hot-bucket guard caps degenerate-hash k² blowup") {
    import spark.implicits._
    val (w, h) = (32, 32)
    // 40 constant-color images: every DCT AC coefficient is 0 ⇒ identical
    // degenerate pHash ⇒ without the guard the block self-join emits
    // 40·39/2 = 780 pairs from pure noise
    def flat(v: Int): Array[Byte] = Array.fill(w * h * 3)(v.toByte)
    def img(seed: Int, shift: Int): Array[Byte] =
      Array.tabulate(w * h * 3) { i =>
        val p = i / 3; val x = p % w; val y = p / w
        val vv = 128 +
          40 * math.sin(x / (2.5 + seed * 0.3) + y / 7.0 + seed) +
          35 * math.cos(x / 5.0 - y / (3.5 + seed * 0.2) + 2 * seed) +
          (if (p % 97 == 0) shift / 4.0 else 0)
        (math.max(0, math.min(255, vv.toInt))).toByte
      }
    val media = ((0 until 40).map(i => (100L + i, flat(128))) ++
        Seq((10L, img(0, 0)), (11L, img(0, 30)))) // real near-dup pair
      .toDF("asset_id", "pixels")
    val withHash = media.select(col("asset_id"),
      Multimodal.perceptualHash(col("pixels"), w, h).as("phash"))
    val pairs = Multimodal.imageNearDups(withHash, maxHamming = 3,
        maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the 40-image degenerate blob exceeds the cap in every block → dropped;
    // the genuine pair (bucket size 2) survives
    assert(pairs.toSet == Set((10L, 11L)), s"pairs: ${pairs.toSeq}")
    // unguarded sanity: the degenerate blob really would have blown up
    val unguarded = Multimodal.imageNearDups(withHash, maxHamming = 3,
      maxBucketSize = Int.MaxValue).count()
    assert(unguarded >= 40L * 39 / 2, s"expected k² blowup, got $unguarded")
  }

  test("perceptualHash covers trailing pixels for non-multiple-of-32 sizes") {
    import spark.implicits._
    // w=63: integer block stride (63/32 = 1) would hash only columns 0–31;
    // fractional bounds make the right half contribute, so an image whose
    // right half is replaced must hash differently
    val (w, h) = (63, 47)
    def base: Array[Byte] =
      Array.tabulate(w * h * 3) { i =>
        val p = i / 3; val x = p % w; val y = p / w
        val v = 128 + 50 * math.sin(x / 4.0 + y / 6.0) +
          35 * math.cos(x / 7.0 - y / 5.0)
        (math.max(0, math.min(255, v.toInt))).toByte
      }
    val altered = {
      val out = base
      var p = 0
      while (p < w * h) {
        val x = p % w; val y = p / w
        if (x >= 32) {
          val v = math.max(0, math.min(255,
            128 + 60 * math.sin(y / 2.0 - x / 3.0) +
              40 * math.cos((x + y) / 4.0)).toInt)
          out(p * 3) = v.toByte; out(p * 3 + 1) = v.toByte; out(p * 3 + 2) = v.toByte
        }
        p += 1
      }
      out
    }
    val hashes = Seq((1L, base), (2L, altered)).toDF("asset_id", "pixels")
      .select(col("asset_id"),
        Multimodal.perceptualHash(col("pixels"), w, h).as("phash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(hashes(1L) ^ hashes(2L)) >= 5,
      s"right-half change invisible to hash: ${hashes(1L)} vs ${hashes(2L)}")
  }

  test("sampleFrames: stride-spaced frames, zero-duration skipped, capped") {
    val frames = Multimodal.sampleFrames(mediaDf, strideMs = 1000L, maxFrames = 8)
    val byAsset = frames.collect().groupBy(_.getLong(0))
    assert(byAsset(1L).length == 3)            // 3500ms / 1000ms
    assert(!byAsset.contains(2L))              // zero duration → no frames
    assert(byAsset(3L).length == 8)            // capped at maxFrames
    val ts = byAsset(1L).map(_.getLong(2)).sorted
    assert(ts.toSeq == Seq(0L, 1000L, 2000L))
    // deterministic frame bytes
    val again = Multimodal.sampleFrames(mediaDf, 1000L, 8).collect()
      .groupBy(_.getLong(0))
    assert(byAsset(1L).map(_.getAs[Array[Byte]]("frame").toSeq).toSeq ==
      again(1L).map(_.getAs[Array[Byte]]("frame").toSeq).toSeq)
  }

  test("sampleFrames: REAL RIFF/AVI demux — exact frame bytes, container duration, JPEG decodable") {
    import graft.queries.MultimodalQueries.{aviBytes, jpegBytes}
    // 10 fps, 12 frames alternating two solid-gray JPEGs -> 1200 ms
    val jA = jpegBytes(40); val jB = jpegBytes(200)
    val avi = aviBytes(100000L, (0 until 12).map(i => if (i % 2 == 0) jA else jB))
    val rows = java.util.Arrays.asList(
      Row(7L, "video", Row(null, null, null, null, "mjpeg"), avi))
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val out = Multimodal.sampleFrames(media, strideMs = 300L, maxFrames = 8)
      .collect().sortBy(_.getInt(1))
    // 1200/300 = 4 ticks; tick k -> source frame 3k -> color (3k)%2
    assert(out.length == 4)
    assert(out.map(_.getLong(2)).toSeq == Seq(0L, 300L, 600L, 900L))
    val expected = Seq(jA, jB, jA, jB) // frames 0,3,6,9
    out.zip(expected).foreach { case (r, exp) =>
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("frame"), exp),
        s"tick ${r.getInt(1)} carried the wrong container frame")
    }
    // the extracted frame really is a JPEG the JDK decodes to its color
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1).getAs[Array[Byte]]("frame")))
    assert(img != null && img.getWidth == 16)
    val px = img.getRGB(8, 8) & 0xFF
    assert(math.abs(px - 200) <= 8, s"decoded gray $px, planted 200")
    // a structurally broken AVI (truncated chunk size) falls back to the
    // stub: meta duration drives ticks, frames are the 32-byte hashes
    val broken = avi.take(40) ++ Array.fill[Byte](8)(0x7F.toByte)
    val rows2 = java.util.Arrays.asList(
      Row(8L, "video", Row(null, null, 2000L, null, "mjpeg"), broken))
    val stubOut = Multimodal.sampleFrames(
        spark.createDataFrame(rows2, Multimodal.mediaSchema), 1000L, 8)
      .collect()
    assert(stubOut.length == 2 &&
      stubOut.forall(_.getAs[Array[Byte]]("frame").length == 32))
  }

  test("parseAvi: dwTotalFrames checks the PRIMARY stream, multi-stream AVIs accepted") {
    import graft.queries.MultimodalQueries.{aviBytes, jpegBytes}
    val j = jpegBytes(100)
    val avi = aviBytes(100000L, Seq(j, j, j))
    // retag the LAST frame chunk as stream 01 and declare the primary
    // count (2) in avih dwTotalFrames (offset 32 + 16)
    val stride = 8 + j.length + (j.length & 1)
    val multi = avi.clone()
    multi(100 + 2 * stride + 1) = '1'.toByte // "00dc" -> "01dc"
    multi(48) = 2.toByte; multi(49) = 0; multi(50) = 0; multi(51) = 0
    val parsed = Multimodal.parseAvi(multi)
    assert(parsed.isDefined, "valid multi-stream AVI rejected")
    // ONLY the primary stream's chunks demux into the frame timeline —
    // a secondary stream's chunk must neither inflate the duration nor
    // interleave into the emitted frames (the frame list holds exactly
    // the 2 primary-stream chunks, both byte-equal to the planted JPEG)
    assert(parsed.get._2.length == 2)
    assert(parsed.get._2.forall(f => java.util.Arrays.equals(f, j)))
    // physical truncation still rejects via the RIFF-extent check
    assert(Multimodal.parseAvi(multi.take(multi.length - 2)).isEmpty)
  }

  test("parseMp4: ISO-BMFF sample-table demux — exact bytes, audio-first trak, truncation") {
    import graft.queries.MultimodalQueries.{mp4Bytes, jpegBytes}
    val jA = jpegBytes(40); val jB = jpegBytes(200)
    val frames = (0 until 6).map(i => if (i % 2 == 0) jA else jB)
    val mp4 = mp4Bytes(100000L, frames)
    val parsed = Multimodal.parseMp4(mp4)
    assert(parsed.isDefined, "valid MP4 rejected")
    assert(parsed.get._1 == 100000L)
    assert(parsed.get._2.length == 6)
    parsed.get._2.zip(frames).foreach { case (got, exp) =>
      assert(java.util.Arrays.equals(got, exp), "sample bytes differ")
    }
    // the demuxed sample really is a JPEG the JDK decodes to its color
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(parsed.get._2(1)))
    assert(img != null && img.getWidth == 16)
    assert(math.abs((img.getRGB(8, 8) & 0xFF) - 200) <= 8)
    // a leading audio trak must not shadow the vide trak (the AVI
    // multi-stream lesson, applied to MP4 from day one)
    val af = mp4Bytes(200000L, frames, leadingAudioTrak = true)
    val p2 = Multimodal.parseMp4(af)
    assert(p2.isDefined && p2.get._1 == 200000L && p2.get._2.length == 6)
    assert(java.util.Arrays.equals(p2.get._2(0), jA))
    // physical truncation rejects: the cut box's extent escapes the
    // payload and the walk fails loudly instead of shrinking
    assert(Multimodal.parseMp4(mp4.take(mp4.length - 3)).isEmpty)
    // the two container walkers do not cross-accept
    assert(Multimodal.parseAvi(mp4).isEmpty)
    // sampleFrames serves MP4 end-to-end: 600 ms at 200 ms -> 3 ticks
    val rows = java.util.Arrays.asList(
      Row(9L, "video", Row(null, null, null, null, "mjpeg"), mp4))
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val out = Multimodal.sampleFrames(media, strideMs = 200L, maxFrames = 8)
      .collect().sortBy(_.getInt(1))
    assert(out.length == 3)
    assert(java.util.Arrays.equals(
      out(0).getAs[Array[Byte]]("frame"), jA)) // tick 0 -> frame 0
  }

  test("parseAvi: audio-declared-first AVI demuxes the vids stream (01dc)") {
    import graft.queries.MultimodalQueries.jpegBytes
    // stream numbers follow hdrl strl declaration order: an AVI that
    // declares its audio stream FIRST carries video chunks as 01dc —
    // the walker must find the first `vids` strh, not assume prefix 00
    val j = jpegBytes(90)
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    def tag(s: String): Unit = out.write(
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val avih = {
      val b = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(100000); b.putInt(0).putInt(0).putInt(0)
      b.putInt(2) // dwTotalFrames: the VIDEO stream's count
      b.array()
    }
    val audio = Array.fill[Byte](6)(0x11)
    val strlBody = 4 + 8 + 4          // 'strl' + strh chunk (fccType only)
    val hdrlBody = 4 + 8 + avih.length + 2 * (8 + strlBody)
    val moviBody = 4 + (8 + audio.length) +
      2 * (8 + j.length + (j.length & 1))
    tag("RIFF"); w32(4 + 8 + hdrlBody + 8 + moviBody); tag("AVI ")
    tag("LIST"); w32(hdrlBody); tag("hdrl")
    tag("avih"); w32(avih.length); out.write(avih)
    tag("LIST"); w32(strlBody); tag("strl"); tag("strh"); w32(4); tag("auds")
    tag("LIST"); w32(strlBody); tag("strl"); tag("strh"); w32(4); tag("vids")
    tag("LIST"); w32(moviBody); tag("movi")
    tag("00wb"); w32(audio.length); out.write(audio)
    Seq(j, j).foreach { f =>
      tag("01dc"); w32(f.length); out.write(f)
      if ((f.length & 1) == 1) out.write(0)
    }
    val parsed = Multimodal.parseAvi(out.toByteArray)
    assert(parsed.isDefined, "audio-first AVI rejected")
    val (uspf, frames) = parsed.get
    assert(uspf == 100000L)
    assert(frames.length == 2, s"expected the 2 vids chunks, got ${frames.length}")
    assert(frames.forall(f => java.util.Arrays.equals(f, j)),
      "audio chunk leaked into the frame timeline")
  }

  test("resizeImages: real PNG bilinear resize, pHash survives the rescale") {
    import spark.implicits._
    // smooth grayscale pattern in NORMALIZED coordinates so the same image
    // content can be rendered at any resolution
    def lum(u: Double, v: Double): Int = math.max(0, math.min(255,
      (128 + 55 * math.sin(u * 9.7 + v * 3.1) + 45 * math.cos(u * 4.3 - v * 8.9)).toInt))
    def png(n: Int): Array[Byte] = {
      val buf = new java.awt.image.BufferedImage(n, n,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until n).foreach(y => (0 until n).foreach { x =>
        val g = lum(x.toDouble / n, y.toDouble / n)
        buf.setRGB(x, y, (g << 16) | (g << 8) | g)
      })
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(buf, "png", bos)
      bos.toByteArray
    }
    val media = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, "image", Row(64, 64, null, null, "png"), png(64))),
      Multimodal.mediaSchema)
    val resized = Multimodal.resizeImages(media, 32, 32).head()
    val px = resized.getAs[Array[Byte]]("resized")
    assert(px.length == 32 * 32 * 3)
    // real resample, not the hash stub: spot-check pixels track the pattern
    (0 until 32 by 5).foreach { y =>
      (0 until 32 by 5).foreach { x =>
        val want = lum((x + 0.5) / 32, (y + 0.5) / 32)
        val got = px((y * 32 + x) * 3) & 0xFF
        assert(math.abs(got - want) <= 30, s"pixel ($x,$y): got $got want ~$want")
      }
    }
    // pHash is scale-invariant by design: hash of the bilinear 32x32 must
    // match hash of the full-res original within a small Hamming distance
    val ph32 = Seq((1L, px)).toDF("id", "pixels")
      .select(Multimodal.perceptualHash(col("pixels"), 32, 32)).head().getLong(0)
    val full = graft.sources.ImageIngest.decodeImages(
        Seq(("a.png", png(64))).toDF("path", "content"))
      .select(Multimodal.perceptualHash(col("pixels"), 64, 64)).head().getLong(0)
    val ham = java.lang.Long.bitCount(ph32 ^ full)
    assert(ham <= 6, s"pHash not resize-stable: hamming $ham")
  }

  test("resizeImages: fixed-shape output, null payload propagates as null") {
    val out = Multimodal.resizeImages(mediaDf, 8, 8).collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Array[Byte]]("resized"))).toMap
    assert(out(4L).get.length == 8 * 8 * 3)
    assert(out(5L).isEmpty)
  }

  test("audioFeatures: fixed-dim bounded vector per audio asset") {
    val out = Multimodal.audioFeatures(mediaDf, dim = 16).collect()
    assert(out.length == 1)
    val v = out.head.getSeq[Float](out.head.fieldIndex("features"))
    assert(v.length == 16 && v.forall(x => x >= -1f && x <= 1f))
  }

  test("audioFeatures: real WAV decodes to its PCM energy envelope") {
    import javax.sound.sampled._
    // 16-bit mono PCM WAV, built with the JDK encoder: first half a 0.5-
    // amplitude square wave (RMS 0.5), second half silence (RMS 0)
    def wav(samples: Array[Float], rate: Float = 8000f): Array[Byte] = {
      val data = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        val v = math.max(-32768, math.min(32767, math.round(s * 32768f)))
        data(2 * i) = (v & 0xFF).toByte
        data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      }
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, 1, 2, rate, false)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, samples.length),
        AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val half = 4000
    val samples = Array.tabulate(2 * half)(i =>
      if (i >= half) 0.0f else if (i % 2 == 0) 0.5f else -0.5f)
    val rows = java.util.Arrays.asList(
      Row(10L, "audio", Row(null, null, 1000L, 8000, "wav"), wav(samples)),
      Row(11L, "audio", Row(null, null, null, null, null), Array[Byte](1, 2, 3)))
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val feats = Multimodal.audioFeatures(media, dim = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](r.fieldIndex("features"))).toMap
    val real = feats(10L)
    assert(real.length == 8)
    // segments 0-3 cover the square wave, 4-7 the silence
    real.take(4).foreach(e => assert(math.abs(e - 0.5f) < 1e-3, s"RMS $e != 0.5"))
    real.drop(4).foreach(e => assert(e == 0.0f, s"silence RMS $e != 0"))
    // unparseable payload falls back to the deterministic stub contract
    assert(feats(11L).length == 8 && feats(11L).forall(x => x >= -1f && x <= 1f))
  }

  test("audio fingerprint: gain-invariant collisions, shape separation, near-dup join") {
    import javax.sound.sampled._
    def wav(samples: Array[Float], rate: Float = 8000f): Array[Byte] = {
      val data = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        val v = math.max(-32768, math.min(32767, math.round(s * 32768f)))
        data(2 * i) = (v & 0xFF).toByte
        data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      }
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, 1, 2, rate, false)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, samples.length),
        AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    // a ramp-up/down energy pattern; the 0.55-gain copy has the SAME
    // envelope shape (every delta compare preserved), the reversed pattern
    // the opposite shape
    val n = 6500
    def tone(i: Int, amp: Float) = if (i % 2 == 0) amp else -amp
    val ramp = Array.tabulate(n)(i => tone(i, 0.1f + 0.8f * i / n))
    val quiet = ramp.map(_ * 0.55f)
    val reverse = ramp.reverse
    val rows = java.util.Arrays.asList(
      Row(1L, "audio", Row(null, null, 1000L, 8000, "wav"), wav(ramp)),
      Row(2L, "audio", Row(null, null, 1000L, 8000, "wav"), wav(quiet)),
      Row(3L, "audio", Row(null, null, 1000L, 8000, "wav"), wav(reverse)))
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val withFp = Multimodal.audioFeatures(media, dim = 65)
      .select(col("asset_id"),
        Multimodal.audioFingerprint(col("features")).as("afp"))
    val fps = withFp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L), "gain change altered the fingerprint")
    assert(java.lang.Long.bitCount(fps(1L) ^ fps(3L)) > 20,
      s"reversed envelope not separated (hamming ${java.lang.Long.bitCount(fps(1L) ^ fps(3L))})")
    val pairs = Multimodal.audioNearDups(withFp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"near-dup pairs wrong: $pairs")
  }
}
