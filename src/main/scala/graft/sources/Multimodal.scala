package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north star): image/audio/video payloads are
  * opaque BINARY columns beside typed metadata structs; decode / resize /
  * frame-sample run as batched per-partition transforms so a real codec
  * (ffmpeg/libjpeg behind JNI, or Python workers at the boundary) slots in
  * without touching the relational plan. Image decode (javax.imageio:
  * PNG/JPEG/BMP/GIF) and audio decode (javax.sound.sampled: WAV/AIFF/AU →
  * PCM) are REAL pure-JDK paths with deterministic stub fallbacks for
  * unparseable payloads; video frame decode has no JDK codec and stays a
  * deterministic STUB (SURVEY.md §7.3). Schema, partitioning, batch shape,
  * and null/corrupt handling are the real, tested contract throughout.
  */
object Multimodal {

  /** media table schema: one row per asset. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("codec", StringType, nullable = true))), nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  private val frameSchema = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** Minimal RIFF/AVI container walk — REAL frame extraction without any
    * codec: RIFF is length-prefixed chunk iteration, so the PRIMARY video
    * stream's frame chunks (`NNdc`/`NNdb`, NN = the first `strl` whose
    * `strh` declares fccType `vids` — stream numbers follow hdrl
    * declaration order, so an audio-first file has video chunks `01dc`)
    * slice out of the payload as exact byte ranges, and for MJPEG AVIs
    * each chunk IS a complete JFIF image `javax.imageio` decodes — the
    * one mainstream video layout a pure JVM can both demux and decode
    * (the MP4/H.264 boundary stays documented, as model inference is).
    * Returns (µs per frame from the `avih` header, the primary video
    * stream's frame chunks in file order); None when the payload is not
    * a structurally valid AVI — callers keep the deterministic stub (the
    * [[resizeImages]] real-or-stub discipline).
    */
  private[graft] def parseAvi(
      payload: Array[Byte]): Option[(Long, Vector[Array[Byte]])] = {
    if (payload == null || payload.length < 24) return None
    def fourcc(off: Int): String =
      new String(payload, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
    def le32(off: Int): Long =
      (payload(off) & 0xFFL) | ((payload(off + 1) & 0xFFL) << 8) |
        ((payload(off + 2) & 0xFFL) << 16) | ((payload(off + 3) & 0xFFL) << 24)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    // a partial download cut on a chunk boundary would otherwise walk
    // cleanly and return a silently-shorter frame list: the declared
    // RIFF extent must fit in the payload we actually hold
    if (8L + le32(4) > payload.length) return None
    var usPerFrame = 0L
    var totalFrames = 0L
    var ok = true
    // stream numbers follow strh declaration order in hdrl; the first
    // `vids` stream is the primary video stream whose chunk-id prefix we
    // demux. hdrl precedes movi in a valid RIFF, so the prefix is settled
    // before any frame chunk is seen; headerless minimal AVIs keep the
    // "00" default
    var streamCount = 0
    var vPrefix = "00"
    var vidsSeen = false
    val frames = Vector.newBuilder[Array[Byte]]
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (ok && off + 8 <= end) {
        val id = fourcc(off)
        val sz = le32(off + 4)
        if (sz > Int.MaxValue - 8L || off + 8L + sz > end) { ok = false }
        else {
          val body = off + 8
          val n = sz.toInt
          if (id == "LIST") {
            if (n >= 4) {
              val lt = fourcc(body)
              if (lt == "hdrl" || lt == "movi" || lt == "rec " || lt == "strl")
                walk(body + 4, body + n)
            }
          } else if (id == "avih" && n >= 4) {
            usPerFrame = le32(body)
            if (n >= 20) totalFrames = le32(body + 16) // dwTotalFrames
          } else if (id == "strh" && n >= 4) {
            if (!vidsSeen && fourcc(body) == "vids") {
              vPrefix = f"$streamCount%02d"
              vidsSeen = true
            }
            streamCount += 1
          } else if (id.startsWith(vPrefix) &&
              (id.endsWith("dc") || id.endsWith("db"))) {
            // ONLY the primary video stream's chunks are frames: another
            // stream's chunks would inflate the derived duration
            // (frames × µs/frame) and interleave into the frame timeline,
            // so sampleFrames would emit the wrong frame at the wrong
            // tick on a valid multi-stream file
            frames += java.util.Arrays.copyOfRange(payload, body, body + n)
          }
          off = body + n + (n & 1) // RIFF chunks are word-aligned
        }
      }
    }
    val riffEnd = math.min(payload.length.toLong, 8L + le32(4)).toInt
    walk(12, riffEnd)
    val fs = frames.result()
    // an undercounting RIFF size field caps riffEnd mid-stream without
    // tripping `ok`; the avih frame count detects it — when the header
    // declares dwTotalFrames (> 0), the PRIMARY stream's demuxed count
    // must match (dwTotalFrames describes the main video stream, which
    // is exactly and only what `frames` now holds)
    if (ok && totalFrames > 0 && fs.length != totalFrames) return None
    if (ok && usPerFrame > 0 && fs.nonEmpty) Some((usPerFrame, fs)) else None
  }

  /** Minimal ISO-BMFF (MP4, ISO/IEC 14496-12) demux — the MP4 sibling of
    * [[parseAvi]], same contract: REAL sample extraction without any
    * codec. Big-endian length-prefixed box walk to the FIRST `vide`
    * trak; the sample table (`stts` nominal delta + `mdhd` timescale →
    * µs/frame; `stsz` sizes threaded through the `stsc` sample-to-chunk
    * runs at the `stco`/`co64` chunk offsets) yields every video
    * sample's exact byte range in the payload. For motion-JPEG MP4s
    * each sample is a complete JFIF image `javax.imageio` decodes; any
    * other codec (H.264 et al.) demuxes as exact bytes with real timing
    * and the DECODE stays the documented JDK boundary — the container
    * walk is no longer the gap. Returns None when the payload is not a
    * structurally valid MP4 (every box, chunk offset, and sample range
    * must land inside the payload) — callers keep the deterministic
    * stub.
    */
  private[graft] def parseMp4(
      payload: Array[Byte]): Option[(Long, Vector[Array[Byte]])] = {
    if (payload == null || payload.length < 16) return None
    def be32(o: Int): Long =
      ((payload(o) & 0xFFL) << 24) | ((payload(o + 1) & 0xFFL) << 16) |
        ((payload(o + 2) & 0xFFL) << 8) | (payload(o + 3) & 0xFFL)
    def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
    def fourcc(o: Int): String =
      new String(payload, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (fourcc(4) != "ftyp") return None
    final case class Box(tpe: String, body: Int, end: Int)
    // boxes tile their container exactly; any misaligned or payload-
    // escaping size rejects the whole parse (the parseAvi truncation
    // discipline — a cut container must fail loudly, not shrink)
    def children(start: Int, end: Int): Option[Vector[Box]] = {
      val out = Vector.newBuilder[Box]
      var off = start
      while (off + 8 <= end) {
        val sz = be32(off)
        val tpe = fourcc(off + 4)
        val (body, boxEnd) =
          if (sz == 1L) {
            if (off + 16 > end) return None
            val ls = be64(off + 8)
            if (ls < 16 || ls > end - off) return None
            (off + 16, off + ls.toInt)
          } else if (sz == 0L) (off + 8, end) // open box: to container end
          else {
            if (sz < 8 || sz > end - off) return None
            (off + 8, off + sz.toInt)
          }
        out += Box(tpe, body, boxEnd)
        off = boxEnd
      }
      if (off != end) None else Some(out.result())
    }
    def child(bs: Vector[Box], tpe: String): Option[Box] =
      bs.find(_.tpe == tpe)
    val top = children(0, payload.length).getOrElse(return None)
    val moov = child(top, "moov").getOrElse(return None)
    val moovKids = children(moov.body, moov.end).getOrElse(return None)
    moovKids.filter(_.tpe == "trak").foreach { trak =>
      val result = for {
        trakKids <- children(trak.body, trak.end)
        mdia <- child(trakKids, "mdia")
        mdiaKids <- children(mdia.body, mdia.end)
        hdlr <- child(mdiaKids, "hdlr")
        // handler_type sits after version/flags(4) + pre_defined(4)
        if hdlr.end - hdlr.body >= 12 && fourcc(hdlr.body + 8) == "vide"
        mdhd <- child(mdiaKids, "mdhd")
        if mdhd.end - mdhd.body >= 24 // v0 minimum; v1 checked below
        mdhdV1 = payload(mdhd.body) == 1 // version byte
        if !mdhdV1 || mdhd.end - mdhd.body >= 32
        timescale = if (mdhdV1) be32(mdhd.body + 20) // v1: 8+8-byte times
          else be32(mdhd.body + 12)                  // v0: 4+4-byte times
        if timescale > 0
        minf <- child(mdiaKids, "minf")
        minfKids <- children(minf.body, minf.end)
        stbl <- child(minfKids, "stbl")
        stblKids <- children(stbl.body, stbl.end)
        stts <- child(stblKids, "stts")
        if stts.end - stts.body >= 16 && be32(stts.body + 4) >= 1
        // the first run's delta is the nominal rate (constant-rate
        // files have one run; a trailing odd-duration sample adds a
        // second we deliberately ignore, like avih's single rate)
        usPerFrame = be32(stts.body + 12) * 1000000L / timescale
        if usPerFrame > 0
        stsz <- child(stblKids, "stsz")
        if stsz.end - stsz.body >= 12
        stsc <- child(stblKids, "stsc")
        if stsc.end - stsc.body >= 8
        stcoBox <- child(stblKids, "stco").map((_, false))
          .orElse(child(stblKids, "co64").map((_, true)))
        if stcoBox._1.end - stcoBox._1.body >= 8
      } yield {
        val (stco, wide) = stcoBox
        val uniform = be32(stsz.body + 4)
        val nSamples = be32(stsz.body + 8).toInt
        val nChunks = be32(stco.body + 4).toInt
        val nRuns = be32(stsc.body + 4).toInt
        def sampleSize(i: Int): Long =
          if (uniform > 0) uniform else be32(stsz.body + 12 + 4 * i)
        def chunkOffset(c: Int): Long =
          if (wide) be64(stco.body + 8 + 8 * c) else be32(stco.body + 8 + 4 * c)
        def runFirstChunk(r: Int): Long = be32(stsc.body + 8 + 12 * r)
        def runPerChunk(r: Int): Long = be32(stsc.body + 8 + 12 * r + 4)
        // structural bounds before any table walks
        if (nSamples <= 0 || nChunks <= 0 || nRuns <= 0 ||
            (uniform == 0 && stsz.end - stsz.body < 12 + 4L * nSamples) ||
            stco.end - stco.body < 8 + (if (wide) 8L else 4L) * nChunks ||
            stsc.end - stsc.body < 8 + 12L * nRuns) None
        else {
          val frames = Vector.newBuilder[Array[Byte]]
          var sample = 0
          var run = 0
          var chunk = 0
          var valid = true
          while (valid && chunk < nChunks && sample < nSamples) {
            while (run + 1 < nRuns && runFirstChunk(run + 1) <= chunk + 1)
              run += 1
            var off = chunkOffset(chunk)
            var inChunk = 0L
            while (valid && inChunk < runPerChunk(run) && sample < nSamples) {
              val sz = sampleSize(sample)
              // subtraction form: `off + sz` overflows Long for a crafted
              // co64 offset near Long.MaxValue, flipping the bound check
              // and turning the return-None contract into an array crash
              if (off < 0 || sz <= 0 || sz > Int.MaxValue ||
                  off > payload.length.toLong - sz) valid = false
              else {
                frames += java.util.Arrays.copyOfRange(
                  payload, off.toInt, (off + sz).toInt)
                off += sz; sample += 1; inChunk += 1
              }
            }
            chunk += 1
          }
          // every declared sample must land: an undercounting chunk
          // table is the stco analog of the avih frame-count check
          if (valid && sample == nSamples) Some((usPerFrame, frames.result()))
          else None
        }
      }
      result.flatten match {
        case Some(hit) => return Some(hit)
        case None => () // not a (valid) video trak — try the next
      }
    }
    None
  }

  /** Frame sampling: video payload → one row per sampled frame at a fixed
    * stride. Generator shape (1 row in → F rows out) via flatMap inside
    * mapPartitions. REAL for RIFF/AVI ([[parseAvi]]) and ISO-BMFF/MP4
    * ([[parseMp4]]) payloads: the
    * asset's duration derives from the container (frames × µs/frame),
    * tick `k` lands at `ts = k·strideMs`, and the emitted frame is the
    * container frame on screen at that instant
    * (`floor(ts / frameDuration)`, clamped) — for MJPEG that row is a
    * decodable JPEG feeding the real image ops (pHash, resize, decode).
    * Other payloads keep the deterministic STUB derived from (payload
    * hash, frame index) — a codec-backed impl would slot in per batch.
    * Null/empty payloads and zero-duration assets yield no frames
    * (corrupt-skip semantics, S3).
    */
  def sampleFrames(media: DataFrame, strideMs: Long = 1000L,
      maxFrames: Int = 32): DataFrame = {
    val enc = ExpressionEncoder(frameSchema)
    media
      .filter(col("kind") === "video" && col("payload").isNotNull)
      .select(col("asset_id"), col("meta.duration_ms").as("duration_ms"), col("payload"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          // container demux is real for RIFF/AVI and ISO-BMFF/MP4; any
          // other payload keeps the deterministic stub
          parseAvi(payload).orElse(parseMp4(payload)) match {
            case Some((usPf, frames)) =>
              // parseMp4 admits usPerFrame up to ~4.3e15 (32-bit stts
              // delta over timescale 1), so the product can overflow for
              // large sample counts; saturate instead of going negative
              // (a negative duration silently emitted ZERO frames)
              val nf = frames.length.toLong
              val durMs =
                if (nf > 0 && usPf > Long.MaxValue / nf) Long.MaxValue / 1000L
                else nf * usPf / 1000L
              val n = math.min(
                if (strideMs <= 0) 0L else durMs / strideMs,
                maxFrames.toLong).toInt
              (0 until n).iterator.map { k =>
                val src = math.min(frames.length - 1L,
                  k.toLong * strideMs * 1000L / usPf).toInt
                Row(r.getLong(0), k, k * strideMs, frames(src))
              }
            case None =>
              val dur = if (r.isNullAt(1)) 0L else r.getLong(1)
              val n = math.min(
                if (strideMs <= 0) 0L else dur / strideMs,
                maxFrames.toLong).toInt
              val base = payload.foldLeft(-7046029254386353131L)(
                (a, b) => (a ^ b) * 1099511628211L)
              (0 until n).iterator.map { f =>
                val bytes = Array.tabulate[Byte](32)(
                  i => ((base ^ (f * 131L)) >> (i % 56) & 0xFF).toByte)
                Row(r.getLong(0), f, f * strideMs, bytes)
              }
          }
        }
      }(enc)
  }

  /** Image resize: payload → w×h×3 RGB pixel buffer + updated meta. REAL
    * for payloads `javax.imageio` can decode (PNG/JPEG/BMP/GIF — bilinear
    * resample through a Graphics2D transform, pure JVM); payloads no JDK
    * reader handles keep the deterministic hash-derived stub so the
    * fixed-shape contract — (payload, target) → w·h·3 bytes, null in /
    * null out — holds identically for both.
    */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val resize = udf { (payload: Array[Byte]) =>
      if (payload == null) None
      else resizeReal(payload, w, h).orElse {
        val base = payload.foldLeft(1125899906842597L)((a, b) => a * 31 + b)
        Some(Array.tabulate[Byte](w * h * 3)(i => ((base >> (i % 56)) & 0xFF).toByte))
      }
    }
    media.filter(col("kind") === "image")
      .withColumn("resized", resize(col("payload")))
      .withColumn("resized_w", when(col("resized").isNotNull, lit(w)))
      .withColumn("resized_h", when(col("resized").isNotNull, lit(h)))
  }

  /** Decode + bilinear-resize to row-major RGB via the JDK's imaging stack;
    * None when no registered reader parses the payload.
    */
  private def resizeReal(payload: Array[Byte], w: Int,
      h: Int): Option[Array[Byte]] =
    try {
      val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (src == null) None
      else {
        val dst = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, w, h, null)
        g.dispose()
        val px = new Array[Byte](w * h * 3)
        var y = 0; var i = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = dst.getRGB(x, y)
            px(i) = ((rgb >> 16) & 0xFF).toByte
            px(i + 1) = ((rgb >> 8) & 0xFF).toByte
            px(i + 2) = (rgb & 0xFF).toByte
            i += 3; x += 1
          }
          y += 1
        }
        Some(px)
      }
    } catch { case _: Throwable => None }

  /** Perceptual hash (pHash) of an RGB pixel buffer: grayscale → block-mean
    * downsample to 32×32 → 2-D DCT-II → the 8×8 low-frequency corner minus
    * the DC term, each bit = coefficient above the median. Unlike the stub
    * codecs, this MATH is the real published algorithm — near-identical
    * images differ in few bits, so Hamming distance is the image near-dup
    * metric. Single-pass UDF per row (O(32²·8·8) flops), map-only at scale.
    */
  def perceptualHash(pixels: Column, w: Int, h: Int): Column = {
    require(w >= 32 && h >= 32, "pHash needs at least 32x32 input")
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null || bytes.length < w * h * 3) None
      else {
        // grayscale + block-mean downsample to 32x32. Block bounds are
        // FRACTIONAL (gy*h/32 ..< (gy+1)*h/32) so every pixel contributes;
        // integer strides w/32, h/32 silently dropped the trailing w%32
        // columns / h%32 rows (worst case w=63 hashed only the left half),
        // diverging from published pHash for non-multiple-of-32 dimensions.
        val g = Array.ofDim[Double](32, 32)
        var gy = 0
        while (gy < 32) {
          val y0 = gy * h / 32; val y1 = (gy + 1) * h / 32
          var gx = 0
          while (gx < 32) {
            val x0 = gx * w / 32; val x1 = (gx + 1) * w / 32
            var s = 0.0; var c = 0
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val p = (y * w + x) * 3
                s += ((bytes(p) & 0xFF) + (bytes(p + 1) & 0xFF) + (bytes(p + 2) & 0xFF)) / 3.0
                c += 1; x += 1
              }
              y += 1
            }
            g(gy)(gx) = s / c
            gx += 1
          }
          gy += 1
        }
        // 2-D DCT-II, low-frequency 8x8 corner only
        val dct = Array.ofDim[Double](8, 8)
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            var s = 0.0
            var y = 0
            while (y < 32) {
              var x = 0
              while (x < 32) {
                s += g(y)(x) *
                  math.cos((2 * y + 1) * u * math.Pi / 64.0) *
                  math.cos((2 * x + 1) * v * math.Pi / 64.0)
                x += 1
              }
              y += 1
            }
            dct(u)(v) = s
            v += 1
          }
          u += 1
        }
        val coefs = (for { u2 <- 0 until 8; v2 <- 0 until 8
          if u2 != 0 || v2 != 0 } yield dct(u2)(v2)).toArray
        val sortedC = coefs.sorted
        val median = sortedC(coefs.length / 2)
        var hash = 0L
        var i = 0
        while (i < coefs.length) {
          if (coefs(i) > median) hash |= (1L << i)
          i += 1
        }
        Some(hash)
      }
    }
    f(pixels)
  }

  /** Quantized DCT basis shared by [[perceptualHashQuantized]] and the
    * DuckDB oracle that replays it: round(cos((2y+1)·u·π/64)·2^15). The
    * table is INTEGER LITERALS on both sides (the gate's oracle SQL is
    * built from this array), so no engine ever re-evaluates a
    * transcendental — the cross-engine-exact discipline of the
    * vx_cka_matrix_quantized family applied to the 2-D DCT.
    */
  private[graft] val dctCosQ: Array[Array[Long]] = Array.tabulate(32, 8)(
    (y, u) => math.round(math.cos((2 * y + 1) * u * math.Pi / 64.0) * 32768.0))

  /** Integer-exact twin of [[perceptualHash]] — same structure (grayscale
    * block reduce → 2-D DCT-II → 63 low-frequency bits vs their median),
    * arithmetic restricted to Long so an independent engine replays the
    * hash bit-for-bit (the mm_image_neardup_pairs FULL oracle):
    *   - block SUMS of (r+g+b) replace grayscale MEANS — both rescale g
    *     by the constant 3·blockPixels, and the DCT is linear, so every
    *     coefficient (and the median) scales identically: the
    *     coef-vs-median sign structure is unchanged;
    *   - the cosine basis is the shared [[dctCosQ]] integer table; a
    *     positive scale factor (2^15 per axis) again preserves signs.
    * Requires w,h multiples of 32 (constant block size keeps the scale
    * argument exact; the float form handles ragged sizes) and w·h ≤ 2^22
    * pixels so the worst-case |Σ g·c·c| stays under Long.MaxValue.
    * The float [[perceptualHash]] remains the production path for
    * arbitrary dimensions; MultimodalSpec pins that both forms agree on
    * the near-dup pair structure.
    */
  def perceptualHashQuantized(pixels: Column, w: Int, h: Int): Column = {
    require(w >= 32 && h >= 32 && w % 32 == 0 && h % 32 == 0,
      "quantized pHash needs w,h multiples of 32")
    require(w.toLong * h <= (1L << 22), "quantized pHash overflow bound: w*h <= 2^22")
    val cq = dctCosQ
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null || bytes.length < w * h * 3) None
      else {
        val bw = w / 32; val bh = h / 32
        val g = Array.ofDim[Long](32, 32)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = (y * w + x) * 3
            g(y / bh)(x / bw) +=
              (bytes(p) & 0xFF) + (bytes(p + 1) & 0xFF) + (bytes(p + 2) & 0xFF)
            x += 1
          }
          y += 1
        }
        val dct = Array.ofDim[Long](8, 8)
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            var s = 0L
            var yy = 0
            while (yy < 32) {
              var xx = 0
              while (xx < 32) {
                s += g(yy)(xx) * cq(yy)(u) * cq(xx)(v)
                xx += 1
              }
              yy += 1
            }
            dct(u)(v) = s
            v += 1
          }
          u += 1
        }
        val coefs = (for { u2 <- 0 until 8; v2 <- 0 until 8
          if u2 != 0 || v2 != 0 } yield dct(u2)(v2)).toArray
        val median = coefs.sorted.apply(coefs.length / 2)
        var hash = 0L
        var i = 0
        while (i < coefs.length) {
          if (coefs(i) > median) hash |= (1L << i)
          i += 1
        }
        Some(hash)
      }
    }
    f(pixels)
  }

  /** Image near-dup candidate pairs by pHash Hamming distance ≤ maxHamming,
    * found via the SimHash pigeonhole block join (4×16-bit blocks: any pair
    * within Hamming ≤ 3 shares ≥ 1 exact block) — never all-pairs. Shares
    * the hot-bucket economics of the text dedup family.
    */
  def imageNearDups(withHash: DataFrame, maxHamming: Int = 3,
      idCol: String = "asset_id", hashCol: String = "phash",
      maxBucketSize: Int = 1000): DataFrame = {
    require(maxHamming <= 3, "4-block pigeonhole guarantees recall only to Hamming 3")
    val blocks = (0 until 4).map(b =>
      struct(lit(b).as("blk"),
        shiftrightunsigned(col(hashCol), b * 16).bitwiseAND(lit(0xFFFFL)).as("val")))
    val allBanded = withHash
      .select(col(idCol).as("__id"), col(hashCol).as("__h"),
        explode(array(blocks: _*)).as("block"))
      .select(col("__id"), col("__h"), col("block.blk"), col("block.val"))
    // same hot-bucket guard as Dedup.simhashNearDups/minhashCandidates: a
    // block value shared by k images emits k² candidate pairs, and real
    // corpora make this bite — constant-color / low-texture images collapse
    // to degenerate pHashes with identical blocks. Over-common blocks carry
    // no near-dup signal, so buckets past the cap are dropped pre-join.
    val banded = allBanded.join(
      allBanded.groupBy(col("blk"), col("val"))
        .agg(count(lit(1)).as("__bs"))
        .filter(col("__bs") <= maxBucketSize)
        .select(col("blk"), col("val")),
      Seq("blk", "val"))
    val pairs = banded.join(
        banded.select(col("blk"), col("val"),
          col("__id").as("__id2"), col("__h").as("__h2")),
        Seq("blk", "val"))
      .filter(col("__id") < col("__id2"))
      .select(col("__id").as("id_a"), col("__id2").as("id_b"),
        col("__h").as("h_a"), col("__h2").as("h_b"))
      .distinct()
    pairs
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Energy-delta audio fingerprint (Haitsma & Kalker 2002's bit
    * derivation over one band, published robust-hash math): bit i is set
    * iff envelope(i+1) > envelope(i), so the fingerprint encodes the
    * SHAPE of the energy curve and is invariant to overall gain — the
    * property that makes re-encoded/re-normalized copies collide. Feed a
    * 65-segment envelope (`audioFeatures(dim = 65)`) for all 64 bits.
    * Map-only codegen-adjacent UDF; the near-dup join below shares the
    * image family's 4×16-bit Hamming block machinery unchanged.
    */
  def audioFingerprint(features: Column): Column = {
    val f = udf { (env: Seq[Float]) =>
      if (env == null || env.length < 2) None
      else {
        var h = 0L; var i = 0
        val n = math.min(env.length - 1, 64)
        while (i < n) { if (env(i + 1) > env(i)) h |= (1L << i); i += 1 }
        Some(h)
      }
    }
    f(features)
  }

  /** Audio near-dup pairs over the energy-delta fingerprint — the Hamming
    * block join is hash-agnostic (any 64-bit code), so this IS
    * [[imageNearDups]] pointed at the audio fingerprint column: 4×16-bit
    * pigeonhole blocks (complete recall to Hamming 3), hot-bucket guard,
    * exact bit_count verify.
    */
  def audioNearDups(withFp: DataFrame, maxHamming: Int = 3,
      idCol: String = "asset_id", fpCol: String = "afp",
      maxBucketSize: Int = 1000): DataFrame =
    imageNearDups(withFp, maxHamming, idCol, fpCol, maxBucketSize)

  /** Audio feature extraction: payload → fixed-length feature vector. REAL
    * for payloads `javax.sound.sampled` can parse (WAV/AIFF/AU containers,
    * any encoding the JDK converts to 16-bit signed PCM — pure JVM, the
    * audio twin of the imageio path above): channels are mixed down to mono
    * in [-1, 1] and feature i is the RMS energy of the i-th of `dim` equal
    * time segments (fractional bounds, every sample contributes) — a
    * deterministic, resampling-stable energy envelope; a real filterbank/
    * MFCC frontend swaps in at the same (payload → dim floats) boundary.
    * Payloads no JDK reader handles keep the hash-derived stub, so the
    * fixed-shape contract (null in / null out, dim floats otherwise) holds
    * identically for both.
    */
  def audioFeatures(media: DataFrame, dim: Int = 32): DataFrame = {
    val feats = udf { (payload: Array[Byte]) =>
      if (payload == null) None
      else decodePcmReal(payload).map(energyEnvelope(_, dim)).orElse {
        val base = payload.foldLeft(-7046029254386353131L)((a, b) => (a ^ b) * 1099511628211L)
        Some(Array.tabulate(dim) { i =>
          var x = base ^ (i * 0x9E3779B97F4A7C15L)
          x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 33
          ((x & 0xFFFFFF).toFloat / 0x7FFFFF.toFloat) - 1.0f
        })
      }
    }
    media.filter(col("kind") === "audio")
      .withColumn("features", feats(col("payload")))
  }

  /** Decode via the JDK's sampled-audio stack to mono float PCM in [-1, 1];
    * None when no registered reader parses the payload (stub fallback).
    */
  private def decodePcmReal(payload: Array[Byte]): Option[Array[Float]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val ch = fmt.getChannels
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          fmt.getSampleRate, 16, ch, ch * 2, fmt.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
        val bytes = pcm.readAllBytes()
        val nFrames = bytes.length / (2 * ch)
        if (nFrames == 0) None
        else {
          val mono = new Array[Float](nFrames)
          var f = 0
          while (f < nFrames) {
            var s = 0.0f
            var c = 0
            while (c < ch) {
              val o = (f * ch + c) * 2 // little-endian 16-bit signed
              s += ((bytes(o + 1) << 8) | (bytes(o) & 0xFF)).toShort / 32768.0f
              c += 1
            }
            mono(f) = s / ch
            f += 1
          }
          Some(mono)
        }
      } finally in.close()
    } catch { case _: Throwable => None }

  /** RMS energy of `dim` equal time segments, fractional bounds (same
    * discipline as the pHash block means: no trailing samples dropped).
    * Fewer samples than segments → trailing segments are 0.
    */
  private def energyEnvelope(mono: Array[Float], dim: Int): Array[Float] = {
    val n = mono.length
    Array.tabulate(dim) { i =>
      val s0 = i.toLong * n / dim
      val s1 = (i + 1).toLong * n / dim
      if (s1 <= s0) 0.0f
      else {
        var s = 0.0
        var j = s0.toInt
        while (j < s1) { s += mono(j).toDouble * mono(j); j += 1 }
        math.sqrt(s / (s1 - s0)).toFloat
      }
    }
  }
}
