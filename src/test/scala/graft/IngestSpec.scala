package graft

import graft.sources.{Embedder, ImageIngest, StubEmbedder}
import org.apache.spark.sql.functions._

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val pngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 1, 2)
  private val jpgMagic = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 9)
  private val garbage = Array[Byte](1, 2, 3, 4, 5)

  test("decodeImages flags corrupt content and keeps valid rows (skip semantics)") {
    val df = Seq(
      ("a/REAL/x1.png", pngMagic),
      ("a/FAKE/x2.jpg", jpgMagic),
      ("a/REAL/bad.png", garbage)).toDF("path", "content")
    val decoded = ImageIngest.decodeImages(df)
    val byPath = decoded.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(byPath("a/REAL/x1.png") && byPath("a/FAKE/x2.jpg") && !byPath("a/REAL/bad.png"))
    // the reference filters skip-sentinel rows out downstream (S3)
    assert(decoded.filter(col("ok")).count() == 2)
    val okRow = decoded.filter(col("ok")).head()
    assert(okRow.getAs[Int]("width") == 8 && okRow.getAs[Array[Byte]]("pixels").length == 8 * 8 * 3)
  }

  test("WebP metadata-only decode: real dims from VP8L/VP8/VP8X headers, pixels at the boundary") {
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val sz = body.length
      tag.getBytes("US-ASCII") ++
        Array[Byte](sz.toByte, (sz >> 8).toByte, (sz >> 16).toByte, (sz >> 24).toByte) ++
        body ++ (if (sz % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    }
    def webp(chunks: Array[Byte]*): Array[Byte] = {
      val payload = "WEBP".getBytes("US-ASCII") ++ chunks.flatten
      val sz = payload.length
      "RIFF".getBytes("US-ASCII") ++
        Array[Byte](sz.toByte, (sz >> 8).toByte, (sz >> 16).toByte, (sz >> 24).toByte) ++
        payload
    }
    // VP8L (lossless): 0x2F signature, then w-1 (14 bits) | h-1 << 14,
    // LSB-first — spec-replicated byte-for-byte
    def vp8l(w: Int, h: Int): Array[Byte] = {
      val bits = (w - 1) | ((h - 1) << 14)
      chunk("VP8L", Array[Byte](0x2F, bits.toByte, (bits >> 8).toByte,
        (bits >> 16).toByte, (bits >> 24).toByte, 0, 0))
    }
    // VP8 (lossy keyframe): 3-byte frame tag, 9D 01 2A start code, LE dims
    def vp8(w: Int, h: Int): Array[Byte] =
      chunk("VP8 ", Array[Byte](0, 0, 0, 0x9D.toByte, 0x01, 0x2A,
        w.toByte, (w >> 8).toByte, h.toByte, (h >> 8).toByte, 0))
    def vp8x(w: Int, h: Int): Array[Byte] =
      chunk("VP8X", Array[Byte](0, 0, 0, 0,
        (w - 1).toByte, ((w - 1) >> 8).toByte, ((w - 1) >> 16).toByte,
        (h - 1).toByte, ((h - 1) >> 8).toByte, ((h - 1) >> 16).toByte))

    assert(ImageIngest.webpDims(webp(vp8l(40, 24))) == Some((40, 24)))
    assert(ImageIngest.webpDims(webp(vp8(320, 200))) == Some((320, 200)))
    // extended container: the inner frame chunk wins; canvas is the
    // fallback when only VP8X parses (odd-size ALPH exercises padding)
    val alph = chunk("ALPH", Array[Byte](1, 2, 3))
    assert(ImageIngest.webpDims(
      webp(vp8x(99, 77), alph, vp8(320, 200))) == Some((320, 200)))
    assert(ImageIngest.webpDims(webp(vp8x(99, 77), alph)) == Some((99, 77)))
    // bare magic (no parseable chunk) and truncation stay out
    assert(ImageIngest.webpDims(webp()) == None)
    assert(ImageIngest.webpDims(
      webp(vp8l(40, 24)).take(16)) == None)
    // a size-LYING chunk (declares 1 byte, more bytes follow) must not
    // decode the next chunk's tag as dimensions — header reads are
    // bounded by the declared chunk size, not just the buffer
    val lying = chunk("VP8L", Array[Byte](0x2F)) // sz=1: signature only
    assert(ImageIngest.webpDims(webp(lying, vp8x(99, 77))) == Some((99, 77)),
      "size-lying VP8L fabricated dims instead of falling through")

    // the host's one REAL third-party WebP (Python's test corpus, a
    // 16x16 lossy VP8X+ALPH+VP8 file) cross-checks the parser against
    // an encoder this repo didn't write
    val real = new java.io.File(
      "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data/python.webp")
    if (real.exists()) {
      val bytes = java.nio.file.Files.readAllBytes(real.toPath)
      assert(ImageIngest.webpDims(bytes) == Some((16, 16)))
    }

    // through decodeImages: parseable WebP = ok, real dims, NULL pixels
    // (metadata-only — never fake bytes); bare magic keeps the 8x8 stub
    val rows = ImageIngest.decodeImages(Seq(
        ("a/x.webp", webp(vp8l(40, 24))),
        ("a/y.webp", webp())).toDF("path", "content"))
      .collect().map(r => r.getString(0) -> r).toMap
    val meta = rows("a/x.webp")
    assert(meta.getBoolean(1) && meta.getInt(2) == 40 && meta.getInt(3) == 24)
    assert(meta.isNullAt(5), "metadata-only decode must not fabricate pixels")
    val stub = rows("a/y.webp")
    assert(stub.getBoolean(1) && stub.getInt(2) == 8 &&
      stub.getAs[Array[Byte]]("pixels").length == 8 * 8 * 3)
  }

  test("decodeImages decodes a real PNG to actual pixels via javax.imageio") {
    // a real 40x24 PNG with a known deterministic pattern, encoded in-test
    val (w, h) = (40, 24)
    def rgbAt(x: Int, y: Int): (Int, Int, Int) =
      ((x * 255) / (w - 1), (y * 255) / (h - 1), (x + y) % 256)
    val buf = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach { x =>
      val (r, g, b) = rgbAt(x, y)
      buf.setRGB(x, y, (r << 16) | (g << 8) | b)
    })
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(buf, "png", bos)
    val pngBytes = bos.toByteArray

    val decoded = ImageIngest.decodeImages(
        Seq(("real/img.png", pngBytes)).toDF("path", "content"))
      .filter(col("ok")).head()
    assert(decoded.getAs[Int]("width") == w && decoded.getAs[Int]("height") == h)
    val px = decoded.getAs[Array[Byte]]("pixels")
    assert(px.length == w * h * 3)
    // PNG is lossless: every decoded pixel equals what was written
    (0 until h).foreach(y => (0 until w).foreach { x =>
      val (r, g, b) = rgbAt(x, y)
      val p = (y * w + x) * 3
      assert((px(p) & 0xFF) == r && (px(p + 1) & 0xFF) == g && (px(p + 2) & 0xFF) == b,
        s"pixel ($x,$y)")
    })
  }

  test("pHash over real decoded PNGs: JPEG-style re-encode is near, distinct is far") {
    import graft.sources.Multimodal
    val (w, h) = (64, 64)
    def render(f: (Int, Int) => Int): Array[Byte] = {
      val buf = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach { x =>
        val v = f(x, y); buf.setRGB(x, y, (v << 16) | (v << 8) | v)
      })
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(buf, "png", bos)
      bos.toByteArray
    }
    def lum(x: Int, y: Int): Int = math.max(0, math.min(255,
      (128 + 45 * math.sin(x / 3.1 + y / 6.2) + 40 * math.cos(x / 6.7 - y / 4.3)).toInt))
    val near = render((x, y) => math.min(255, lum(x, y) + (if ((x * 31 + y) % 59 == 0) 9 else 0)))
    val far = render((x, y) => math.max(0, math.min(255,
      (128 + 50 * math.sin(y / 2.3 - x / 5.9) + 35 * math.cos((x + 2 * y) / 3.7)).toInt)))
    val hashes = ImageIngest.decodeImages(Seq(
        ("a.png", render(lum)), ("b.png", near), ("c.png", far))
        .toDF("path", "content"))
      .filter(col("ok"))
      .select(col("path"), Multimodal.perceptualHash(col("pixels"), w, h).as("ph"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashes("a.png"), hashes("b.png")) <= 3,
      s"near pair too far: ${ham(hashes("a.png"), hashes("b.png"))}")
    assert(ham(hashes("a.png"), hashes("c.png")) >= 10,
      s"distinct pair too close: ${ham(hashes("a.png"), hashes("c.png"))}")
  }

  test("forged-layout label/stem parse (S5)") {
    val df = Seq(("root/REAL/img123.png", pngMagic), ("root/FAKE/y.jpeg", jpgMagic))
      .toDF("path", "content")
    val out = ImageIngest.withForgedLabel(df)
      .select("path", "label", "stem").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(out("root/REAL/img123.png") == (("REAL", "img123")))
    assert(out("root/FAKE/y.jpeg") == (("FAKE", "y")))
  }

  test("GenImage-layout group parse (P1)") {
    val df = Seq(("data/imagenet_ai_0419_biggan/train/ai/p.png", pngMagic))
      .toDF("path", "content")
    val g = ImageIngest.withGenImageGroup(df).select("group").head().getString(0)
    assert(g == "biggan")
  }

  test("prefixed-key demux (S5 merged REAL_FAKE keys)") {
    val df = Seq(("REAL/img1.png", 1), ("FAKE/img2.jpg", 2), ("plain.png", 3))
      .toDF("image_key", "x")
    val out = ImageIngest.demuxPrefixedKeys(df)
      .select("image_key", "label", "stem").collect()
      .map(r => r.getString(0) -> ((Option(r.getString(1)), r.getString(2)))).toMap
    assert(out("REAL/img1.png") == ((Some("REAL"), "img1")))
    assert(out("FAKE/img2.jpg") == ((Some("FAKE"), "img2")))
    assert(out("plain.png") == ((None, "plain")))
  }

  test("stub embedder is deterministic, bounded, content-sensitive") {
    val e = new StubEmbedder(16)
    val a = e.embedBatch(Seq(pngMagic, jpgMagic, null))
    val b = e.embedBatch(Seq(pngMagic, jpgMagic, null))
    assert(a.map(_.toSeq) == b.map(_.toSeq))
    assert(a.forall(v => v.length == 16 && v.forall(x => x >= -1f && x <= 1f)))
    assert(a(0).toSeq != a(1).toSeq)
  }

  test("embedImages: batched mapPartitions plumbing produces one vector per row") {
    val df = Seq(
      ("p1.png", pngMagic), ("p2.jpg", jpgMagic), ("p3.png", pngMagic))
      .toDF("path", "content")
    val out = Embedder.embedImages(df, new StubEmbedder(8), batchSize = 2)
    val rows = out.collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getSeq[Float](1).length == 8))
    // same content → same embedding (deterministic black box)
    val byPath = rows.map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(byPath("p1.png") == byPath("p3.png"))
    assert(byPath("p1.png") != byPath("p2.jpg"))
  }

  test("grouped JSON sink round-trips with partition pruning (S7)") {
    val dir = java.nio.file.Files.createTempDirectory("emb_sink").toString
    val df = Seq(
      ("biggan", "img1.png", Seq(0.1f, 0.2f)),
      ("glide", "img2.png", Seq(0.3f, 0.4f)))
      .toDF("group", "image_key", "embedding")
    ImageIngest.writeGroupedJson(df, dir)
    val back = spark.read.json(dir)
    assert(back.count() == 2)
    val pruned = spark.read.json(dir).filter(col("group") === "biggan")
    assert(pruned.count() == 1)
    assert(pruned.head().getAs[String]("image_key") == "img1.png")
    // layout: one subdir per group (the reference's per-group files)
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(subdirs.toSeq == Seq("group=biggan", "group=glide"))
  }

  test("JSON embedding ingest normalizes {key: vec} objects to rows (S4)") {
    val dir = java.nio.file.Files.createTempDirectory("emb_json")
    val f = dir.resolve("biggan.json")
    java.nio.file.Files.writeString(f,
      """{"img1.png": [0.1, 0.2], "REAL/img2.png": [0.3, 0.4]}""")
    val out = ImageIngest.readJsonEmbeddings(spark, dir.toString + "/*.json")
    val rows = out.collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getString(0) == "biggan"))
    val keys = rows.map(_.getString(1)).toSet
    assert(keys == Set("img1.png", "REAL/img2.png"))
    val demuxed = ImageIngest.demuxPrefixedKeys(out)
      .filter(col("label") === "REAL").count()
    assert(demuxed == 1)
  }
}
