package graft.queries

import graft.sources.{ImageIngest, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal gate queries: drive the REAL image and audio paths
  * (javax.imageio decode → pHash → guarded near-dup join;
  * javax.sound.sampled decode → energy envelope) end-to-end through the
  * driver's harness. The binary fixtures are synthesized deterministically
  * into a temp directory by the query itself — the parquet testdata has no
  * binary columns, and a gate query must be self-contained — then read
  * back through the SAME `binaryFile` scan the production ingest uses.
  * Codec boundaries are JVM-library byte math (not SQL-expressible) →
  * rows-only; MultimodalSpec and IngestSpec pin the decode semantics.
  */
object MultimodalQueries extends QueryPack {

  /** 32×32 RGB PNG with a deterministic two-gradient pattern; `noise`
    * perturbs a sparse pixel subset, the near-dup regime pHash is built
    * to absorb.
    */
  private[queries] def pngBytes(seed: Int, noise: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      32, 32, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 32) {
        val base = if (((x / (4 + seed % 3)) + (y / (3 + seed % 4))) % 2 == 0)
          40 + 13 * seed else 215 - 11 * seed
        val n = if (noise != 0 && (x * 31 + y * 17) % 37 == 0) noise else 0
        val v = math.max(0, math.min(255, base + n))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 16-bit mono PCM WAV: `dim`-segment on/off energy pattern selected by
    * `mask` bit i (on = 0.5-amplitude square wave, off = silence).
    */
  private def wavBytes(mask: Int, segments: Int = 8,
      perSegment: Int = 1000, amp: Int = 16384): Array[Byte] = {
    import javax.sound.sampled._
    val n = segments * perSegment
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val on = ((mask >> (i / perSegment)) & 1) == 1
      val s = if (!on) 0 else if (i % 2 == 0) amp else -amp
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Idempotent fixture layout under the JVM temp dir: same bytes every
    * call, so repeated gate runs scan identical content.
    */
  private def ensureFixtures(): String = {
    val root = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft-mm-fixtures")
    val img = new java.io.File(root, "img")
    val aud = new java.io.File(root, "aud")
    img.mkdirs(); aud.mkdirs()
    // unconditional overwrite: a same-length length check would keep a
    // stale fixture from an older generator alive across JVM runs (the
    // shared tmpdir persists); the files are tiny, rewriting is free
    def put(f: java.io.File, bytes: Array[Byte]): Unit = {
      val os = new java.io.FileOutputStream(f)
      try os.write(bytes) finally os.close()
    }
    // 4 distinct base patterns; seeds 0 and 2 get a near-dup noisy variant
    // and seed 0 an exact copy — known pair structure for the near-dup join
    Seq(0, 1, 2, 3).foreach(s => put(new java.io.File(img, s"base$s.png"), pngBytes(s, 0)))
    put(new java.io.File(img, "base0_noisy.png"), pngBytes(0, 12))
    put(new java.io.File(img, "base2_noisy.png"), pngBytes(2, -12))
    put(new java.io.File(img, "base0_copy.png"), pngBytes(0, 0))
    (0 until 6).foreach(i =>
      put(new java.io.File(aud, s"clip$i.wav"), wavBytes(mask = (0x35 * (i + 1)) & 0xFF)))
    // near-dup corpus (own subdir so the energy-profile query's row set is
    // untouched): two base patterns, each with a lower-gain re-encode —
    // same envelope SHAPE, the invariance the delta fingerprint encodes
    val and = new java.io.File(root, "aud_nd")
    and.mkdirs()
    put(new java.io.File(and, "songA.wav"), wavBytes(mask = 0x35))
    put(new java.io.File(and, "songA_quiet.wav"), wavBytes(mask = 0x35, amp = 9011))
    put(new java.io.File(and, "songB.wav"), wavBytes(mask = 0xC6))
    put(new java.io.File(and, "songB_quiet.wav"), wavBytes(mask = 0xC6, amp = 11800))
    root.getAbsolutePath
  }

  // image near-dup discovery over REAL decoded pixels: binaryFile scan →
  // imageio decode → DCT pHash → 4-block pigeonhole join with hot-bucket
  // guard. The noisy variants and the exact copy must pair with their
  // bases; distinct patterns must not.
  private val imageNearDups = OracleQuery(
    "mm_image_neardup_pairs",
    (s, _) => {
      val root = ensureFixtures()
      val decoded = ImageIngest.decodeImages(
        ImageIngest.scanImages(s, s"$root/img"))
        .filter(col("ok"))
        .select(
          element_at(split(col("path"), "/"), -1).as("name"),
          Multimodal.perceptualHash(col("pixels"), 32, 32).as("phash"))
      Multimodal.imageNearDups(decoded, maxHamming = 3, idCol = "name")
        .orderBy(col("id_a"), col("id_b"))
    },
    None)

  // audio near-dup discovery over REAL decoded PCM: binaryFile scan →
  // javax.sound.sampled decode → 65-segment envelope → energy-delta
  // fingerprint (gain-invariant by construction) → the same 4×16-bit
  // Hamming block join the image family uses. The lower-gain re-encodes
  // must pair with their bases; JVM codec byte math → rows-only,
  // MultimodalSpec pins the fingerprint semantics
  private val audioNearDupPairs = OracleQuery(
    "mm_audio_neardup_pairs",
    (s, _) => {
      val root = ensureFixtures()
      val media = s.read.format("binaryFile")
        .option("pathGlobFilter", "*.wav").load(s"$root/aud_nd")
        .select(
          element_at(split(col("path"), "/"), -1).as("name"),
          lit("audio").as("kind"),
          col("content").as("payload"))
      val withFp = Multimodal.audioFeatures(media, dim = 65)
        .select(col("name"),
          Multimodal.audioFingerprint(col("features")).as("afp"))
      Multimodal.audioNearDups(withFp, maxHamming = 3, idCol = "name")
        .orderBy(col("id_a"), col("id_b"))
    },
    None)

  // audio energy profiling over REAL decoded PCM: binaryFile scan →
  // javax.sound.sampled decode → 8-segment RMS envelope → per-clip
  // activity stats (the shape a voice-activity / silence-trim stage needs)
  private val audioEnergy = OracleQuery(
    "mm_audio_energy_profile",
    (s, _) => {
      val root = ensureFixtures()
      val media = s.read.format("binaryFile")
        .option("pathGlobFilter", "*.wav").load(s"$root/aud")
        .select(
          xxhash64(col("path")).as("asset_id"),
          element_at(split(col("path"), "/"), -1).as("name"),
          lit("audio").as("kind"),
          struct(lit(null).cast("int").as("width"),
            lit(null).cast("int").as("height"),
            lit(1000L).as("duration_ms"), lit(8000).as("sample_rate"),
            lit("wav").as("codec")).as("meta"),
          col("content").as("payload"))
      Multimodal.audioFeatures(media, dim = 8)
        .select(col("name"),
          aggregate(col("features"),
            lit(0), (acc, x) => acc + when(x > 0.1f, 1).otherwise(0))
            .as("active_segments"),
          round(array_max(col("features")).cast("double"), 3).as("peak_rms"))
        .orderBy(col("name"))
    },
    None)

  override val all: Seq[OracleQuery] =
    Seq(imageNearDups, audioEnergy, audioNearDupPairs)
}
