package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Perceptual media hash (dHash) + Hamming-band near-dup dedup: the
  * pixel-domain path over REAL decoded images (PNG via ImageIO — the
  * byte-domain fallback is driver-oracle-gated by q_media_phash), the
  * robustness/separation contract, and mediaNearDups' exact-recall
  * band join against a driver-computed ground truth. */
class MediaHashSpec extends SparkSpec {
  import spark.implicits._

  private def png(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Horizontal gradient with a per-row tint — distinct block means in
    * both dimensions so the hash has structure. */
  private def gradient(w: Int, h: Int, invert: Boolean): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 255) / (w - 1)
      val g = if (invert) 255 - v else v
      val b = (y * 255) / (h - 1)
      img.setRGB(x, y, (g << 16) | (g << 8) | b)
    }
    img
  }

  private def media(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("media_id", "data")

  test("pixel dHash: deterministic across encodes, stable under a " +
      "1-pixel perturbation, far from the inverted image") {
    val base = gradient(32, 32, invert = false)
    val perturbed = gradient(32, 32, invert = false)
    // nudge one pixel's luma slightly — block means move by ~1/16 level
    val rgb = perturbed.getRGB(5, 5)
    perturbed.setRGB(5, 5, rgb ^ 0x000002)
    val inverted = gradient(32, 32, invert = true)
    val out = Multimodal.mediaHash(media(Seq(
        (0L, png(base)), (1L, png(base)), (2L, png(perturbed)),
        (3L, png(inverted)))))
      .select("media_id", "phash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) === out(1L), "same image, two encodes")
    assert(java.lang.Long.bitCount(out(0L) ^ out(2L)) <= 7,
      "1-pixel perturbation stays within the near-dup radius")
    assert(java.lang.Long.bitCount(out(0L) ^ out(3L)) > 7,
      "inverted gradient is not a near-dup")
    assert(out(0L) !== 0L, "hash has structure")
  }

  test("pixel dHash survives rescale: the 2x-upscaled image hashes " +
      "within the near-dup radius of the original") {
    val base = gradient(32, 32, invert = false)
    val big = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    val g2d = big.createGraphics()
    g2d.drawImage(base, 0, 0, 64, 64, null)
    g2d.dispose()
    val out = Multimodal.mediaHash(media(Seq(
        (0L, png(base)), (1L, png(big)))))
      .select("media_id", "phash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(out(0L) ^ out(1L)) <= 7,
      s"hamming ${java.lang.Long.bitCount(out(0L) ^ out(1L))}")
  }

  test("routing: a non-image blob takes the byte-domain fallback " +
      "(hash equals byteDHash of the raw bytes)") {
    val bytes = "not an image at all, just text bytes é中"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val got = Multimodal.mediaHash(media(Seq((0L, bytes))))
      .select("phash").head().getLong(0)
    assert(got === Multimodal.byteDHash(bytes))
    // and the bit-string presentation is the MSB-first binary form
    val bits = Multimodal.mediaHash(media(Seq((0L, bytes))))
      .select("phash_bits").head().getString(0)
    assert(bits.length === 64)
    assert(java.lang.Long.parseUnsignedLong(bits, 2) === got)
  }

  test("mediaNearDups: band join returns EXACTLY the pairs within the " +
      "Hamming radius (ground truth from the hashes themselves)") {
    val imgs = Seq(
      0L -> png(gradient(32, 32, invert = false)),
      1L -> png(gradient(32, 32, invert = false)),   // exact dup of 0
      2L -> png(gradient(32, 32, invert = true)),
      3L -> "text blob one, definitely not an image".getBytes("UTF-8"),
      4L -> "text blob one, definitely not an image".getBytes("UTF-8"),
      5L -> "a completely different text payload with other bytes"
        .getBytes("UTF-8"))
    val df = media(imgs)
    val hashes = Multimodal.mediaHash(df)
      .select("media_id", "phash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      if java.lang.Long.bitCount(hashes(a) ^ hashes(b)) <= 7
    } yield (a, b)).toSet
    assert(expected.contains((0L, 1L)) && expected.contains((3L, 4L)),
      "constructed dups must be in the ground truth")
    val got = Multimodal.mediaNearDups(df, "media_id", maxHamming = 7)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
    // recall is exact for <= 7 by pigeonhole; radius 0 = exact dups only
    val exact0 = Multimodal.mediaNearDups(df, "media_id", maxHamming = 0)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact0 === (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      if hashes(a) == hashes(b) } yield (a, b)).toSet)
  }

  test("mediaNearDups adaptive banding: radius 3 runs 4x16-bit bands " +
      "with EXACT recall (ground truth from the hashes), and disabling " +
      "both guards reproduces the same pairs") {
    val rows = (0L until 12L).map { i =>
      val txt =
        if (i < 4) "shared payload for the dup cluster"
        else s"unique payload number $i with its own distinct byte mix"
      i -> txt.getBytes("UTF-8")
    }
    val df = media(rows)
    val hashes = Multimodal.mediaHash(df)
      .select("media_id", "phash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      if java.lang.Long.bitCount(hashes(a) ^ hashes(b)) <= 3
    } yield (a, b)).toSet
    assert(expected.nonEmpty, "dup cluster must produce ground truth")
    val got = Multimodal.mediaNearDups(df, "media_id", maxHamming = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
    val unguarded = Multimodal.mediaNearDups(df, "media_id",
        maxHamming = 3, maxBucket = Int.MaxValue, maxCandidatePairs = 0L)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unguarded === expected, "guards must be no-ops on a tiny corpus")
  }

  test("mediaNearDups candidate-volume guard fails fast with a remedy " +
      "pointer when the post-cap estimate exceeds the budget") {
    val df = media((0L until 40L).map(i =>
      i -> "every row is the identical blob".getBytes("UTF-8")))
    val e = intercept[IllegalStateException] {
      Multimodal.mediaNearDups(df, "media_id", maxHamming = 3,
        maxCandidatePairs = 10L).count()
    }
    assert(e.getMessage.contains("maxCandidatePairs"))
    assert(e.getMessage.contains("Remedies"))
  }

  test("mediaNearDups maxBucket cap: a hot bucket (dup pile-up) is " +
      "anti-joined out before the self-join; small clusters survive") {
    val hot = (0L until 30L).map(i =>
      i -> "the pile-up blob shared by thirty rows".getBytes("UTF-8"))
    val pair = Seq(
      100L -> "a small two-row cluster payload".getBytes("UTF-8"),
      101L -> "a small two-row cluster payload".getBytes("UTF-8"))
    val got = Multimodal.mediaNearDups(media(hot ++ pair), "media_id",
        maxHamming = 3, maxBucket = 10)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((100L, 101L)),
      "over-cap buckets dropped, under-cap pair kept")
  }

  test("audioHash is container-invariant: the same PCM payload wrapped " +
      "at different sample rates hashes identically (= byteDHash of the " +
      "samples), and NOT like the container bytes") {
    val payload = "pcm payload bytes for the audio hash é中".getBytes("UTF-8")
    val wav8k = Multimodal.buildWav(media(Seq(0L -> payload)), 8000f)
    val wav44k = Multimodal.buildWav(media(Seq(1L -> payload)), 44100f)
    val out = Multimodal.audioHash(wav8k.unionByName(wav44k))
      .select("media_id", "phash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) === out(1L), "container label must not affect the hash")
    assert(out(0L) === Multimodal.byteDHash(payload),
      "sample-space hash = byteDHash of the decoded PCM stream")
    val container = wav8k.select("data").head().getAs[Array[Byte]](0)
    assert(Multimodal.byteDHash(container) !== out(0L),
      "a decode failure (hashing the RIFF container) could not pass")
    // undecodable blob → byte-domain fallback over the raw bytes
    val raw = Multimodal.audioHash(media(Seq(2L -> payload)))
      .select("phash").head().getLong(0)
    assert(raw === Multimodal.byteDHash(payload))
  }

  test("audioNearDups: re-encoded audio (same samples, different " +
      "container) dedups at hamming 0; distinct payloads don't pair") {
    val p = "identical audio samples across two containers".getBytes("UTF-8")
    val q = "a completely different pcm payload with other bytes in it"
      .getBytes("UTF-8")
    val corpus = Multimodal.buildWav(media(Seq(10L -> p)), 8000f)
      .unionByName(Multimodal.buildWav(media(Seq(11L -> p)), 44100f))
      .unionByName(Multimodal.buildWav(media(Seq(12L -> q)), 8000f))
    val got = Multimodal.audioNearDups(corpus, "media_id", maxHamming = 0)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((10L, 11L)))
  }

  test("mediaNearDups on an empty / all-null-blob corpus returns an " +
      "empty pair set (the guard's sum-over-zero-rows is coalesced)") {
    val allNull = media(Seq(0L -> null, 1L -> null))
    assert(Multimodal.mediaNearDups(allNull, "media_id").count() === 0L)
    assert(Multimodal.mediaNearDups(media(Seq.empty), "media_id")
      .count() === 0L)
  }

  // ── audio canonicalization ──────────────────────────────────────────

  /** Wrap a raw payload in a real container via AudioSystem.write. */
  private def container(payload: Array[Byte],
      fmt: javax.sound.sampled.AudioFormat,
      typ: javax.sound.sampled.AudioFileFormat.Type): Array[Byte] = {
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(payload), fmt,
      payload.length.toLong / fmt.getFrameSize)
    val baos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, typ, baos)
    baos.toByteArray
  }

  test("G.711 expansion tables match the JDK's own ULAW/ALAW codec " +
      "for every code (the closed form the oracle replays is the " +
      "codec's truth)") {
    import javax.sound.sampled.{AudioFormat, AudioSystem, AudioInputStream}
    for ((enc, table) <- Seq(
        AudioFormat.Encoding.ULAW -> Multimodal.ulawToLinear,
        AudioFormat.Encoding.ALAW -> Multimodal.alawToLinear)) {
      val codes = Array.tabulate[Byte](256)(i => i.toByte)
      val src = new AudioInputStream(
        new java.io.ByteArrayInputStream(codes),
        new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false), 256L)
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        8000f, 16, 1, 2, 8000f, false)
      val lin = AudioSystem.getAudioInputStream(target, src).readAllBytes()
      assert(lin.length === 512)
      val jdk = Array.tabulate(256) { i =>
        ((lin(2 * i + 1).toInt << 8) | (lin(2 * i) & 0xff)).toShort.toInt
      }
      assert(jdk.toSeq === table.toSeq, s"$enc table diverges from the JDK")
    }
  }

  test("audioHash is ENCODING-invariant: 8-bit unsigned WAV, 16-bit LE " +
      "WAV and 16-bit BE AIFF of the same samples hash identically " +
      "(and still = byteDHash of the 8-bit payload)") {
    import javax.sound.sampled.{AudioFormat, AudioFileFormat}
    val payload = "the canonical sample stream é中".getBytes("UTF-8")
    // the exact 16-bit embedding of 8-bit unsigned b: s = (b-128)*256
    def s16(b: Byte): Int = ((b & 0xff) - 128) << 8
    val le = payload.flatMap(b =>
      Array((s16(b) & 0xff).toByte, ((s16(b) >> 8) & 0xff).toByte))
    val be = payload.flatMap(b =>
      Array(((s16(b) >> 8) & 0xff).toByte, (s16(b) & 0xff).toByte))
    val rows = media(Seq(
      0L -> container(payload, new AudioFormat(
        AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false),
        AudioFileFormat.Type.WAVE),
      1L -> container(le, new AudioFormat(
        AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false),
        AudioFileFormat.Type.WAVE),
      2L -> container(be, new AudioFormat(
        AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, true),
        AudioFileFormat.Type.AIFF)))
    val out = Multimodal.audioHash(rows)
      .select("media_id", "phash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) === Multimodal.byteDHash(payload),
      "8-bit hash unchanged by sample-space canonicalization")
    assert(out(1L) === out(0L), "16-bit LE WAV rewrap")
    assert(out(2L) === out(0L), "16-bit BE AIFF rewrap")
  }

  test("buildWavUlaw → audioHash expands the G.711 codes (hash = " +
      "intDHash of the expanded samples, NOT the byte-passthrough)") {
    // a payload built to BREAK mean-order preservation under the
    // (nonlinear) expansion: even blocks {0x00, 0xFF} have byte mean
    // 127.5 but expanded u16 mean (644 + 32768)/2 = 16706; odd blocks
    // {0x60, 0x60} have byte mean 96 but u16 mean 32396 — every
    // adjacent block comparison FLIPS, so a linear read of the codes
    // deterministically cannot hash like the expansion
    val codes = Array.tabulate[Byte](144) { i =>
      if ((i / 2) % 2 == 0) { if (i % 2 == 0) 0x00 else 0xFF.toByte }
      else 0x60.toByte
    }
    val wav = Multimodal.buildWavUlaw(media(Seq(0L -> codes)))
    val got = Multimodal.audioHash(wav).select("phash").head().getLong(0)
    val want = Multimodal.intDHash(
      codes.map(b => Multimodal.ulawToLinear(b & 0xff) + 32768))
    assert(got === want)
    assert(got !== Multimodal.byteDHash(codes),
      "reading the codes as linear samples could not pass")
  }

  // ── video tier ──────────────────────────────────────────────────────

  /** Scala replay of the buildAviBlocks arithmetic (the oracle's
    * closed form): per-frame dHash over blockVideoLevel + majority
    * pool, written independently of videoHashOf's loop shape. */
  private def pooledHashOver(content: Long, fset: Seq[Int],
      jitter: Long): Long = {
    def frameHash(f: Int): Long = {
      var h = 0L
      for (r <- 0 until 8; c <- 0 until 8)
        if (Multimodal.blockVideoLevel(content, f, r, c + 1, jitter) >
            Multimodal.blockVideoLevel(content, f, r, c, jitter))
          h |= 1L << (r * 8 + c)
      h
    }
    val fh = fset.map(frameHash)
    var h = 0L
    for (j <- 0 until 64) {
      val c = fh.count(x => (x >>> j & 1L) == 1L)
      if (2 * c >= fh.length) h |= 1L << j
    }
    h
  }

  private def pooledHash(content: Long, frames: Int, jitter: Long): Long =
    pooledHashOver(content, 0 until frames, jitter)

  test("videoHash over buildAviBlocks ≡ the arithmetic replay " +
      "(encode → mux → demux → BMP decode → luma → dHash → majority " +
      "pool, all real); a byte-domain fallback could not match") {
    val rows = Seq((5L, 5L, 0L), (6L, 6L, 0L), (7L, -7L, 0L))
      .toDF("media_id", "content", "jitter")
    val avi = Multimodal.buildAviBlocks(rows, "media_id", "content",
      "jitter", frames = 3)
    val got = Multimodal.videoHash(avi, n = 3)
      .select("media_id", "phash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(5L) === pooledHash(5L, 3, 0L))
    assert(got(6L) === pooledHash(6L, 3, 0L))
    assert(got(7L) === pooledHash(-7L, 3, 0L),
      "negative content ids floorMod cleanly")
    val blob = avi.filter(col("media_id") === 5L)
      .select("data").head().getAs[Array[Byte]](0)
    assert(Multimodal.byteDHash(blob) !== got(5L),
      "hashing the container bytes could not pass")
  }

  test("videoHash: jitter perturbs at most 2 bits per signature, and " +
      "videoNearDups pairs the jittered clone with its original") {
    val rows = Seq((0L, 42L, 0L), (1L, 42L, 101L), (2L, 99L, 0L))
      .toDF("media_id", "content", "jitter")
    val avi = Multimodal.buildAviBlocks(rows, "media_id", "content",
      "jitter", frames = 3)
    val hs = Multimodal.videoHash(avi, n = 3)
      .select("media_id", "phash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d01 = java.lang.Long.bitCount(hs(0L) ^ hs(1L))
    assert(d01 <= 2, s"one-block jitter moved $d01 bits")
    assert(java.lang.Long.bitCount(hs(0L) ^ hs(2L)) > 3,
      "distinct content is not a near-dup")
    val pairs = Multimodal.videoNearDups(avi, "media_id", n = 3,
        maxHamming = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("videoHash salvage: a mid-frame-2 truncation pools frames {0,1}; " +
      "a corrupted frame-1 BMP magic pools frames {0,2} — both hash in " +
      "PIXEL space, never the byte fallback (the q_video_dirty contract)") {
    val rows = Seq((0L, 11L, 0L), (1L, 12L, 0L))
      .toDF("media_id", "content", "jitter")
    val blobs = Multimodal.buildAviBlocks(rows, "media_id", "content",
        "jitter", frames = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val b0 = blobs(0L)
    val s0 = Multimodal.demuxAviSpans(b0)
    val cut = java.util.Arrays.copyOfRange(b0, 0, s0(2)._1 + s0(2)._2 / 2)
    val b1 = blobs(1L).clone()
    b1(Multimodal.demuxAviSpans(b1)(1)._1) = 0 // kill frame 1's 'B' magic
    val got = Multimodal.videoHash(media(Seq(0L -> cut, 1L -> b1)))
      .select("media_id", "phash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) === pooledHashOver(11L, Seq(0, 1), 0L))
    assert(got(1L) === pooledHashOver(12L, Seq(0, 2), 0L))
    assert(got(0L) !== Multimodal.byteDHash(cut),
      "byte-hashing the salvageable truncated container could not pass")
    assert(got(1L) !== Multimodal.byteDHash(b1),
      "byte-hashing the salvageable bad-frame container could not pass")
  }

  test("videoHash: non-AVI blobs fall back to byteDHash; an AVI whose " +
      "frames all fail to decode falls back too") {
    val junk = "not a riff container at all".getBytes("UTF-8")
    val got = Multimodal.videoHash(media(Seq(0L -> junk)))
      .select("phash").head().getLong(0)
    assert(got === Multimodal.byteDHash(junk))
  }

  test("buildBlockPng: a NEGATIVE id still renders in-range gray " +
      "levels (floorMod) and round-trips to the arithmetic hash") {
    val df = Seq(-5L).toDF("doc_id")
    val got = Multimodal.mediaHash(Multimodal.buildBlockPng(df, "doc_id"))
      .select("phash").head().getLong(0)
    var want = 0L
    for (r <- 0 until 8; c <- 0 until 8) {
      def v(bx: Int) = math.floorMod(-5L * 37 + r * 17 + bx * 23, 199) + 1
      if (v(c + 1) > v(c)) want |= 1L << (r * 8 + c)
    }
    assert(got === want)
  }
}
