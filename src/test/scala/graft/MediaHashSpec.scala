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
}
