package graft

import org.apache.spark.sql.functions._
import graft.llm.Multimodal

/** The image modality's codec is REAL (JDK ImageIO PNG encode/decode);
  * these tests pin the generator↔decoder contract independently of the
  * DuckDB oracle: a hand-computed digest drives the PNG synthesis and
  * the expected decoded features/raster hashes are derived here from
  * the generator parameters alone — if the codec stopped actually
  * decoding pixels (or PNG round trips stopped being lossless), these
  * fail. */
class MultimodalSpec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("synthesizePng → ImageIO round trip recovers dims and stripe levels losslessly") {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest("jaffle".getBytes("UTF-8"))
    def b(i: Int): Int = digest(i) & 0xff
    val png = Multimodal.synthesizePng(digest)
    // PNG magic — the bytes really are a PNG file, not a digest blob
    assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte &&
      png(2) === 'N'.toByte && png(3) === 'G'.toByte)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth === 64 + b(0) && img.getHeight === 64 + b(1))
    val r = img.getRaster
    for (y <- Seq(0, img.getHeight - 1); x <- 0 until math.min(img.getWidth, 8))
      assert(r.getSample(x, y, 0) === (if (x % 2 == 0) b(2) else b(4)),
        s"pixel ($x,$y)")
  }

  test("mediaFeatures image rows: decoded features equal generator-parameter formulas") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val feats = Multimodal.mediaFeatures(spark, docs)
      .filter(col("media_type") === "image")
    val expected = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), md5(col("text")).as("dg"))
      .as[(Long, String)].collect().map { case (id, dg) =>
        def b(i: Int): Int = Integer.parseInt(dg.substring(2 * i, 2 * i + 2), 16)
        val w = 64 + b(0); val h = 64 + b(1)
        val sum = ((w + 1) / 2 * b(2).toLong + w / 2 * b(4)) * h
        (id, w, h, sum.toDouble / (w.toLong * h) / 255.0,
          ((w - 64).toLong << 24) | ((h - 64).toLong << 16) |
            (b(2).toLong << 8) | b(4).toLong)
      }.toSeq.toDF("doc_id", "width", "height", "brightness", "feature_hash")
    val got = feats.select("doc_id", "width", "height", "brightness", "feature_hash")
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("mediaResized image rows: NN-resize round trip hashes the predicted 64×64 raster") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val thumbs = Multimodal.mediaResized(spark, docs)
      .filter(col("media_type") === "image")
    val expected = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), md5(col("text")).as("dg"))
      .as[(Long, String)].collect().map { case (id, dg) =>
        def b(i: Int): Int = Integer.parseInt(dg.substring(2 * i, 2 * i + 2), 16)
        val w = 64 + b(0)
        val rowHex = (0 until Multimodal.ThumbW).map { x =>
          if ((x * w / Multimodal.ThumbW) % 2 == 0) dg.substring(4, 6)
          else dg.substring(8, 10)
        }.mkString
        (id, md5Hex(rowHex * Multimodal.ThumbH))
      }.toSeq.toDF("doc_id", "content_hash")
    val got = thumbs.select("doc_id", "content_hash")
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("synthesizeWav → AudioSystem round trip recovers rate, length, and levels") {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest("jaffle".getBytes("UTF-8"))
    def b(i: Int): Int = digest(i) & 0xff
    val wav = Multimodal.synthesizeWav(digest)
    // RIFF/WAVE magic — the bytes really are a WAV container
    assert(wav(0) === 'R'.toByte && wav(1) === 'I'.toByte &&
      wav(2) === 'F'.toByte && wav(3) === 'F'.toByte &&
      wav(8) === 'W'.toByte && wav(9) === 'A'.toByte)
    val ain = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = ain.getFormat
    assert(fmt.getSampleRate.toInt === 8000 + 100 * b(0))
    val raw = ain.readAllBytes()
    ain.close()
    assert(raw.length === 256 + 4 * b(1))
    for (i <- 0 until 8)
      assert((raw(i) & 0xff) === (if (i % 2 == 0) b(2) else b(4)), s"sample $i")
  }

  test("mediaFeatures audio rows: decoded features equal generator-parameter formulas") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val feats = Multimodal.mediaFeatures(spark, docs)
      .filter(col("media_type") === "audio")
    val expected = docs.filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), md5(col("text")).as("dg"))
      .as[(Long, String)].collect().map { case (id, dg) =>
        def b(i: Int): Int = Integer.parseInt(dg.substring(2 * i, 2 * i + 2), 16)
        val rate = 8000 + 100 * b(0); val n = 256 + 4 * b(1)
        val sum = (n + 1) / 2 * b(2).toLong + n / 2 * b(4)
        (id, rate, n, sum.toDouble / n / 255.0,
          (b(0).toLong << 24) | (b(1).toLong << 16) |
            (b(2).toLong << 8) | b(4).toLong)
      }.toSeq.toDF("doc_id", "width", "height", "brightness", "feature_hash")
    val got = feats.select("doc_id", "width", "height", "brightness", "feature_hash")
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("mediaResized audio rows: WAV downsample round trip hashes the predicted samples") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val thumbs = Multimodal.mediaResized(spark, docs)
      .filter(col("media_type") === "audio")
    val expected = docs.filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), md5(col("text")).as("dg"))
      .as[(Long, String)].collect().map { case (id, dg) =>
        def b(i: Int): Int = Integer.parseInt(dg.substring(2 * i, 2 * i + 2), 16)
        val n = 256 + 4 * b(1)
        val hex = (0 until Multimodal.ThumbW).map { i =>
          if ((i * n / Multimodal.ThumbW) % 2 == 0) dg.substring(4, 6)
          else dg.substring(8, 10)
        }.mkString
        (id, md5Hex(hex))
      }.toSeq.toDF("doc_id", "content_hash")
    val got = thumbs.select("doc_id", "content_hash")
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("synthesizeGif → ImageIO round trip recovers frame count, dims, per-frame levels") {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest("jaffle".getBytes("UTF-8"))
    def b(i: Int): Int = digest(i) & 0xff
    val gif = Multimodal.synthesizeGif(digest)
    // GIF magic — the bytes really are a GIF container
    assert(gif(0) === 'G'.toByte && gif(1) === 'I'.toByte && gif(2) === 'F'.toByte)
    val reader = javax.imageio.ImageIO.getImageReadersBySuffix("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(gif))
    reader.setInput(iis, false)
    val n = reader.getNumImages(true)
    assert(n === 1 + (b(3) >> 4), "frame count survives the container round trip")
    for (f <- 0 until n) {
      val img = reader.read(f)
      assert(img.getWidth === 64 + b(0) % 64 && img.getHeight === 64 + b(1) % 64, s"frame $f dims")
      val even = (b(2) + Multimodal.FrameLevelStep * f) & 0xff
      val odd = (b(4) + Multimodal.FrameLevelStep * f) & 0xff
      for (y <- Seq(0, img.getHeight - 1); x <- 0 until math.min(img.getWidth, 8))
        assert((img.getRGB(x, y) & 0xff) === (if (x % 2 == 0) even else odd),
          s"frame $f pixel ($x,$y)")
    }
    iis.close(); reader.dispose()
  }

  test("mediaFeatures video rows: decoded all-frame features equal generator formulas") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val feats = Multimodal.mediaFeatures(spark, docs)
      .filter(col("media_type") === "video")
    val expected = docs.filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), md5(col("text")).as("dg"))
      .as[(Long, String)].collect().map { case (id, dg) =>
        def b(i: Int): Int = Integer.parseInt(dg.substring(2 * i, 2 * i + 2), 16)
        val w = 64 + b(0) % 64; val h = 64 + b(1) % 64
        val nF = 1 + (b(3) >> 4)
        val sum = (0 until nF).map { f =>
          val even = (b(2) + Multimodal.FrameLevelStep * f) & 0xff
          val odd = (b(4) + Multimodal.FrameLevelStep * f) & 0xff
          ((w + 1) / 2 * even.toLong + w / 2 * odd) * h
        }.sum
        (id, w, h, sum.toDouble / (nF.toLong * w * h) / 255.0, nF,
          ((w - 64).toLong << 24) | ((h - 64).toLong << 16) |
            (b(2).toLong << 8) | b(4).toLong)
      }.toSeq.toDF("doc_id", "width", "height", "brightness", "n_frames", "feature_hash")
    val got = feats.select("doc_id", "width", "height", "brightness", "n_frames",
      "feature_hash")
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("mediaResized video rows: GIF poster-frame round trip hashes the predicted raster") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val thumbs = Multimodal.mediaResized(spark, docs)
      .filter(col("media_type") === "video")
    val expected = docs.filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), md5(col("text")).as("dg"))
      .as[(Long, String)].collect().map { case (id, dg) =>
        def b(i: Int): Int = Integer.parseInt(dg.substring(2 * i, 2 * i + 2), 16)
        val w = 64 + b(0) % 64
        val rowHex = (0 until Multimodal.ThumbW).map { x =>
          if ((x * w / Multimodal.ThumbW) % 2 == 0) dg.substring(4, 6)
          else dg.substring(8, 10)
        }.mkString
        (id, md5Hex(rowHex * Multimodal.ThumbH))
      }.toSeq.toDF("doc_id", "content_hash")
    val got = thumbs.select("doc_id", "content_hash")
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("mediaFrames: sampled frames hash the decoded per-frame 8x8 grid") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val got = Multimodal.mediaFrames(docs)
      .select("doc_id", "frame_idx", "frame_ts_ms", "frame_hash")
    val expected = docs.filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), md5(col("text")).as("dg"), col("n_chars"))
      .as[(Long, String, Long)].collect().flatMap { case (id, dg, nChars) =>
        def b(i: Int): Int = Integer.parseInt(dg.substring(2 * i, 2 * i + 2), 16)
        val w = 64 + b(0) % 64
        val nF = 1 + (b(3) >> 4)
        val stride = (nF + Multimodal.FrameSampleMax - 1) / Multimodal.FrameSampleMax
        (0 until nF by stride).map { f =>
          val even = (b(2) + Multimodal.FrameLevelStep * f) & 0xff
          val odd = (b(4) + Multimodal.FrameLevelStep * f) & 0xff
          val row8 = (0 until Multimodal.FrameGridN).map { x =>
            f"${if ((x * w / Multimodal.FrameGridN) % 2 == 0) even else odd}%02x"
          }.mkString
          (id, f, nChars * 10 * f / nF, md5Hex(row8 * Multimodal.FrameGridN))
        }
      }.toSeq.toDF("doc_id", "frame_idx", "frame_ts_ms", "frame_hash")
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("mediaAHash: real-decode signatures equal the stripe-formula prediction") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val got = Multimodal.mediaAHash(spark, docs)
    val expected = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), md5(col("text")).as("dg"))
      .as[(Long, String)].collect().map { case (id, dg) =>
        def b(i: Int): Int = Integer.parseInt(dg.substring(2 * i, 2 * i + 2), 16)
        val w = 64 + b(0); val h = 64 + b(1)
        val total = ((w + 1) / 2 * b(2).toLong + w / 2 * b(4)) * h
        var hi = 0L; var lo = 0L
        for (cy <- 0 until 8; cx <- 0 until 8) {
          val x0 = cx * w / 8; val x1 = (cx + 1) * w / 8
          val y0 = cy * h / 8; val y1 = (cy + 1) * h / 8
          val ne = (x1 + 1) / 2 - (x0 + 1) / 2
          val cs = (y1 - y0).toLong * (ne * b(2).toLong + (x1 - x0 - ne) * b(4))
          if (cs * (w.toLong * h) > total * ((x1 - x0).toLong * (y1 - y0))) {
            val k = cy * 8 + cx
            if (k >= 32) hi |= 1L << (k - 32) else lo |= 1L << k
          }
        }
        (id, f"$hi%08x$lo%08x", hi, lo)
      }.toSeq.toDF("doc_id", "ahash", "h_hi", "h_lo")
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("aHashPairs: identical images pair at hamming 0; contracts hold") {
    import spark.implicits._
    // ids ≡ 0 (mod 3) so all rows are images; 3 and 9 share a text →
    // identical PNG → identical hash; 6 differs
    val docs = Seq(
      (3L, "twin twin twin", 14L), (9L, "twin twin twin", 14L),
      (6L, "completely different words here", 31L))
      .toDF("doc_id", "text", "n_chars")
    val sigs = Multimodal.mediaAHash(spark, docs)
    val pairs = Multimodal.aHashPairs(sigs).collect()
    val twin = pairs.filter(r => r.getAs[Long]("doc_a") === 3L &&
      r.getAs[Long]("doc_b") === 9L)
    assert(twin.length === 1 && twin.head.getAs[Long]("hamming") === 0L)
    pairs.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("hamming") <= Multimodal.AHashMaxHamming)
      assert(r.getAs[String]("ahash_a").matches("[0-9a-f]{16}"))
    }
  }
}
