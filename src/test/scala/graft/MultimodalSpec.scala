package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MultimodalFunctions._

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("media metadata struct + metadata-only resize (no payload touch)") {
    val df = Seq(("doc1", "payload-bytes-here")).toDF("id", "txt")
      .withColumn("payload", asPayload(col("txt")))
      .withColumn("meta", mediaMeta("png", 640, 480))
    val resized = resizeMeta(df, "meta", 64, 64)
    val r = resized.select("meta.format", "meta.width", "meta.height").head()
    assert((r.getString(0), r.getInt(1), r.getInt(2)) == ("png", 64, 64))
    // payload untouched
    assert(resized.select(md5(col("payload"))).head().getString(0) ==
      df.select(md5(col("payload"))).head().getString(0))
  }

  test("fakeFeaturesForTesting emits the documented schema with deterministic stub features") {
    val df = Seq((7L, "abc")).toDF("doc_id", "txt")
      .withColumn("payload", asPayload(col("txt")))
    val out = fakeFeaturesForTesting(df, "doc_id", "payload")
    assert(out.schema == decodedSchema)
    val row = out.head()
    assert(row.getLong(0) == 7L && row.getInt(1) == 3)
    val feats = row.getAs[scala.collection.Seq[Float]](2)
    assert(feats.size == 8 && feats.forall(f => f >= 0.0f && f <= 1.0f))
    // deterministic: same payload, same features
    assert(fakeFeaturesForTesting(df, "doc_id", "payload").head().getAs[scala.collection.Seq[Float]](2) == feats)
  }

  test("decodeImageFeatures: ImageIO PNG round-trip recovers exact pixels; non-images get null rows") {
    // known pixel matrix, asymmetric in both axes so a transposed or
    // flipped decode cannot pass: 2 wide x 3 tall
    val rgb = Array(0xFF0000, 0x00FF00, 0x0000FF, 0x102030, 0xFFFFFF, 0x000000)
    val png = encodePng(2, 3, rgb)
    val truncated = png.take(20) // valid magic, unreadable body
    val df = Seq((0L, png), (1L, "not an image".getBytes), (2L, truncated))
      .toDF("doc_id", "payload")
    val out = decodeImageFeatures(df, "doc_id", "payload")
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    val ok = out(0)
    assert(ok.getInt(1) == 2 && ok.getInt(2) == 3)
    // exact means from the source pixels: sums over the 6 pixels
    def mean(shift: Int) = {
      val s = rgb.map(v => (v >> shift) & 0xff).map(_.toLong).sum
      java.math.BigDecimal.valueOf(s)
        .divide(java.math.BigDecimal.valueOf(6), 6, java.math.RoundingMode.HALF_UP)
        .doubleValue()
    }
    assert(ok.getDouble(3) == mean(16) && ok.getDouble(4) == mean(8) &&
      ok.getDouble(5) == mean(0))
    // undecodable payloads keep their rows with null metadata (the
    // decodeMedia raw convention) — never silently dropped
    Seq(out(1), out(2)).foreach { r =>
      assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
    }
  }

  test("decodeImageFeatures: exactly-lossless JDK writers (png/bmp) round-trip identically; gif/jpeg decode with correct dims") {
    // png and bmp writers are bit-exact from TYPE_INT_RGB; the JDK's
    // gif writer QUANTIZES through its own palette even for 4-color
    // images (measured: channel means shift), and jpeg is lossy by
    // design — so those two assert dimensions only. The oracle-gated
    // path (x5d) uses png.
    val rgb = Array.tabulate(16)(i => Seq(0x000000, 0xFF0000, 0x00FF00, 0xFFFFFF)(i % 4))
    def enc(fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 4, 4, rgb, 0, 4)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no JDK writer for $fmt")
      bos.toByteArray
    }
    val df = Seq(("png", 0L), ("bmp", 1L), ("gif", 2L), ("jpg", 3L))
      .map { case (f, id) => (id, enc(f)) }.toDF("doc_id", "payload")
    val rows = decodeImageFeatures(df, "doc_id", "payload")
      .orderBy("doc_id").collect()
    rows.foreach(r => assert(r.getInt(1) == 4 && r.getInt(2) == 4))
    val Array(png, bmp, _, _) = rows
    assert((bmp.getDouble(3), bmp.getDouble(4), bmp.getDouble(5)) ==
      ((png.getDouble(3), png.getDouble(4), png.getDouble(5))))
    // the exact expected means from the source pixels
    assert(png.getDouble(3) == 127.5 && png.getDouble(4) == 127.5 &&
      png.getDouble(5) == 63.75)
  }

  test("decodeMedia parses real BMP and WAV headers and falls back to raw") {
    // hand-assembled little-endian headers, independent of the x5b
    // hex-expression synthesis path
    def le4(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le2(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val bmp = "BM".getBytes ++ le4(70) ++ le4(0) ++ le4(54) ++ // file header
      le4(40) ++ le4(640) ++ le4(480) ++ le2(1) ++ le2(24) ++ // DIB: w, h, planes, bpp
      Array.fill[Byte](24)(0) ++ Array.fill[Byte](12)(0x55)
    val wav = "RIFF".getBytes ++ le4(2084) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le4(16) ++ le2(1) ++ le2(2) ++ le4(44100) ++ // ch, rate
      le4(176400) ++ le2(4) ++ le2(16) ++ "data".getBytes ++ le4(2048) ++
      Array.fill[Byte](8)(0)
    val raw = "not-a-media-file".getBytes
    val df = Seq((0L, bmp), (1L, wav), (2L, raw)).toDF("doc_id", "payload")
    val out = decodeMedia(df, "doc_id", "payload").orderBy("doc_id").collect()
    assert(out(0).getString(1) == "bmp" && out(0).getInt(3) == 640 &&
      out(0).getInt(4) == 480 && out(0).getInt(7) == 24)
    assert(out(1).getString(1) == "wav" && out(1).getInt(5) == 44100 &&
      out(1).getInt(6) == 2 && out(1).getInt(7) == 16)
    assert(out(2).getString(1) == "raw" && out(2).isNullAt(3) && out(2).isNullAt(5))
    assert(out(2).getInt(2) == raw.length)
  }

  test("decodeMedia accepts spec-valid extended fmt chunks (len 18 and 40) and odd-length chunk padding") {
    // WAVE_FORMAT_EXTENSIBLE writes fmt len 40; many encoders write 18.
    // The r12 fix relaxed the walk from len == 16 to len >= 16 — pin
    // both extended sizes, plus a preceding ODD-length chunk so the
    // RIFF word-alignment (len & 1 pad) in the walk is exercised too.
    def le4(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le2(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def fmtChunk(len: Int) = "fmt ".getBytes ++ le4(len) ++ le2(0xFFFE) ++
      le2(6) ++ le4(48000) ++ le4(1152000) ++ le2(24) ++ le2(24) ++
      Array.fill[Byte](len - 16)(0)
    def wavWith(pre: Array[Byte], fmtLen: Int) = {
      val body = pre ++ fmtChunk(fmtLen) ++ "data".getBytes ++ le4(4) ++ Array.fill[Byte](4)(0)
      "RIFF".getBytes ++ le4(4 + body.length) ++ "WAVE".getBytes ++ body
    }
    val oddChunk = "LIST".getBytes ++ le4(3) ++ Array[Byte](1, 2, 3, 0) // 3 data + 1 pad
    val df = Seq(
      (18L, wavWith(Array.emptyByteArray, 18)),
      (40L, wavWith(Array.emptyByteArray, 40)),
      (41L, wavWith(oddChunk, 40))
    ).toDF("doc_id", "payload")
    val out = decodeMedia(df, "doc_id", "payload").orderBy("doc_id").collect()
    for (r <- out)
      assert(r.getString(1) == "wav" && r.getInt(5) == 48000 &&
        r.getInt(6) == 6 && r.getInt(7) == 24,
        s"doc ${r.getLong(0)}: $r")
  }

  test("decodeMedia parses PNG IHDR and JPEG SOF headers (hand-assembled bytes)") {
    def be4(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be2(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be4(13) ++ "IHDR".getBytes ++ be4(800) ++ be4(600) ++
      Array[Byte](16, 2, 0, 0, 0) ++ be4(0) // depth 16, truecolor, fake CRC
    // SOI, APP0(JFIF), a COM segment the SOF walk must skip, SOF2
    // (progressive, also in the C0-CF set), EOI
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Array[Byte](0xff.toByte, 0xe0.toByte) ++ be2(16) ++ "JFIF".getBytes ++
      Array[Byte](0, 1, 1, 0) ++ be2(1) ++ be2(1) ++ Array[Byte](0, 0) ++
      (Array[Byte](0xff.toByte, 0xfe.toByte) ++ be2(7) ++ "hello".getBytes) ++
      (Array[Byte](0xff.toByte, 0xc2.toByte) ++ be2(11) ++ Array[Byte](12) ++
        be2(240) ++ be2(320) ++ Array[Byte](1, 0x11, 0x11, 0)) ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
    val df = Seq((0L, png), (1L, jpeg)).toDF("doc_id", "payload")
    val out = decodeMedia(df, "doc_id", "payload").orderBy("doc_id").collect()
    assert(out(0).getString(1) == "png" && out(0).getInt(3) == 800 &&
      out(0).getInt(4) == 600 && out(0).getInt(7) == 16)
    assert(out(1).getString(1) == "jpeg" && out(1).getInt(3) == 320 &&
      out(1).getInt(4) == 240 && out(1).getInt(6) == 1 && out(1).getInt(7) == 12)
  }

  test("decodeMedia plan is pure column expressions — no RDD scan node") {
    val df = Seq((0L, "xx".getBytes)).toDF("doc_id", "payload")
    val plan = decodeMedia(df, "doc_id", "payload")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD") && !plan.contains("Scan rdd"),
      s"decodeMedia left Tungsten:\n$plan")
  }

  test("sampleFrames covers the payload with the configured stride") {
    val txt = "x" * 300
    val df = Seq((1L, txt)).toDF("doc_id", "txt")
      .withColumn("payload", asPayload(col("txt")))
    val frames = sampleFrames(df, "doc_id", "payload", frameBytes = 64, stride = 2)
    val rows = frames.orderBy("frame_no").collect()
    assert(rows.map(_.getAs[Int]("frame_no")).toSeq == Seq(0, 1))
    assert(rows.forall(_.getAs[Array[Byte]]("frame").length <= 64))
  }

  test("sampleFrames: payloads shorter than frameBytes (incl. empty) keep their frame_no-0 row, truncated") {
    val df = Seq((1L, "short"), (2L, "")).toDF("doc_id", "txt")
      .withColumn("payload", asPayload(col("txt")))
    val rows = sampleFrames(df, "doc_id", "payload", frameBytes = 64, stride = 2)
      .orderBy("doc_id").collect()
    // every input row stays represented - consumers needing strictly
    // full windows filter octet_length(frame) = frameBytes downstream
    assert(rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("frame_no"))).toSeq ==
      Seq((1L, 0), (2L, 0)))
    assert(rows.map(_.getAs[Array[Byte]]("frame").length).toSeq == Seq(5, 0))
  }

  test("payloadEntropy: constant payload is 0, uniform alphabet is ln(k)") {
    val df = Seq(
      (1L, "aaaaaaaa"),          // one symbol: entropy 0
      (2L, "abababab"),          // two symbols, uniform: ln 2
      (3L, "abcdabcd")           // four symbols, uniform: ln 4
    ).toDF("doc_id", "txt").withColumn("payload", asPayload(col("txt")))
    val out = payloadEntropy(df, "doc_id", "payload")
      .orderBy("doc_id")
      .select("doc_id", "byte_len", "n_distinct", "entropy")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def fx(k: Int): Double = {
      // the operator's fixed-point arithmetic at p = 1/k over 1 symbol
      // class each: k identical terms round individually then sum
      val term = BigDecimal((1.0 / k) * math.log(1.0 / k) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      math.rint(-(term * k).toDouble / 1e6 * 1e6) / 1e6
    }
    assert(out.toSeq == Seq(
      (1L, 8L, 1L, 0.0), (2L, 8L, 2L, fx(2)), (3L, 8L, 4L, fx(4))))
  }

  test("payloadEntropy keeps one row per input: empty and NULL payloads get zero defaults") {
    // empty/NULL never survive the explode — the operator must emit
    // (id, 0, 0, 0.0) for them or a caller joining back on id loses
    // the rows without a signal (round-5 advice)
    val df = Seq((1L, Option("abc")), (2L, Option("")), (3L, Option.empty[String]))
      .toDF("doc_id", "txt")
      .withColumn("payload", asPayload(col("txt")))
    val out = payloadEntropy(df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(2L) == ((0L, 0L, 0.0)) && out(3L) == ((0L, 0L, 0.0)))
    assert(out(1L)._1 == 3L && out(1L)._2 == 3L)
  }

  // ---- image average-hash (MediaExpressions.image_ahash64) ----

  /** Grayscale uncompressed 24-bpp BMP from a (x, yTop) → luma byte
    * function, bottom-up rows by default, top-down when `topDown`. */
  private def bmp(w: Int, h: Int, topDown: Boolean = false)
                 (lum: (Int, Int) => Int): Array[Byte] = {
    def putLE(d: Array[Byte], off: Int, v: Int): Unit = {
      d(off) = v.toByte; d(off + 1) = (v >> 8).toByte
      d(off + 2) = (v >> 16).toByte; d(off + 3) = (v >> 24).toByte
    }
    val rowSize = ((w * 3 + 3) / 4) * 4
    val d = new Array[Byte](54 + rowSize * h)
    d(0) = 'B'; d(1) = 'M'
    putLE(d, 2, d.length); putLE(d, 10, 54); putLE(d, 14, 40)
    putLE(d, 18, w); putLE(d, 22, if (topDown) -h else h)
    d(26) = 1; d(28) = 24
    for (yTop <- 0 until h; x <- 0 until w) {
      val v = lum(x, yTop).toByte
      val srcRow = if (topDown) yTop else h - 1 - yTop
      val off = 54 + srcRow * rowSize + x * 3
      d(off) = v; d(off + 1) = v; d(off + 2) = v
    }
    d
  }

  test("image_ahash64: checkerboard bits, upscale invariance, row-order equivalence, null cases") {
    import graft.expressions.MediaExpressions
    val checker8 = bmp(8, 8)((x, y) => if ((x + y) % 2 == 0) 255 else 0)
    // even rows 10101010 = 0xAA, odd rows 01010101 = 0x55, MSB-first
    assert(MediaExpressions.ahash64(checker8) == 0xAA55AA55AA55AA55L)
    // a 2x-upscaled checkerboard box-downsamples to the same grid
    val checker16 = bmp(16, 16)((x, y) => if ((x / 2 + y / 2) % 2 == 0) 255 else 0)
    assert(MediaExpressions.ahash64(checker16) == 0xAA55AA55AA55AA55L)
    // identical logical image, bottom-up vs top-down storage
    val grad = (x: Int, y: Int) => (x * 20 + y * 11) % 256
    assert(MediaExpressions.ahash64(bmp(12, 9)(grad)) ==
      MediaExpressions.ahash64(bmp(12, 9, topDown = true)(grad)))
    // not a BMP / too small / wrong depth → null
    assert(MediaExpressions.ahash64("not an image".getBytes) == null)
    assert(MediaExpressions.ahash64(bmp(7, 8)((_, _) => 0)) == null)
    val bad = bmp(8, 8)((_, _) => 0); bad(28) = 8 // 8-bpp
    assert(MediaExpressions.ahash64(bad) == null)
    // expression path (codegen) agrees with the driver-side call
    val viaExpr = Seq(checker8).toDF("p")
      .select(MediaExpressions.image_ahash64(col("p")).as("h")).head().getLong(0)
    assert(viaExpr == 0xAA55AA55AA55AA55L)
    val viaExprNull = Seq("nope".getBytes).toDF("p")
      .select(MediaExpressions.image_ahash64(col("p")).as("h")).head()
    assert(viaExprNull.isNullAt(0))
  }

  /** PCM WAV from 16-bit samples, with an optional extra chunk ahead
    * of `data` (to exercise the RIFF chunk walk + word alignment). */
  private def wav(samples: Seq[Int], fmtCode: Int = 1, bits: Int = 16,
                  extra: Option[Array[Byte]] = None): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le2(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le4(v: Int): Unit = { le2(v & 0xffff); le2((v >> 16) & 0xffff) }
    def ascii(s: String): Unit = bos.write(s.getBytes("ASCII"))
    val dataLen = samples.size * 2
    val extraLen = extra.map(e => 8 + e.length + (e.length & 1)).getOrElse(0)
    ascii("RIFF"); le4(4 + 24 + extraLen + 8 + dataLen); ascii("WAVE")
    ascii("fmt "); le4(16); le2(fmtCode); le2(1); le4(8000); le4(16000)
    le2(2); le2(bits)
    extra.foreach { e =>
      ascii("LIST"); le4(e.length); bos.write(e)
      if ((e.length & 1) == 1) bos.write(0) // RIFF word alignment pad
    }
    ascii("data"); le4(dataLen)
    samples.foreach(le2)
    bos.toByteArray
  }

  test("audio_hash64: square-wave bits, chunk walk with odd-length LIST, null cases, -32768 abs") {
    import graft.expressions.MediaExpressions
    // 128 samples, 2 per window: even windows loud, odd silent →
    // byte 10101010 = 0xAA repeated
    val square = (0 until 128).map(i => if ((i / 2) % 2 == 0) 30000 else 0)
    assert(MediaExpressions.audioHash64(wav(square)) == 0xAAAAAAAAAAAAAAAAL)
    // an odd-length LIST chunk before data must not derail the walk
    assert(MediaExpressions.audioHash64(
      wav(square, extra = Some(Array[Byte](1, 2, 3)))) == 0xAAAAAAAAAAAAAAAAL)
    // -32768 two's complement: |Short.MinValue| = 32768, louder than 30000
    val withMin = (0 until 128).map(i => if ((i / 2) % 2 == 0) 0x8000 else 0)
    assert(MediaExpressions.audioHash64(wav(withMin)) == 0xAAAAAAAAAAAAAAAAL)
    // non-PCM, non-16-bit, too-short, non-WAV → null
    assert(MediaExpressions.audioHash64(wav(square, fmtCode = 3)) == null)
    assert(MediaExpressions.audioHash64(wav(square, bits = 8)) == null)
    assert(MediaExpressions.audioHash64(wav(Seq.fill(63)(100))) == null)
    assert(MediaExpressions.audioHash64("not audio".getBytes) == null)
    // codegen path agrees with the driver-side call
    val viaExpr = Seq(wav(square)).toDF("p")
      .select(MediaExpressions.audio_hash64(col("p")).as("h")).head().getLong(0)
    assert(viaExpr == 0xAAAAAAAAAAAAAAAAL)
  }

  test("ahashNearDuplicates: perturbed copy found, inverted image rejected, raw payloads skipped") {
    val rnd = new scala.util.Random(7)
    val base = Array.fill(32, 32)(rnd.nextInt(256))
    val img1 = bmp(32, 32)((x, y) => base(y)(x))
    // tiny perturbation: a few pixels nudged — hamming stays small
    val img2 = bmp(32, 32)((x, y) =>
      if (x < 2 && y < 2) math.min(255, base(y)(x) + 3) else base(y)(x))
    val img3 = bmp(32, 32)((x, y) => 255 - base(y)(x)) // complement: far
    val df = Seq((1L, img1), (2L, img2), (3L, img3),
      (4L, "just text".getBytes)).toDF("doc_id", "payload")
    val pairs = graft.functions.MultimodalFunctions
      .ahashNearDuplicates(df, "doc_id", "payload", maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 <= 7),
      s"perturbed pair missing: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"complement image paired: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ahashNearDuplicates works with STRING ids (no silent cast-to-NULL drop)") {
    val rnd = new scala.util.Random(7)
    val base = Array.fill(32, 32)(rnd.nextInt(256))
    val img1 = bmp(32, 32)((x, y) => base(y)(x))
    val img2 = bmp(32, 32)((x, y) =>
      if (x < 2 && y < 2) math.min(255, base(y)(x) + 3) else base(y)(x))
    val df = Seq(("doc-a", img1), ("doc-b", img2)).toDF("doc_id", "payload")
    val pairs = graft.functions.MultimodalFunctions
      .ahashNearDuplicates(df, "doc_id", "payload", maxHamming = 7)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == "doc-a" && p._2 == "doc-b" && p._3 <= 7),
      s"string-id pair missing: ${pairs.toSeq}")
  }

  test("audioHash64 returns null (not AIOOBE) for a chunk length near Int.MaxValue") {
    import graft.expressions.MediaExpressions
    // a positive declared length that would wrap an int cursor
    // negative — the walk must fall off the end and return null
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = { bos.write(v); bos.write(v >> 8); bos.write(v >> 16); bos.write(v >> 24) }
    bos.write("RIFF".getBytes); le32(400); bos.write("WAVE".getBytes)
    bos.write("JUNK".getBytes); le32(0x7FFFFFE0)
    (0 until 64).foreach(_ => bos.write(0))
    assert(MediaExpressions.audioHash64(bos.toByteArray) == null)
  }

  test("audioHash64 rejects a fmt chunk whose declared length is under 16 bytes") {
    import graft.expressions.MediaExpressions
    // RIFF/WAVE with a truncated fmt chunk (len=4) whose BYTES would
    // otherwise be read from the following data chunk's header
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = { bos.write(v); bos.write(v >> 8); bos.write(v >> 16); bos.write(v >> 24) }
    bos.write("RIFF".getBytes); le32(400); bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); le32(4); le32(0x00010001) // PCM,mono — but only 4 declared bytes
    bos.write("data".getBytes); le32(256)
    (0 until 128).foreach { i => bos.write(i & 0xff); bos.write(0) }
    assert(MediaExpressions.audioHash64(bos.toByteArray) == null)
  }
}
