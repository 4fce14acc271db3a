package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codec-free media-header parsing as a Catalyst expression.
  *
  * BMP, WAV, PNG and JPEG header fields are pure byte math — fixed
  * offsets (BMP/WAV/PNG) or a marker-segment walk (JPEG SOF) — so the
  * parse belongs INSIDE whole-stage codegen as a column expression, not
  * behind an `rdd.mapPartitions` boundary that deserializes every
  * payload row out of Tungsten. The mapPartitions path
  * (MultimodalFunctions.fakeFeaturesForTesting) remains the documented boundary
  * for formats that need a real codec (full image decode, audio PCM,
  * video frames).
  */
object MediaExpressions {

  /** Header fields recovered without a codec; `format` is the sniffed
    * container ("bmp" | "wav" | "png" | "jpeg" | "raw"), the rest are
    * null where the format doesn't carry them (e.g. sample_rate for
    * images). `bits` is bits-per-pixel (BMP), bits-per-sample (WAV),
    * bit depth (PNG) or sample precision (JPEG); `channels` is audio
    * channels (WAV) or color components (JPEG SOF). */
  val headerSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("bits", IntegerType, nullable = true)))

  @inline private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  @inline private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  @inline private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  @inline private def beShort(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def row(fmt: String, width: Any, height: Any,
                  rate: Any, channels: Any, bits: Any): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(fmt), width, height, rate, channels, bits))

  /** Sniff + parse one payload. Called from generated code (Scala
    * object methods get static forwarders, so codegen emits a plain
    * static call). Total work is O(header bytes), never O(payload). */
  def parse(b: Array[Byte]): InternalRow = {
    // BMP: "BM", BITMAPINFOHEADER — width @18, height @22, bpp @28 (LE)
    if (b.length >= 30 && b(0) == 'B' && b(1) == 'M')
      return row("bmp", leInt(b, 18), leInt(b, 22), null, null, leShort(b, 28))
    // WAV: RIFF….WAVE — walk the chunk list to `fmt ` (canonically at
    // offset 12, but spec-valid files may lead with JUNK/LIST chunks;
    // fixed offsets would read those chunks' bytes as rate/channels).
    // Long cursor for the same overflow reason as audioHash64's walk.
    if (b.length >= 36 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      var iL = 12L
      while (iL + 8 <= b.length) {
        val i = iL.toInt
        val len = leInt(b, i + 4)
        if (len < 0) return row("wav", null, null, null, null, null)
        if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
          if (len < 16 || i + 8 + 16 > b.length)
            return row("wav", null, null, null, null, null)
          // chunk data: channels @+2, rate @+4, bits @+14
          return row("wav", null, null, leInt(b, i + 12), leShort(b, i + 10),
            leShort(b, i + 22))
        }
        iL += 8L + len + (len & 1)
      }
      return row("wav", null, null, null, null, null)
    }
    // PNG: 8-byte magic, IHDR must be the first chunk (spec-mandated) —
    // width @16, height @20 (BE), bit depth @24
    if (b.length >= 25 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      return row("png", beInt(b, 16), beInt(b, 20), null, null, b(24).toInt)
    // JPEG: SOI then marker segments; walk to the first SOF marker
    // (0xC0–0xCF except DHT C4 / JPG C8 / DAC CC), which carries
    // precision(1) height(2) width(2) ncomponents(1) after its length
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < b.length && (b(i) & 0xff) == 0xff) {
        val marker = b(i + 1) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (i + 9 < b.length)
            return row("jpeg", beShort(b, i + 7), beShort(b, i + 5),
              null, b(i + 9).toInt, b(i + 4).toInt)
          return row("jpeg", null, null, null, null, null)
        }
        // 0xFF fill bytes may pad between segments (ISO 10918): skip
        // one byte at a time until the real marker byte
        if (marker == 0xff) i += 1
        // standalone markers (RSTn, EOI, TEM) carry no length field
        else if ((marker >= 0xd0 && marker <= 0xd9) || marker == 0x01) i += 2
        else i += 2 + beShort(b, i + 2)
      }
      return row("jpeg", null, null, null, null, null)
    }
    row("raw", null, null, null, null, null)
  }

  /** Header sniff as a codegen'd expression: the generated code is one
    * static call per row, so payload scans with a header projection
    * stay inside a WholeStageCodegen span (no RDD boundary, no
    * Tungsten exit). */
  case class MediaHeader(child: Expression) extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(BinaryType)
    override def dataType: DataType = headerSchema
    override def prettyName: String = "media_header"

    override def nullSafeEval(input: Any): Any =
      parse(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, b =>
        s"${ev.value} = graft.expressions.MediaExpressions.parse($b);")

    override protected def withNewChildInternal(c: Expression): MediaHeader =
      copy(child = c)
  }

  def media_header(payload: Column): Column =
    ColumnBridge.column(MediaHeader(ColumnBridge.expression(payload)))

  /** Average-hash (aHash) of an uncompressed 24-bpp BMP payload: the
    * image is box-downsampled to an 8×8 luma grid and each cell
    * contributes one bit — 1 iff its mean luma exceeds the whole-image
    * mean. Perceptually similar images differ in few bits, so hamming
    * distance over the 64-bit hash is the image near-dup measure (the
    * SimHash discipline applied to pixels), and the byte-banding
    * pigeonhole (8 bands ⇒ any pair at hamming ≤ 7 shares a band)
    * gives the candidate-generation path at scale.
    *
    * All-integer and branch-exact: luma = r+g+b (no weights, no
    * division), the cell/global mean comparison cross-multiplies
    * (cellSum·totN > totSum·cellN), cells take floor boundaries
    * (cx·w/8 … (cx+1)·w/8), bit p = (cellY·8+cellX) lands at hash bit
    * (63−p). The x34 oracle replicates the arithmetic bit-for-bit in
    * SQL on 8×8 inputs (where the downsample is the identity).
    *
    * Returns NULL for anything that is not a complete uncompressed
    * 24-bpp BMP of at least 8×8 (or larger than 2²⁶ pixels — the
    * cross-multiply overflow guard). Negative BMP heights (top-down
    * row order) are handled. Work is O(pixels), one pass, no
    * allocation beyond the 64-cell accumulators. */
  def ahash64(b: Array[Byte]): Any = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
    val dataOff = leInt(b, 10)
    val w = leInt(b, 18)
    val hRaw = leInt(b, 22)
    val bpp = leShort(b, 28)
    val comp = leInt(b, 30)
    val h = math.abs(hRaw)
    if (bpp != 24 || comp != 0 || w < 8 || h < 8) return null
    if (w.toLong * h > (1L << 26)) return null
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (dataOff < 54 || dataOff.toLong + rowSize.toLong * h > b.length) return null
    val topDown = hRaw < 0
    val cellSum = new Array[Long](64)
    val cellN = new Array[Long](64)
    var totSum = 0L
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val base = dataOff + srcRow * rowSize
      val cy = (y.toLong * 8 / h).toInt
      var x = 0
      while (x < w) {
        val off = base + x * 3
        val g = (b(off) & 0xff) + (b(off + 1) & 0xff) + (b(off + 2) & 0xff)
        val cell = cy * 8 + (x.toLong * 8 / w).toInt
        cellSum(cell) += g
        cellN(cell) += 1
        totSum += g
        x += 1
      }
      y += 1
    }
    val totN = w.toLong * h
    var hash = 0L
    var p = 0
    while (p < 64) {
      if (cellSum(p) * totN > totSum * cellN(p)) hash |= 1L << (63 - p)
      p += 1
    }
    java.lang.Long.valueOf(hash)
  }

  case class ImageAHash64(child: Expression) extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(BinaryType)
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "image_ahash64"

    override def nullSafeEval(input: Any): Any =
      ahash64(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, b => s"""
        Object r = graft.expressions.MediaExpressions.ahash64($b);
        if (r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ((java.lang.Long) r).longValue(); }""")

    override protected def withNewChildInternal(c: Expression): ImageAHash64 =
      copy(child = c)
  }

  def image_ahash64(payload: Column): Column =
    ColumnBridge.column(ImageAHash64(ColumnBridge.expression(payload)))

  /** Energy-contour hash of a PCM WAV payload — the audio twin of
    * [[ahash64]]: the 16-bit sample stream splits into 64 equal
    * windows (floor boundaries) and each window contributes one bit,
    * 1 iff its mean |sample| exceeds the whole-stream mean
    * (cross-multiplied, all-integer — windowSum·N > totSum·windowN).
    * Bit w lands at hash bit (63−w). Perceptually similar clips
    * (same loudness envelope) differ in few bits, so the hash feeds
    * the same hamming-banding near-dup path as images.
    *
    * Accepts RIFF/WAVE with a PCM (format 1) 16-bit fmt chunk,
    * walking the chunk list to the `data` chunk (chunks are
    * word-aligned per the RIFF spec). Channels are not unmixed —
    * interleaved samples all feed the envelope, which is
    * channel-count-invariant for the mean compare. NULL for
    * non-WAV / non-PCM / non-16-bit / fewer than 64 samples (or more
    * than 2²⁶ — overflow guard). */
  def audioHash64(b: Array[Byte]): Any = {
    if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return null
    // chunk walk: fmt must say PCM 16-bit; data carries the samples.
    // The cursor is a LONG: a declared chunk length near Int.MaxValue
    // would wrap an int cursor negative and index out of bounds — the
    // walk must fall off the end (and tolerate a truncated final data
    // chunk) instead of throwing on a malformed file
    var fmtOk = false
    var dataOff = -1
    var dataLen = 0
    var iL = 12L
    while (iL + 8 <= b.length && (dataOff < 0 || !fmtOk)) {
      val i = iL.toInt
      val len = leInt(b, i + 4)
      if (len < 0) return null
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
        // the chunk's own declared length must cover the 16 format
        // bytes — otherwise the reads below would spill into the next
        // chunk's bytes (a malformed file, not a decodable one)
        if (len < 16 || i + 8 + 16 > b.length) return null
        fmtOk = leShort(b, i + 8) == 1 && leShort(b, i + 8 + 14) == 16
      } else if (b(i) == 'd' && b(i + 1) == 'a' &&
        b(i + 2) == 't' && b(i + 3) == 'a') {
        dataOff = i + 8
        dataLen = len
      }
      iL += 8L + len + (len & 1) // RIFF chunks are word-aligned
    }
    if (!fmtOk || dataOff < 0) return null
    val n = math.min(dataLen, b.length - dataOff) / 2
    if (n < 64 || n > (1 << 26)) return null
    val winSum = new Array[Long](64)
    val winN = new Array[Long](64)
    var totSum = 0L
    var s = 0
    while (s < n) {
      val off = dataOff + 2 * s
      val v = ((b(off) & 0xff) | (b(off + 1) << 8)).toShort.toInt
      val a = math.abs(v).toLong // abs(-32768) = 32768, exact in Int→Long
      val w = (s.toLong * 64 / n).toInt
      winSum(w) += a
      winN(w) += 1
      totSum += a
      s += 1
    }
    var hash = 0L
    var w = 0
    while (w < 64) {
      if (winSum(w) * n > totSum * winN(w)) hash |= 1L << (63 - w)
      w += 1
    }
    java.lang.Long.valueOf(hash)
  }

  case class AudioHash64(child: Expression) extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(BinaryType)
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "audio_hash64"

    override def nullSafeEval(input: Any): Any =
      audioHash64(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, b => s"""
        Object r = graft.expressions.MediaExpressions.audioHash64($b);
        if (r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ((java.lang.Long) r).longValue(); }""")

    override protected def withNewChildInternal(c: Expression): AudioHash64 =
      copy(child = c)
  }

  def audio_hash64(payload: Column): Column =
    ColumnBridge.column(AudioHash64(ColumnBridge.expression(payload)))
}
