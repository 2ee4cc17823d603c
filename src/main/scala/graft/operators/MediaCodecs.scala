package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM synthesis and parsing of REAL public container headers — WAV
  * (RIFF/WAVE), BMP (BITMAPFILEHEADER + BITMAPINFOHEADER), AVI
  * (RIFF/'AVI '/hdrl/avih) — replacing the round-1..6 functions-of-bytes
  * decode stub. Payload BODIES are zero/truncated filler (this container
  * has no media libraries and the pipeline never looks at samples), but
  * the headers are byte-exact per the public Microsoft RIFF/WAVE/AVI and
  * Windows bitmap layouts, and [[parse]] reads them the way any codec
  * would: little-endian structs at the documented offsets, chunk walks
  * for the RIFF formats, dispatching on the MAGIC BYTES (not on a kind
  * column) — so a layout bug in either side breaks the m1/m2/m3 gates.
  */
object MediaCodecs {

  /** What the header decode yields: zero-valued fields are not-applicable
    * for the format (e.g. sampleRate for images).
    */
  final case class Parsed(width: Int, height: Int, durationMs: Long, sampleRate: Int)

  private def le(n: Int): ByteBuffer =
    ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  /** Deterministic synthetic media for the gate tables: every field a
    * pure integer function of (media_id, text length) so the DuckDB
    * oracle recomputes the decoded output arithmetically while the Spark
    * side must round-trip it through real header bytes.
    */
  def synthesize(kind: String, mediaId: Long, textLen: Int): Array[Byte] = kind match {
    case "audio" =>
      buildWav(sampleRate = 8000 * (1 + (mediaId % 3).toInt), nSamples = textLen)
    case "image" =>
      buildBmp(16 + textLen % 640, 16 + textLen % 480, filler = math.min(textLen, 64))
    case _ =>
      buildAvi(usPerFrame = 33333, totalFrames = 30 + textLen % 900,
        16 + textLen % 640, 16 + textLen % 480, filler = math.min(textLen, 64))
  }

  /** Canonical 44-byte PCM WAV header + zeroed 16-bit mono samples. */
  def buildWav(sampleRate: Int, nSamples: Int): Array[Byte] = {
    val dataSize = nSamples * 2
    val b = le(44 + dataSize)
    b.put("RIFF".getBytes("US-ASCII")); b.putInt(36 + dataSize); b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")); b.putInt(16)
    b.putShort(1); b.putShort(1) // PCM, mono
    b.putInt(sampleRate); b.putInt(sampleRate * 2) // byte rate
    b.putShort(2); b.putShort(16) // block align, bits
    b.put("data".getBytes("US-ASCII")); b.putInt(dataSize)
    b.array() // samples stay zero
  }

  /** WAV with REAL 16-bit mono PCM samples (little-endian, the canonical
    * 44-byte header of [[buildWav]]): the m6 audio-fingerprint input.
    */
  def buildWavSamples(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val b = le(44 + dataSize)
    b.put("RIFF".getBytes("US-ASCII")); b.putInt(36 + dataSize); b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")); b.putInt(16)
    b.putShort(1); b.putShort(1)
    b.putInt(sampleRate); b.putInt(sampleRate * 2)
    b.putShort(2); b.putShort(16)
    b.put("data".getBytes("US-ASCII")); b.putInt(dataSize)
    samples.foreach(b.putShort)
    b.array()
  }

  /** Decode a 16-bit mono PCM WAV to (sampleRate, samples): the RIFF walk
    * [[parseWave]] does, plus reading the data chunk's little-endian
    * samples. None for other encodings or a truncated data chunk.
    */
  def parseWavSamples(p: Array[Byte]): Option[(Int, Array[Short])] = {
    if (p.length < 12 || tag(p, 0) != "RIFF" || tag(p, 8) != "WAVE") return None
    var off = 12
    var sampleRate = 0
    var ok = false // fmt seen: PCM, mono, 16-bit
    var dataOff = -1
    var dataSize = -1
    while (off + 8 <= p.length) {
      val id = tag(p, off)
      val size = leInt(p, off + 4)
      if (size < 0) return None
      if (id == "fmt " && off + 8 + 16 <= p.length) {
        ok = leShort(p, off + 8) == 1 && leShort(p, off + 8 + 2) == 1 &&
          leShort(p, off + 8 + 14) == 16
        sampleRate = leInt(p, off + 8 + 4)
      } else if (id == "data") { dataOff = off + 8; dataSize = size }
      off += 8 + size + (size & 1)
    }
    if (!ok || sampleRate <= 0 || dataOff < 0 ||
      dataOff.toLong + dataSize > p.length) return None
    Some((sampleRate, Array.tabulate(dataSize / 2)(i =>
      leShort(p, dataOff + i * 2).toShort)))
  }

  /** Energy-delta fingerprint — the audio analogue of [[dHash64]]: cut
    * the stream into fixed `window`-sample frames, bit w set iff the
    * (w+1)-th frame's energy (sum of |sample|) exceeds the w-th's. Sign
    * of the energy DELTA is invariant under any positive gain, the
    * property a loudness-normalizing pipeline needs. Streams beyond 65
    * windows contribute only their first 65; missing windows leave bits 0.
    */
  def energyFingerprint64(samples: Array[Short], window: Int): Long = {
    val nw = math.min(samples.length / window, 65)
    val e = new Array[Long](nw)
    var w = 0
    while (w < nw) {
      var j = w * window
      val end = j + window
      var s = 0L
      while (j < end) { s += math.abs(samples(j).toInt); j += 1 }
      e(w) = s
      w += 1
    }
    var sig = 0L
    var i = 0
    while (i + 1 < nw) {
      if (e(i + 1) > e(i)) sig |= 1L << i
      i += 1
    }
    sig
  }

  /** 54-byte BMP header (24bpp, BI_RGB); pixel data TRUNCATED to `filler`
    * bytes — documented synthetic shortcut, the header fields are real.
    */
  def buildBmp(width: Int, height: Int, filler: Int): Array[Byte] = {
    val rowSize = ((24 * width + 31) / 32) * 4
    val fileSize = 54 + filler
    val b = le(fileSize)
    b.put('B'.toByte); b.put('M'.toByte); b.putInt(fileSize)
    b.putShort(0); b.putShort(0); b.putInt(54) // reserved, data offset
    b.putInt(40); b.putInt(width); b.putInt(height)
    b.putShort(1); b.putShort(24) // planes, bpp
    b.putInt(0); b.putInt(rowSize * height) // BI_RGB, biSizeImage
    b.putInt(2835); b.putInt(2835); b.putInt(0); b.putInt(0) // 72 DPI, palette
    b.array()
  }

  /** 88-byte AVI skeleton: RIFF('AVI ') > LIST(hdrl) > avih(MainAVIHeader,
    * 56 bytes); stream lists and movi data TRUNCATED to `filler` bytes.
    */
  def buildAvi(usPerFrame: Int, totalFrames: Int,
      width: Int, height: Int, filler: Int): Array[Byte] = {
    val b = le(88 + filler)
    b.put("RIFF".getBytes("US-ASCII")); b.putInt(80 + filler); b.put("AVI ".getBytes("US-ASCII"))
    b.put("LIST".getBytes("US-ASCII")); b.putInt(4 + 8 + 56); b.put("hdrl".getBytes("US-ASCII"))
    b.put("avih".getBytes("US-ASCII")); b.putInt(56)
    b.putInt(usPerFrame); b.putInt(0); b.putInt(0); b.putInt(0)
    b.putInt(totalFrames); b.putInt(0); b.putInt(1); b.putInt(0) // 1 stream
    b.putInt(width); b.putInt(height)
    b.array() // dwReserved[4] and filler stay zero
  }

  /** BMP with REAL pixel rows (24bpp BI_RGB, bottom-up, 4-byte-aligned
    * rows, zero padding): `gray(x, y)` supplies the value written to all
    * three channels. Unlike [[buildBmp]]'s truncated filler, this body is
    * a decodable pixel grid — the m4 perceptual-dedup input.
    */
  def buildBmpGray(width: Int, height: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val rowSize = ((24 * width + 31) / 32) * 4
    val fileSize = 54 + rowSize * height
    val b = le(fileSize)
    b.put('B'.toByte); b.put('M'.toByte); b.putInt(fileSize)
    b.putShort(0); b.putShort(0); b.putInt(54)
    b.putInt(40); b.putInt(width); b.putInt(height)
    b.putShort(1); b.putShort(24)
    b.putInt(0); b.putInt(rowSize * height)
    b.putInt(2835); b.putInt(2835); b.putInt(0); b.putInt(0)
    var r = 0
    while (r < height) {
      val y = height - 1 - r // positive biHeight => rows stored bottom-up
      var x = 0
      while (x < width) {
        val v = (gray(x, y) & 0xff).toByte
        b.put(v); b.put(v); b.put(v) // B, G, R
        x += 1
      }
      var pad = rowSize - width * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      r += 1
    }
    b.array()
  }

  /** A REAL compressed-container PNG with an arithmetic-predictable body
    * (the m4b tier's input): 8-bit TRUECOLOR (color type 2 — achromatic
    * r=g=b pixels, so ImageIO's getRGB is the identity; an 8-bit GRAY
    * image would route through a gray→sRGB colorspace conversion and
    * corrupt the grid), IDAT a zlib stream of STORED deflate blocks
    * (RFC 1951 BTYPE=00 — byte-exact, no compressor version in the
    * loop) with the real adler32 trailer, per-chunk CRC32s, filter 0 per
    * scanline. Any standards-conforming PNG decoder reads these bytes;
    * the synthesis itself stays pure arithmetic like [[buildBmpGray]].
    */
  def buildPngGray(width: Int, height: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length))
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(be32(crc.getValue.toInt))
    }
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    chunk("IHDR", be32(width) ++ be32(height) ++
      Array[Byte](8, 2 /* truecolor */, 0, 0, 0))
    // raw scanlines: filter byte 0 + width achromatic RGB triples
    val raw = new Array[Byte](height * (1 + width * 3))
    var y = 0
    while (y < height) {
      val base = y * (1 + width * 3)
      raw(base) = 0
      var x = 0
      while (x < width) {
        val v = (gray(x, y) & 0xff).toByte
        raw(base + 1 + x * 3) = v; raw(base + 2 + x * 3) = v; raw(base + 3 + x * 3) = v
        x += 1
      }
      y += 1
    }
    // zlib: 0x78 0x01 header, stored deflate blocks (<= 65535 each),
    // adler32 over the raw stream
    val z = new java.io.ByteArrayOutputStream()
    z.write(0x78); z.write(0x01)
    var off = 0
    while (off < raw.length) {
      val n = math.min(65535, raw.length - off)
      val last = off + n >= raw.length
      z.write(if (last) 1 else 0)
      z.write(n & 0xff); z.write((n >> 8) & 0xff)
      z.write(~n & 0xff); z.write((~n >> 8) & 0xff)
      z.write(raw, off, n)
      off += n
    }
    val adler = new java.util.zip.Adler32()
    adler.update(raw)
    z.write(be32(adler.getValue.toInt))
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** A REAL baseline JPEG whose decode is ARITHMETICALLY EXACT (the m4c
    * tier's input) — lossy-format decode made replayable by construction:
    *
    *   - every 8×8 block carries ONLY a DC coefficient, and the IDCT of
    *     a DC-only block is flat: libjpeg's islow path computes
    *     pixel = DESCALE(dc·q << PASS1_BITS, PASS1_BITS+3) + 128, which
    *     is exactly dc/8 + 128 (no rounding ambiguity) when dc is a
    *     MULTIPLE OF 8 — so DC = (gray − 128)·8 with quant 1 decodes to
    *     precisely `gray`;
    *   - three components at 1×1 sampling with Cb = Cr = flat 128
    *     (DC 0): the integer YCbCr→RGB tables are exactly zero at 128,
    *     so decoded R = G = B = Y — no colorspace drift, and the BT.601
    *     luma in [[parseCompressedGray]] returns Y verbatim (the m4b
    *     truecolor trick, restated for JPEG);
    *   - one flat block PER TARGET PIXEL (blocksW × blocksH blocks =
    *     8·blocksW × 8·blocksH pixels): the block-mean downscale to the
    *     dHash raster averages a constant block — integer-exact — so the
    *     decoded-and-downscaled grid IS `gray` bit for bit.
    *
    * The container is standards-complete: DQT (all-ones), SOF0, DHT
    * (canonical custom tables — 12 DC categories at length 4, a single
    * length-2 AC code for EOB), SOS, entropy-coded MCUs with DC
    * prediction and 0xFF byte stuffing. Any baseline decoder reads it;
    * the synthesis is pure arithmetic like [[buildPngGray]].
    */
  def buildJpegGrayBlocks(blocksW: Int, blocksH: Int,
      gray: (Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 1 + 64); u8(0x00) // DQT table 0: all ones
    var i = 0
    while (i < 64) { u8(1); i += 1 }
    marker(0xc0); u16(8 + 3 * 3); u8(8) // SOF0: 8-bit, 3 components 1x1
    u16(blocksH * 8); u16(blocksW * 8); u8(3)
    Seq(1, 2, 3).foreach { id => u8(id); u8(0x11); u8(0) }
    // DHT: DC table 0 = categories 0..11, all length 4 (canonical code k
    // for symbol k); AC table 0 = one length-2 code ("00") for EOB
    marker(0xc4); u16(2 + (1 + 16 + 12) + (1 + 16 + 1))
    u8(0x00); (1 to 16).foreach(l => u8(if (l == 4) 12 else 0))
    (0 until 12).foreach(u8)
    u8(0x10); (1 to 16).foreach(l => u8(if (l == 2) 1 else 0))
    u8(0x00)
    marker(0xda); u16(6 + 2 * 3); u8(3) // SOS
    Seq(1, 2, 3).foreach { id => u8(id); u8(0x00) }
    u8(0); u8(63); u8(0)
    var acc = 0; var nbits = 0
    def putBits(code: Int, len: Int): Unit = {
      var j = len - 1
      while (j >= 0) {
        acc = (acc << 1) | ((code >> j) & 1); nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0) // byte stuffing
          acc = 0; nbits = 0
        }
        j -= 1
      }
    }
    def encodeDcOnlyBlock(diff: Int): Unit = {
      val cat = if (diff == 0) 0
        else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      putBits(cat, 4) // DC category, canonical code = symbol
      if (cat > 0)
        putBits(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
      putBits(0, 2) // EOB: all AC zero
    }
    var prevY = 0
    var by = 0
    while (by < blocksH) {
      var bx = 0
      while (bx < blocksW) {
        val dcY = (gray(bx, by) - 128) * 8
        encodeDcOnlyBlock(dcY - prevY); prevY = dcY
        encodeDcOnlyBlock(0) // Cb: flat 128 (prediction stays 0)
        encodeDcOnlyBlock(0) // Cr
        bx += 1
      }
      by += 1
    }
    while (nbits != 0) putBits(1, 1) // pad to byte with 1s
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Decode a 24bpp BMP's pixel grid to gray values (blue channel — the
    * m4 gallery is achromatic): header fields drive the data offset, row
    * stride and the bottom-up row order; anything malformed (wrong bpp,
    * truncated pixel array) returns None rather than failing the batch.
    */
  def parseBmpGray(p: Array[Byte]): Option[Array[Array[Int]]] = {
    if (p.length < 54 || p(0) != 'B' || p(1) != 'M') return None
    val dataOff = leInt(p, 10)
    val width = leInt(p, 18)
    val height = leInt(p, 22)
    if (leShort(p, 28) != 24 || width <= 0 || height <= 0 || dataOff < 54) return None
    decodeGrid(p, dataOff, width, height)
  }

  /** Shared 24bpp DIB pixel-array decode (bottom-up rows, 4-byte stride,
    * blue channel): the raster walk behind both [[parseBmpGray]] and the
    * AVI '00db' frame chunks, which carry exactly this layout minus the
    * BMP file header. None when the array overruns the buffer.
    */
  private def decodeGrid(p: Array[Byte], dataOff: Int,
      width: Int, height: Int): Option[Array[Array[Int]]] = {
    val rowSize = ((24 * width + 31) / 32) * 4
    if (dataOff < 0 || dataOff.toLong + rowSize.toLong * height > p.length) None
    else Some(Array.tabulate(height, width) { (y, x) =>
      p(dataOff + (height - 1 - y) * rowSize + x * 3) & 0xff
    })
  }

  /** AVI with REAL frame data: RIFF('AVI ') > LIST(hdrl) > avih +
    * LIST(movi) with one '00db' (uncompressed DIB) chunk per frame, each
    * chunk the 24bpp bottom-up pixel rows of [[buildBmpGray]]'s layout
    * without the BMP file header — the standard uncompressed-AVI frame
    * encoding. Unlike [[buildAvi]]'s truncated filler, every frame is a
    * decodable grid: the m5 video-dedup input.
    */
  def buildAviFrames(usPerFrame: Int, width: Int, height: Int,
      frames: Seq[(Int, Int) => Int]): Array[Byte] = {
    val rowSize = ((24 * width + 31) / 32) * 4
    val frameBytes = rowSize * height // multiple of 4, so always word-aligned
    val moviSize = 4 + frames.length * (8 + frameBytes)
    val riffSize = 4 + (8 + 68) + (8 + moviSize)
    val b = le(8 + riffSize)
    b.put("RIFF".getBytes("US-ASCII")); b.putInt(riffSize); b.put("AVI ".getBytes("US-ASCII"))
    b.put("LIST".getBytes("US-ASCII")); b.putInt(68); b.put("hdrl".getBytes("US-ASCII"))
    b.put("avih".getBytes("US-ASCII")); b.putInt(56)
    b.putInt(usPerFrame); b.putInt(0); b.putInt(0); b.putInt(0)
    b.putInt(frames.length); b.putInt(0); b.putInt(1); b.putInt(0)
    b.putInt(width); b.putInt(height)
    b.position(b.position() + 16) // dwReserved[4]
    b.put("LIST".getBytes("US-ASCII")); b.putInt(moviSize); b.put("movi".getBytes("US-ASCII"))
    frames.foreach { gray =>
      b.put("00db".getBytes("US-ASCII")); b.putInt(frameBytes)
      var r = 0
      while (r < height) {
        val y = height - 1 - r
        var x = 0
        while (x < width) {
          val v = (gray(x, y) & 0xff).toByte
          b.put(v); b.put(v); b.put(v)
          x += 1
        }
        var pad = rowSize - width * 3
        while (pad > 0) { b.put(0.toByte); pad -= 1 }
        r += 1
      }
    }
    b.array()
  }

  /** Decode an AVI's frame grids: avih supplies the dimensions (the walk
    * [[parseAvi]] does), then every '00db' chunk under LIST(movi) decodes
    * through the shared DIB raster walk. None for anything malformed —
    * missing header, corrupt (negative) chunk size, truncated frame — an
    * executor task must never loop on bad bytes.
    */
  def parseAviFrames(p: Array[Byte]): Option[Seq[Array[Array[Int]]]] = {
    if (p.length < 12 || tag(p, 0) != "RIFF" || tag(p, 8) != "AVI ") return None
    var width = 0
    var height = 0
    val frames = Seq.newBuilder[Array[Array[Int]]]
    var off = 12
    while (off + 12 <= p.length) {
      val id = tag(p, off)
      val size = leInt(p, off + 4)
      if (size < 0) return None
      if (id == "LIST" && tag(p, off + 8) == "hdrl") {
        var in = off + 12
        val end = math.min(off + 8 + size, p.length)
        while (in + 8 <= end) {
          val csz = leInt(p, in + 4)
          if (csz < 0) return None
          if (tag(p, in) == "avih" && in + 8 + 40 <= p.length) {
            width = leInt(p, in + 8 + 32)
            height = leInt(p, in + 8 + 36)
          }
          in += 8 + csz + (csz & 1)
        }
      } else if (id == "LIST" && tag(p, off + 8) == "movi") {
        if (width <= 0 || height <= 0) return None // header must precede movi
        var in = off + 12
        val end = math.min(off + 8 + size, p.length)
        while (in + 8 <= end) {
          val csz = leInt(p, in + 4)
          if (csz < 0) return None
          if (tag(p, in) == "00db") {
            decodeGrid(p, in + 8, width, height) match {
              case Some(g) => frames += g
              case None => return None // truncated frame
            }
          }
          in += 8 + csz + (csz & 1)
        }
      }
      off += 8 + size + (size & 1)
    }
    val out = frames.result()
    if (out.isEmpty) None else Some(out)
  }

  /** dHash: bit y*8+x set iff gray(x+1, y) > gray(x, y) — the classic
    * difference hash over a 9×8 grid (brightness-shift invariant: adding
    * a constant to every pixel changes no comparison). Grids beyond 9×8
    * contribute only their top-left 9×8 window.
    */
  def dHash64(gray: Array[Array[Int]]): Long = {
    var sig = 0L
    var y = 0
    val rows = math.min(gray.length, 8)
    while (y < rows) {
      val row = gray(y)
      val cols = math.min(row.length - 1, 8)
      var x = 0
      while (x < cols) {
        if (row(x + 1) > row(x)) sig |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    sig
  }

  private def tag(p: Array[Byte], off: Int): String =
    new String(p, off, 4, "US-ASCII")
  private def leInt(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
      ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)
  private def leShort(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)

  private def beInt(p: Array[Byte], off: Int): Int =
    ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
      ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)

  private def isPng(p: Array[Byte]): Boolean =
    p.length >= 24 && (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G'
  private def isJpeg(p: Array[Byte]): Boolean =
    p.length >= 4 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8 &&
      (p(2) & 0xff) == 0xff

  /** PNG dimensions straight from the IHDR chunk (always first, big-endian
    * width/height at 16/20) — a pure byte walk, no decoder.
    */
  private def parsePng(p: Array[Byte]): Option[Parsed] =
    if (new String(p, 12, 4, "US-ASCII") == "IHDR")
      Some(Parsed(beInt(p, 16), beInt(p, 20), 0L, 0))
    else None

  /** JPEG dimensions from the first SOFn frame header (the marker-segment
    * walk every JPEG parser does): segments are FF <marker> <be16 length>;
    * SOF0–SOF15 (minus the DHT/JPG/DAC pseudo-markers C4/C8/CC) carry
    * height/width big-endian at +5/+7. Corrupt lengths abort — an executor
    * task must never loop on bad bytes.
    */
  private def parseJpeg(p: Array[Byte]): Option[Parsed] = {
    var off = 2
    while (off + 4 <= p.length && (p(off) & 0xff) == 0xff) {
      val marker = p(off + 1) & 0xff
      if (marker >= 0xd0 && marker <= 0xd9) off += 2 // standalone RSTn/SOI/EOI
      else {
        val len = ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
        if (len < 2) return None
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (off + 9 > p.length) return None
          val h = ((p(off + 5) & 0xff) << 8) | (p(off + 6) & 0xff)
          val w = ((p(off + 7) & 0xff) << 8) | (p(off + 8) & 0xff)
          return Some(Parsed(w, h, 0L, 0))
        }
        off += 2 + len
      }
    }
    None
  }

  /** Decode a COMPRESSED image (PNG/JPEG) through the JDK's own ImageIO —
    * no non-public dependency — into the same gray grid the BMP raster
    * walk yields: integer BT.601 luma (299r+587g+114b)/1000 per pixel
    * (exactly g for achromatic pixels), then, when the image is larger
    * than the dHash-native targetW×targetH raster, a deterministic
    * block-mean downscale with integer truncation — explicit arithmetic,
    * not AWT rescaling, so the grid is bit-stable across platforms.
    * Smaller-than-target images return None (nothing to hash against).
    */
  def parseCompressedGray(p: Array[Byte], targetW: Int = 9,
      targetH: Int = 8): Option[Array[Array[Int]]] =
    if (!isPng(p) && !isJpeg(p)) None
    else try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val luma = Array.tabulate(h, w) { (y, x) =>
          val rgb = img.getRGB(x, y)
          (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
        }
        if (w == targetW && h == targetH) Some(luma)
        else if (w < targetW || h < targetH) None
        else Some(Array.tabulate(targetH, targetW) { (ty, tx) =>
          val x0 = tx * w / targetW; val x1 = (tx + 1) * w / targetW
          val y0 = ty * h / targetH; val y1 = (ty + 1) * h / targetH
          var s = 0; var n = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { s += luma(y)(x); n += 1; x += 1 }
            y += 1
          }
          s / n
        })
      }
    } catch { case _: java.io.IOException => None }

  /** Unified image decode for the perceptual pipeline: the BMP raster walk
    * for uncompressed payloads, the ImageIO branch for PNG/JPEG — every
    * arm lands on the same gray grid feeding [[dHash64]].
    */
  def parseImageGray(p: Array[Byte]): Option[Array[Array[Int]]] =
    if (p.length >= 2 && p(0) == 'B' && p(1) == 'M') parseBmpGray(p)
    else parseCompressedGray(p)

  /** Content-based header decode: dispatches on magic bytes, returns None
    * for anything unrecognized (the pipeline keeps such rows with
    * zero-valued metadata rather than failing the batch).
    */
  def parse(payload: Array[Byte]): Option[Parsed] =
    if (payload.length >= 12 && tag(payload, 0) == "RIFF") tag(payload, 8) match {
      case "WAVE" => parseWave(payload)
      case "AVI " => parseAvi(payload)
      case _ => None
    }
    else if (payload.length >= 54 && payload(0) == 'B' && payload(1) == 'M')
      Some(Parsed(leInt(payload, 18), leInt(payload, 22), 0L, 0))
    else if (isPng(payload)) parsePng(payload)
    else if (isJpeg(payload)) parseJpeg(payload)
    else None

  /** RIFF chunk walk: fmt (channels/rate/block align) + data (sample
    * count) → duration. Tolerates extra chunks and any chunk order. A
    * corrupt (negative) chunk size aborts the walk — an executor task
    * must never loop on malformed bytes.
    */
  private def parseWave(p: Array[Byte]): Option[Parsed] = {
    var off = 12
    var sampleRate = 0
    var blockAlign = 0
    var dataSize = -1
    var bad = false
    while (!bad && off + 8 <= p.length) {
      val id = tag(p, off)
      val size = leInt(p, off + 4)
      if (size < 0) bad = true
      else {
        if (id == "fmt " && off + 8 + 16 <= p.length) {
          sampleRate = leInt(p, off + 8 + 4)
          blockAlign = leShort(p, off + 8 + 12)
        } else if (id == "data") dataSize = size
        off += 8 + size + (size & 1) // RIFF chunks are word-aligned
      }
    }
    if (bad || sampleRate <= 0 || blockAlign <= 0 || dataSize < 0) None
    else Some(Parsed(0, 0, (dataSize / blockAlign).toLong * 1000L / sampleRate, sampleRate))
  }

  /** RIFF walk to LIST(hdrl), then avih: MainAVIHeader fields at their
    * documented dword offsets (usPerFrame 0, totalFrames 4, width 8,
    * height 9 — in dwords).
    */
  private def parseAvi(p: Array[Byte]): Option[Parsed] = {
    var off = 12
    while (off + 12 <= p.length) {
      val id = tag(p, off)
      val size = leInt(p, off + 4)
      if (size < 0) return None // corrupt size: never loop on bad bytes
      if (id == "LIST" && tag(p, off + 8) == "hdrl") {
        var in = off + 12
        val end = math.min(off + 8 + size, p.length)
        while (in + 8 <= end) {
          val cid = tag(p, in)
          val csz = leInt(p, in + 4)
          if (csz < 0) return None
          if (cid == "avih" && in + 8 + 40 <= p.length) {
            val usPerFrame = leInt(p, in + 8)
            val totalFrames = leInt(p, in + 8 + 16)
            val width = leInt(p, in + 8 + 32)
            val height = leInt(p, in + 8 + 36)
            return Some(Parsed(width, height,
              totalFrames.toLong * usPerFrame / 1000L, 0))
          }
          in += 8 + csz + (csz & 1)
        }
      }
      off += 8 + size + (size & 1)
    }
    None
  }
}
