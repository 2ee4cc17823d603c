package graft

import graft.operators.MediaCodecs
import org.scalatest.funsuite.AnyFunSuite

/** Golden-bytes tests for the container codecs: the expected headers are
  * HAND-ASSEMBLED from the public layout docs, independent of the
  * builders — so a matched builder/parser bug pair (both wrong the same
  * way) cannot cancel out.
  */
class MediaCodecsSpec extends AnyFunSuite {

  private def ascii(s: String) = s.getBytes("US-ASCII")
  private def le32(v: Int) = Array[Byte](
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  test("WAV: builder emits the canonical 44-byte PCM header, parser reads it") {
    // 8 kHz mono 16-bit, 4000 samples = 8000 data bytes, 500 ms
    val golden = ascii("RIFF") ++ le32(36 + 8000) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16) ++
      ascii("data") ++ le32(8000) ++ Array.fill[Byte](8000)(0)
    val built = MediaCodecs.buildWav(sampleRate = 8000, nSamples = 4000)
    assert(built.toSeq == golden.toSeq)
    assert(MediaCodecs.parse(golden).contains(MediaCodecs.Parsed(0, 0, 500L, 8000)))
  }

  test("BMP: builder emits the documented 54-byte header, parser reads dimensions") {
    // 100x50 24bpp: row size ((2400+31)/32)*4 = 300, image size 15000
    val golden = ascii("BM") ++ le32(54) ++ le16(0) ++ le16(0) ++ le32(54) ++
      le32(40) ++ le32(100) ++ le32(50) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(15000) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0)
    val built = MediaCodecs.buildBmp(width = 100, height = 50, filler = 0)
    assert(built.toSeq == golden.toSeq)
    assert(MediaCodecs.parse(golden).contains(MediaCodecs.Parsed(100, 50, 0L, 0)))
  }

  test("AVI: builder emits RIFF>LIST(hdrl)>avih, parser reads frames and size") {
    // 30 fps (33333 us/frame), 100 frames = 3333 ms, 320x240
    val golden = ascii("RIFF") ++ le32(80) ++ ascii("AVI ") ++
      ascii("LIST") ++ le32(68) ++ ascii("hdrl") ++
      ascii("avih") ++ le32(56) ++
      le32(33333) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(100) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(320) ++ le32(240) ++ Array.fill[Byte](16)(0)
    val built = MediaCodecs.buildAvi(
      usPerFrame = 33333, totalFrames = 100, width = 320, height = 240, filler = 0)
    assert(built.toSeq == golden.toSeq)
    assert(MediaCodecs.parse(golden).contains(MediaCodecs.Parsed(320, 240, 3333L, 0)))
  }

  test("parser is content-dispatched and rejects unknown payloads") {
    // kind column lies ⇒ decode still follows the bytes
    assert(MediaCodecs.parse(MediaCodecs.buildWav(24000, 24000))
      .contains(MediaCodecs.Parsed(0, 0, 1000L, 24000)))
    assert(MediaCodecs.parse("not a container at all".getBytes("US-ASCII")).isEmpty)
    assert(MediaCodecs.parse(Array[Byte](0x42, 0x4d, 1, 2)).isEmpty) // truncated BMP
    // RIFF with an unknown form tag
    assert(MediaCodecs.parse(ascii("RIFF") ++ le32(4) ++ ascii("XXXX")).isEmpty)
    // corrupt NEGATIVE chunk sizes must abort, not loop the walk forever
    assert(MediaCodecs.parse(ascii("RIFF") ++ le32(100) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32(-16) ++ Array.fill[Byte](24)(0)).isEmpty)
    assert(MediaCodecs.parse(ascii("RIFF") ++ le32(100) ++ ascii("AVI ") ++
      ascii("LIST") ++ le32(-8) ++ ascii("hdrl") ++ Array.fill[Byte](24)(0)).isEmpty)
    assert(MediaCodecs.parse(ascii("RIFF") ++ le32(100) ++ ascii("AVI ") ++
      ascii("LIST") ++ le32(68) ++ ascii("hdrl") ++
      ascii("avih") ++ le32(-56) ++ Array.fill[Byte](16)(0)).isEmpty)
  }

  test("BMP pixel grid: golden bytes for a 2x2 image, parse round-trips") {
    // 2x2 24bpp: row size ((48+31)/32)*4 = 8 (6 data + 2 pad); rows are
    // stored BOTTOM-UP, so stored row 0 is image row y=1. Golden bytes
    // hand-assembled: gray(x,y) = 10*x + y
    val header = ascii("BM") ++ le32(54 + 16) ++ le16(0) ++ le16(0) ++ le32(54) ++
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(16) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0)
    val row1 = Array[Byte](1, 1, 1, 11, 11, 11, 0, 0)  // y=1: (0,1)=1 (1,1)=11
    val row0 = Array[Byte](0, 0, 0, 10, 10, 10, 0, 0)  // y=0: (0,0)=0 (1,0)=10
    val golden = header ++ row1 ++ row0
    val built = MediaCodecs.buildBmpGray(2, 2, (x, y) => 10 * x + y)
    assert(built.toSeq == golden.toSeq)
    assert(MediaCodecs.parseBmpGray(golden).get.map(_.toSeq).toSeq ==
      Seq(Seq(0, 10), Seq(1, 11)))
    // truncated pixel array rejected, header-only BMP rejected
    assert(MediaCodecs.parseBmpGray(golden.dropRight(1)).isEmpty)
    assert(MediaCodecs.parseBmpGray(MediaCodecs.buildBmp(100, 50, 0)).isEmpty)
  }

  test("AVI frames: golden bytes for a 2-frame 2x2 video, parse round-trips") {
    // frame chunk = BMP pixel rows without the file header: row size 8,
    // frame bytes 16; movi = 4 + 2*(8+16) = 52; riff = 4 + 76 + 60 = 140
    val avih = le32(33333) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(2) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(2) ++ le32(2) ++ Array.fill[Byte](16)(0)
    def frame(g: (Int, Int) => Int) = {
      def px(x: Int, y: Int) = { val v = g(x, y).toByte; Array[Byte](v, v, v) }
      // bottom-up: stored row 0 is image y=1
      px(0, 1) ++ px(1, 1) ++ Array[Byte](0, 0) ++
        px(0, 0) ++ px(1, 0) ++ Array[Byte](0, 0)
    }
    val f0 = (x: Int, y: Int) => 10 * x + y
    val f1 = (x: Int, y: Int) => 100 - 10 * x - y
    val golden = ascii("RIFF") ++ le32(140) ++ ascii("AVI ") ++
      ascii("LIST") ++ le32(68) ++ ascii("hdrl") ++ ascii("avih") ++ le32(56) ++ avih ++
      ascii("LIST") ++ le32(52) ++ ascii("movi") ++
      ascii("00db") ++ le32(16) ++ frame(f0) ++
      ascii("00db") ++ le32(16) ++ frame(f1)
    val built = MediaCodecs.buildAviFrames(33333, 2, 2, Seq(f0, f1))
    assert(built.toSeq == golden.toSeq)
    val frames = MediaCodecs.parseAviFrames(golden).get
    assert(frames.map(_.map(_.toSeq).toSeq) == Seq(
      Seq(Seq(0, 10), Seq(1, 11)), Seq(Seq(100, 90), Seq(99, 89))))
    // the header decode still reads the frame-carrying container
    val meta = MediaCodecs.parse(golden).get
    assert(meta.width == 2 && meta.height == 2 && meta.durationMs == 66L)
    // truncated last frame rejected; frame-less legacy skeleton rejected
    assert(MediaCodecs.parseAviFrames(golden.dropRight(1)).isEmpty)
    assert(MediaCodecs.parseAviFrames(
      MediaCodecs.buildAvi(33333, 30, 16, 16, 64)).isEmpty)
  }

  test("WAV samples: golden bytes round-trip, fingerprint gain invariance") {
    val samples = Array[Short](0, -1, 32767, -32768, 257)
    val built = MediaCodecs.buildWavSamples(8000, samples)
    // golden: canonical header + little-endian sample words
    val golden = ascii("RIFF") ++ le32(36 + 10) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++
      le16(2) ++ le16(16) ++ ascii("data") ++ le32(10) ++
      Array[Byte](0, 0, -1, -1, -1, 127, 0, -128, 1, 1)
    assert(built.toSeq == golden.toSeq)
    val (rate, back) = MediaCodecs.parseWavSamples(built).get
    assert(rate == 8000 && back.toSeq == samples.toSeq)
    // the header decode still reads it; truncated data rejected; the
    // legacy zero-sample builder parses (all-zero samples are valid PCM)
    assert(MediaCodecs.parse(built).get.sampleRate == 8000)
    assert(MediaCodecs.parseWavSamples(built.dropRight(1)).isEmpty)
    assert(MediaCodecs.parseWavSamples(MediaCodecs.buildWav(8000, 3)).get
      ._2.toSeq == Seq[Short](0, 0, 0))

    // fingerprint: rising window energies => all 64 bits; flat => 0
    def steps(amps: Seq[Int]) = amps.flatMap(a => Seq.fill(16)(a.toShort)).toArray
    assert(MediaCodecs.energyFingerprint64(steps(0 to 64), 16) == -1L)
    assert(MediaCodecs.energyFingerprint64(steps(Seq.fill(65)(7)), 16) == 0L)
    // positive gain never changes an energy comparison
    val amps = (0 until 65).map(w => (w * 37 + 11) % 200)
    val fp1 = MediaCodecs.energyFingerprint64(steps(amps), 16)
    val fp2 = MediaCodecs.energyFingerprint64(steps(amps.map(_ * 3)), 16)
    assert(fp1 == fp2)
    // a single-window spike flips at most the two comparisons touching it
    val spiked = amps.updated(30, amps(30) + 37)
    val d = java.lang.Long.bitCount(fp1 ^ MediaCodecs.energyFingerprint64(steps(spiked), 16))
    assert(d <= 2, s"single window flipped $d bits")
    // negative samples contribute |sample| (the -1 run beats the 0 run)
    assert((MediaCodecs.energyFingerprint64(
      steps(Seq(0, -1) ++ Seq.fill(63)(0)), 16) & 1L) == 1L)
  }

  test("dHash: neighbor comparisons, brightness invariance, single-pixel locality") {
    // 9x8 ramp: gray = x => every horizontal comparison is 'greater' =>
    // all 64 bits set
    val ramp = Array.tabulate(8, 9)((_, x) => x * 3)
    assert(MediaCodecs.dHash64(ramp) == -1L)
    val flat = Array.tabulate(8, 9)((_, _) => 7)
    assert(MediaCodecs.dHash64(flat) == 0L)
    // constant brightness shift never changes a comparison
    val img = Array.tabulate(8, 9)((y, x) => (x * 37 + y * 11) % 200)
    val brighter = img.map(_.map(_ + 40))
    assert(MediaCodecs.dHash64(img) == MediaCodecs.dHash64(brighter))
    // a single-pixel change flips at most the two comparisons touching it
    val perturbed = img.map(_.clone)
    perturbed(3)(2) += 37
    val d = java.lang.Long.bitCount(
      MediaCodecs.dHash64(img) ^ MediaCodecs.dHash64(perturbed))
    assert(d <= 2, s"single pixel flipped $d bits")
  }

  test("synthesize: field formulas round-trip through parse for every kind") {
    for (len <- Seq(0, 1, 63, 64, 65, 640, 2000); id <- 0L to 5L) {
      val wav = MediaCodecs.parse(MediaCodecs.synthesize("audio", id, len)).get
      val sr = 8000 * (1 + (id % 3).toInt)
      assert(wav == MediaCodecs.Parsed(0, 0, len.toLong * 1000 / sr, sr))
      val bmp = MediaCodecs.parse(MediaCodecs.synthesize("image", id, len)).get
      assert(bmp == MediaCodecs.Parsed(16 + len % 640, 16 + len % 480, 0L, 0))
      val avi = MediaCodecs.parse(MediaCodecs.synthesize("video", id, len)).get
      assert(avi == MediaCodecs.Parsed(16 + len % 640, 16 + len % 480,
        (30 + len % 900).toLong * 33333 / 1000, 0))
    }
  }

  private def pngBytes(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = gray(x, y)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("buildPngGray: hand-built stored-deflate PNG round-trips bytes -> ImageIO -> exact grid") {
    val id = 777L
    val grid = (x: Int, y: Int) => graft.operators.Multimodal.grayPixel(id)(x, y)
    val png = MediaCodecs.buildPngGray(9, 8, grid)
    // a REAL decoder (ImageIO, via the unified dispatch) must read our
    // hand-assembled container byte-for-byte: signature, IHDR, stored
    // deflate blocks, adler32, CRCs
    assert(MediaCodecs.parse(png).contains(MediaCodecs.Parsed(9, 8, 0L, 0)))
    val g = MediaCodecs.parseImageGray(png).get
    val expected = (0 until 8).map(y => (0 until 9).map(x => grid(x, y)))
    assert(g.map(_.toSeq).toSeq == expected.map(_.toSeq))
    // the grid equals the BMP rendering's — the m4b == m4 identity's core
    assert(MediaCodecs.parseBmpGray(MediaCodecs.buildBmpGray(9, 8, grid))
      .get.map(_.toSeq).toSeq == g.map(_.toSeq).toSeq)
    // a multi-block zlib stream (raw > 65535 bytes: 160x160x3) also decodes
    val bigPng = MediaCodecs.buildPngGray(160, 160, (x, y) => (x * 7 + y * 3) % 200)
    assert(MediaCodecs.parse(bigPng).contains(MediaCodecs.Parsed(160, 160, 0L, 0)))
    val gBig = MediaCodecs.parseCompressedGray(bigPng, 160, 160).get
    assert(gBig(17)(23) == (23 * 7 + 17 * 3) % 200)
  }

  test("buildJpegGrayBlocks: DC-only baseline JPEG decodes to the exact grid (lossy made arithmetic)") {
    val id = 777L
    val grid = (x: Int, y: Int) => graft.operators.Multimodal.grayPixel(id)(x, y)
    val jpg = MediaCodecs.buildJpegGrayBlocks(9, 8, grid)
    // metadata arm: SOFn walk finds the 72x64 frame
    assert(MediaCodecs.parse(jpg).contains(MediaCodecs.Parsed(72, 64, 0L, 0)))
    // decode arm: a REAL baseline decoder (ImageIO/libjpeg) must read the
    // hand-assembled container — custom canonical huffman tables, all-1
    // quant, DC prediction, byte stuffing — and the DC-only construction
    // (multiple-of-8 coefficients, flat-128 chroma) makes the decode +
    // block-mean downscale EXACT despite JPEG being a lossy format
    val g = MediaCodecs.parseImageGray(jpg).get
    val expected = (0 until 8).map(y => (0 until 9).map(x => grid(x, y)))
    assert(g.map(_.toSeq).toSeq == expected.map(_.toSeq),
      "JPEG decode drifted from the arithmetic grid")
    // the extreme grays exercise the full DC category range (|dc| <= 1024)
    val extremes = MediaCodecs.buildJpegGrayBlocks(4, 2,
      (x, y) => Seq(0, 255, 128, 1, 254, 127, 129, 64)(y * 4 + x))
    val ge = MediaCodecs.parseCompressedGray(extremes, 4, 2).get
    assert(ge.flatten.toSeq == Seq(0, 255, 128, 1, 254, 127, 129, 64))
    // identity with the m4 family: same grid as the BMP rendering
    assert(MediaCodecs.parseBmpGray(MediaCodecs.buildBmpGray(9, 8, grid))
      .get.map(_.toSeq).toSeq == g.map(_.toSeq).toSeq)
  }

  test("PNG/JPEG branch: golden PNG decodes to known pixels, matches its BMP gallery sibling") {
    val id = 4096L
    val grid = (x: Int, y: Int) => graft.operators.Multimodal.grayPixel(id)(x, y)
    val png = pngBytes(9, 8, grid)
    // metadata arm: IHDR dimensions via the magic dispatch
    assert(MediaCodecs.parse(png).contains(MediaCodecs.Parsed(9, 8, 0L, 0)))
    // pixel arm: PNG is lossless and the test image achromatic, so luma
    // reproduces the arithmetic grid EXACTLY
    val g = MediaCodecs.parseImageGray(png).get
    val expected = (0 until 8).map(y => (0 until 9).map(x => grid(x, y)))
    assert(g.map(_.toSeq).toSeq == expected.map(_.toSeq))
    // and the decoded PNG joins the m4 perceptual family: its dHash equals
    // its brightness-shifted BMP gallery sibling's (id+1 is the +5 member)
    val sibling = MediaCodecs.parseBmpGray(MediaCodecs.buildBmpGray(
      9, 8, graft.operators.Multimodal.grayPixel(id + 1))).get
    assert(MediaCodecs.dHash64(g) == MediaCodecs.dHash64(sibling))
    // oversized PNG: 2x2 blocks of the same grid block-mean down to the
    // identical raster through the deterministic downscale
    val big = pngBytes(18, 16, (x, y) => grid(x / 2, y / 2))
    assert(MediaCodecs.parse(big).contains(MediaCodecs.Parsed(18, 16, 0L, 0)))
    val gBig = MediaCodecs.parseImageGray(big).get
    assert(gBig.map(_.toSeq).toSeq == expected.map(_.toSeq))
    // undersized images have nothing to hash against
    assert(MediaCodecs.parseImageGray(pngBytes(4, 4, grid)).isEmpty)
    // JPEG: lossy, so only the metadata arm is asserted (SOF walk)
    val jimg = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val jbaos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(jimg, "jpg", jbaos)
    assert(MediaCodecs.parse(jbaos.toByteArray)
      .contains(MediaCodecs.Parsed(9, 8, 0L, 0)))
  }
}
