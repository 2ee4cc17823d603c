package graft.tools

import java.awt.image.BufferedImage

/** One-off fixture generator for the m4d decode-path goldens — kept in
  * the tree so the fixture provenance is reproducible: each fixture is
  * a deterministic synthetic "photograph" (smooth gradients, an edge,
  * a disk — the feature mix that makes every DCT band and both chroma
  * channels nonzero) encoded by the JDK's OWN baseline JPEG writer at
  * three qualities. Unlike m4c's arithmetically-exact construction,
  * these carry real quant tables, real Huffman tables and chroma
  * subsampling — the decode paths a camera file exercises. The BYTES
  * are checked in under src/main/resources/graft/jpeg_fixtures (so
  * encoder drift across JDKs cannot move them), and the goldens this
  * prints are pasted into SparkEntry's m4d oracle as literals (so
  * decoder drift fails the gate instead of silently re-baselining).
  *
  * Run: sbt "runMain graft.tools.GenJpegFixtures"
  */
object GenJpegFixtures {

  /** Deterministic RGB "photo": integer gradients + a bright disk + a
    * hard vertical edge. Pure arithmetic — no RNG, no time.
    */
  private def rgb(seed: Int)(x: Int, y: Int): Int = {
    val r = (x * 255 / 95 + seed * 40) & 0xff
    val g = (y * 255 / 63 + seed * 25) & 0xff
    val dx = x - 30 - seed * 10; val dy = y - 28
    val inDisk = dx * dx + dy * dy < (10 + seed * 3) * (10 + seed * 3)
    val edge = if (x > 64) 70 else 0
    val b = (((x + 2 * y) & 0x3f) * 3 + edge + (if (inDisk) 90 else 0)) & 0xff
    (r << 16) | (g << 8) | b
  }

  def fixtureNames: Seq[String] = Seq("cam0", "cam1", "cam2")

  private def qualityOf(i: Int): Float = Seq(0.5f, 0.75f, 0.92f)(i)

  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(
      "src/main/resources/graft/jpeg_fixtures")
    java.nio.file.Files.createDirectories(outDir)
    fixtureNames.zipWithIndex.foreach { case (name, i) =>
      val (w, h) = (96, 64)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(i)(x, y))
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpeg").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(qualityOf(i))
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      val bytes = bos.toByteArray
      java.nio.file.Files.write(outDir.resolve(s"$name.jpg"), bytes)
      // goldens = the engine's canonical decode, run ONCE here and
      // frozen as oracle literals: the FULL-RESOLUTION luma digest (the
      // sharpest pin — any decoder drift moves it), the 9×8 serving
      // grid digest, and the dHash the perceptual pipeline would store
      def md5Of(g: Array[Array[Int]]): String = {
        val md = java.security.MessageDigest.getInstance("MD5")
        g.foreach(row => row.foreach(v => md.update(v.toByte)))
        md.digest().map("%02x".format(_)).mkString
      }
      val full = graft.operators.MediaCodecs
        .parseCompressedGray(bytes, w, h).get
      val grid = graft.operators.MediaCodecs.parseImageGray(bytes).get
      val dh = graft.operators.MediaCodecs.dHash64(grid)
      println(s"""("$name", $w, $h, "${md5Of(full)}", "${md5Of(grid)}", ${dh}L)""")
    }
  }
}
