package graft.core

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** PNG encode/decode of RGBA pixel buffers via the JDK's ImageIO — the
  * engine's tile sink format (reference sink: graphics.c:192-218). */
object Png {
  /** rgba: 4 bytes per pixel, row-major. */
  def encode(rgba: Array[Byte], width: Int, height: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_ARGB)
    var i = 0
    var p = 0
    val pixels = new Array[Int](width * height)
    while (i < pixels.length) {
      val r = rgba(p) & 0xFF
      val g = rgba(p + 1) & 0xFF
      val b = rgba(p + 2) & 0xFF
      val a = rgba(p + 3) & 0xFF
      pixels(i) = (a << 24) | (r << 16) | (g << 8) | b
      i += 1
      p += 4
    }
    img.setRGB(0, 0, width, height, pixels, 0, width)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** PNG bytes -> (rgba, width, height). */
  def decode(png: Array[Byte]): (Array[Byte], Int, Int) = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
    val w = img.getWidth
    val h = img.getHeight
    val rgba = new Array[Byte](w * h * 4)
    val pixels = img.getRGB(0, 0, w, h, null, 0, w)
    var i = 0
    while (i < pixels.length) {
      val v = pixels(i)
      rgba(4 * i) = ((v >> 16) & 0xFF).toByte
      rgba(4 * i + 1) = ((v >> 8) & 0xFF).toByte
      rgba(4 * i + 2) = (v & 0xFF).toByte
      rgba(4 * i + 3) = ((v >>> 24) & 0xFF).toByte
      i += 1
    }
    (rgba, w, h)
  }

  /** PSNR between two RGBA buffers (dB); Double.PositiveInfinity if equal. */
  def psnr(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length, s"buffer size mismatch ${a.length} vs ${b.length}")
    var se = 0.0
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xFF) - (b(i) & 0xFF)
      se += d.toDouble * d
      i += 1
    }
    if (se == 0) Double.PositiveInfinity
    else 10 * math.log10(255.0 * 255.0 / (se / a.length))
  }
}
