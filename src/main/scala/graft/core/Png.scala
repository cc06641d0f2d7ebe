package graft.core

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** PNG encode/decode of RGBA pixel buffers via the JDK's ImageIO — the
  * engine's tile sink format (reference sink: graphics.c:192-218). */
object Png {
  ImageIO.setUseCache(false) // no file-backed stream cache (decode path)

  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var n = 0
    while (n < 256) {
      var c = n
      var k = 0
      while (k < 8) {
        c = if ((c & 1) != 0) 0xEDB88320 ^ (c >>> 1) else c >>> 1
        k += 1
      }
      t(n) = c
      n += 1
    }
    t
  }

  private def crc32(buf: Array[Byte], off: Int, len: Int, seed: Int = -1): Int = {
    var c = seed
    var i = off
    val end = off + len
    while (i < end) {
      c = crcTable((c ^ buf(i)) & 0xFF) ^ (c >>> 8)
      i += 1
    }
    c
  }

  /** rgba: 4 bytes per pixel, row-major. Hand-rolled RGBA8 PNG writer
    * (filter 0 + deflate) — ImageIO's encoder uses a file-backed cache
    * and registry locks that serialize executor threads; this one is
    * allocation-only and thread-safe. */
  private val rawCache = new ThreadLocal[Array[Byte]]
  private val deflaterCache = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater = new java.util.zip.Deflater(3)
  }
  private val chunkCache = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](65536)
  }

  def encode(rgba: Array[Byte], width: Int, height: Int): Array[Byte] = {
    // raw scanlines with filter byte 0 (thread-local buffer reuse: the
    // render reducer calls this once per tile on executor threads)
    val rawLen = height * (1 + width * 4)
    var raw = rawCache.get()
    if (raw == null || raw.length != rawLen) {
      raw = new Array[Byte](rawLen)
      rawCache.set(raw)
    } else {
      var yy = 0
      while (yy < height) { raw(yy * (1 + width * 4)) = 0; yy += 1 }
    }
    var y = 0
    while (y < height) {
      System.arraycopy(rgba, y * width * 4, raw, y * (1 + width * 4) + 1, width * 4)
      y += 1
    }
    val deflater = deflaterCache.get()
    deflater.reset()
    deflater.setInput(raw)
    deflater.finish()
    val comp = new java.io.ByteArrayOutputStream(raw.length / 4 + 64)
    val buf = chunkCache.get()
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      comp.write(buf, 0, n)
    }
    val idat = comp.toByteArray

    val out = new java.io.ByteArrayOutputStream(idat.length + 64)
    val dos = new java.io.DataOutputStream(out)
    dos.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n'))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      dos.writeInt(data.length)
      val full = new Array[Byte](4 + data.length)
      typ.getBytes("ASCII").copyToArray(full)
      data.copyToArray(full, 4)
      dos.write(full)
      dos.writeInt(~crc32(full, 0, full.length))
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte) // bit depth
    ihdr.put(6.toByte) // color type RGBA
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    dos.flush()
    out.toByteArray
  }

  /** PNG bytes -> (rgba, width, height). */
  def decode(png: Array[Byte]): (Array[Byte], Int, Int) = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
    // ImageIO.read signals "unrecognized format" with null, not a throw
    require(img != null, s"Png.decode: not a decodable image (${png.length} bytes)")
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
