package graft.core

/**
 * Rendering configuration; defaults match the reference CLI defaults
 * (render.c:18-44, 483-493).
 */
case class RenderParams(
    dotBase: Int = 13,
    dotBright: Double = 0.05917,
    dotRamp: Double = 1.23,
    pointSize: Double = 1,
    gaussian: Boolean = false,
    linePerDot: Double = 6.64,
    lineRamp: Double = 1,
    lineThick: Double = 1,
    gpsBase: Int = 16,
    gpsDist: Double = 1600,
    gpsRamp: Double = 1.5,
    gamma: Double = 0.5,
    colorCap: Double = 0.7,
    cie: Boolean = false,
    antialias: Boolean = true,
    mercatorLat: Double = -1, // -M: latitude for area compensation; <0 = off
    exponent: Double = 2,
    metabright: Boolean = false,
    metabrush: Boolean = false,
    maxmeta: Long = Long.MaxValue,
    tilesize: Int = 256,
    gps: Boolean = false,
    // -x c: cloud/circle mode — meta = count scattered in a radius
    // (render.c:60-72, 272-305); <= 0 = off. Value = radius parameter.
    circle: Double = -1,
    // color ramp (-C meta1:hue1:meta2:hue2); inactive by default
    colorRampActive: Boolean = false,
    colorMeta1: Long = 0, colorHue1: Double = 0,
    colorMeta2: Long = 0, colorHue2: Double = 0,
    // tone map
    transparency: Int = 255,
    invert: Boolean = false,
    bg: Int = 0,
    color: Int = -1,
    color2: Int = -1,
    saturate: Boolean = true,
    mask: Boolean = false) {

  /** Per-(tile-zoom) point-rendering parameters: sampling step, brush
    * area, brightness (render.c:121-139). */
  def pointParams(zDraw: Int): (Int, Double, Double) = {
    var step = 1
    var brush = 1.0
    var bright1 = dotBright
    if (zDraw > dotBase) {
      brush = math.exp(math.log(2.0) * (zDraw - dotBase))
      bright1 *= math.exp(math.log(dotRamp) * (zDraw - dotBase))
    } else {
      step = math.floor(math.exp(math.log(exponent) * (dotBase - zDraw)) + .5).toInt
      bright1 *= math.exp(math.log(dotRamp) * (zDraw - dotBase))
      bright1 = bright1 * step / (1 << (dotBase - zDraw))
    }
    bright1 /= pointSize
    brush *= pointSize
    (step, brush, bright1)
  }

  /** Per-zoom line thickness and brightness (render.c:140-149). */
  def lineParams(zDraw: Int): (Double, Double) = {
    var thick = lineThick
    var bright1 = dotBright * linePerDot / lineThick
    if (lineRamp >= 1) {
      thick *= math.exp(math.log(lineRamp) * (zDraw - dotBase))
      bright1 *= math.exp(math.log(dotRamp / lineRamp) * (zDraw - dotBase))
    } else {
      bright1 *= math.exp(math.log(dotRamp) * (zDraw - dotBase))
    }
    (thick, bright1)
  }

  /** Mercator area compensation for the brush (render.c:151-160). */
  def mercatorBrushScale(zDraw: Int, yDraw: Int): Double =
    if (mercatorLat < 0) 1.0
    else {
      val lat = Mercator.tileToLat(((yDraw + .5) * (1L << (32 - zDraw))).toLong, 32)
      val rat = math.cos(lat * math.Pi / 180)
      val base = math.cos(mercatorLat * math.Pi / 180)
      1.0 / (rat * rat / (base * base))
    }

  /** meta -> hue in [0,1), or -1 for "no hue" (render.c:214-228). */
  def metaHue(meta: Long): Double = {
    if (!colorRampActive) return -1
    val hue = ((meta.toDouble - colorMeta1) / (colorMeta2 - colorMeta1) *
      (colorHue2 - colorHue1) + colorHue1) / 360
    if (hue < -2) -1
    // closed form of the reference's ±1 wrap loops (render.c:218-227),
    // bit-exact for every input where those loops terminate: each ±1
    // step is FP-exact below 2^53, so the loop result equals
    // hue - floor(hue) — except the DOWNWARD loop exits at exactly 1
    // (integers map to 1.0) while the upward loop exits at 0. At
    // hue >= 2^53 (or +Inf) the reference's hue-- no longer progresses
    // and it hangs — we return the no-hue sentinel instead (documented
    // deviation: a hang is not a behavior to replicate). NaN passes
    // through both versions untouched.
    else if (hue >= 9007199254740992.0) -1 // 2^53
    else if (hue > 1) {
      val frac = hue - math.floor(hue)
      if (frac == 0.0) 1.0 else frac
    } else if (hue < 0) hue - math.floor(hue)
    else hue
  }

  /** Cloud radius in tiles for circle mode (cloudsize(),
    * render.c:60-72): radius parameter scaled by latitude and zoom. */
  def cloudSize(zDraw: Int, xDraw: Int, yDraw: Int): Double = {
    val lat = Mercator.tileToLat(((yDraw + .5) * (1L << (32 - zDraw))).toLong, 32)
    val rat = math.cos(lat * math.Pi / 180)
    var size = circle * .00000274 // degrees
    size /= rat
    // 1L: the reference's `1 << z_draw` (render.c:69) is int and UB at
    // z_draw >= 31; we support single-tile renders to z=32
    size /= 360.0 / (1L << zDraw) // tiles
    size
  }

  /** GPS-jump attenuation: returns the scaled brightness, or 0 to drop
    * the segment (render.c:321-336). */
  def gpsAttenuate(bright: Double, dx: Double, dy: Double, zDraw: Int): Double = {
    if (!gps) return bright
    val dist = math.sqrt(dx * dx + dy * dy)
    val min = gpsDist * math.exp(math.log(gpsRamp) * (gpsBase - zDraw))
    var b = bright
    if (dist > min) b /= dist / min
    if (b < .0025) 0 else b
  }
}

/**
 * Tone-mapping of an accumulated Canvas to RGBA bytes; semantics match
 * the reference's out() (graphics.c:51-190): gamma, hue -> RGB rainbow
 * or CIELCH-approx, two-segment saturation ramp mid-color -> color2,
 * background/alpha blending, mask inversion.
 */
object ToneMap {
  private val bufCache = new ThreadLocal[Array[Byte]]

  def apply(g: Canvas, p: RenderParams): Array[Byte] = {
    val n = g.width * g.height
    // thread-local reuse: one task per thread at a time; callers consume
    // the buffer before the next tile on this thread is tone-mapped
    var buf = bufCache.get()
    if (buf == null || buf.length != n * 4) {
      buf = new Array[Byte](n * 4)
      bufCache.set(buf)
    }
    val limit2 = 1.0
    val limit = limit2 / 2
    val hasHue = g.hasHue

    val (r, gg, b) =
      if (p.color < 0) (128, 128, 128)
      else ((p.color >> 16) & 0xFF, (p.color >> 8) & 0xFF, p.color & 0xFF)
    val fg = if (p.invert) 0 else 255
    val bgR = (p.bg >> 16) & 0xFF
    val bgG = (p.bg >> 8) & 0xFF
    val bgB = p.bg & 0xFF
    val (r2, g2, b2) =
      if (p.color2 < 0) (fg, fg, fg)
      else ((p.color2 >> 16) & 0xFF, (p.color2 >> 8) & 0xFF, p.color2 & 0xFF)

    // background fast fill: zero-brightness pixels map to the constant
    // bg pixel; fill the whole buffer with it (doubling arraycopy), then
    // tone-map only the canvas's dirty rows — at high zooms most tiles
    // are nearly empty and this is the dominant memory traffic.
    // Mask mode inverts zero pixels (they are NOT background), so it
    // keeps the full-canvas loop.
    val fast = !p.mask
    if (fast) {
      buf(0) = bgR.toByte; buf(1) = bgG.toByte; buf(2) = bgB.toByte; buf(3) = p.transparency.toByte
      var filled = 4
      while (filled < buf.length) {
        val copy = math.min(filled, buf.length - filled)
        System.arraycopy(buf, 0, buf, filled, copy)
        filled += copy
      }
      if (g.maxY < g.minY) return buf // untouched canvas: all background
    }

    var i = if (fast) g.minY * g.width else 0
    val end = if (fast) (g.maxY + 1) * g.width else n
    while (i < end) {
      var sat = 0.0
      var midr = r; var midg = gg; var midb = b
      if (hasHue && !(g.cx(i) == 0 && g.cy(i) == 0)) {
        var h = math.atan2(g.cy(i), g.cx(i)) / (2 * math.Pi)
        if (g.image(i) != 0)
          sat = math.sqrt(g.cx(i) * g.cx(i) + g.cy(i) * g.cy(i)) / g.image(i)
        if (p.cie) {
          val l = .5
          var c = sat
          h *= 2 * math.Pi
          h = h + (math.Pi / 2 - (math.Pi - 2))
          if (c > 1 - 2 * math.abs(l - .5)) c = 1 - 2 * math.abs(l - .5)
          val r1 = math.sin(h + math.Pi - 2.0) * 0.417211 * c + l
          val g1 = math.sin(h + math.Pi + 1.5) * 0.158136 * c + l
          val b1 = math.sin(h + math.Pi) * 0.455928 * c + l
          midr = (math.exp(math.log(r1 * 0.923166 + 0.0791025) * 1.25) * 255).toInt
          midg = (math.exp(math.log(g1 * 0.923166 + 0.0791025) * 1.25) * 255).toInt
          midb = (math.exp(math.log(b1 * 0.923166 + 0.0791025) * 1.25) * 255).toInt
        } else {
          h += .5
          h *= -1
          val r1 = math.sin(math.Pi * h)
          val g1 = math.sin(math.Pi * (h + 1.0 / 3))
          val b1 = math.sin(math.Pi * (h + 2.0 / 3))
          midr = (255 * (r1 * r1) * sat + r * (1 - sat)).toInt
          midg = (255 * (g1 * g1) * sat + gg * (1 - sat)).toInt
          midb = (255 * (b1 * b1) * sat + b * (1 - sat)).toInt
        }
      }

      var v = g.image(i)
      if (v != 0 && p.gamma != 1) v = math.exp(math.log(v) * p.gamma)
      if (p.mask) {
        v = limit - v
        if (v < 0) v = 0
      }

      if (v == 0) {
        if (!fast) {
          buf(4 * i) = bgR.toByte
          buf(4 * i + 1) = bgG.toByte
          buf(4 * i + 2) = bgB.toByte
          buf(4 * i + 3) = p.transparency.toByte
        } // else: already background-filled
      } else {
        if (sat != 0 && v > limit2 * p.colorCap) v = limit2 * p.colorCap
        if (!p.saturate) {
          if (v > limit2) v = limit2
          v *= limit / limit2
        }
        if (v <= limit) {
          val along = v / limit
          val opacity = (255 * along + p.transparency * (1 - along)) / 255
          buf(4 * i) = (midr * along / opacity + bgR * (1 - along / opacity)).toInt.toByte
          buf(4 * i + 1) = (midg * along / opacity + bgG * (1 - along / opacity)).toInt.toByte
          buf(4 * i + 2) = (midb * along / opacity + bgB * (1 - along / opacity)).toInt.toByte
          buf(4 * i + 3) = (opacity * 255).toInt.toByte
        } else if (v <= limit2) {
          val along = (v - limit) / (limit2 - limit)
          buf(4 * i) = (r2 * along + midr * (1 - along)).toInt.toByte
          buf(4 * i + 1) = (g2 * along + midg * (1 - along)).toInt.toByte
          buf(4 * i + 2) = (b2 * along + midb * (1 - along)).toInt.toByte
          buf(4 * i + 3) = 255.toByte
        } else {
          buf(4 * i) = r2.toByte
          buf(4 * i + 1) = g2.toByte
          buf(4 * i + 2) = b2.toByte
          buf(4 * i + 3) = 255.toByte
        }
      }
      i += 1
    }
    buf
  }
}
