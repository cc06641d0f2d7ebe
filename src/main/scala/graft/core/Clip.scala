package graft.core

/**
 * Cohen–Sutherland segment/rectangle clipping, semantics identical to
 * the reference implementation (clip.c:9-77), used both as the
 * pre-rasterize clip and as the dump-inclusion predicate
 * (render.c:244-262).
 */
object Clip {
  private final val INSIDE = 0
  private final val LEFT = 1
  private final val RIGHT = 2
  private final val BOTTOM = 4
  private final val TOP = 8

  private def outCode(x: Double, y: Double, xmin: Double, ymin: Double, xmax: Double, ymax: Double): Int = {
    var code = INSIDE
    if (x < xmin) code |= LEFT
    else if (x > xmax) code |= RIGHT
    if (y < ymin) code |= BOTTOM
    else if (y > ymax) code |= TOP
    code
  }

  /** Clip segment (x0,y0)-(x1,y1) to [xmin,xmax]x[ymin,ymax].
    * Returns null if rejected, else the 4 clipped coords. */
  def clip(x0in: Double, y0in: Double, x1in: Double, y1in: Double,
           xmin: Double, ymin: Double, xmax: Double, ymax: Double): Array[Double] = {
    var x0 = x0in; var y0 = y0in; var x1 = x1in; var y1 = y1in
    var out0 = outCode(x0, y0, xmin, ymin, xmax, ymax)
    var out1 = outCode(x1, y1, xmin, ymin, xmax, ymax)
    while (true) {
      if ((out0 | out1) == 0) {
        return Array(x0, y0, x1, y1)
      } else if ((out0 & out1) != 0) {
        return null
      } else {
        var x = x0; var y = y0
        val outcodeOut = if (out0 != 0) out0 else out1
        if ((outcodeOut & TOP) != 0) {
          x = x0 + (x1 - x0) * (ymax - y0) / (y1 - y0); y = ymax
        } else if ((outcodeOut & BOTTOM) != 0) {
          x = x0 + (x1 - x0) * (ymin - y0) / (y1 - y0); y = ymin
        } else if ((outcodeOut & RIGHT) != 0) {
          y = y0 + (y1 - y0) * (xmax - x0) / (x1 - x0); x = xmax
        } else {
          y = y0 + (y1 - y0) * (xmin - x0) / (x1 - x0); x = xmin
        }
        if (outcodeOut == out0) {
          x0 = x; y0 = y; out0 = outCode(x0, y0, xmin, ymin, xmax, ymax)
        } else {
          x1 = x; y1 = y; out1 = outCode(x1, y1, xmin, ymin, xmax, ymax)
        }
      }
    }
    null // unreachable
  }

  /** Does the segment intersect the rectangle at all? */
  def accepts(x0: Double, y0: Double, x1: Double, y1: Double,
              xmin: Double, ymin: Double, xmax: Double, ymax: Double): Boolean =
    clip(x0, y0, x1, y1, xmin, ymin, xmax, ymax) != null
}
