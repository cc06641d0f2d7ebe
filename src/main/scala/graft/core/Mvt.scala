package graft.core

/**
 * Mapbox-Vector-Tile encoder — the engine's vector tile sink (the
 * reference's alternate render backend, vector.cc:181-323 +
 * vector_tile.proto). Hand-rolled protobuf varints (no dependency),
 * layers "points" and "lines", meta as a feature tag, zlib-compressed.
 * Geometry is tile-local, extent 4096, zigzag-delta encoded command
 * streams (MoveTo/LineTo).
 */
object Mvt {
  final val Extent = 4096

  final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) {
        out.write(((v & 0x7F) | 0x80).toInt)
        v >>>= 7
      }
      out.write(v.toInt)
    }
    def zigzag(v: Long): Unit = varint((v << 1) ^ (v >> 63))
    def key(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def bytes(field: Int, b: Array[Byte]): Unit = {
      key(field, 2); varint(b.length); out.write(b)
    }
    def string(field: Int, s: String): Unit = bytes(field, s.getBytes("UTF-8"))
    def uint(field: Int, v: Long): Unit = { key(field, 0); varint(v) }
    def toBytes: Array[Byte] = out.toByteArray
  }

  /** One feature to encode: tile-local integer coords (0..extent). */
  case class MvtFeature(xs: Array[Int], ys: Array[Int], meta: Long)

  /** Encode the command stream for a feature. */
  private def geom(f: MvtFeature, isLine: Boolean): Seq[Long] = {
    val cmds = scala.collection.mutable.ArrayBuffer.empty[Long]
    def zz(v: Long) = (v << 1) ^ (v >> 63)
    var px = 0L; var py = 0L
    if (!isLine) {
      cmds += ((f.xs.length.toLong << 3) | 1) // MoveTo x n
      f.xs.indices.foreach { i =>
        cmds += zz(f.xs(i) - px); cmds += zz(f.ys(i) - py)
        px = f.xs(i); py = f.ys(i)
      }
    } else {
      cmds += ((1L << 3) | 1) // MoveTo x1
      cmds += zz(f.xs(0) - px); cmds += zz(f.ys(0) - py)
      px = f.xs(0); py = f.ys(0)
      cmds += (((f.xs.length - 1).toLong << 3) | 2) // LineTo x (n-1)
      (1 until f.xs.length).foreach { i =>
        cmds += zz(f.xs(i) - px); cmds += zz(f.ys(i) - py)
        px = f.xs(i); py = f.ys(i)
      }
    }
    cmds.toSeq
  }

  private def featureBytes(f: MvtFeature, isLine: Boolean, tagIdx: Option[Int]): Array[Byte] = {
    val w = new Writer
    tagIdx.foreach { t =>
      // tags: packed [keyIdx, valueIdx]
      val tw = new Writer
      tw.varint(0); tw.varint(t)
      w.bytes(2, tw.toBytes)
    }
    w.uint(3, if (isLine) 2 else 1) // GeomType LINESTRING / POINT
    val gw = new Writer
    geom(f, isLine).foreach(gw.varint)
    w.bytes(4, gw.toBytes)
    w.toBytes
  }

  private def valueBytes(v: Long): Array[Byte] = {
    val w = new Writer
    w.key(4, 0) // Value.int_value = field 4 varint
    w.varint(v)
    w.toBytes
  }

  private def layerBytes(name: String, feats: Seq[MvtFeature], isLine: Boolean, hasMeta: Boolean): Array[Byte] = {
    val w = new Writer
    w.uint(15, 2) // version
    w.string(1, name)
    val metas = if (hasMeta) feats.map(_.meta).distinct.sorted else Seq.empty
    val metaIdx = metas.zipWithIndex.toMap
    feats.foreach { f =>
      w.bytes(2, featureBytes(f, isLine, if (hasMeta) Some(metaIdx(f.meta)) else None))
    }
    if (hasMeta) {
      w.string(3, "meta")
      metas.foreach(m => w.bytes(4, valueBytes(m)))
    }
    w.uint(5, Extent)
    w.toBytes
  }

  /** Encode a tile's points + lines into compressed MVT bytes.
    * Duplicate points collapse (the reference's per-cell bucketing with
    * caps, vector.cc:326-497, simplified to exact dedup). */
  def encode(points: Seq[MvtFeature], lines: Seq[MvtFeature], hasMeta: Boolean,
             gzip: Boolean = true): Array[Byte] = {
    val w = new Writer
    val pts = points.distinctBy(f => (f.xs.toSeq, f.ys.toSeq, f.meta))
    if (pts.nonEmpty) w.bytes(3, layerBytes("points", pts, isLine = false, hasMeta))
    if (lines.nonEmpty) w.bytes(3, layerBytes("lines", lines, isLine = true, hasMeta))
    val raw = w.toBytes
    if (!gzip) raw
    else {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(raw)
      gz.close()
      bos.toByteArray
    }
  }

  // ---------- minimal decoder (tests / consumers) ----------

  final class Reader(buf: Array[Byte]) {
    var pos = 0
    def hasMore: Boolean = pos < buf.length
    def varint(): Long = {
      var v = 0L; var shift = 0
      var b = 0
      do {
        b = buf(pos) & 0xFF; pos += 1
        v |= (b & 0x7FL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)
    def bytes(len: Int): Array[Byte] = {
      val r = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len
      r
    }
  }

  case class DecodedLayer(name: String, features: Seq[(Int, Seq[(Long, Long)], Option[Long])], extent: Long)

  def decode(tile: Array[Byte], gzipped: Boolean = true): Seq[DecodedLayer] = {
    val raw =
      if (!gzipped) tile
      else {
        val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(tile))
        in.readAllBytes()
      }
    val r = new Reader(raw)
    val layers = scala.collection.mutable.ArrayBuffer.empty[DecodedLayer]
    while (r.hasMore) {
      val k = r.varint()
      require((k >> 3) == 3 && (k & 7) == 2, s"unexpected tile field $k")
      val len = r.varint().toInt
      layers += decodeLayer(r.bytes(len))
    }
    layers.toSeq
  }

  private def decodeLayer(b: Array[Byte]): DecodedLayer = {
    val r = new Reader(b)
    var name = ""
    var extent = 4096L
    val feats = scala.collection.mutable.ArrayBuffer.empty[(Int, Seq[(Long, Long)], Option[Long])]
    val values = scala.collection.mutable.ArrayBuffer.empty[Long]
    val rawFeats = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    while (r.hasMore) {
      val k = r.varint()
      val field = (k >> 3).toInt
      (field, (k & 7).toInt) match {
        case (1, 2) => name = new String(r.bytes(r.varint().toInt), "UTF-8")
        case (2, 2) => rawFeats += r.bytes(r.varint().toInt)
        case (3, 2) => r.bytes(r.varint().toInt) // key name
        case (4, 2) =>
          val vb = new Reader(r.bytes(r.varint().toInt))
          val vk = vb.varint()
          values += vb.varint()
        case (5, 0) => extent = r.varint()
        case (15, 0) => r.varint()
        case _ => throw new IllegalStateException(s"layer field $k")
      }
    }
    rawFeats.foreach { fb =>
      val fr = new Reader(fb)
      var typ = 0
      var tag: Option[Long] = None
      var coords: Seq[(Long, Long)] = Nil
      while (fr.hasMore) {
        val k = fr.varint()
        ((k >> 3).toInt, (k & 7).toInt) match {
          case (2, 2) =>
            val tr = new Reader(fr.bytes(fr.varint().toInt))
            tr.varint() // key idx
            tag = Some(values(tr.varint().toInt))
          case (3, 0) => typ = fr.varint().toInt
          case (4, 2) =>
            val gr = new Reader(fr.bytes(fr.varint().toInt))
            val cs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
            var px = 0L; var py = 0L
            while (gr.hasMore) {
              val cmd = gr.varint()
              val count = (cmd >> 3).toInt
              val op = (cmd & 7).toInt
              if (op == 1 || op == 2) {
                (0 until count).foreach { _ =>
                  px += gr.unzigzag(gr.varint())
                  py += gr.unzigzag(gr.varint())
                  cs += ((px, py))
                }
              }
            }
            coords = cs.toSeq
          case other => throw new IllegalStateException(s"feature field $other")
        }
      }
      feats += ((typ, coords, tag))
    }
    DecodedLayer(name, feats.toSeq, extent)
  }
}
