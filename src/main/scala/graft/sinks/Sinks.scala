package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{BitPack, Cell, Mercator}
import graft.encode.Feature
import java.nio.file.{Files, Paths}

/** Output sinks of the engine beyond parquet: the reference's dump
  * formats, tileset metadata, and the reference's own binary dataset
  * format (full interop: a dataset written here renders identically
  * under the reference binaries). */
object Sinks {
  /** S6: text dump rows (`render -d` format, dump.c:69-89):
    * "lat,lon [lat,lon ...] [bits:meta] // hex..." */
  def textDump(features: Dataset[Feature], metabits: Int): Dataset[String] = {
    val spark = features.sparkSession
    import spark.implicits._
    features.map { f =>
      val coords = f.vertices.map { c =>
        val x = Cell.decodeX(c); val y = Cell.decodeY(c)
        f"${Mercator.tileToLat(y, 32)}%f,${Mercator.tileToLon(x, 32)}%f"
      }.mkString(" ")
      val metaPart = if (metabits != 0) f" $metabits%d:${f.meta}%d" else ""
      val hex = f.vertices.map { c =>
        f"${Cell.decodeX(c)}%08x ${Cell.decodeY(c)}%08x"
      }.mkString(" ")
      s"$coords$metaPart // $hex"
    }
  }

  /** S7: GeoJSON dump (`render -D`, dump.c:21-68): Point / LineString
    * features with meta as a property. */
  def geoJsonDump(features: Dataset[Feature], metabits: Int): Dataset[String] = {
    val spark = features.sparkSession
    import spark.implicits._
    features.map { f =>
      val coords = f.vertices.map { c =>
        val lon = Mercator.tileToLon(Cell.decodeX(c), 32)
        val lat = Mercator.tileToLat(Cell.decodeY(c), 32)
        f"[ $lon%f, $lat%f ]"
      }
      val (typ, cs) =
        if (f.vertices.length == 1) ("Point", coords.head.stripPrefix("[").stripSuffix("]").trim)
        else ("LineString", coords.mkString("[ ", ", ", " ]"))
      val props = if (metabits != 0) s"""{ "meta": ${f.meta} }""" else "{}"
      s"""{ "type": "Feature", "properties": $props, "geometry": { "type": "$typ", "coordinates": [ $cs ] } }"""
    }
  }

  /** S5: mbutil-compatible tileset metadata.json (render.c:395-457). */
  def writeTilesetMetadata(dir: String, name: String, minzoom: Int, maxzoom: Int): Unit = {
    Files.createDirectories(Paths.get(dir))
    val json =
      s"""{
         |  "name": "$name",
         |  "description": "$name",
         |  "version": "1",
         |  "format": "png",
         |  "type": "overlay",
         |  "minzoom": $minzoom,
         |  "maxzoom": $maxzoom,
         |  "bounds": "-180.0,-85.0511,180.0,85.0511"
         |}""".stripMargin
    Files.writeString(Paths.get(dir, "metadata.json"), json)
  }

  /** min/max zoom gathered during the write pass (an up-front
    * `tiles.map(_.z).distinct().collect()` would execute the full
    * render DAG a second time just for the metadata header). */
  private class ZRangeAcc extends org.apache.spark.util.AccumulatorV2[Int, (Int, Int)] {
    private var mn = Int.MaxValue
    private var mx = Int.MinValue
    override def isZero: Boolean = mn == Int.MaxValue
    override def copy(): ZRangeAcc = { val a = new ZRangeAcc; a.mn = mn; a.mx = mx; a }
    override def reset(): Unit = { mn = Int.MaxValue; mx = Int.MinValue }
    override def add(v: Int): Unit = { if (v < mn) mn = v; if (v > mx) mx = v }
    override def merge(other: org.apache.spark.util.AccumulatorV2[Int, (Int, Int)]): Unit =
      other match { case o: ZRangeAcc => if (o.mn < mn) mn = o.mn; if (o.mx > mx) mx = o.mx }
    override def value: (Int, Int) = (mn, mx)
  }

  /** Tile table -> z/x/y.png files + metadata.json (the `render -o`
    * tileset layout). Executor-parallel file writes; ONE render job
    * (the zoom range for metadata.json rides along in an accumulator). */
  def writeTileset(tiles: Dataset[graft.render.TileOut], dir: String, name: String): Unit = {
    val spark = tiles.sparkSession
    val zAcc = new ZRangeAcc
    spark.sparkContext.register(zAcc, "tileset-zoom-range")
    tiles.foreachPartition { (it: Iterator[graft.render.TileOut]) =>
      it.foreach { t =>
        val p = Paths.get(dir, t.z.toString, t.x.toString)
        Files.createDirectories(p)
        Files.write(p.resolve(t.y.toString + ".png"), t.png)
        zAcc.add(t.z)
      }
    }
    if (!zAcc.isZero) {
      val (mn, mx) = zAcc.value
      writeTilesetMetadata(dir, name, mn, mx)
    }
  }

  /**
   * Assemble mode (`render -A`, render.c:827-887): render every tile of
   * a lat/lon bbox at zoom z and stitch into one large RGBA image,
   * cropped to the bbox at pixel precision. Deviation from the
   * reference: the crop offset is rounded to whole pixels (the reference
   * draws at fractional offsets — a <=0.5 px global shift) and brush
   * spill across subtile borders comes from the neighbor ring rather
   * than being clipped away. Capped at 10000x10000 like the reference.
   */
  def assemble(points: Option[DataFrame], lines: Option[Dataset[Feature]],
               z: Int, lat1: Double, lon1: Double, lat2: Double, lon2: Double,
               mapbits: Int, p: graft.core.RenderParams): (Array[Byte], Int, Int) = {
    val wx1 = math.min(Mercator.lonToX32(lon1), Mercator.lonToX32(lon2))
    val wx2 = math.max(Mercator.lonToX32(lon1), Mercator.lonToX32(lon2))
    val wy1 = math.min(Mercator.latToY32(lat1), Mercator.latToY32(lat2))
    val wy2 = math.max(Mercator.latToY32(lat1), Mercator.latToY32(lat2))
    val ts = p.tilesize
    val x1 = (wx1 >> (32 - z)).toInt; val x2 = (wx2 >> (32 - z)).toInt
    val y1 = (wy1 >> (32 - z)).toInt; val y2 = (wy2 >> (32 - z)).toInt
    val fx1 = Mercator.worldToTileFracX(wx1, z, x1)
    val fy1 = Mercator.worldToTileFracY(wy1, z, y1)
    val fx2 = Mercator.worldToTileFracX(wx2, z, x2)
    val fy2 = Mercator.worldToTileFracY(wy2, z, y2)
    val outW = ((x2 - x1 + fx2 - fx1) * ts).toInt
    val outH = ((y2 - y1 + fy2 - fy1) * ts).toInt
    require(outW.toLong * outH <= 10000L * 10000L, "Image too big")
    val cropX = (fx1 * ts).round.toInt
    val cropY = (fy1 * ts).round.toInt

    val tiles = graft.render.Render.renderTiles(points, lines, z, mapbits, p,
      requireOwn = false,
      only = Some((tx, ty) => tx >= x1 && tx <= x2 && ty >= y1 && ty <= y2))
      .collect()
    val big = new Array[Byte](outW * outH * 4)
    // background fill for empty regions
    val bgTile = graft.core.ToneMap(new graft.core.Canvas(1, 1), p)
    var i = 0
    while (i < outW * outH) {
      System.arraycopy(bgTile, 0, big, i * 4, 4)
      i += 1
    }
    tiles.foreach { t =>
      val (rgba, _, _) = graft.core.Png.decode(t.png)
      val ox = (t.x - x1) * ts - cropX
      val oy = (t.y - y1) * ts - cropY
      var py = 0
      while (py < ts) {
        val by = oy + py
        if (by >= 0 && by < outH) {
          var px = 0
          while (px < ts) {
            val bx = ox + px
            if (bx >= 0 && bx < outW)
              System.arraycopy(rgba, (py * ts + px) * 4, big, (by * outW + bx) * 4, 4)
            px += 1
          }
        }
        py += 1
      }
    }
    (big, outW, outH)
  }

  /**
   * S10: write a dataset in the reference's own binary format —
   * per-(n,common) fully sorted packed record files + `meta` descriptor
   * (encode.c:274-403). TEST-ONLY golden-interop sink: the records
   * stream through the driver in sorted partition order — do not point
   * it at real data. At cluster scale each (n,common) group would be
   * written as per-partition files and concatenated by the storage
   * layer; dataset files here are local single files by design.
   */
  def writeDatamapsBinary(features: Dataset[Feature], dir: String,
                          encodeZoom: Int = 16, metabits: Int = 0): Unit = {
    val spark = features.sparkSession
    import spark.implicits._
    val mapbits = 2 * (encodeZoom + 8)
    Files.createDirectories(Paths.get(dir))

    // pack every record, tagged with its (n, common) file identity;
    // cached so the per-group loop below re-filters the cached packed
    // rows instead of re-running the upstream DAG per group
    val packed: Dataset[(Int, Int, Array[Byte])] = features.map { f =>
      val xs = f.vertices.map(c => Cell.decodeX(c).toInt)
      val ys = f.vertices.map(c => Cell.decodeY(c).toInt)
      val n = xs.length
      val common = if (n > 1) BitPack.commonLevels(xs, ys, mapbits) else 0
      (n, common, BitPack.pack(xs, ys, f.meta, metabits, mapbits, metabits, common))
    }.cache()

    val groups = packed.select(col("_1"), col("_2")).distinct()
      .as[(Int, Int)].collect().sorted
    var maxn = 0
    groups.foreach { case (n, common) =>
      maxn = math.max(maxn, n)
      val sorted = packed.filter(r => r._1 == n && r._2 == common)
        .map(_._3)
        .rdd
        .sortBy(identity[Array[Byte]])(
          new Ordering[Array[Byte]] {
            def compare(a: Array[Byte], b: Array[Byte]): Int = BitPack.compare(a, b)
          },
          scala.reflect.classTag[Array[Byte]])
      val fname = if (n == 1) "1,0" else s"$n,$common"
      val out = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(s"$dir/$fname"))
      sorted.toLocalIterator.foreach(out.write)
      out.close()
    }
    packed.unpersist()
    Files.writeString(Paths.get(dir, "meta"), s"1\n$mapbits $metabits $maxn\n")
  }
}
