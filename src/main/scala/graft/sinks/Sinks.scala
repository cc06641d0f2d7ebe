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

  /** Tile table -> z/x/y.png files + metadata.json (the `render -o`
    * tileset layout). Executor-parallel file writes. */
  def writeTileset(tiles: Dataset[graft.render.TileOut], dir: String, name: String): Unit = {
    val spark = tiles.sparkSession
    import spark.implicits._
    val zs = tiles.map(t => t.z).distinct().collect()
    tiles.foreachPartition { (it: Iterator[graft.render.TileOut]) =>
      it.foreach { t =>
        val p = Paths.get(dir, t.z.toString, t.x.toString)
        Files.createDirectories(p)
        Files.write(p.resolve(t.y.toString + ".png"), t.png)
      }
    }
    if (zs.nonEmpty) writeTilesetMetadata(dir, name, zs.min, zs.max)
  }

  /**
   * S10: write a dataset in the reference's own binary format —
   * per-(n,common) fully sorted packed record files + `meta` descriptor
   * (encode.c:274-403). The records stream through the driver in sorted
   * partition order (at cluster scale each (n,common) group would be
   * written as per-partition files and concatenated by the storage
   * layer; dataset files here are local).
   */
  def writeDatamapsBinary(features: Dataset[Feature], dir: String,
                          encodeZoom: Int = 16, metabits: Int = 0): Unit = {
    val spark = features.sparkSession
    import spark.implicits._
    val mapbits = 2 * (encodeZoom + 8)
    Files.createDirectories(Paths.get(dir))

    // pack every record, tagged with its (n, common) file identity
    val packed: Dataset[(Int, Int, Array[Byte])] = features.map { f =>
      val xs = f.vertices.map(c => Cell.decodeX(c).toInt)
      val ys = f.vertices.map(c => Cell.decodeY(c).toInt)
      val n = xs.length
      val common = if (n > 1) BitPack.commonLevels(xs, ys, mapbits) else 0
      (n, common, BitPack.pack(xs, ys, f.meta, metabits, mapbits, metabits, common))
    }

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
    Files.writeString(Paths.get(dir, "meta"), s"1\n$mapbits $metabits $maxn\n")
  }
}
