package graft.render

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** One rendered tile. */
case class TileOut(z: Int, x: Int, y: Int, png: Array[Byte])

/** A draw command shuffled to its tile's reducer: a feature occurrence
  * in tile (z,x,y). `slot` encodes processing order (-1 = own range,
  * 0..8 = neighbor probe order) so FP accumulation matches the
  * reference's loop order exactly (do_tile, render.c:942-967). */
case class PointCmd(tkey: Long, slot: Int, cell: Long, meta: Long)

/**
 * Tile rasterization of a point table — the reference's `render`
 * pipeline (render.c:932-1003 + process :74-368) as one Spark job:
 *
 *   points -> [rank filter (step sampling)] -> flatMap to draw tiles
 *   (own tile + spill ring) -> groupByKey(tile) -> canvas accumulation
 *   -> tone map -> PNG.
 *
 * The single shuffle (groupByKey on tile) replaces the reference's
 * per-tile process parallelism (xargs -P8); tiles are independent, so
 * this scales with executors. Skewed tiles (city hotspots) can be
 * split by salting the tile key and merging canvases — the canvas is
 * an associative monoid (graft.core.Canvas.merge).
 */
object Render {
  /** Add a global `rank` column over the (cell, meta)-sorted order —
    * the analog of the reference's file offset, needed for the
    * deterministic step-subsample at low zooms (render.c:165-167).
    * One extra narrow pass; ranks are per-partition offsets + local
    * index (the table must already be range-partitioned + sorted). */
  def withGlobalRank(sorted: DataFrame): DataFrame = {
    // cache to freeze the physical partitioning between the count pass
    // and the rank pass (two jobs must see identical partitions)
    val frozen = sorted.cache()
    val counts = frozen.groupBy(spark_partition_id().as("pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val n = frozen.rdd.getNumPartitions
    val offsets = (0 until n).scanLeft(0L)((acc, i) => acc + counts.getOrElse(i, 0L))
    val schema = org.apache.spark.sql.types.StructType(
      frozen.schema.fields :+ org.apache.spark.sql.types.StructField("rank", org.apache.spark.sql.types.LongType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    frozen.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var r = offsets(pid)
      it.map { row =>
        val out = org.apache.spark.sql.Row.fromSeq(row.toSeq :+ r)
        r += 1
        out
      }
    }(enc)
  }

  /** Does a point rendered at zDraw use a brush larger than one pixel
    * (then splats may spill into adjacent tiles)? render.c:128-139. */
  def brushSpills(p: RenderParams, zDraw: Int): Boolean = {
    val (_, brush, _) = p.pointParams(zDraw)
    brush * (p.tilesize / 256.0) * (p.tilesize / 256.0) > 1
  }

  /**
   * Render every tile at zoom `zDraw` that contains at least one point.
   * `points` needs columns (cell: Long, meta: Long[, rank: Long]);
   * rank is required when the zoom's sampling step > 1.
   * Returns the RGBA pixel buffer per tile (PNG encode is a separate
   * map so tests can compare raw pixels).
   */
  def renderPoints(points: DataFrame, zDraw: Int, mapbits: Int, p: RenderParams): Dataset[TileOut] = {
    val spark = points.sparkSession
    import spark.implicits._
    val (step, _, _) = p.pointParams(zDraw)
    val sampled =
      if (step <= 1) points
      else points.filter(col("rank") % step === 0)

    val spill = brushSpills(p, zDraw)
    val hasMeta = points.columns.contains("meta")
    val base = sampled.select(col("cell"), (if (hasMeta) col("meta") else lit(0L)).as("meta"))
      .as[(Long, Long)]

    val cmds: Dataset[PointCmd] = base.flatMap { case (cell, meta) =>
      val tx = Cell.tileX(cell, zDraw)
      val ty = Cell.tileY(cell, zDraw)
      val own = PointCmd(Cell.tileKey(zDraw, tx, ty), -1, cell, meta)
      if (!spill) Iterator.single(own)
      else {
        val n = 1L << zDraw
        // this point also appears in each neighbor's probe (slot = the
        // neighbor loop index from THAT tile's perspective)
        val nbrs = for {
          dx <- -1 to 1
          dy <- -1 to 1
          if dx != 0 || dy != 0
          nx = tx + dx; ny = ty + dy
          if ny >= 0 && ny < n && nx >= 0 && nx < n
        } yield {
          // from tile (nx,ny), this point lies in probe slot for offset
          // (-dx,-dy): loop order xx (-1..1) outer, yy (-1..1) inner
          val sx = -dx + 1; val sy = -dy + 1
          PointCmd(Cell.tileKey(zDraw, nx, ny), sx * 3 + sy, cell, meta)
        }
        Iterator.single(own) ++ nbrs.iterator
      }
    }

    cmds.groupByKey(_.tkey).flatMapGroups { (tkey, it) =>
      val z = Cell.tileKeyZ(tkey)
      val tx = Cell.tileKeyX(tkey)
      val ty = Cell.tileKeyY(tkey)
      val recs = it.toArray
      // reference order: own range in (cell,meta) order, then each
      // neighbor range in probe-loop order (render.c:942-967)
      java.util.Arrays.sort(recs, (a: PointCmd, b: PointCmd) => {
        val c = Integer.compare(a.slot, b.slot)
        if (c != 0) c else {
          val cc = java.lang.Long.compare(a.cell, b.cell)
          if (cc != 0) cc else java.lang.Long.compare(a.meta, b.meta)
        }
      })
      if (!recs.exists(_.slot == -1)) Iterator.empty
      else {
        val canvas = renderPointCanvas(recs, z, tx, ty, mapbits, p)
        val rgba = ToneMap(canvas, p)
        Iterator.single(TileOut(z, tx, ty, Png.encode(rgba, p.tilesize, p.tilesize)))
      }
    }
  }

  /** The per-tile canvas accumulation (process(), render.c:121-313,
    * points path), operating on own + neighbor records in reference
    * order. Neighbor records only draw if the own range drew at least
    * one brush (the `further` rule, render.c:942-947). */
  def renderPointCanvas(recs: Array[PointCmd], z: Int, tx: Int, ty: Int,
                        mapbits: Int, p: RenderParams): Canvas = {
    val canvas = new Canvas(p.tilesize, p.tilesize)
    val (step, brush0, bright0) = p.pointParams(z)
    val mercScale = p.mercatorBrushScale(z, ty)
    val brush = brush0 * mercScale
    val b = brush * (p.tilesize / 256.0) * (p.tilesize / 256.0)
    var further = false
    var i = 0
    while (i < recs.length) {
      val r = recs(i)
      if (r.slot == -1 || further) {
        if (r.meta <= p.maxmeta) {
          var x = Cell.decodeX(r.cell)
          var y = Cell.decodeY(r.cell)
          if (z >= mapbits / 2 - 8) {
            // overzoom de-gridding noise (render.c:198-212)
            val noisebits = 32 - mapbits / 2
            var xi = x.toInt; var yi = y.toInt
            var j = 0
            while (j < noisebits) {
              val nx = xi | (((yi >>> (2 * noisebits - 1 - j)) & 1) << j)
              val ny = yi | (((xi >>> (2 * noisebits - 1 - j)) & 1) << j)
              xi = nx; yi = ny
              j += 1
            }
            x = xi.toLong & 0xFFFFFFFFL; y = yi.toLong & 0xFFFFFFFFL
          }
          val hue = if (p.colorRampActive) p.metaHue(r.meta) else -1.0
          var bright = bright0
          var bb = b
          if (p.metabright) bright *= r.meta
          if (p.metabrush) bb *= r.meta
          val xd = Mercator.worldToTileFracX(x, z, tx)
          val yd = Mercator.worldToTileFracY(y, z, ty)
          var xs = xd * p.tilesize
          var ys = yd * p.tilesize
          if (!p.antialias) {
            xs = (xd * p.tilesize).toInt + .5
            ys = (yd * p.tilesize).toInt + .5
          }
          if (bb <= 1) {
            canvas.drawPixel(xs - .5, ys - .5, bright * bb, hue)
          } else {
            Raster.drawBrush(xs, ys, canvas, bright, bb, hue, p.gaussian)
            if (r.slot == -1) further = true
          }
        }
      }
      i += 1
    }
    canvas
  }
}
