package graft.join

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, GeometryFactory, Polygon}
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.index.strtree.STRtree

/** A convex polygon in integer world coordinates. */
case class WorldPolygon(poly_id: Long, xs: Array[Long], ys: Array[Long])

/**
 * Point-in-polygon join: broadcast R-tree of prepared polygons on the
 * build side, streamed probe over the point table (the north_rule's PIP
 * operator; the reference has no joins beyond sorted range lookup, so
 * this is a graft addition built Spark-first).
 *
 * Scale shape: the polygon set is small relative to points (dims vs
 * facts), so it broadcasts; the probe side never shuffles. Integer
 * coordinates make JTS's robust predicates exact, so results match an
 * exact-arithmetic oracle bit-for-bit.
 */
object PipJoin {
  // built once per EXECUTOR JVM per broadcast, not once per task: at
  // thousands of partitions the per-task re-prepare of every polygon
  // (the expensive part of PreparedGeometry) is pure redundant work.
  // Keyed on the broadcast VALUE instance (weak identity key), never
  // the Broadcast wrapper or its numeric id: every task deserializes
  // its own Broadcast wrapper object (an identity key on it would miss
  // for every task after the first — per-task rebuilds, the exact work
  // this cache exists to avoid), while TorrentBroadcast.value returns
  // the ONE BlockManager-cached array shared by all tasks in the
  // executor; and broadcast IDS restart from 0 when a SparkContext is
  // recreated in the same JVM, so an id key could serve a stale tree
  // built from DIFFERENT polygons. Weak keys release the prepared tree
  // when the block itself is evicted — nothing pins for JVM life.
  // (Arrays don't override equals/hashCode, so WeakHashMap's
  // equals-based lookup IS identity here.)
  private val indexCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[Array[WorldPolygon], STRtree]())

  private def cachedIndex(b: org.apache.spark.broadcast.Broadcast[Array[WorldPolygon]]): STRtree = {
    val polys = b.value
    val hit = indexCache.get(polys)
    if (hit != null) hit
    else {
      // build OUTSIDE the map lock (minutes-long prepare on huge polygon
      // sets must not serialize unrelated lookups); two racing tasks may
      // both build — both trees come from the same polygon array, so
      // whichever put lands last is equivalent
      val built = buildIndex(polys)
      indexCache.put(polys, built)
      built
    }
  }

  private def buildIndex(polys: Array[WorldPolygon]): STRtree = {
    val gf = new GeometryFactory()
    val tree = new STRtree()
    polys.foreach { p =>
      val coords = (p.xs.indices :+ 0).map(i => new Coordinate(p.xs(i).toDouble, p.ys(i).toDouble)).toArray
      val poly = gf.createPolygon(coords)
      val prepared = PreparedGeometryFactory.prepare(poly)
      // JTS PreparedGeometry builds its interior structures lazily on
      // the first predicate call — exercise it HERE, before the shared
      // instance becomes visible to concurrent tasks via the cache
      prepared.covers(poly.getCentroid)
      tree.insert(poly.getEnvelopeInternal, (p.poly_id, prepared))
    }
    tree.build()
    tree
  }

  /**
   * points: DataFrame with (id: Long, x32: Long, y32: Long).
   * Returns (id, poly_id) for every point covered by a polygon
   * (boundary inclusive — JTS covers()).
   */
  def join(spark: SparkSession, points: DataFrame, polys: Array[WorldPolygon]): DataFrame = {
    import spark.implicits._
    val bcast = spark.sparkContext.broadcast(polys)
    points.select(col("id").cast("long"), col("x32").cast("long"), col("y32").cast("long"))
      // one NULL id/coord row would otherwise kill the whole join with
      // an encoder NPE (the one-bad-row class every other join in this
      // layer already filters at its boundary)
      .filter(col("id").isNotNull && col("x32").isNotNull && col("y32").isNotNull)
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // per-JVM memoized tree for the broadcast polygons
        val tree = cachedIndex(bcast)
        val gf = new GeometryFactory()
        it.flatMap { case (id, x, y) =>
          val pt = gf.createPoint(new Coordinate(x.toDouble, y.toDouble))
          val hits = tree.query(pt.getEnvelopeInternal)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          val n = hits.size()
          var i = 0
          while (i < n) {
            val (pid, prep) = hits.get(i).asInstanceOf[(Long, PreparedGeometry)]
            if (prep.covers(pt)) out += ((id, pid))
            i += 1
          }
          out
        }
      }
      .toDF("id", "poly_id")
  }

  /** Deterministic convex test polygons (triangles) in world coords from
    * integer keys; same formula is reproduced in the oracle SQL. Scaled
    * to 26-bit coords so oracle cross-products stay exact in BIGINT. */
  def trianglesFromKeys(keys: Seq[Long]): Array[WorldPolygon] = {
    val r = 1L << 26 // ~1/64 of the world per side
    keys.map { k =>
      val cx = ((k * 2654435761L + 991L) % (4294967296L - 4 * r)) + 2 * r
      val cy = ((k * 1103515245L + 173L) % (4294967296L - 4 * r)) + 2 * r
      WorldPolygon(k,
        Array(cx, cx - r, cx + r),
        Array(cy - r, cy + r, cy + r))
    }.toArray
  }

  /** Oracle SQL predicate: point (px,py) inside the triangle for key k
    * (half-plane cross products, boundary inclusive). Coordinates are
    * scaled >> 6 so products fit exactly in BIGINT (and in doubles on
    * the JTS side). */
  def triangleSql(k: String, px: String, py: String): String = {
    val r = 1L << 26
    val cx = s"((($k * 2654435761 + 991) % ${4294967296L - 4 * r}) + ${2 * r})"
    val cy = s"((($k * 1103515245 + 173) % ${4294967296L - 4 * r}) + ${2 * r})"
    // vertices (CCW in screen coords): A=(cx,cy-r) B=(cx-r,cy+r) C=(cx+r,cy+r)
    // scaled by >> 6 to keep cross products within BIGINT
    def s(v: String) = s"(($v) >> 6)"
    val ax = s(cx); val ay = s(s"$cy - $r")
    val bx = s(s"$cx - $r"); val by = s(s"$cy + $r")
    val cx2 = s(s"$cx + $r"); val cy2 = s(s"$cy + $r")
    val p1 = s(px); val p2 = s(py)
    def cross(x1: String, y1: String, x2: String, y2: String) =
      s"(($x2 - $x1) * ($p2 - $y1) - ($y2 - $y1) * ($p1 - $x1))"
    val c1 = cross(ax, ay, bx, by)
    val c2 = cross(bx, by, cx2, cy2)
    val c3 = cross(cx2, cy2, ax, ay)
    s"(($c1 >= 0 AND $c2 >= 0 AND $c3 >= 0) OR ($c1 <= 0 AND $c2 <= 0 AND $c3 <= 0))"
  }

  /** The engine-side probe must use the same >>6 scaling as the oracle
    * so boundary cases agree. Scale a polygon set down. */
  def scaled(polys: Array[WorldPolygon]): Array[WorldPolygon] =
    polys.map(p => WorldPolygon(p.poly_id, p.xs.map(_ >> 6), p.ys.map(_ >> 6)))
}
