package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.{Cell, Mercator}
import graft.encode.Feature

/**
 * The reference's text ingest format as a Spark source (S1,
 * encode.c:31-185): one feature per line — space-separated `lat,lon`
 * vertices plus optional `bits:value` / `:value` metadata tokens.
 * Any invalid vertex drops the whole record (encode.c:91-109).
 */
object TextSource {
  /** Parse one input line; None if no valid feature. */
  def parseLine(line: String, mapbits: Int, metabits: Int): Option[Feature] = {
    val toks = line.trim.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) return None
    val lats = scala.collection.mutable.ArrayBuffer.empty[Double]
    val lons = scala.collection.mutable.ArrayBuffer.empty[Double]
    var meta = 0L
    var haveMeta = false
    toks.foreach { t =>
      if (!t.contains(":")) {
        val coord = t.split(",")
        if (coord.length != 2) return None
        try {
          lats += coord(0).toDouble
          lons += coord(1).toDouble
        } catch { case _: NumberFormatException => return None }
      } else {
        // ":v" or "bits:v" — first token's value becomes the record meta
        // (the common single-token case of encode.c:58-82). A bare ":"
        // (or "::") splits to an EMPTY array in Java — .last would
        // throw and kill the ingest task on one adversarial line; drop
        // the record instead (the reference's sscanf also fails there)
        val parts = t.split(":")
        if (parts.isEmpty) return None
        try { if (!haveMeta) { meta = parts.last.toLong; haveMeta = true } }
        catch { case _: NumberFormatException => return None }
      }
    }
    if (lats.isEmpty) return None
    if (!lats.indices.forall(i => Mercator.valid(lats(i), lons(i)))) return None
    val cells = lats.indices.map { i =>
      Cell.truncate(
        Cell.encode(Mercator.lonToX32(lons(i)).toInt, Mercator.latToY32(lats(i)).toInt),
        mapbits)
    }.toArray
    Some(Feature(cells(0), cells, meta & (if (metabits >= 64) -1L else (1L << metabits) - 1)))
  }

  /** Read a text dataset of features (distributed). */
  def read(spark: SparkSession, path: String, encodeZoom: Int = 16, metabits: Int = 0): Dataset[Feature] = {
    import spark.implicits._
    val mapbits = 2 * (encodeZoom + 8)
    spark.read.textFile(path).flatMap(parseLine(_, mapbits, metabits))
  }

  /** Streaming ingest of the same text format (the reference's
    * encode-new-files workflow as a Structured Streaming source): new
    * files landing in `dir` become parsed features incrementally. */
  def readStream(spark: SparkSession, dir: String, encodeZoom: Int = 16, metabits: Int = 0): Dataset[Feature] = {
    import spark.implicits._
    val mapbits = 2 * (encodeZoom + 8)
    spark.readStream.textFile(dir).flatMap(parseLine(_, mapbits, metabits))
  }
}
