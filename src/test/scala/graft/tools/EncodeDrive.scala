// External driver for the graft.core public API: replicate `encode -z16 -m8`
package graft.tools

import graft.core._
import java.nio.file.{Files, Paths}

object EncodeDrive {
  def main(args: Array[String]): Unit = {
    val Array(in, outDir) = args
    val mapbits = 48; val metabits = 8
    val mask = (-1 << (32 - mapbits / 2))
    val groups = scala.collection.mutable.Map[(Int, Int), scala.collection.mutable.ArrayBuffer[Array[Byte]]]()
    var maxn = 0
    scala.io.Source.fromFile(in).getLines().foreach { line =>
      val toks = line.trim.split(" ")
      val coords = toks.filter(_.contains(","))
      val metaTok = toks.find(t => t.startsWith(":") || t.matches("\\d+:.*"))
      val lats = coords.map(_.split(",")(0).toDouble)
      val lons = coords.map(_.split(",")(1).toDouble)
      if (lats.zip(lons).forall { case (la, lo) => Mercator.valid(la, lo) }) {
        val xs = lats.indices.map(i => Mercator.lonToX32(lons(i)).toInt).toArray
        val ys = lats.indices.map(i => Mercator.latToY32(lats(i)).toInt).toArray
        val (mbits, mval) = metaTok match {
          case Some(t) if t.startsWith(":") => (metabits, t.drop(1).toLong)
          case Some(t) => val p = t.split(":"); (p(0).toInt, p(1).toLong)
          case None => (0, 0L)
        }
        val n = xs.length
        maxn = math.max(maxn, n)
        // encoder stores full-resolution world coords; truncation happens via mapbits in pack
        val xt = xs.map(v => v & mask); val yt = ys.map(v => v & mask)
        val common = if (n > 1) BitPack.commonLevels(xt, yt, mapbits) else 0
        val rec = BitPack.pack(xs, ys, mval, mbits, mapbits, metabits, common)
        groups.getOrElseUpdate((n, common), scala.collection.mutable.ArrayBuffer()) += rec
      }
    }
    Files.createDirectories(Paths.get(outDir))
    groups.foreach { case ((n, common), recs) =>
      val sorted = recs.sortWith((a, b) => BitPack.compare(a, b) < 0)
      val name = if (n == 1) "1,0" else s"$n,$common"
      val out = new java.io.FileOutputStream(s"$outDir/$name")
      sorted.foreach(out.write)
      out.close()
    }
    Files.writeString(Paths.get(s"$outDir/meta"), s"1\n$mapbits $metabits $maxn\n")
    println("encoded " + groups.values.map(_.size).sum + " records")
  }
}
