package graft.tools

import org.apache.spark.sql.functions._

/** One-off profiler for the bench encode phase: times each sub-step. */
object EncProf {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session(32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val imgPath = "/tmp/graft_bench/images_0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[encprof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup
    spark.read.parquet(imgPath).select("image_id", "phash").count()
    t("read+count") { spark.read.parquet(imgPath).select("image_id", "phash").count() }
    val mapped = spark.read.parquet(imgPath).select("image_id", "phash")
      .as[(String, Long)]
      .map { case (id, ph) =>
        val (lat, lon, cell, meta) = graft.tables.ImageTable.geotagPhash(ph)
        (id, ph, lat, lon, cell, meta)
      }.toDF("image_id", "phash", "lat", "lon", "cell", "meta")
    t("read+map+count") { mapped.count() }
    t("map+range+write") {
      mapped.repartitionByRange(64, col("cell"))
        .sortWithinPartitions(col("cell"), col("meta"))
        .write.mode("overwrite").parquet("/tmp/encprof_out")
    }
    t("map+hashpart+write") {
      mapped.repartition(64, col("cell"))
        .sortWithinPartitions(col("cell"), col("meta"))
        .write.mode("overwrite").parquet("/tmp/encprof_out2")
    }
    t("range256+write") {
      mapped.repartitionByRange(256, col("cell"))
        .sortWithinPartitions(col("cell"), col("meta"))
        .write.mode("overwrite").parquet("/tmp/encprof_out3")
    }
    val cached = mapped.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cached.count()
    t("cached+range64+write") {
      cached.repartitionByRange(64, col("cell"))
        .sortWithinPartitions(col("cell"), col("meta"))
        .write.mode("overwrite").parquet("/tmp/encprof_out4")
    }
    t("cached+range256+write") {
      cached.repartitionByRange(256, col("cell"))
        .sortWithinPartitions(col("cell"), col("meta"))
        .write.mode("overwrite").parquet("/tmp/encprof_out5")
    }
    spark.stop()
  }
}
