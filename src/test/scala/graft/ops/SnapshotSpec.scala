package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Snapshot layer + resumable tiling job (north rule: per-partition
  * lineage + metrics; killed job resumes from last committed state). */
class SnapshotSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(): String = java.nio.file.Files.createTempDirectory("snap").toString

  test("snapshot commit/read/append round-trips with manifest isolation") {
    import spark.implicits._
    val root = tmpDir()
    val df1 = (1L to 100L).toDF("v")
    val s1 = Snapshots.commit(root, df1)
    assert(s1 == 1)
    assert(Snapshots.read(spark, root).count() == 100)

    val df2 = (101L to 150L).toDF("v")
    val s2 = Snapshots.append(root, df2)
    assert(s2 == 2)
    assert(Snapshots.read(spark, root).count() == 150)
    // time travel: snapshot 1 still readable and intact
    assert(Snapshots.read(spark, root, Some(1L)).count() == 100)
    assert(Snapshots.currentSnapshot(root).contains(2L))
  }

  test("killed tiling job resumes from lineage; final tiles exactly-once") {
    import spark.implicits._
    val root = tmpDir()
    val out1 = tmpDir() + "/tiles_killed"
    val out2 = tmpDir() + "/tiles_clean"

    val geo = graft.tables.ImageTable.generateGeo(spark, 3000).toDF()
      .select(col("cell"), col("meta"))
      .repartitionByRange(4, col("cell"))
      .sortWithinPartitions(col("cell"), col("meta"))
    Snapshots.commit(root, geo)

    // clean run (no failure) = expected output
    val ranClean = CheckpointedTiles.run(spark, root, out2, z = 15, mapbits = 48, bucketLevel = 1)
    assert(ranClean == 4)

    // killed run: crash at bucket 2, then resume
    val ex = intercept[RuntimeException] {
      CheckpointedTiles.run(spark, root, out1, z = 15, mapbits = 48, bucketLevel = 1,
        failAtBucket = Some(2))
    }
    assert(ex.getMessage.contains("injected"))
    assert(CheckpointedTiles.committed(out1) == Set(0, 1))
    val resumed = CheckpointedTiles.run(spark, root, out1, z = 15, mapbits = 48, bucketLevel = 1)
    assert(resumed == 2) // only the uncommitted buckets ran

    // identical final tile sets, exactly one lineage row per bucket
    def tiles(out: String) = spark.read.parquet(s"$out/bucket=*")
      .select("z", "x", "y").as[(Int, Int, Int)].collect().toSet
    assert(tiles(out1) == tiles(out2))
    assert(tiles(out1).nonEmpty)
    val lin = CheckpointedTiles.lineage(out1)
    assert(lin.map(_.bucket) == Seq(0, 1, 2, 3))
    assert(lin.map(_.rows).sum >= 3000) // ring overlap counts rows more than once
    assert(lin.map(_.tiles).sum == tiles(out1).size)
  }

  test("resume after the snapshot advanced re-renders stale buckets (no mixed generations)") {
    import spark.implicits._
    val root = tmpDir()
    val out = tmpDir() + "/tiles_stale"
    val geo1 = graft.tables.ImageTable.generateGeo(spark, 2000).toDF()
      .select(col("cell"), col("meta"))
    Snapshots.commit(root, geo1)
    intercept[RuntimeException] {
      CheckpointedTiles.run(spark, root, out, z = 15, mapbits = 48, bucketLevel = 1,
        failAtBucket = Some(2))
    }
    assert(CheckpointedTiles.committed(out) == Set(0, 1))
    // the snapshot advances while the job is down: buckets 0-1 are now
    // STALE — resuming must re-render them, not splice two generations
    Snapshots.append(root,
      graft.tables.ImageTable.generateGeo(spark, 3000).toDF()
        .select(col("cell"), col("meta")).filter(col("meta") % 3 === 0))
    // the generation-filtered overload is the honest progress signal:
    // the stale rows still exist as files but commit to snapshot 1
    assert(CheckpointedTiles.committed(out, snapshot = 2L) == Set.empty,
      "no bucket is committed at the ADVANCED generation yet")
    val resumed = CheckpointedTiles.run(spark, root, out, z = 15, mapbits = 48, bucketLevel = 1)
    assert(resumed == 4, "stale buckets must re-run")
    assert(CheckpointedTiles.lineage(out).map(_.snapshot).toSet == Set(2L))
    // final tiles equal a clean render of the new snapshot
    val out2 = tmpDir() + "/tiles_clean_s2"
    CheckpointedTiles.run(spark, root, out2, z = 15, mapbits = 48, bucketLevel = 1)
    def tiles(o: String) = spark.read.parquet(s"$o/bucket=*")
      .select("z", "x", "y").as[(Int, Int, Int)].collect().toSet
    assert(tiles(out) == tiles(out2) && tiles(out).nonEmpty)
  }

  test("checkpointed tiling at a STEP-SAMPLED zoom ranks the snapshot (was: rank-column crash)") {
    import spark.implicits._
    val root = tmpDir()
    val out = tmpDir() + "/tiles_lowz"
    val geo = graft.tables.ImageTable.generateGeo(spark, 3000).toDF()
      .select(col("cell"), col("meta"))
    Snapshots.commit(root, geo)
    // z=10 < default dotBase(13): pointParams step > 1 -> pointCmds
    // filters on rank; the bucket job must supply a GLOBAL rank
    val ran = CheckpointedTiles.run(spark, root, out, z = 10, mapbits = 48, bucketLevel = 1)
    assert(ran == 4)
    val tiles = spark.read.parquet(s"$out/bucket=*")
      .select("z", "x", "y").as[(Int, Int, Int)].collect().toSet
    assert(tiles.nonEmpty && tiles.forall(_._1 == 10))
    // tile SET equals the plain pyramid render at the same zoom (pixel
    // equality isn't pinned: the checkpointed job's global rank total
    // order may tie-break differently from this ad-hoc render's)
    val ranked = graft.render.Render.withGlobalRank(geo)
    try {
      val expect = graft.render.Render
        .renderPyramid(ranked, Seq(10), 48, graft.core.RenderParams())
        .collect().map(t => (t.z, t.x, t.y)).toSet
      assert(tiles == expect, s"${tiles.size} vs ${expect.size} tiles")
    } finally ranked.unpersist()
  }
}
