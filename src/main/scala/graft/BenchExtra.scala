package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/**
 * Measurement-only companion to [[Bench]] (guide §1.4 noop-sink
 * isolation; §1.5 job labeling). NOT part of the driver contract —
 * Bench.scala stays the frozen harness; this main exists so
 * optimization rounds can (a) time each declared query against the
 * noop sink in isolation, with per-query job/stage/shuffle telemetry
 * from a SparkListener, and (b) dump `.explain("formatted")` plans to
 * `plans/<tag>/` for the before/after evidence the round requires.
 *
 * Usage (same env contract as Bench):
 *   runMain graft.BenchExtra explain <dirTag> [query...]
 *   runMain graft.BenchExtra time [query...]
 */
object BenchExtra {
  /** Cumulative counters a query run drains: jobs launched, stages run,
    * tasks, shuffle write bytes, input bytes, executor run time. */
  private class Probe extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    val input = new java.util.concurrent.atomic.AtomicLong
    val runTimeMs = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(s.stageInfo.numTasks.toLong)
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        input.addAndGet(m.inputMetrics.bytesRead)
        runTimeMs.addAndGet(m.executorRunTime)
      }
    }
    def snap(): (Long, Long, Long, Long, Long, Long) =
      (jobs.get, stages.get, tasks.get, shuffleWrite.get, input.get, runTimeMs.get)
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val mode = if (args.nonEmpty) args(0) else "time"
    val rest = args.drop(1).toSeq

    mode match {
      case "explain" =>
        val tag = rest.headOption.getOrElse("r08")
        val names = if (rest.length > 1) rest.drop(1) else SparkEntry.queries.keys.toSeq.sorted
        val dir = java.nio.file.Paths.get(s"/root/repo/plans/$tag")
        java.nio.file.Files.createDirectories(dir)
        names.foreach { name =>
          val df = SparkEntry.queries(name)(spark, sfDir)
          val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(dir.resolve(s"$name.txt"), txt)
          println(s"explained $name -> plans/$tag/$name.txt")
        }
      case "time" =>
        val names = if (rest.nonEmpty) rest else SparkEntry.queries.keys.toSeq.sorted
        val probe = new Probe
        spark.sparkContext.addSparkListener(probe)
        println("name,sec1,sec2,jobs,stages,tasks,shuffle_mb,input_mb,runtime_s")
        names.foreach { name =>
          spark.sparkContext.setJobDescription(s"benchextra: $name")
          def once(): Double = {
            val t0 = System.nanoTime()
            noop(SparkEntry.queries(name)(spark, sfDir))
            (System.nanoTime() - t0) / 1e9
          }
          val s1 = once()
          // drain the async listener bus BEFORE snapping the baseline,
          // or the warm pass's late stage events land inside the
          // measured window and inflate every counter
          Thread.sleep(200)
          val before = probe.snap()
          val s2 = once()
          Thread.sleep(200)
          val after = probe.snap()
          val (j, st, tk) = (after._1 - before._1, after._2 - before._2, after._3 - before._3)
          val shMb = (after._4 - before._4) / 1e6
          val inMb = (after._5 - before._5) / 1e6
          val rtS = (after._6 - before._6) / 1e3
          println(f"$name,$s1%.3f,$s2%.3f,$j,$st,$tk,$shMb%.1f,$inMb%.1f,$rtS%.1f")
        }
      case "jobs" =>
        // per-JOB wall breakdown of one query (guide §7.1 without a UI):
        // prints each Spark job's duration + stage/task counts so the
        // serial action structure of a multi-job operator is visible
        val name = rest.head
        val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
        val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        spark.sparkContext.addSparkListener(new SparkListener {
          override def onJobStart(j: SparkListenerJobStart): Unit =
            starts.put(j.jobId, (System.nanoTime(), j.stageInfos.map(_.numTasks).sum))
          override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val s = starts.get(j.jobId)
            if (s != null)
              lines.add(f"job ${j.jobId}%3d ${(System.nanoTime() - s._1) / 1e9}%7.3f s  tasks=${s._2}")
          }
        })
        // warm pass, then the measured pass
        noop(SparkEntry.queries(name)(spark, sfDir))
        lines.clear()
        val t0 = System.nanoTime()
        noop(SparkEntry.queries(name)(spark, sfDir))
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        lines.forEach(l => println(l))
        println(f"total $name: $wall%.3f s")
      case other =>
        sys.error(s"unknown BenchExtra mode '$other' (use explain|time|jobs)")
    }
    spark.stop()
  }
}
