package graft.tools

/** Prints both host-probe readings (ALU busy loop + STREAM triad) at
  * the scaling thread counts — a quick way to see what the shared host
  * is delivering right now before launching a scaling sequence.
  * Usage: sbt "Test/runMain graft.tools.ProbeCheck" */
object ProbeCheck {
  def main(args: Array[String]): Unit = {
    for (t <- Seq(2, 8, 32)) {
      val cpu = graft.Bench.cpuProbe(t)
      val mem = graft.Bench.memProbe(t)
      println(f"threads=$t%2d cpu_probe=$cpu%6.3f s  mem_probe=$mem%6.3f s")
    }
    println("pair ceilings: cpu 8->32 = (t8/t32)/4, mem likewise")
  }
}
