package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Fencing contract for the single-writer state lease: a holder whose
  * heartbeat stalls past the lease window can be legitimately stolen —
  * when its heartbeat resumes it must detect the successor's token,
  * fence itself (checkFenced throws), and never touch or delete the
  * successor's lease file. */
class StateLeaseSpec extends AnyFunSuite {

  test("stale-stolen writer fences itself and never touches the successor's lease") {
    val dir = java.nio.file.Files.createTempDirectory("lease_fence").toString
    // leaseMs=1500 -> heartbeat tick every max(500,1000)=1000ms
    val l = StateLease.acquire(dir, leaseMs = 1500)
    StateLease.checkFenced(l) // freshly acquired: not fenced
    // simulate the stall-steal: a successor replaced the lease file
    val p = java.nio.file.Paths.get(dir, ".writer_lease")
    java.nio.file.Files.writeString(p, "successor-token")
    val successorMtime = java.nio.file.Files.getLastModifiedTime(p)
    // wait for the original's heartbeat to notice (ticks at 1s)
    val deadline = System.currentTimeMillis() + 10000
    while (!l.fenced.get() && System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(l.fenced.get(), "heartbeat did not fence after the token changed")
    val ex = intercept[IllegalStateException](StateLease.checkFenced(l))
    assert(ex.getMessage.contains("stale-stolen"), ex.getMessage)
    // the fenced heartbeat must have exited WITHOUT refreshing the
    // successor's lease (the read happens before any touch; a blind
    // touch would keep the successor fresh while both writers append)
    Thread.sleep(1500)
    assert(java.nio.file.Files.getLastModifiedTime(p) == successorMtime,
      "fenced writer refreshed the successor's lease mtime")
    assert(!l.heartbeat.isAlive, "fenced heartbeat thread still running")
    // release must not delete the successor's lease either
    StateLease.release(l)
    assert(java.nio.file.Files.readString(p) == "successor-token",
      "release removed the successor's lease")
  }

  test("unfenced holder heartbeats normally and releases its own lease") {
    val dir = java.nio.file.Files.createTempDirectory("lease_norm").toString
    val l = StateLease.acquire(dir, leaseMs = 1500)
    val p = java.nio.file.Paths.get(dir, ".writer_lease")
    val m0 = java.nio.file.Files.getLastModifiedTime(p).toMillis
    // wait past one tick: the mtime must ADVANCE (heartbeat alive)
    val deadline = System.currentTimeMillis() + 10000
    while (java.nio.file.Files.getLastModifiedTime(p).toMillis == m0 &&
      System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(java.nio.file.Files.getLastModifiedTime(p).toMillis > m0, "heartbeat never touched")
    assert(!l.fenced.get())
    StateLease.checkFenced(l)
    StateLease.release(l)
    assert(!java.nio.file.Files.exists(p), "release did not delete our own lease")
  }
}
