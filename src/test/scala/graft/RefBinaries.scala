package graft

import java.nio.file.{Files, Paths, Path, StandardCopyOption}
import scala.sys.process._

/** Builds the reference engine's binaries (read-only tree at
  * /root/reference) into target/refbuild once per JVM, to serve as the
  * golden-output oracle for encode/render/enumerate/merge tests. */
object RefBinaries {
  private val srcDir = Paths.get("/root/reference")
  private val buildDir = Paths.get("target/refbuild").toAbsolutePath

  lazy val dir: Path = synchronized {
    val encode = buildDir.resolve("encode")
    if (!Files.exists(encode)) {
      if (Files.exists(buildDir)) {
        // wipe stale partial build
        Files.walk(buildDir).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
      }
      Files.createDirectories(buildDir)
      Files.list(srcDir).forEach { p =>
        if (Files.isRegularFile(p))
          Files.copy(p, buildDir.resolve(p.getFileName.toString), StandardCopyOption.REPLACE_EXISTING)
      }
      val rc = Process(Seq("make", "encode", "render", "enumerate", "merge"),
        buildDir.toFile).!(ProcessLogger(_ => (), _ => ()))
      require(rc == 0, "reference make failed")
    }
    buildDir
  }

  def available: Boolean =
    try { dir; true } catch { case _: Throwable => false }

  /** Run a reference binary; returns (exitCode, stdout bytes). */
  def run(bin: String, args: Seq[String], stdin: Option[Array[Byte]] = None,
          cwd: Option[Path] = None): (Int, Array[Byte]) = {
    val cmd = (dir.resolve(bin).toString +: args)
    val out = new java.io.ByteArrayOutputStream()
    val io = new ProcessIO(
      in => { stdin.foreach(in.write); in.close() },
      os => { val buf = new Array[Byte](65536)
        var n = os.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = os.read(buf) }
        os.close() },
      err => { err.close() })
    val p = Process(cmd, cwd.map(_.toFile)).run(io)
    val rc = p.exitValue()
    (rc, out.toByteArray)
  }
}
