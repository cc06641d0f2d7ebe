package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * NOTE — oracle-cost envelope: the DuckDB side of this check is NOT the
  * engine. Two oracles are intentionally expensive and dominate checks
  * above sf0.01: q21's list-based n-gram SQL (quadratic list_contains
  * per pair) and q42's recursive-CTE transitive closure (DuckDB has no
  * iterative components operator). At sf0.1 the DuckDB pass runs
  * minutes while the Spark side runs seconds — that is oracle cost, not
  * engine cost; verification stays pinned at sf0.01 where the full
  * cross-check completes in ~90s. Do not "fix" engine performance from
  * oracle timings. */
object Verify {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // oracle JSON must be locale-stable
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // a stale parquet from a previous run into the same outDir must not
    // survive a failing query: the DuckDB compare would read the OLD
    // results and false-pass. Delete first — a failure then leaves a
    // missing dir, which the compare reports as a loud per-query error.
    def rmTree(p: java.nio.file.Path): Unit = if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val st = Files.walk(p)
      try st.iterator().asScala.toSeq.sortBy(-_.getNameCount).foreach(Files.delete)
      finally st.close()
    }
    var failed = List.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      rmTree(Paths.get(s"$outDir/$name"))
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size} QUERIES FAILED: ${failed.reverse.mkString(", ")}")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
