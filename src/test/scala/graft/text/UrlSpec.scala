package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** urlColumns: count + first-host extraction on planted documents —
  * multiple URLs, ports, paths with query strings, bare hosts, and
  * URL-free text. */
class UrlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("counts and hosts on planted URLs") {
    import spark.implicits._
    val rows = Seq(
      (1L, "no links here at all"),
      (2L, "see https://Example.ORG/a/b?q=1 and http://cdn2.example.net:8080/x"),
      (3L, "bare host http://foo.bar trailing text"),
      (4L, "scheme-less www.example.com is NOT a url"),
      (5L, "tab-terminated https://a.b/p\tafter"))
      .toDF("doc_id", "text")
    val got = rows.select((col("doc_id") +:
        TextOps.urlColumns(col("text")).map { case (n, c) => c.as(n) }): _*)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toMap2
    assert(got(1L) == ((0L, "")))
    assert(got(2L) == ((2L, "example.org")))
    assert(got(3L) == ((1L, "foo.bar")))
    assert(got(4L) == ((0L, "")))
    assert(got(5L) == ((1L, "a.b")))
  }

  private implicit class MapOps(rows: Array[(Long, Long, String)]) {
    def toMap2: Map[Long, (Long, String)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
