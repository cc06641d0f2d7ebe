package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Boilerplate-line removal (q66): kernel split/fold semantics, the
  * operator vs a brute-force replay, the hot-set cap, and plan shape. */
class LineDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.ansi.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val P = 2147483647L
  private def h64(line: String): Long = {
    var h31 = 0L; var h37 = 0L; var first = true
    line.codePoints().forEach { cp =>
      if (first) { h31 = cp; h37 = cp; first = false }
      else { h31 = (h31 * 31 + cp) % P; h37 = (h37 * 37 + cp) % P }
    }
    (h31 << 31) | h37
  }

  test("lineHashes: string_split semantics (trailing empties kept, empty line hashes 0)") {
    def hashes(s: String): Seq[Long] = {
      val a = PortableHash.lineHashes(UTF8String.fromString(s))
      (0 until a.numElements()).map(a.getLong)
    }
    assert(hashes("a\nbb\n") == Seq(h64("a"), h64("bb"), 0L))
    assert(hashes("") == Seq(0L))
    assert(hashes("\n\n") == Seq(0L, 0L, 0L))
    assert(hashes("one line") == Seq(h64("one line")))
  }

  test("dropHotLines: drops exactly the hot lines, keeps order and empties") {
    val hot = Array(h64("boiler"), h64("footer")).sorted
    val r = PortableHash.dropHotLines(UTF8String.fromString("boiler\nbody one\n\nfooter\nbody two"), hot)
    assert(r.getUTF8String(0).toString == "body one\n\nbody two")
    assert(r.getLong(1) == 5L && r.getLong(2) == 3L)
    // all dropped -> empty text
    val r2 = PortableHash.dropHotLines(UTF8String.fromString("boiler\nfooter"), hot)
    assert(r2.getUTF8String(0).toString == "" && r2.getLong(2) == 0L)
    // empty hot set keeps everything
    val r3 = PortableHash.dropHotLines(UTF8String.fromString("boiler\nx"), Array.empty[Long])
    assert(r3.getUTF8String(0).toString == "boiler\nx" && r3.getLong(2) == 2L)
  }

  test("operator equals brute-force replay; boilerplate dropped, unique bodies survive") {
    import spark.implicits._
    val n = 40
    val rows = (0 until n).map(i => (i.toLong, s"header common\nunique body $i\nfooter ${i % 2}"))
    val pages = rows.toDF("doc_id", "page")
    val out = TextOps.boilerplateLines(pages, minCount = 10L)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // brute force: count every line, drop >= 10
    val counts = rows.flatMap(_._2.split("\n", -1)).groupBy(identity).view.mapValues(_.size)
    rows.foreach { case (id, page) =>
      val lines = page.split("\n", -1)
      val kept = lines.filter(l => counts(l) < 10)
      assert(out(id) == ((kept.mkString("\n"), lines.length.toLong, kept.length.toLong)), s"doc $id")
    }
    // header (40x) and both footers (20x) are hot; bodies survive
    assert(out(0L)._1 == "unique body 0")
  }

  test("hot-set cap is loud, not silent") {
    import spark.implicits._
    val pages = (0 until 8).map(i => (i.toLong, "shared line\nalso shared")).toDF("doc_id", "page")
    val e = intercept[IllegalArgumentException] {
      TextOps.boilerplateLines(pages, minCount = 2L, hotCap = 1)
    }
    assert(e.getMessage.contains("raise minCount"))
  }

  test("plan shape: stats shuffle carries only the 8-byte hash; rewrite is map-only") {
    import spark.implicits._
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val pages = (0 until 30).map(i => (i.toLong, s"hot line\nbody $i")).toDF("doc_id", "page")
      // stats stage plan: no string column on any exchange
      val stats = pages.select(explode(TextOps.lineHashes(col("page"))).as("h"))
        .groupBy("h").agg(count(lit(1)).as("c")).filter(col("c") >= 10)
      val exchanges = stats.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty)
      exchanges.foreach(e => assert(
        !e.output.exists(_.dataType == org.apache.spark.sql.types.StringType),
        "line text rode the stats shuffle"))
      // rewrite stage: zero exchanges
      val rewrite = pages.select(col("doc_id"),
        TextOps.dropHotLines(col("page"), Array(h64("hot line"))).as("st"))
      assert(!rewrite.queryExecution.executedPlan.toString().contains("Exchange"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
