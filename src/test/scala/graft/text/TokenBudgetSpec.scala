package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** tokenBudgetMix: the chunked distributed prefix sum must equal the
  * plain per-domain window cumsum on adversarial shapes — one 90%-hot
  * domain (the skew case the chunking exists for), hash ties, zero-token
  * rows, budgets at the exact boundary, and budgets exceeding a domain's
  * total. */
class TokenBudgetSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** (id, domain, toks, h) → kept (id, domain, toks, cum): greedy
    * "tokens BEFORE the row still under budget" semantics. */
  private def brute(rows: Seq[(Long, String, Long, Long)],
                    budget: Long): Set[(Long, String, Long, Long)] =
    rows.groupBy(_._2).toSeq.flatMap { case (_, g) =>
      var cum = 0L
      g.sortBy(r => (r._4, r._1)).flatMap { r =>
        val before = cum
        cum += r._3
        if (before < budget) Some((r._1, r._2, r._3, cum)) else None
      }
    }.toSet

  private def run(rows: Seq[(Long, String, Long, Long)], budget: Long,
                  chunks: Int): Set[(Long, String, Long, Long)] = {
    import spark.implicits._
    TextOps.tokenBudgetMix(rows.toDF("id", "domain", "toks", "h"),
        "domain", "toks", "h", "id", budget, chunks)
      .select("id", "domain", "toks", "cum")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
  }

  test("hot domain, ties, zero-token rows, boundary budgets (vs brute force)") {
    val rnd = new scala.util.Random(41)
    // domain "hot": 2000 rows; "a".."j": ~40 each; hashes from a SMALL
    // range so ties are common AND spread over the full 2^31 range so
    // every chunk boundary is exercised; every 13th row has 0 tokens
    def h(i: Int): Long =
      if (i % 2 == 0) rnd.nextInt(50).toLong * 40000000L else rnd.nextInt(100).toLong
    val rows =
      (0 until 2000).map(i => (i.toLong, "hot", if (i % 13 == 0) 0L else rnd.nextInt(9).toLong + 1, h(i))) ++
      (0 until 400).map(i => (10000L + i, ("a"(0) + i % 10).toChar.toString, rnd.nextInt(9).toLong + 1, h(i)))
    for (budget <- Seq(0L, 1L, 37L, 500L, 100000L); chunks <- Seq(1, 3, 32)) {
      assert(run(rows, budget, chunks) == brute(rows, budget), s"budget=$budget chunks=$chunks")
    }
  }

  test("NULL contracts: null domain keeps its own group (null-safe offsets join), null hash excluded") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("domain", StringType),
      StructField("toks", LongType), StructField("h", LongType)))
    val rows = Seq(
      Row(1L, null, 5L, 10L), Row(2L, null, 5L, 2000000000L), // null domain, two chunks
      Row(3L, "d", 5L, 20L),
      Row(4L, "d", 5L, null)) // null hash -> excluded
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val got = TextOps.tokenBudgetMix(df, "domain", "toks", "h", "id", 100L, chunks = 4)
      .select("id", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 5L), (2L, 10L), (3L, 5L)))
  }

  test("sequencePack: bin spans vs brute force (multi-bin docs, zero-token drops)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // some docs longer than the seqLen (span several bins), some empty
    val rows = (0 until 500).map { i =>
      val toks = i % 11 match {
        case 0 => 0L
        case 1 => 40L + rnd.nextInt(30) // spans 3+ bins at L=16
        case _ => 1L + rnd.nextInt(9).toLong
      }
      (i.toLong, toks, rnd.nextInt(80).toLong * 25000000L)
    }
    val expected = {
      var cum = 0L
      rows.sortBy(r => (r._3, r._1)).collect { case (id, toks, _) if toks > 0 =>
        cum += toks
        (id, toks, cum, (cum - toks) / 16, (cum - 1) / 16)
      }.toSet
    }
    for (chunks <- Seq(1, 5, 32)) {
      val got = TextOps.sequencePack(rows.toDF("id", "toks", "h"), "toks", "h", "id", 16L, chunks)
        .select("id", "toks", "cum", "first_seq", "last_seq")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      assert(got == expected, s"chunks=$chunks")
    }
  }

  test("exact-boundary semantics: row crossing the budget is kept, next row dropped") {
    // one domain, hashes force the order 1,2,3; toks 5 each, budget 10:
    // row1 cum 5 (0<10 keep), row2 cum 10 (5<10 keep — crosses the
    // line), row3 (10<10 false — dropped)
    val rows = Seq((1L, "d", 5L, 10L), (2L, "d", 5L, 20L), (3L, "d", 5L, 30L))
    assert(run(rows, 10L, 4) == Set((1L, "d", 5L, 5L), (2L, "d", 5L, 10L)))
  }
}
