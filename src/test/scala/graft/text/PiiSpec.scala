package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PII detection/redaction (q53): planted positives for every shape,
  * hard negatives the regexes must reject, and the redaction chain's
  * output text. Counts + redaction are also cross-checked against
  * DuckDB by the q53 oracle; this spec pins the SEMANTICS so a pattern
  * edit that both engines agree on but that changes behavior (e.g.
  * dropping the octet range check) still fails loudly. */
class PiiSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(text: String): (Map[String, Long], String) = {
    import spark.implicits._
    val row = Seq(text).toDF("text")
      .select(TextOps.piiColumns(col("text")).map { case (n, c) => c.as(n) }: _*)
      .head()
    val counts = TextOps.PiiTypes.map { case (n, _, _) =>
      s"n_$n" -> row.getAs[Long](s"n_$n")
    }.toMap
    (counts, row.getAs[String]("red_text"))
  }

  test("each shape detects and redacts") {
    val (c, red) = run(
      "mail bob.smith+x@sub.example.org or (415) 555-2671 / 415-555-2671, " +
        "host 192.168.0.1, ssn 078-05-1120 end")
    assert(c("n_email") == 1)
    assert(c("n_phone") == 2)
    assert(c("n_ipv4") == 1)
    assert(c("n_id") == 1)
    assert(red == "mail <EMAIL> or <PHONE> / <PHONE>, host <IP>, ssn <ID> end")
  }

  test("hard negatives stay clean") {
    val cases = Seq(
      "version v256.1.1.1 here",   // invalid octet, no word boundary
      "semver bumped to 1.2.3 ok", // 3 octets is NOT an IP
      "a@b no tld",                // email needs a dotted TLD
      "5558670042 raw digits",     // phone requires separators
      "12-34-5678 and 123-456-789")// not the 3-2-4 id shape
    for (t <- cases) {
      val (c, red) = run(t)
      assert(c.values.sum == 0, s"false positive in '$t': $c")
      assert(red == t)
    }
    // DOCUMENTED limit (shared by both engines — RE2 has no lookbehind
    // to forbid it): a 5-part dotted run matches its first 4-octet
    // window, because \b holds between a digit and the following '.'
    val (c2, _) = run("1.2.3.4.5")
    assert(c2("n_ipv4") == 1, s"dotted-run: $c2")
  }

  test("boundary subtleties") {
    // IP at string edges and punctuation boundaries
    assert(run("10.0.0.1")._1("n_ipv4") == 1)
    assert(run("(10.0.0.255)")._1("n_ipv4") == 1)
    assert(run("255.255.255.255!")._1("n_ipv4") == 1)
    assert(run("999.1.2.3")._1("n_ipv4") == 0)
    // SSN-shape inside a longer digit-hyphen run must not match
    assert(run("1123-45-6789")._1("n_id") == 0)
    assert(run("123-45-67890")._1("n_id") == 0)
    // phone: parenthesized exchange needs no leading word boundary
    assert(run("x(555) 867.5309 ")._1("n_phone") == 1)
    // an SSN is not a phone (2-digit middle group)
    assert(run("078-05-1120")._1("n_phone") == 0)
  }

  test("redaction order: specific id shape wins over phone") {
    // 3-2-4 matches the id pattern; phone must not have consumed it
    val (_, red) = run("ids 078-05-1120 then 415-555-2671")
    assert(red == "ids <ID> then <PHONE>")
  }

  test("multiple hits per type count individually") {
    val (c, _) = run("a@x.com b@y.org 1.2.3.4 5.6.7.8 9.10.11.12")
    assert(c("n_email") == 2)
    assert(c("n_ipv4") == 3)
  }
}
