package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Model-based quality scoring (q63): trained fixture sanity, planted
  * easy/hard separation, map-only plan, and a JVM-vs-column replay. */
class QualityModelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.ansi.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("fixture loads: 256 int8-range weights, nonzero model") {
    assert(QualityModel.weights.length == QualityModel.Buckets)
    assert(QualityModel.weights.forall(w => w >= -127 && w <= 127))
    assert(QualityModel.weights.exists(_ != 0))
  }

  test("planted easy/hard docs: corpus-vocabulary text keeps, ciphered garbage drops") {
    // easy: the synthetic corpus vocabulary (what training positives use)
    val good = "spark table row scan fast merge batch value key hash join query data column window group"
    // hard: same shape, substitution-ciphered vocabulary (the trained
    // separation a length/punct heuristic cannot make)
    val bad = graft.tools.QualityTrain.cipher(good)
    assert(QualityModel.score(UTF8String.fromString(good)) >= 0, "easy doc must keep")
    assert(QualityModel.score(UTF8String.fromString(bad)) < 0, "hard doc must drop")
    // empty text scores exactly the bias
    assert(QualityModel.score(UTF8String.fromString("")) == QualityModel.bias)
  }

  test("operator: map-only plan (zero exchanges), column kernel equals JVM replay") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark table row scan fast merge"),
      (2L, "vxsgh mfugy gqo ambq tmvw yogky"),
      (3L, "")).toDF("doc_id", "text")
    val res = TextOps.qualityModelScore(docs)
    val plan = res.queryExecution.executedPlan
    assert(!plan.toString().contains("Exchange"), "quality scoring must be map-only")
    val rows = res.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    docs.collect().foreach { r =>
      val (id, t) = (r.getLong(0), r.getString(1))
      val expect = QualityModel.score(UTF8String.fromString(t))
      assert(rows(id)._2 == expect, s"doc $id kernel/JVM divergence")
      assert(rows(id)._3 == (if (expect >= 0) 1 else 0))
    }
    assert(rows(1L)._3 == 1 && rows(3L)._3 == 0)
  }

  test("codegen path survives non-nullable input (no interpreted fallback)") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = Seq((1L, "spark table"), (2L, "zzqv kkw"))
        .toDF("doc_id", "text")
        .select(TextOps.qualityScore(col("text")).as("s")).count()
      assert(n == 2)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
