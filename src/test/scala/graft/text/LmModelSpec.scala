package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Bigram-LM perplexity scoring (q65): trained fixture sanity, planted
  * fluent/garbage separation, map-only plan, and a JVM-vs-column replay. */
class LmModelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.ansi.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("fixture loads: 1021 positive sub-2^23 costs, ordered terciles") {
    assert(LmModel.costs.length == LmModel.Buckets)
    assert(LmModel.costs.forall(c => c > 0 && c < (1L << 23)))
    assert(LmModel.headMax <= LmModel.midMax)
    // a trained model is non-uniform: seen buckets are cheaper than the
    // smoothing ceiling
    assert(LmModel.costs.distinct.length > 1)
  }

  test("pair-bucket arithmetic stays < 2^52 at the worst inputs") {
    val worst = (LmModel.PairMod - 1) * LmModel.PairMul + (LmModel.PairMod - 1)
    assert(worst < (1L << 52) && worst > 0)
    assert(LmModel.bucket(Long.MaxValue / 2, Long.MaxValue / 3) >= 0)
  }

  test("planted fluent/garbage docs: ciphered vocabulary reads as higher perplexity") {
    val good = "the spark table row scan fast merge batch value key hash join query data column window group"
    val bad = graft.tools.QualityTrain.cipher(good)
    def avg(t: String): Long = {
      val hs = PortableHash.tokenShingleHashes(UTF8String.fromString(t), 1)
      val n = hs.numElements()
      assert(n >= 2)
      LmModel.cost(UTF8String.fromString(t)) / (n - 1)
    }
    assert(avg(bad) > avg(good), s"cipher avg ${avg(bad)} must exceed fluent avg ${avg(good)}")
    // degenerate docs cost exactly zero (no bigram)
    assert(LmModel.cost(UTF8String.fromString("")) == 0L)
    assert(LmModel.cost(UTF8String.fromString("single")) == 0L)
  }

  test("operator: map-only plan (zero exchanges), column kernel equals JVM replay") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark table row scan fast merge"),
      (2L, "vxsgh mfugy gqo ambq tmvw yogky"),
      (3L, ""),
      (4L, "one")).toDF("doc_id", "text")
    val res = TextOps.lmScore(docs)
    val plan = res.queryExecution.executedPlan
    assert(!plan.toString().contains("Exchange"), "LM scoring must be map-only")
    val rows = res.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    docs.collect().foreach { r =>
      val (id, t) = (r.getLong(0), r.getString(1))
      val hs = PortableHash.tokenShingleHashes(UTF8String.fromString(t), 1)
      val nBig = math.max(hs.numElements() - 1, 0).toLong
      val cost = LmModel.cost(UTF8String.fromString(t))
      val avg = if (nBig > 0) cost / nBig else 0L
      val bucket =
        if (nBig == 0) 2
        else if (avg <= LmModel.headMax) 0
        else if (avg <= LmModel.midMax) 1
        else 2
      assert(rows(id) == ((nBig, cost, avg, bucket)), s"doc $id kernel/JVM divergence")
    }
    // no-bigram docs land in the tail bucket, garbage in the tail too
    assert(rows(3L)._4 == 2 && rows(4L)._4 == 2 && rows(2L)._4 == 2)
  }

  test("codegen path survives non-nullable input (no interpreted fallback)") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = Seq((1L, "spark table fast"), (2L, "zzqv kkw nnp"))
        .toDF("doc_id", "text")
        .select(TextOps.lmCost(col("text")).as("c")).count()
      assert(n == 2)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
