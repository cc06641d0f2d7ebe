package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SemDeDup semantic dedup (q64): planted near-duplicate-cluster recall
  * at bench scale, keep-one semantics, shuffle shape, and the loud
  * candidate-budget guard. */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("planted near-dup clusters collapse to one keeper each (bench scale)") {
    import spark.implicits._
    val dim = 32
    val r = new scala.util.Random(7)
    // 4000 base vectors + 2 tiny-perturbation copies of every 50th:
    // copies sit at cos ~0.9999 of their source — every same-cell copy
    // MUST co-cluster; cross-cell splits are the documented SemDeDup
    // boundary tradeoff and are asserted to be rare, not absent
    val base = (0L until 4000L).map { i =>
      val rr = new scala.util.Random(i)
      i -> Array.fill(dim)((rr.nextDouble() - 0.5).toFloat)
    }
    val copies = base.filter(_._1 % 50 == 0).flatMap { case (i, v) =>
      (1 to 2).map { c =>
        (100000L + i * 10 + c) -> v.map(x => x + (r.nextDouble() * 1e-4 - 5e-5).toFloat)
      }
    }
    val vecs = (base ++ copies).toDF("vec_id", "embedding")
    val res = graft.ann.Ann.semDedup(vecs, k = 64, iters = 2, minCos = 0.95)
      .select("vec_id", "cell", "rep", "keep").collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2), row.getInt(3)))
    val byId = res.map(t => t._1 -> t).toMap
    assert(res.length == vecs.count())
    // keep == (vec_id == rep), exactly one keeper per rep group
    res.foreach { case (id, _, rep, keep) => assert((keep == 1) == (id == rep)) }
    val planted = base.filter(_._1 % 50 == 0).map(_._1)
    var collapsed = 0
    planted.foreach { src =>
      val ids = Seq(src, 100000L + src * 10 + 1, 100000L + src * 10 + 2)
      val cells = ids.map(byId(_)._2).distinct
      val reps = ids.map(byId(_)._3).distinct
      if (cells.size == 1) {
        // same cell -> the cos~1 pairs are in the candidate set -> MUST
        // be one component with one keeper (unconditional)
        assert(reps.size == 1, s"same-cell planted group $src split: $reps")
        collapsed += 1
      } else if (reps.size == 1) collapsed += 1
    }
    // boundary splits must stay rare (the quantizer puts near-identical
    // vectors in the same cell almost surely)
    assert(collapsed >= (planted.size * 95) / 100,
      s"only $collapsed/${planted.size} planted groups collapsed")
    // sanity: dedup actually dropped the planted copies
    val dropped = res.count(_._4 == 0)
    assert(dropped >= collapsed * 2 * 95 / 100, s"only $dropped drops")
  }

  test("no embedding array on any shuffle; candidate-budget guard fires loudly") {
    import spark.implicits._
    val vecs = (0L until 300L).map { i =>
      val rr = new scala.util.Random(i)
      i -> Array.fill(16)((rr.nextDouble() - 0.5).toFloat)
    }.toDF("vec_id", "embedding")
    val (cids, cvecs) = graft.ann.Ann.kmeansCentroids(vecs, k = 4, iters = 2)
    val res = graft.ann.Ann.semDedup(vecs, cids, cvecs, minCos = 0.5)
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      (p +: p.children.flatMap(allNodes)) ++ p.subqueries.flatMap(allNodes)
    val exchanges = allNodes(res.queryExecution.executedPlan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    exchanges.foreach { e =>
      e.output.foreach(a => assert(
        !a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType],
        s"array column ${a.name} rides a shuffle"))
    }
    assert(res.count() == 300)
    // guard: a 1-cell quantizer over 300 vectors vs a 1000-pair budget
    val ex = intercept[IllegalArgumentException] {
      graft.ann.Ann.semDedup(vecs, Array(0L), Array(Array.fill(16)(0.1)),
        minCos = 0.5, maxCandPairs = 1000L)
    }
    assert(ex.getMessage.contains("candidate pairs exceed"))
  }
}
