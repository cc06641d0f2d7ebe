package graft.join

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * k-nearest-neighbor join via cell-ring expansion (the reference's
 * neighbor-ring probe, render.c:947-967, generalized): points are
 * bucketed by tile at a density-chosen zoom; each query probes its
 * kRing(r) tiles through a shuffle hash join; an exact top-k window
 * finishes. Queries whose k-th candidate distance exceeds the ring
 * guarantee radius fall back to an exact broadcast pass, so results are
 * exactly the true kNN (ties broken by id) — which the DuckDB
 * brute-force oracle reproduces.
 *
 * Scale shape: the candidate join is a shuffle hash join on tile id —
 * no cross product; the fallback touches only unresolved queries (rare
 * when z is density-matched) with a broadcast of those queries.
 */
object Knn {

  /** Density-derived bucketing shift from ONE cheap aggregate over the
    * point table (count + bbox): the smallest tiles whose average
    * (2*ring+1)^2-tile ring still holds ~targetFactor*k points, so the
    * exact fallback stays RARE without the caller guessing a zoom.
    * Callers who know their data keep passing tileShift explicitly —
    * this is the default, not a cap. Uniform-density model: a ring in a
    * below-average-density pocket can still fall back (exactness is
    * never at stake, only the fallback rate). */
  // density-shift memo keyed by the ANALYZED plan (semanticHash), k,
  // ring, factor: a session running the same join twice (bench min-of-2
  // passes, dashboards) pays the count+bbox aggregate once. Performance
  // -only: a stale shift can never change RESULTS (the exact fallback
  // guarantees that), and the key changes with any plan change — only
  // in-place file mutation under an unchanged plan could reuse a stale
  // entry, which Spark's own relation caching already treats as UB.
  private val shiftMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int, Double), java.lang.Integer]()

  // targetFactor 8 (not 4): the density model is uniform, and a query
  // in a below-average pocket at factor 4 lands right at the resolve
  // boundary — r6's bench had exactly one such query, whose fallback
  // (even d2-capped) costs a full map-side point scan. One extra
  // doubling is a linear candidate-count cost (~2x rows in the ring
  // join, still ~8k per query) that buys a quadratically safer margin;
  // the measured workload went 1 fallback -> 0 with the extra shift.
  /** THE density-model safety factor (see the factor-4->8 history
    * above) — single source for every auto-shift entry point. */
  final val DefaultTargetFactor = 8.0

  def autoTileShift(points: DataFrame, k: Int, ring: Int = 1,
                    targetFactor: Double = DefaultTargetFactor): Int =
    autoTileShiftChecked(points, k, ring, targetFactor)._1

  /** (shift, boundsVerifiedThisCall): true only when the sizing
    * aggregate ran NOW (memo miss) and therefore just enforced the
    * points-side |coord| < 2^30 contract — the caller can then skip its
    * own probe instead of scanning the table a second time. */
  private def autoTileShiftChecked(points: DataFrame, k: Int, ring: Int,
                                   targetFactor: Double): (Int, Boolean) = {
    val key = (points.queryExecution.analyzed.semanticHash(), k, ring, targetFactor)
    val hit = shiftMemo.get(key)
    if (hit != null) return (hit.intValue(), false)
    val computed = autoTileShiftUncached(points, k, ring, targetFactor)
    if (shiftMemo.size < 256) shiftMemo.put(key, Int.box(computed))
    (computed, true)
  }

  private def autoTileShiftUncached(points: DataFrame, k: Int, ring: Int,
                                    targetFactor: Double): Int = {
    val r = points.agg(
      count(lit(1)).as("n"),
      min(col("x").cast("long")).as("x0"), max(col("x").cast("long")).as("x1"),
      min(col("y").cast("long")).as("y0"), max(col("y").cast("long")).as("y1")).head()
    if (r.isNullAt(1)) return 16 // empty table: any shift works
    // d2 exactness contract (enforced here for free — the agg already
    // ran): |coord| < 2^30 keeps dx^2 + dy^2 < 2^63 under ANSI. Raw
    // 32-bit world coords must be pre-shifted (>> 2 or more).
    val bound = 1L << 30
    require(Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        .forall(v => v > -bound && v < bound),
      s"knnJoin coords must satisfy |coord| < 2^30 for exact d2 " +
        s"(got extent [${r.getLong(1)}, ${r.getLong(2)}] x [${r.getLong(3)}, ${r.getLong(4)}]); " +
        "shift raw 32-bit coords right first")
    val n = math.max(r.getLong(0), 1L)
    val ex = math.max(r.getLong(2) - r.getLong(1), 1L).toDouble
    val ey = math.max(r.getLong(4) - r.getLong(3), 1L).toDouble
    val density = n / (ex * ey)
    val ringTiles = (2.0 * ring + 1) * (2 * ring + 1)
    // expected ring points = density * ringTiles * 4^shift >= targetFactor * k
    val need = targetFactor * k / (density * ringTiles)
    val shift = math.ceil(math.log(math.max(need, 1.0)) / math.log(4.0)).toInt
    math.min(math.max(shift, 0), 31)
  }

  /** [[knnJoin]] with the bucketing zoom derived from point density. */
  def knnJoinAuto(spark: SparkSession, points: DataFrame, queries: DataFrame,
                  k: Int, ring: Int = 1): DataFrame =
    knnJoinAutoWithStats(spark, points, queries, k, ring)._1

  /** [[knnJoinAuto]] plus the fallback-query count (see
    * [[knnJoinWithStats]]). */
  def knnJoinAutoWithStats(spark: SparkSession, points: DataFrame, queries: DataFrame,
                           k: Int, ring: Int = 1): (DataFrame, Long) = {
    // the bound contract is now enforced on EVERY call: on a memo miss
    // the sizing aggregate itself just verified it (no second scan); on
    // a memo hit the impl's concurrent probe re-checks it — a hit
    // previously skipped the check, so files overwritten with wider
    // coords under an unchanged plan could overflow d2 mid-join
    // un-diagnosed
    val (shift, checkedNow) = autoTileShiftChecked(points, k, ring, DefaultTargetFactor)
    knnJoinImpl(spark, points, queries, k, shift, ring, probeBounds = !checkedNow)
  }

  /**
   * points:  (id, x, y)  — integer coords (scaled so d2 is exact).
   * queries: (qid, qx, qy)
   * z: bucketing zoom over the 32-bit coordinate space; coordScale: the
   * number of low bits the coords were pre-shifted by (so tile =
   * coord >> (32 - coordScale - z) ... we keep it simple: caller passes
   * tileShift = bits to shift a coord right to get its tile).
   */
  def knnJoin(spark: SparkSession, points: DataFrame, queries: DataFrame,
              k: Int, tileShift: Int, ring: Int = 1): DataFrame =
    knnJoinWithStats(spark, points, queries, k, tileShift, ring)._1

  /** [[knnJoin]] plus the number of queries the exact broadcast
    * fallback handled (0 = everything resolved in-ring). Returned to
    * the caller — not a JVM-global — so concurrent joins in one session
    * each see their own count. Results are exact either way; a high
    * fraction means the bucketing zoom is density-mismatched and the
    * fallback is doing the work a better tile size would have avoided. */
  def knnJoinWithStats(spark: SparkSession, points: DataFrame, queries: DataFrame,
                       k: Int, tileShift: Int, ring: Int = 1): (DataFrame, Long) =
    knnJoinImpl(spark, points, queries, k, tileShift, ring, probeBounds = true)

  private def knnJoinImpl(spark: SparkSession, points: DataFrame, queries: DataFrame,
                          k: Int, tileShift: Int, ring: Int,
                          probeBounds: Boolean): (DataFrame, Long) = {
    // NULL coords are dropped on BOTH sides: a point with a NULL
    // coordinate never matches the ring join but would enter the exact
    // fallback with d2 = NULL, which ascending window order sorts
    // NULLS FIRST — stealing rn=1 from a true neighbor.
    val pts = points.select(col("id"), col("x").cast("long"), col("y").cast("long"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .withColumn("tx", expr(s"x >> $tileShift"))
      .withColumn("ty", expr(s"y >> $tileShift"))
    // |coord| < 2^30 d2-exactness contract on the POINTS side, on EVERY
    // call path (probeBounds=false only when the caller's sizing
    // aggregate enforced it in THIS call): unshifted raw 32-bit coords
    // overflow dx^2+dy^2 mid-join under ANSI (or silently mis-order
    // with ANSI off). The pruned 2-column agg runs as a CONCURRENT job
    // (guide §2.6 — Spark actions are thread-safe) so its scan overlaps
    // the query-side sizing aggregate below instead of serializing in
    // front of it; the future is awaited before any join work is
    // launched. (If a query-side precondition throws first, the one
    // bounded probe job simply runs out in the background.)
    val boundsProbe = if (!probeBounds) None else Some(scala.concurrent.Future {
      pts.agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
        min(col("y")).as("y0"), max(col("y")).as("y1")).head()
    }(scala.concurrent.ExecutionContext.global))
    def awaitPointBounds(): Unit = boundsProbe.foreach { f =>
      val pb = scala.concurrent.blocking {
        scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf)
      }
      if (!pb.isNullAt(0)) {
        val bound = 1L << 30
        require((0 until 4).map(pb.getLong).forall(v => v > -bound && v < bound),
          s"knnJoin point coords must satisfy |coord| < 2^30 for exact d2 " +
            s"(got extent [${pb.getLong(0)}, ${pb.getLong(1)}] x [${pb.getLong(2)}, ${pb.getLong(3)}]); " +
            "shift raw 32-bit coords right first")
      }
    }

    // each query probes its (2r+1)^2 ring of tiles. NULL qids are
    // dropped up front: results are keyed by qid, so a NULL row is
    // unanswerable anyway — and if it entered, the per-qid window would
    // merge every NULL query into ONE top-k group while the
    // countDistinct below EXCLUDES the NULL group, skewing the
    // resolved/unresolved arithmetic that gates the exact fallback.
    // EXACT duplicate query rows collapse (a repeated row would
    // duplicate every candidate and make the top-k window return fewer
    // than k DISTINCT neighbors); one qid asking two different
    // coordinates is rejected below — the per-qid window cannot answer
    // both.
    val q = queries.select(col("qid"), col("qx").cast("long"), col("qy").cast("long"))
      .filter(col("qid").isNotNull && col("qx").isNotNull && col("qy").isNotNull)
      .dropDuplicates("qid", "qx", "qy")
    val qTiles = q
      .withColumn("dx", explode(sequence(lit(-ring), lit(ring))))
      .withColumn("dy", explode(sequence(lit(-ring), lit(ring))))
      .withColumn("tx", expr(s"(qx >> $tileShift) + dx"))
      .withColumn("ty", expr(s"(qy >> $tileShift) + dy"))
      .drop("dx", "dy")

    val d2 = (col("x") - col("qx")) * (col("x") - col("qx")) +
      (col("y") - col("qy")) * (col("y") - col("qy"))

    val w = Window.partitionBy(col("qid")).orderBy(col("d2").asc, col("id").asc)
    // Broadcast the query-tile ring only while it plausibly fits in an
    // executor (rows ~ |queries| * (2r+1)^2); past that, fall back to a
    // shuffle hash join — still no cross product, just hashed on tile id.
    // ONE tiny action funds every per-query decision: broadcast sizing,
    // the duplicate-qid contract, the query-side d2-exactness bound,
    // and the resolved/unresolved split (per DISTINCT qid).
    val qAgg = q.agg(count(lit(1)).as("rows"),
      countDistinct(col("qid")).as("qids"),
      min(col("qx")).as("x0"), max(col("qx")).as("x1"),
      min(col("qy")).as("y0"), max(col("qy")).as("y1")).head()
    val qRows = qAgg.getLong(0)
    val qCount = qAgg.getLong(1)
    require(qRows == qCount,
      s"knnJoin: ${qRows - qCount} duplicate qid row(s) with CONFLICTING coordinates " +
        "(exact duplicates collapse; one qid cannot ask two different queries)")
    if (qRows > 0) {
      // same |coord| < 2^30 d2-exactness contract the auto path checks
      // on the points side — the query table is tiny, so this is free
      val bound = 1L << 30
      require(Seq(qAgg.getLong(2), qAgg.getLong(3), qAgg.getLong(4), qAgg.getLong(5))
          .forall(v => v > -bound && v < bound),
        "knnJoin query coords must satisfy |coord| < 2^30 for exact d2; shift raw 32-bit coords right first")
    }
    // join the concurrent points-side probe before any join work: a
    // bounds violation must surface as this contract error, not as an
    // ANSI overflow somewhere inside the candidate join
    awaitPointBounds()
    val ringRows = qRows * (2L * ring + 1) * (2L * ring + 1)
    // broadcast gate in BYTES, not rows: qid's type is caller-chosen,
    // and 4M rows of long string qids is a very different broadcast
    // from 4M rows of longs
    val qRowBytes = q.schema.map(_.dataType.defaultSize).sum + 24L
    val qSide = if (ringRows * qRowBytes <= (192L << 20)) broadcast(qTiles) else qTiles
    // Eagerly localCheckpoint the (tiny, <= |queries|*k rows) top-k
    // candidate set: the resolved/good/unresolved consumers below would
    // otherwise re-run the full candidate join + window three times, and
    // unlike cache() the blocks are lineage-free and reclaimed by the
    // ContextCleaner as soon as the result Dataset is dropped — no
    // unpersist obligation leaks to the caller. The (huge) point side
    // never shuffles for the broadcast candidate join; only candidates
    // reach the per-query window.
    val cand = pts.join(qSide, Seq("tx", "ty"))
      .select(col("qid"), col("qx"), col("qy"), col("id"), d2.as("d2"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .localCheckpoint(true)

    // ring guarantee: everything within guard of the query is in the ring
    val guard = (ring.toLong) << tileShift // min distance to outside the ring
    // a ring wider than the coordinate space trivially resolves every
    // query; guard*guard would wrap negative for tileShift >= 31 and
    // mark EVERYTHING unresolved (full-corpus fallback)
    val guard2 = if (guard >= (1L << 31)) Long.MaxValue else guard * guard
    def qstats = cand.groupBy("qid")
      .agg(count(lit(1)).as("n"), max(col("d2")).as("kth"))
    def resolvedSet = qstats
      .filter(col("n") >= k && col("kth") <= guard2)
      .select("qid")

    // fallback decision folded into ONE tiny aggregate over the
    // checkpointed (<= |queries|*k row) candidates: unresolved count =
    // qCount - resolved count, and the common all-resolved case returns
    // the checkpointed candidates DIRECTLY — no semi-join, no anti-join,
    // no extra pass over q. (Previously this was a separate anti-join
    // count job; at 43-query bench scale the three per-call actions made
    // q47 the slowest row for pure fixed-overhead reasons.)
    val resolvedCnt = resolvedSet.count()
    val unresolvedCnt = qCount - resolvedCnt
    if (unresolvedCnt == 0) (cand.select("qid", "id", "d2", "rn"), 0L)
    else {
      val resolved = resolvedSet
      val good = cand.join(resolved, Seq("qid"), "left_semi")
        .select("qid", "id", "d2", "rn")
      // exact fallback for unresolved queries: broadcast those queries
      // over the full point table (they are few by construction). The
      // scan is map-side and unavoidable for exactness, but the top-k
      // window is NOT allowed to receive the whole table: a query whose
      // ring already produced >= k candidates (kth merely beyond the
      // guard radius) has a PROOF that the true k-th distance is <= its
      // ring kth — any farther point is beaten by those k candidates —
      // so d2 <= kth pre-filters the scan down to ~k rows per query
      // before anything shuffles into the per-qid window partition.
      // (Previously every point row shuffled into that one partition:
      // a single sparse-pocket query cost a full-table window pass —
      // the r6 q47-vs-q10 2x gap.) Only a query with FEWER than k ring
      // candidates (sparse pocket squared) keeps the unbounded filter.
      val unresolved = q.join(resolved, Seq("qid"), "left_anti")
        .join(qstats, Seq("qid"), "left")
        .select(col("qid"), col("qx"), col("qy"),
          when(col("n").isNotNull && col("n") >= k, col("kth"))
            .otherwise(lit(Long.MaxValue)).as("d2cap"))
      // the SAME d2 val as the ring path — the exactness proof assumes
      // both paths compute the identical metric
      val fb = pts.crossJoin(broadcast(unresolved))
        .select(col("qid"), col("id"), d2.as("d2"), col("d2cap"))
        .filter(col("d2") <= col("d2cap"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select("qid", "id", "d2", "rn")
      (good.unionByName(fb), unresolvedCnt)
    }
  }
}
