package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Interval (range) join: pair every point row with every interval row
 * whose [lo, hi] contains it, on Long domains — "which fee band does
 * this amount fall in", "which time window covers this event".
 *
 * Scale shape: bucketize. Each interval explodes to the grid buckets it
 * overlaps (sequence(lo/bucket .. hi/bucket)); each point maps to its
 * single bucket; a plain hash equi-join on the bucket id meets them and
 * an exact containment filter finishes. Catalyst's own answer to an
 * inequality-only join is BroadcastNestedLoopJoin (or a cartesian) —
 * fine for a broadcast-able interval side, quadratic otherwise. Here
 * the cost is |P| + |I| * (span/bucket) shuffled rows on Long keys —
 * the same cover-and-refine move as the engine's Z-order bbox scan.
 * Choose bucket ~ the median interval span: too small explodes the
 * interval side, too big overfills buckets (the containment filter
 * then discards more candidates).
 *
 * Duplicate-free by construction: a (point, interval) pair meets in
 * exactly one bucket — the point's.
 */
object RangeJoin {
  /** points: (pid, v); intervals: (iid, lo, hi) — all Long columns on a
    * NON-NEGATIVE domain (bucket ids use integer `div`, which only
    * equals floor-division for v >= 0; double-based floor would lose
    * precision past 2^53). Returns (pid, v, iid) for every v in
    * [lo, hi]. INVERTED intervals (hi < lo) are EMPTY by that contract
    * and are dropped up front — they produce no pairs, deliberately
    * silently (unlike the over-span guard below, which is a
    * resource-bomb class and fails loudly): an empty range is a
    * legitimate value, a 2^55-bucket range is not. */
  def intervalJoin(points: DataFrame, intervals: DataFrame, bucket: Long): DataFrame = {
    require(bucket > 0, "bucket must be positive")
    val p = points.select(col("pid").cast("long").as("pid"), col("v").cast("long").as("v"))
      .withColumn("__b", expr(s"v div $bucket"))
    // one corrupt interval (lo=0, hi=Long.MaxValue) would ask
    // sequence() for ~2^55 elements and OOM/kill the whole join — fail
    // LOUDLY with the offending iid instead (the RIFF-clamp class of
    // one-bad-row robustness). 2^22 bucket rows from ONE interval is
    // already pathological; callers with genuinely huge spans should
    // raise `bucket`.
    val maxSpan = 1L << 22
    val i = intervals.select(col("iid").cast("long").as("iid"),
        col("lo").cast("long").as("lo"), col("hi").cast("long").as("hi"))
      .filter(col("lo") <= col("hi"))
      .withColumn("__b", explode(sequence(expr(s"lo div $bucket"),
        when(expr(s"hi div $bucket - lo div $bucket") < maxSpan, expr(s"hi div $bucket"))
          .otherwise(raise_error(concat(
            lit(s"intervalJoin: interval spans >= $maxSpan buckets (raise `bucket`): iid="),
            col("iid").cast("string")))))))
    p.join(i, Seq("__b"))
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select(col("pid"), col("v"), col("iid"))
  }
}
