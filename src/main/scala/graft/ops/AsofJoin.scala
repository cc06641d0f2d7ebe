package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/**
 * As-of (temporal) join: for every left row, the latest right row with
 * `right.ts <= left.ts` on the same key — "which view preceded this
 * click", "what price was in effect at this trade".
 *
 * Formulation: union-and-carry-forward. Both sides union into one
 * stream tagged by side, ONE sort-shuffle on (key, ts) orders it, and a
 * running `last(right_id, ignoreNulls)` window carries the most recent
 * right row into each left row. This is the scale shape: cost is a
 * single exchange + sort of |L|+|R| narrow rows, independent of match
 * distance. The naive alternatives both die at 100 TB: a range
 * theta-join explodes per key, and a per-key mapGroups needs the whole
 * key's history in one task. Ties: at equal ts the right row wins
 * (ASOF `<=` semantics), among equal right ts the largest id wins —
 * fully deterministic, replicated by the DuckDB oracle (q45) which is
 * itself verified against DuckDB's native ASOF JOIN.
 *
 * Skew: the plain window partitions by key, so one pathologically hot
 * key (a bot user with half the events) serializes onto one task. Pass
 * `chunkSpan > 0` (in the ts column's numeric units — epoch seconds for
 * timestamps) for the CHUNKED carry-forward: the window partitions by
 * (key, floor(ts/chunkSpan)) — the hot key splits across its time
 * chunks — and the cross-chunk carry is recovered from a per-(key,
 * chunk) last-right aggregate (chunk-count-sized, orders of magnitude
 * below row count) windowed per key and joined back. Results are
 * IDENTICAL to the unchunked path (asserted in PlanSpec); per-task work
 * is bounded by the hottest (key, chunk) cell, tuned by `chunkSpan`.
 *
 * Ids must be Long; unmatched left rows carry null (callers coalesce).
 *
 * Null timestamps are EXCLUDED on both sides: "as of null" has no
 * defined answer, and engines disagree on where nulls sort (Spark's
 * default window order is nulls-first, DuckDB's is nulls-last — the
 * same input would silently produce different matches). Left rows with
 * a null ts therefore simply don't appear in the output; callers that
 * want them back left-join on the left id.
 */
object AsofJoin {
  /** Numeric view of the ts column for chunking: epoch seconds for
    * timestamp types (NTZ interpreted in the session zone — UTC here),
    * the raw value for numeric columns. Only chunk ASSIGNMENT uses
    * this; ordering stays on the original column. */
  private def tsNumeric(df: DataFrame, ts: String): Column = df.schema(ts).dataType match {
    case TimestampType | TimestampNTZType => unix_micros(col(ts).cast("timestamp")) / 1000000L
    case _ => col(ts).cast("long")
  }

  def asofJoin(left: DataFrame, right: DataFrame,
               key: String, ts: String, leftId: String, rightId: String,
               chunkSpan: Long = 0L): DataFrame = {
    val l = left.filter(col(ts).isNotNull).select(col(key), col(ts),
      col(leftId).cast("long").as("__lid"),
      lit(null).cast("long").as("__rid_in"),
      lit(1).as("__side"))
    val r = right.filter(col(ts).isNotNull).select(col(key), col(ts),
      lit(null).cast("long").as("__lid"),
      col(rightId).cast("long").as("__rid_in"),
      lit(0).as("__side"))
    val u = l.unionByName(r)
    if (chunkSpan <= 0) {
      val w = Window.partitionBy(col(key))
        .orderBy(col(ts), col("__side"), coalesce(col("__rid_in"), col("__lid")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      u.withColumn("__rid", last(col("__rid_in"), ignoreNulls = true).over(w))
        .filter(col("__side") === 1)
        .select(col("__lid").as(leftId), col(key), col("__rid").as(rightId))
    } else {
      // eager checkpoint: `chunked` fans into THREE subtrees (phase-1
      // window, chunkLast aggregate, keyChunks distinct) whose
      // exchanges never reuse — without it the left∪right union and
      // its upstream scans execute three times per call
      val chunked = u.withColumn("__chunk", floor(tsNumeric(u, ts) / chunkSpan))
        .localCheckpoint(true)
      // phase 1: carry-forward WITHIN each (key, chunk) — the hot key's
      // rows split across its chunks instead of one task
      val w1 = Window.partitionBy(col(key), col("__chunk"))
        .orderBy(col(ts), col("__side"), coalesce(col("__rid_in"), col("__lid")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val inChunk = chunked
        .withColumn("__rid_l", last(col("__rid_in"), ignoreNulls = true).over(w1))
      // phase 2: per-(key, chunk) LAST right row = max(struct(ts, rid))
      // over right rows (the same (ts, rid) tie order as the window),
      // then a per-key window over the chunk-count-sized set yields the
      // carry-in from strictly earlier chunks
      val chunkLast = chunked.filter(col("__rid_in").isNotNull)
        .groupBy(col(key), col("__chunk"))
        .agg(max(struct(col(ts), col("__rid_in"))).as("__m"))
        .select(col(key), col("__chunk"), col("__m.__rid_in").as("__last_rid"))
      val wc = Window.partitionBy(col(key)).orderBy(col("__chunk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      // NULL-SAFE key equality here too: the windows group null keys
      // together, so a usingColumns equi-join (null != null) would hand
      // null-key rows a null carry and diverge from the unchunked path
      val keyChunks = chunked.select(col(key), col("__chunk")).distinct().alias("k")
      val carry = keyChunks
        .join(chunkLast.alias("cl"),
          col(s"k.$key") <=> col(s"cl.$key") && col("k.__chunk") === col("cl.__chunk"),
          "left")
        .select(col(s"k.$key").as(key), col("k.__chunk").as("__chunk"),
          col("cl.__last_rid").as("__last_rid"))
        .withColumn("__carry", last(col("__last_rid"), ignoreNulls = true).over(wc))
        .select(col(key), col("__chunk"), col("__carry"))
      // phase 3: join the (small) carry table back on (key, chunk) —
      // the hot key spreads across chunks here too. NULL-SAFE key
      // equality: the windows group null keys together (phase 1 and
      // the unchunked path both match null-key rows), so a plain
      // equi-join here would silently drop their cross-chunk carry
      val lhs = inChunk.filter(col("__side") === 1).alias("l")
      val rhs = carry.alias("c")
      lhs.join(rhs,
          col(s"l.$key") <=> col(s"c.$key") && col("l.__chunk") === col("c.__chunk"),
          "left")
        .select(col("l.__lid").as(leftId), col(s"l.$key").as(key),
          coalesce(col("l.__rid_l"), col("c.__carry")).as(rightId))
    }
  }
}
