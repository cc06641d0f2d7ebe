package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  def asofJoin(left: DataFrame, right: DataFrame,
               key: String, ts: String, leftId: String, rightId: String): DataFrame = {
    val l = left.filter(col(ts).isNotNull).select(col(key), col(ts),
      col(leftId).cast("long").as("__lid"),
      lit(null).cast("long").as("__rid_in"),
      lit(1).as("__side"))
    val r = right.filter(col(ts).isNotNull).select(col(key), col(ts),
      lit(null).cast("long").as("__lid"),
      col(rightId).cast("long").as("__rid_in"),
      lit(0).as("__side"))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), coalesce(col("__rid_in"), col("__lid")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__rid", last(col("__rid_in"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__lid").as(leftId), col(key), col("__rid").as(rightId))
  }
}
