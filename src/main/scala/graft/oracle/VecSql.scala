package graft.oracle

/**
 * DuckDB SQL generators for the vector/ANN oracles — the SINGLE source
 * of the FP-op sequences shared with the JVM kernels
 * (graft.functions.DotProductExpr / CentroidKernel, graft.ann.Ann):
 * elementwise products widened to double and folded left-to-right,
 * cos = dot / sqrt(nn * cc). Change either side only together.
 */
object VecSql {
  /** Elementwise dot product with the same left-to-right fold as the
    * engine's codegen'd kernel (bitwise-identical doubles). Works for
    * FLOAT and DOUBLE lists (::DOUBLE widens floats exactly). */
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), i -> ($a[i]::DOUBLE) * ($b[i]::DOUBLE)), (x, y) -> x + y)"

  def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / sqrt(${dotSql(a, a)} * ${dotSql(b, b)}))"

  /**
   * CTE chain (no leading WITH) defining `cents(cid, cvec DOUBLE[])` =
   * deterministic Lloyd k-means over `table`, replicating
   * graft.ann.Ann.kmeansCentroids exactly:
   *  - init: the k lowest-vec_id embeddings (widened to DOUBLE);
   *  - assign: argmax cosine, tie to the smaller cid (row_number over
   *    cos DESC, cid — the kernel's strict-argmax order);
   *  - update: per-component mean on a 1/quant grid — exact BIGINT
   *    sums of floor(v * quant + 0.5) (order-independent) divided by
   *    (count * quant); empty clusters keep their previous centroid.
   *
   * Contract: FIXED-dimension embeddings (the testdata shape). For
   * ragged input the engine keeps a centroid's previous TAIL values
   * when a cluster's members are all shorter (Ann.kmeansCentroids
   * clones the old array), while this CTE's list(... ORDER BY j)
   * truncates to the dims present — the two would diverge from the
   * first ragged iteration on.
   */
  def kmeansCentsCte(k: Int, iters: Int, quant: Long = 1L << 20,
                     table: String = "embeddings"): String = {
    val dims = s"(SELECT unnest(generate_series(1, (SELECT max(len(embedding)) FROM $table))) AS j)"
    val sb = new StringBuilder
    sb ++= s"cents0 AS (SELECT vec_id AS cid, list_transform(embedding, x -> x::DOUBLE) AS cvec " +
      s"FROM (SELECT * FROM $table ORDER BY vec_id LIMIT $k) i0), "
    for (t <- 1 to iters) {
      sb ++= s"asg$t AS (SELECT vec_id, cell FROM (SELECT v.vec_id, c.cid AS cell, " +
        s"row_number() OVER (PARTITION BY v.vec_id ORDER BY ${cosSql("v.embedding", "c.cvec")} DESC, c.cid) AS rn " +
        s"FROM $table v, cents${t - 1} c) a WHERE rn = 1), "
      sb ++= s"sums$t AS (SELECT a.cell AS cid, jj.j, " +
        s"CAST(sum(CAST(floor((v.embedding[jj.j]::DOUBLE) * $quant.0 + 0.5) AS BIGINT)) AS BIGINT) AS s, " +
        s"count(*) AS cnt FROM asg$t a JOIN $table v ON v.vec_id = a.vec_id, $dims jj " +
        s"WHERE jj.j <= len(v.embedding) GROUP BY 1, 2), "
      sb ++= s"newc$t AS (SELECT cid, list((s::DOUBLE) / ((cnt * $quant)::DOUBLE) ORDER BY j) AS cvec " +
        s"FROM sums$t GROUP BY cid), "
      sb ++= s"cents$t AS (SELECT p.cid, coalesce(n.cvec, p.cvec) AS cvec " +
        s"FROM cents${t - 1} p LEFT JOIN newc$t n ON n.cid = p.cid), "
    }
    sb ++= s"cents AS (SELECT cid, cvec FROM cents$iters)"
    sb.toString
  }
}
