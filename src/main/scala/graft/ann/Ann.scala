package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (array<float>) — the
 * training-pipeline ANN operators. Brute-force cosine top-k is the
 * exact baseline; random-hyperplane LSH bucketing is the scale path
 * (candidates only meet inside a bucket — the shuffle is on a small
 * signature, never an all-pairs cross product).
 */
object Ann {
  /** Sequential-fold dot product of two float arrays (cast to double
    * elementwise, summed left-to-right — the same order DuckDB's list
    * functions use, so results are bit-identical). Native codegen'd
    * expression (the HOF fold is interpreted and dominates ANN time). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Bridge.{column, expression}
    column(graft.functions.DotProductExpr(expression(a), expression(b)))
  }

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))

  /** Exact cosine top-k: broadcast the (small) query set, window top-k
    * per query. At scale this is the rerank stage after LSH prefilter. */
  def bruteForceTopK(vecs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val joined = vecs.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(queries.select(col("qid"), col("qvec"))))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), cosine(col("embedding"), col("qvec")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    joined.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Random-hyperplane (SimHash-style) signature of an embedding:
    * `planes` sign bits packed into a Long. Native codegen'd kernel
    * (graft.text.RhpSig) whose plane components are pure-integer mixes
    * that the DuckDB oracle reproduces exactly — the projections fold
    * doubles in the same sequential order, so the sign bits (hence
    * buckets and candidate sets) match bit-for-bit. */
  def rhpSignature(v: Column, planes: Int): Column = {
    import org.apache.spark.sql.graft.Bridge.{column, expression}
    column(graft.functions.RhpSigExpr(expression(v), planes))
  }

  /** LSH-bucketed ANN: bucket = signature band; candidates share a
    * band; exact cosine rerank inside buckets; top-k per query.
    * Recall < 1 by construction (approximate); `bands`/`rowsPerBand`
    * trade recall vs candidate count. Defaults (64 planes, 8 bands of
    * 8 rows) give 256 possible keys per band — at round-1's 16/4 the
    * 4-bit keys made every bucket hold n/16 of the corpus, i.e.
    * near-all-pairs at scale. */
  /** (band, key) struct array of a vector's LSH band keys. */
  def rhpBandCols(sig: Column, planes: Int, bands: Int): Column = {
    val rows = planes / bands
    val mask = (1L << rows) - 1
    array((0 until bands).map(b =>
      struct(lit(b).as("band"), shiftrightunsigned(sig, b * rows).bitwiseAND(mask).as("key"))): _*)
  }

  /** Exploded (vec_id, embedding, bk) band rows for LSH self/probe joins. */
  def rhpBands(vecs: DataFrame, planes: Int = 64, bands: Int = 8): DataFrame =
    vecs.select(col("vec_id"), col("embedding"),
      explode(rhpBandCols(rhpSignature(col("embedding"), planes), planes, bands)).as("bk"))

  /** Embedding near-duplicate pairs at scale: LSH-bucketed candidate
    * self-join (only same-bucket vectors ever meet — the shuffle key is
    * the 1-long band key, never an all-pairs cross product) + exact
    * cosine rerank at `minCos`. Approximate by construction: pairs whose
    * signatures share no band are not considered (recall rises with
    * `bands`). This is the 100 TB path; the exact all-pairs q31 variant
    * is oracle-scale only. */
  def nearDupLsh(vecs: DataFrame, minCos: Double,
                 planes: Int = 64, bands: Int = 8): DataFrame = {
    val b = rhpBands(vecs, planes, bands)
    val a2 = b.select(col("vec_id").as("vec_a"), col("embedding").as("ea"), col("bk"))
    val b2 = b.select(col("vec_id").as("vec_b"), col("embedding").as("eb"), col("bk"))
    a2.join(b2, Seq("bk")).filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), col("ea"), col("eb"))
      .dropDuplicates("vec_a", "vec_b")
      .select(col("vec_a"), col("vec_b"), cosine(col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** IVF-flat coarse quantization: assign every vector to its nearest
    * centroid by cosine (ties by centroid id). Centroids are a small
    * broadcast table (cid, cvec) — the assignment is a broadcast
    * nested-loop over K centroids per row, the standard IVF build cost;
    * the index itself is just an int cell column, so the candidate join
    * shuffles on a small key, never the embeddings. */
  def ivfAssign(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val scored = vecs.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cents.select(col("cid"), col("cvec"))))
      .select(col("vec_id"), col("embedding"), col("cid"),
        cosine(col("embedding"), col("cvec")).as("cs"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cs").desc, col("cid").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid").as("cell"))
  }

  /** IVF-probed ANN top-k: queries probe their `nprobe` nearest
    * centroid cells; candidates are the vectors assigned to those cells;
    * exact cosine rerank. Recall < 1 by construction (cells not probed
    * are never scanned) — the complementary scale path to lshTopK. */
  def ivfTopK(vecs: DataFrame, queries: DataFrame, cents: DataFrame,
              k: Int, nprobe: Int = 2): DataFrame = {
    val asg = ivfAssign(vecs, cents)
    val qScored = queries.select(col("qid"), col("qvec"))
      .crossJoin(broadcast(cents.select(col("cid"), col("cvec"))))
      .select(col("qid"), col("qvec"), col("cid"),
        cosine(col("qvec"), col("cvec")).as("cs"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("cs").desc, col("cid").asc)
    val probes = qScored.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe).select(col("qid"), col("qvec"), col("cid").as("cell"))
    val cand = asg.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .dropDuplicates("qid", "vec_id")
      .select(col("qid"), col("vec_id"), cosine(col("embedding"), col("qvec")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    cand.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  def lshTopK(vecs: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 64, bands: Int = 8): DataFrame = {
    val rows = planes / bands
    def bandCols(sig: Column): Column = rhpBandCols(sig, planes, bands)
    val v = vecs.select(col("vec_id"), col("embedding"),
      explode(bandCols(rhpSignature(col("embedding"), planes))).as("bk"))
    // query-side MULTI-PROBE: each band key is probed exactly and with
    // every 1-bit flip — per-band collision probability rises from p^r
    // to p^r + r*p^(r-1)*(1-p) at a cost of (rows+1)x QUERY band rows
    // only (the huge vector side is untouched). fb = 0 probes the exact
    // key; fb = 1..rows flips bit fb-1.
    val q = queries.select(col("qid"), col("qvec"),
      explode(bandCols(rhpSignature(col("qvec"), planes))).as("bk"))
      .withColumn("fb", explode(sequence(lit(0), lit(rows))))
      .select(col("qid"), col("qvec"),
        struct(col("bk.band").as("band"),
          when(col("fb") === 0, col("bk.key"))
            .otherwise(col("bk.key").bitwiseXOR(expr("shiftleft(CAST(1 AS BIGINT), fb - 1)")))
            .as("key")).as("bk"))

    val cand = v.join(q, v("bk") === q("bk"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("embedding"), col("qvec"))
      .dropDuplicates("qid", "vec_id")
      .select(col("qid"), col("vec_id"), cosine(col("embedding"), col("qvec")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    cand.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }
}
