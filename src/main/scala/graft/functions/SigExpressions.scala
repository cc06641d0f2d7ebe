package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen'd signature expressions for the near-dup / ANN pipelines.
 * The interpreted higher-order-function formulations (transform +
 * aggregate per permutation/bit/plane) dominate runtime at scale; these
 * compute the whole signature in one static-kernel call per row while
 * staying inside whole-stage codegen. Semantics live in
 * graft.text.PortableHash / graft.text.RhpSig, the single source shared
 * with the DuckDB oracle SQL generators.
 */
case class MinhashSigExpr(child: Expression, shingle: Int, perms: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(t: Any): Any =
    graft.text.PortableHash.minhashSig(t.asInstanceOf[UTF8String], shingle, perms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.text.PortableHash.minhashSig($t, $shingle, $perms)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused minhash signature + LSH band keys (array of `bands` keys). */
case class MinhashBandsExpr(child: Expression, shingle: Int, bands: Int, rows: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"
  override protected def nullSafeEval(t: Any): Any =
    graft.text.PortableHash.minhashBands(t.asInstanceOf[UTF8String], shingle, bands, rows)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.text.PortableHash.minhashBands($t, $shingle, $bands, $rows)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimhashExpr(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash62"
  override protected def nullSafeEval(t: Any): Any =
    graft.text.PortableHash.simhash62(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.text.PortableHash.simhash62($t)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass token n-gram shingle hashes (see
  * PortableHash.tokenShingleHashes): the 8-byte contamination-join keys.
  * Replaces the interpreted transform/slice lambda that re-split the
  * document once per shingle (O(tokens^2) character work per doc). */
case class TokenShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_shingle_hashes"
  override protected def nullSafeEval(t: Any): Any =
    graft.text.PortableHash.tokenShingleHashes(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.text.PortableHash.tokenShingleHashes($t, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass token n-gram shingle strings (single-space-joined windows). */
case class TokenShinglesExpr(child: Expression, n: Int) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "token_shingles"
  override protected def nullSafeEval(t: Any): Any =
    graft.text.PortableHash.tokenShingles(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.text.PortableHash.tokenShingles($t, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rolling character n-gram hashes (exact-substring decontamination
  * seeds; see PortableHash.charNgramHashes). */
case class CharNgramHashesExpr(child: Expression, n: Int) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_ngram_hashes"
  override protected def nullSafeEval(t: Any): Any =
    graft.text.PortableHash.charNgramHashes(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.text.PortableHash.charNgramHashes($t, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass (window-hash, window-bytes) pairs for the single-scan
  * duplicate-span projection — [[CharNgramHashesExpr]] with each
  * window's snip extracted incrementally (a per-window substring()
  * would seek quadratically; see PortableHash.charNgramSnips). */
case class CharNgramSnipsExpr(child: Expression, n: Int) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("wh", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("snip", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "char_ngram_snips"
  override protected def nullSafeEval(t: Any): Any =
    graft.text.PortableHash.charNgramSnips(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.text.PortableHash.charNgramSnips($t, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Trained linear quality margin (graft.text.QualityModel: hashed token
  * features x int8 fixture weights, integer dot product) — map-only,
  * one kernel call per row. */
case class QualityScoreExpr(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "quality_score"
  override protected def nullSafeEval(t: Any): Any =
    graft.text.QualityModel.score(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.text.QualityModel.score($t)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-line h64 hashes (graft.text.PortableHash.lineHashes) — the
  * 8-byte-only stats pass of boilerplate-line removal. */
case class LineHashesExpr(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "line_hashes"
  override protected def nullSafeEval(t: Any): Any =
    graft.text.PortableHash.lineHashes(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.text.PortableHash.lineHashes($t)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Boilerplate-line rewrite (graft.text.PortableHash.dropHotLines):
  * drops lines whose h64 is in the sorted hot array (binary search per
  * line; the array rides the task binary, bounded by the caller's cap)
  * and returns (clean_text, n_lines, n_kept) in one pass. */
case class DropHotLinesExpr(child: Expression, hot: Array[Long]) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("clean_text", StringType, nullable = false),
    org.apache.spark.sql.types.StructField("n_lines", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_kept", LongType, nullable = false)))
  override def prettyName: String = "drop_hot_lines"
  override protected def nullSafeEval(t: Any): Any =
    graft.text.PortableHash.dropHotLines(t.asInstanceOf[UTF8String], hot)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hotRef = ctx.addReferenceObj("hotLines", hot, "long[]")
    defineCodeGen(ctx, ev, t => s"graft.text.PortableHash.dropHotLines($t, $hotRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Trained bigram-LM total cost (graft.text.LmModel: hashed bigram
  * buckets x integer micro-log10 fixture costs) — map-only, one kernel
  * call per row; avg cost per bigram is the perplexity proxy. */
case class LmCostExpr(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "lm_cost"
  override protected def nullSafeEval(t: Any): Any =
    graft.text.LmModel.cost(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.text.LmModel.cost($t)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Learned-vocab BPE token count (graft.text.Bpe: GPT-2-format merges
  * fixture, classic greedy lowest-rank merging, memoized per word). */
case class BpeTokenCountExpr(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"
  override protected def nullSafeEval(t: Any): Any =
    graft.text.Bpe.tokenCount(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.text.Bpe.tokenCount($t)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Raw plane projections of a float embedding (the JL dimensionality
  * reduction [[RhpSigExpr]]'s sign bits quantize) — array of `planes`
  * doubles, same kernel, same DuckDB-exact fold. */
case class RhpProjectExpr(child: Expression, planes: Int) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "rhp_project"
  override protected def nullSafeEval(v: Any): Any =
    graft.text.RhpSig.projections(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.text.RhpSig.projections($v, $planes)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane sign-bit signature of a float-array embedding. */
case class RhpSigExpr(child: Expression, planes: Int) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "rhp_sig"
  override protected def nullSafeEval(v: Any): Any =
    graft.text.RhpSig.signature(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.text.RhpSig.signature($v, $planes)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Shared scoring loop for the IVF coarse quantizer: rank the (small,
 * broadcast-as-expression-constant) centroid set against one float
 * embedding by exact cosine. The FP op sequence is IDENTICAL to the
 * DuckDB oracle's `cos DESC, cid ASC` window (sequential left-to-right
 * dot folds, cos = dot / sqrt(nn * cc)), so assignments and probes
 * match bit-for-bit. NaN follows SQL descending-sort order (NaN
 * largest): comparisons use java.lang.Double.compare.
 */
private[functions] object CentroidKernel {
  /** indices of the `n` best centroids in (cos desc, cid asc) order.
    * `cids` must be ascending; selection is repeated strict-argmax so
    * equal-cos ties resolve to the smaller cid, exactly like
    * row_number() OVER (ORDER BY cos DESC, cid). */
  def rank(v: org.apache.spark.sql.catalyst.util.ArrayData,
           cvecs: Array[Array[Double]], selfDots: Array[Double], n: Int): Array[Int] = {
    val dim = v.numElements()
    var nn = 0.0
    var i = 0
    while (i < dim) { val f = v.getFloat(i).toDouble; nn += f * f; i += 1 }
    val kk = cvecs.length
    val cos = new Array[Double](kk)
    var c = 0
    while (c < kk) {
      val cv = cvecs(c)
      val m = math.min(dim, cv.length)
      var s = 0.0
      i = 0
      while (i < m) { s += v.getFloat(i).toDouble * cv(i); i += 1 }
      cos(c) = s / math.sqrt(nn * selfDots(c))
      c += 1
    }
    val used = new Array[Boolean](kk)
    val out = new Array[Int](math.min(n, kk))
    var r = 0
    while (r < out.length) {
      var best = -1
      c = 0
      while (c < kk) {
        if (!used(c) && (best < 0 || java.lang.Double.compare(cos(c), cos(best)) > 0)) best = c
        c += 1
      }
      used(best) = true
      out(r) = best
      r += 1
    }
    out
  }

  def selfDot(c: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }
}

/** Map-side IVF assignment: nearest centroid (by exact cosine, tie to
  * the smaller cid) of a float-array embedding — replaces the
  * crossJoin + Window argmax with a zero-shuffle codegen'd kernel.
  * `cids` must be sorted ascending. */
case class NearestCentroidExpr(child: Expression, cids: Seq[Long], cvecs: Seq[Seq[Double]])
    extends UnaryExpression with ExpectsInputTypes {
  // array<float> ONLY: CentroidKernel.rank reads getFloat — an
  // array<double> input would silently read half of every slot
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid"
  @transient private lazy val cv: Array[Array[Double]] = cvecs.map(_.toArray).toArray
  @transient private lazy val ids: Array[Long] = cids.toArray
  @transient private lazy val sd: Array[Double] = cv.map(CentroidKernel.selfDot)
  def assign(v: org.apache.spark.sql.catalyst.util.ArrayData): Long =
    ids(CentroidKernel.rank(v, cv, sd, 1)(0))
  override protected def nullSafeEval(v: Any): Any =
    assign(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this, classOf[NearestCentroidExpr].getName)
    defineCodeGen(ctx, ev, v => s"$ref.assign($v)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Map-side IVF probe list: the `n` nearest centroid ids in
  * (cos desc, cid asc) order — the query-side multi-probe without a
  * crossJoin or Window. `cids` must be sorted ascending. */
case class NearestCentroidsExpr(child: Expression, cids: Seq[Long], cvecs: Seq[Seq[Double]], n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_centroids"
  @transient private lazy val cv: Array[Array[Double]] = cvecs.map(_.toArray).toArray
  @transient private lazy val ids: Array[Long] = cids.toArray
  @transient private lazy val sd: Array[Double] = cv.map(CentroidKernel.selfDot)
  def probe(v: org.apache.spark.sql.catalyst.util.ArrayData): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      CentroidKernel.rank(v, cv, sd, n).map(ids))
  override protected def nullSafeEval(v: Any): Any =
    probe(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroids", this, classOf[NearestCentroidsExpr].getName)
    defineCodeGen(ctx, ev, v => s"$ref.probe($v)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
