package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed connected components over an edge list, for collapsing
 * near-duplicate pair graphs (MinHash/SimHash/embedding LSH output)
 * into clusters: every node gets the component's minimum id as its
 * representative, so "keep one doc per duplicate cluster" is a single
 * `filter(doc_id === rep)` afterwards.
 *
 * Algorithm: alternating large-star / small-star (Kiveris et al.,
 * "Connected Components in MapReduce and Beyond", SoCC'14) — the
 * published O(log^2 n)-round MapReduce formulation. Each round is two
 * Long-key aggregations + one equi-join; no adjacency list ever
 * materializes in one task, so a 10^12-edge graph shuffles only
 * (Long, Long) rows hashed across the cluster. Rounds localCheckpoint
 * eagerly (lineage would otherwise double per iteration), and
 * convergence is an O(1)-row checksum action per round, not a diff join.
 */
object Components {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Telemetry from the most recent [[connectedComponents]] call in this
    * JVM: (round, edge count after the round) per distributed star
    * round; empty when the driver fast path ran. A pathological giant
    * component (everything near-dup of everything) maximizes round
    * count, so ops monitors round growth here / in the logs rather than
    * discovering it as an unexplained wall-clock cliff. */
  @volatile var lastRoundStats: Seq[(Int, Long)] = Nil

  /** large-star: every neighbor v > u re-parents to m(u) = min(N(u) ∪ {u}).
    * Input/output edges are (a, b) Long columns, orientation-free. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("a").as("u"), col("b").as("v"))
      .unionByName(edges.select(col("b").as("u"), col("a").as("v")))
    val m = sym.groupBy("u").agg(min(col("v")).as("minv"))
      .select(col("u"), least(col("u"), col("minv")).as("m"))
    sym.filter(col("v") > col("u"))
      .join(m, "u")
      .select(col("v").as("a"), col("m").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** small-star: orient (max, min); every small neighbor and u itself
    * re-parent to the minimum neighbor. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges.select(
      greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v"))
    val m = oriented.groupBy("u").agg(min(col("v")).as("m"))
    val moved = oriented.join(m, "u")
      .select(col("v").as("a"), col("m").as("b"))
      .filter(col("a") =!= col("b"))
    moved.unionByName(m.select(col("u").as("a"), col("m").as("b"))).distinct()
  }

  /** Order-independent O(1) fingerprint of an edge set: (count, xor of
    * row hashes). Equal fingerprints across a round == converged (the
    * star transforms only ever move edges toward the component min, so
    * a stable set is the fixpoint, not a coincidence). */
  private def fingerprint(edges: DataFrame): (Long, Long) = {
    val r = edges.agg(
      count(lit(1)).as("n"),
      coalesce(bit_xor(xxhash64(col("a"), col("b"))), lit(0L)).as("h")).head()
    (r.getLong(0), r.getLong(1))
  }

  /**
   * Connected components of the undirected graph in `edges` (columns
   * `a`, `b`: Long node ids). Returns (node, rep) for every node that
   * appears in an edge; rep = min node id of its component. Callers
   * join this back to the full entity table and coalesce(rep, id) for
   * singletons.
   */
  def connectedComponents(edges: DataFrame, maxIter: Int = 32,
                          smallGraphEdges: Long = 1L << 20): DataFrame = {
    var cur = edges.select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    var fp = fingerprint(cur)
    lastRoundStats = Nil
    val inputEdges = fp._1
    // Small-graph fast path: a pair graph that fits on the driver skips
    // the ~6-shuffle-per-round distributed loop (same move Spark itself
    // makes when it broadcasts a small join side). The distributed path
    // below is the 100 TB shape; ComponentsSpec exercises both.
    if (fp._1 <= smallGraphEdges) {
      val spark = edges.sparkSession
      import spark.implicits._
      val parent = scala.collection.mutable.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      cur.select("a", "b").as[(Long, Long)].toLocalIterator().forEachRemaining {
        case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val out = parent.keysIterator.map(v => (v, find(v))).toSeq ++
        parent.values.map(r => { val rr = find(r); (rr, rr) }).toSeq.distinct
      return out.distinct.toDF("node", "rep")
        .groupBy("node").agg(min(col("rep")).as("rep"))
    }
    var it = 0
    var converged = cur.isEmpty
    while (!converged && it < maxIter) {
      val next = smallStar(largeStar(cur)).localCheckpoint(true)
      val nfp = fingerprint(next)
      converged = nfp == fp
      fp = nfp
      cur = next
      it += 1
      lastRoundStats = lastRoundStats :+ (it, nfp._1)
      log.info(s"connectedComponents round $it: ${nfp._1} edges (input $inputEdges)")
      // star rounds can transiently inflate the edge set; sustained
      // blow-up is the giant-component signature — surface it loudly
      if (nfp._1 > 8 * inputEdges)
        log.warn(s"connectedComponents round $it edge count ${nfp._1} exceeds 8x the " +
          s"input ($inputEdges): likely a giant component; expect many more rounds")
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    // fixpoint is a star forest oriented (member -> min): a is the node,
    // b the representative; roots themselves appear only on the b side
    cur.select(col("a").as("node"), col("b").as("rep"))
      .unionByName(cur.select(col("b").as("node"), col("b").as("rep")))
      .groupBy("node").agg(min(col("rep")).as("rep"))
  }
}
