package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Incremental TEXT near-dup dedup against persisted state — the text
 * analog of Media.writeImageDedupState / incrementalImageDedup, and the
 * continuous-ingest shape for a 100 TB document corpus: a new batch
 * dedups against everything ever seen WITHOUT re-tokenizing,
 * re-hashing, or re-shuffling the old corpus.
 *
 * Match semantics are EXACTLY the batch MinHash-LSH pipeline's
 * (q28/q42): two documents are near-dups iff they share any LSH band
 * key of their minhash signatures (the fused codegen kernel
 * TextOps.minhashBandKeys; ineligible docs — fewer clean chars than the
 * shingle width — are singletons). The persisted state is
 *  - `<table>` (catalog, parquet at `dir/bands`): one row per
 *    (distinct-md5 rep doc x band) — (band, band_key, text_md5, rep) —
 *    BUCKETED by band_key so incremental probes join the corpus-sized
 *    side with ZERO shuffle (read via spark.table, never read.parquet:
 *    bucket metadata lives in the catalog);
 *  - `dir/labels`: (doc_id, rep) for every doc.
 *
 * Exact duplicates (identical text — the bulk of web duplication)
 * collapse by an md5 pregroup before banding, so a million-copy
 * document contributes ONE set of band rows, never a mega-bucket; the
 * pregroup's star edges preserve connectivity, so the induced partition
 * equals the plain batch clustering's.
 *
 * Labels are STICKY and merges compose — identical semantics to the
 * image path via the shared ops.StickyLabels. Appends are serialized
 * per corpus by ops.StateLease. doc_id must be a corpus-unique Long
 * (it IS the graph node id — no separate nid hash needed).
 */
object TextDedupState {
  /** Default LSH geometry — the q28/q42 parameters. */
  final val Shingle = 5
  final val Bands = 4
  final val Rows = 4

  private def eligible(text: Column): Column =
    length(regexp_replace(text, "[^a-z ]", "")) >= Shingle

  /** (doc_id, text_md5, band, band_key) rows for the batch's
    * distinct-md5 rep docs + the pregroup star edges + the rep
    * projection. Band rows only exist for ELIGIBLE rep docs. */
  private def pregroupAndBands(docs: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val hashed = docs.select(col("doc_id").cast("long").as("doc_id"), col("text"),
      md5(col("text")).as("text_md5"))
    val groups = hashed.groupBy(col("text_md5")).agg(min(col("doc_id")).as("grep"))
    val withRep = hashed.join(groups, "text_md5").localCheckpoint(true)
    val starEdges = withRep.filter(col("doc_id") =!= col("grep"))
      .select(col("doc_id").as("a"), col("grep").as("b"))
    val reps = withRep.filter(col("doc_id") === col("grep"))
      .select(col("doc_id"), col("text"), col("text_md5"))
    val bands = reps.filter(eligible(col("text")))
      .select(col("doc_id"), col("text_md5"),
        posexplode(TextOps.minhashBandKeys(col("text"), Shingle, Bands, Rows))
          .as(Seq("band", "band_key")))
    (starEdges, reps, bands)
  }

  /** Build the persisted state: batch-cluster `docs` (md5 pregroup +
    * capped LSH pairs + connected components — the q42 partition),
    * land the bucketed band index and the labels, return the labels. */
  def writeTextDedupState(docs: DataFrame, dir: String, table: String,
                          buckets: Int): DataFrame = {
    val spark = docs.sparkSession
    val (starEdges, reps, bands) = pregroupAndBands(docs)
    val pairs = TextOps.cappedCandidatePairs(
      bands.select(col("doc_id"), col("band_key")), "band_key", cap = 64)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val comp = graft.ops.Components.connectedComponents(starEdges.unionByName(pairs))
      .withColumnRenamed("node", "doc_id")
    val labels = docs.select(col("doc_id").cast("long").as("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("rep"), col("doc_id")).as("rep"))
      .localCheckpoint(true)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    bands
      .join(labels, "doc_id")
      .select(col("band"), col("band_key"), col("text_md5"), col("rep"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "band_key").sortBy("band_key")
      .option("path", s"$dir/bands").saveAsTable(table)
    labels.write.mode("overwrite").parquet(s"$dir/labels")
    labels
  }

  /** Dedup a NEW batch against the persisted band index WITHOUT
    * touching the old corpus: within the batch, the full md5-pregroup +
    * capped-LSH clustering; across the boundary, the batch's rep band
    * keys probe the BUCKETED index (corpus side never shuffles; only
    * (doc_id, band_key) rows do) — a shared band key IS a match, the
    * same criterion the batch pipeline uses, so boundary semantics
    * equal re-clustering the union. Old labels are sticky; bridges
    * emit merges (see ops.StickyLabels). Returns (labels(doc_id, rep),
    * merges(rep_a, merged_rep)). */
  def incrementalTextDedup(newDocs: DataFrame, bandsTable: String):
      (DataFrame, DataFrame) = {
    val spark = newDocs.sparkSession
    val (starEdges, _, bands) = pregroupAndBands(newDocs)
    val bandsC = bands.localCheckpoint(true) // feeds pairs + the probe
    val pairs = TextOps.cappedCandidatePairs(
      bandsC.select(col("doc_id"), col("band_key")), "band_key", cap = 64)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    // boundary probe: batch band keys join the bucketed index; the hit
    // set is candidate-sized and checkpointed — the edge list AND the
    // old-rep set both derive from it, and nothing ever scans the
    // index in full
    val probeHits = bandsC.select(col("doc_id"), col("band_key"))
      .join(spark.table(bandsTable).select(col("band_key"), col("rep")), "band_key")
      .select(col("doc_id"), col("rep"))
      .distinct()
      .localCheckpoint(true)
    val newOldEdges = probeHits.select(col("doc_id").as("a"), col("rep").as("b"))
    val oldReps = probeHits.select(col("rep").as("rep_nid"), col("rep")).distinct()
    val comp = graft.ops.Components.connectedComponents(
      starEdges.unionByName(pairs).unionByName(newOldEdges))
    val ids = newDocs.select(col("doc_id").cast("long").as("doc_id"))
      .withColumn("nid", col("doc_id"))
    graft.ops.StickyLabels.resolve(comp, oldReps, ids, "doc_id")
  }

  /** Fold a processed batch into the state so the NEXT batch sees it:
    * append band rows for the batch's distinct-md5 rep docs whose text
    * is NOT already indexed (presence = exact text_md5 match through
    * the band-0 bucket join — identical texts share every band key, so
    * one band suffices and the corpus side stays shuffle-free),
    * labeled with the batch's FINAL reps; plus the labels (skippable
    * via `writeLabels` for callers with their own idempotent label
    * sink). Single-writer per corpus, enforced by ops.StateLease. */
  def appendTextDedupState(newDocs: DataFrame, newLabels: DataFrame,
                           bandsTable: String, dir: String, buckets: Int,
                           writeLabels: Boolean = true): Unit = {
    val lease = graft.ops.StateLease.acquire(dir)
    try {
      val spark = newDocs.sparkSession
      val (_, _, bands) = pregroupAndBands(newDocs)
      val bandsC = bands.localCheckpoint(true)
      val idx0 = spark.table(bandsTable).filter(col("band") === 0)
        .select(col("band_key"), col("text_md5").as("old_md5"))
      val fresh = bandsC.filter(col("band") === 0)
        .join(idx0, Seq("band_key"), "left")
        .groupBy(col("doc_id"), col("text_md5"))
        .agg(max(when(col("old_md5") === col("text_md5"), 1).otherwise(0)).as("present"))
        .filter(col("present") === 0)
        .select(col("doc_id"))
      bandsC.join(fresh, "doc_id")
        .join(newLabels.select(col("doc_id").cast("long").as("doc_id"), col("rep")), "doc_id")
        .select(col("band"), col("band_key"), col("text_md5"), col("rep"))
        .write.mode("append").format("parquet")
        .bucketBy(buckets, "band_key").sortBy("band_key")
        .option("path", s"$dir/bands").saveAsTable(bandsTable)
      if (writeLabels) newLabels.write.mode("append").parquet(s"$dir/labels")
    } finally graft.ops.StateLease.release(lease)
  }
}
