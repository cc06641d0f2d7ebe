package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/**
 * Structured Streaming operators. The reference engine is batch-only —
 * incrementality is encode-new + merge (README.md:97-107) and is covered
 * by Snapshots.append — but a Spark-native engine also serves the
 * streaming shape of the same aggregations: windowed tile stats over an
 * event stream, and stateful sessionization.
 */
object StreamOps {
  /** Windowed per-tile counts over a streaming point source with event
    * time + watermark: the streaming analog of the enumerate rollup. */
  def streamingTileCounts(events: DataFrame, z: Int, window: String, watermark: String): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ -> instant (UTC session)
      .withWatermark("ts", watermark)
      .withColumn("tx", expr(s"x32 >> ${32 - z}"))
      .withColumn("ty", expr(s"y32 >> ${32 - z}"))
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("tx"), col("ty"))
      .agg(count(lit(1)).as("cnt"))

  case class Session(userId: Long, nEvents: Long, startTs: Long, endTs: Long)

  /** Stateful sessionization with a gap timeout (flatMapGroupsWithState):
    * closes a session when no event arrives within `gapMs`. */
  def sessionize(spark: SparkSession, events: DataFrame, gapMs: Long): DataFrame = {
    import spark.implicits._
    val typed = events.select(col("user_id").cast("long"),
      expr("unix_millis(CAST(ts AS TIMESTAMP))").cast("long"))
      .as[(Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long)], state: GroupState[Session]) =>
          val sorted = it.map(_._2).toSeq.sorted
          var cur = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
          sorted.foreach { t =>
            cur match {
              case Some(s) if t - s.endTs <= gapMs =>
                cur = Some(s.copy(nEvents = s.nEvents + 1, endTs = t))
              case Some(s) =>
                closed += s
                cur = Some(Session(uid, 1, t, t))
              case None =>
                cur = Some(Session(uid, 1, t, t))
            }
          }
          cur.foreach(state.update)
          closed.iterator
      }.toDF()
  }

  /** Streaming exact dedup: first occurrence of each content digest
    * passes, duplicates within the watermark horizon drop. State is one
    * 16-byte md5 per distinct doc and is EVICTED once the watermark
    * passes (dropDuplicatesWithinWatermark) — bounded state, the only
    * formulation that survives an unbounded 100 TB ingest stream
    * (a plain dropDuplicates would accrete state forever). */
  def streamingDedup(docs: DataFrame, watermark: String): DataFrame =
    docs
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .withColumn("text_md5", md5(col("text")))
      .dropDuplicatesWithinWatermark("text_md5")

  /** Run a streaming query over a bounded source synchronously into a
    * memory sink; returns the sink table name. */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode = OutputMode.Append): StreamingQuery = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q
  }
}
