package graft.stream

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming analytics over the change log — the Structured
  * Streaming surface beyond the reference's cron-batch model (which has no
  * watermarks/windows, SURVEY §2.9): per-repo change rates with watermarked
  * tumbling windows, and per-repo burst sessionization with custom state.
  *
  * Scale notes: the windowed agg is a streaming hash agg partial-combined
  * map-side and keyed by (window, repo) — the same shuffle discipline as the
  * batch path; state store size is bounded by the watermark (windows close
  * and evict).
  */
object ChangeRates {

  /** Tumbling event-time windows of change counts per repo. Late events
    * beyond the watermark are dropped — safe for MONITORING (the MERGE path
    * never drops: max-LSN-wins is order-free, SURVEY §2.9).
    */
  def windowedRates(events: DataFrame,
                    windowLen: String = "1 hour",
                    watermark: String = "2 hours"): DataFrame =
    events
      .filter(col("op") =!= "schema_change")
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("repo"))
      .agg(count(lit(1)).as("changes"),
        sum(when(col("op") === "delete", 1L).otherwise(0L)).as("deletes"))
      .select(col("window.start").as("window_start"), col("repo"),
        col("changes"), col("deletes"))

  final case class BurstState(start: Long, last: Long, n: Long)
  final case class Burst(repo: String, start_ts: Timestamp, end_ts: Timestamp,
                         changes: Long)

  /** Burst sessionization: consecutive changes to a repo closer than `gapMs`
    * apart form one burst. Custom state via flatMapGroupsWithState with an
    * EVENT-time timeout — the watermark closes idle bursts deterministically
    * (processing-time timeouts make replays nondeterministic). Bursts also
    * close data-driven when a same-key event arrives past the gap.
    */
  def repoBursts(spark: SparkSession, events: DataFrame, gapMs: Long = 3600000L): Dataset[Burst] = {
    import spark.implicits._
    val keyed = events
      .filter(col("op") =!= "schema_change")
      .withWatermark("ts", "10 seconds")
      .select(col("repo").as[String], col("ts").as[Timestamp])
      .groupByKey(_._1)
    keyed.flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
      (repo: String, rows: Iterator[(String, Timestamp)], state: GroupState[BurstState]) => {
        if (state.hasTimedOut) {
          val s = state.get
          state.remove()
          Iterator(Burst(repo, new Timestamp(s.start), new Timestamp(s.last), s.n))
        } else {
          val times = rows.map(_._2.getTime).toSeq.sorted
          var out = List.empty[Burst]
          var cur = state.getOption
          for (t <- times) {
            cur match {
              case Some(s) if t - s.last <= gapMs =>
                cur = Some(s.copy(last = t, n = s.n + 1))
              case Some(s) =>
                out ::= Burst(repo, new Timestamp(s.start), new Timestamp(s.last), s.n)
                cur = Some(BurstState(t, t, 1))
              case None =>
                cur = Some(BurstState(t, t, 1))
            }
          }
          cur.foreach { s =>
            state.update(s)
            state.setTimeoutTimestamp(s.last + gapMs)
          }
          out.reverseIterator
        }
      })
  }
}
