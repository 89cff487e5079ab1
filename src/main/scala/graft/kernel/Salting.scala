package graft.kernel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase salted dedup for hot keys (SURVEY.md §7.4).
  *
  * AQE's skew-join splitting does not help window functions: a window over
  * `(repo, path)` puts every event of a hot repo in one task. Phase 1 adds a
  * deterministic salt derived from the ORDER columns (so it is stable under
  * re-execution) and reduces each `(key, salt)` cell to its max-order row —
  * at most `saltBuckets` survivors per key, spread over `saltBuckets`× more
  * partitions. Phase 2 runs the plain window on the tiny survivor set.
  *
  * Both phases keep whole rows (no struct packing) and stay in whole-stage
  * codegen except the window sorts themselves.
  */
object Salting {

  /** Max-order-wins dedup with a skew strategy dial. `ordCols` highest tuple
    * wins; order must be total for determinism (callers pass (lsn, event_id)).
    *
    * @param saltBuckets  -2 → ADAPTIVE: probe the batch for its hottest key
    *                     (chooseSaltBuckets) and pick the bucket count —
    *                     window semantics with skew sized from the data;
    *                     ≤0 → hash-agg dedup (map-side partial combine — the
    *                     default engine path; hot keys collapse before the
    *                     shuffle, no salting needed);
    *                     1 → plain single window;
    *                     >1 → two-phase salted window (for comparison and for
    *                     callers needing window semantics under skew)
    */
  def dedupSalted(
      df: DataFrame,
      keyCols: Seq[String],
      ordCols: Seq[Column],
      saltBuckets: Int): DataFrame = {
    if (saltBuckets == -2) {
      dedupSalted(df, keyCols, ordCols, chooseSaltBuckets(df, keyCols))
    } else if (saltBuckets <= 0) {
      ChangeOps.dedupLastWinsAgg(df, keyCols, ordCols)
    } else if (saltBuckets == 1) {
      ChangeOps.dedupLastWins(df, keyCols, ordCols)
    } else {
      val salt = pmod(xxhash64(ordCols: _*), lit(saltBuckets.toLong))
      val salted = df.withColumn("__salt", salt)
        .repartition((keyCols.map(col) :+ col("__salt")): _*)
      val w1 = Window.partitionBy((keyCols.map(col) :+ col("__salt")): _*)
        .orderBy(ordCols.map(_.desc): _*)
      val survivors = salted.withColumn("__rn", row_number().over(w1))
        .filter(col("__rn") === 1).drop("__rn", "__salt")
      ChangeOps.dedupLastWins(survivors, keyCols, ordCols)
    }
  }

  /** Pick a salt bucket count from an approximate hot-key probe: sample the
    * batch, look at the max per-key share, and size buckets so the hottest
    * key's expected per-task row count stays near the mean. Cheap (sampled
    * local agg) and good enough — dedup is correct for any bucket count.
    */
  def chooseSaltBuckets(df: DataFrame, keyCols: Seq[String],
                        targetPerBucket: Long = 500000L,
                        sampleRate: Double = 0.01): Int = {
    require(sampleRate > 0 && sampleRate <= 1, s"sampleRate $sampleRate")
    val sample = df.sample(sampleRate, 42L)
    val top = sample.groupBy(keyCols.map(col): _*).count()
      .agg(max("count")).collect()(0)
    if (top.isNullAt(0)) 1
    else {
      // un-sample by the ACTUAL rate — deriving the factor from the rate
      // keeps the estimate right if someone tunes one constant later
      val hottest = math.round(top.getLong(0) / sampleRate)
      math.min(64, math.max(1, (hottest / targetPerBucket).toInt))
    }
  }
}
