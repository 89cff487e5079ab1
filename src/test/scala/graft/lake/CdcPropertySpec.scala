package graft.lake

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.events.{EventLog, ReplayOracle}

/** Property-style engine checks (SURVEY.md §5): across random generator
  * configs and random batch splits, replay through LakeTable.merge must equal
  * the plain-Scala oracle fold — including shuffled within-batch order and
  * every saltBuckets strategy.
  */
class CdcPropertySpec extends SparkSuite {

  test("random configs × random splits × dedup strategies ≡ oracle") {
    val rnd = new scala.util.Random(2026)
    for (trial <- 0 until 5) {
      val n = 1500 + rnd.nextInt(1500)
      val cfg = EventLog.Config(
        numEvents = n,
        numRepos = 5 + rnd.nextInt(30),
        pathsPerRepo = 5 + rnd.nextInt(40),
        zipfExponent = 0.8 + rnd.nextDouble(),
        updateRatio = 0.3 + rnd.nextDouble() * 0.4,
        deleteRatio = rnd.nextDouble() * 0.15,
        duplicateRate = rnd.nextDouble() * 0.1,
        schemaChangeLsns = Seq(rnd.nextInt(n).toLong, rnd.nextInt(n).toLong),
        // a random widen lsn: sometimes after the stars add (metadata-only
        // int→long widening mid-replay), sometimes before it (quarantined as
        // unknown column) — both orderings must replay identically to the
        // oracle under every batch split and dedup strategy
        widenLsns = Seq(rnd.nextInt(n).toLong),
        // random drop/rename lsns: depending on where they land relative to
        // the adds they either APPLY (metadata-only drop with re-add
        // tombstone; era-gated value-preserving rename) or QUARANTINE
        // (unknown column / collision) — engine and oracle must agree under
        // every split either way
        dropLsns = Seq(rnd.nextInt(n).toLong),
        renameLsns = Seq(rnd.nextInt(n).toLong),
        seed = rnd.nextLong())
      val events = EventLog.generate(spark, cfg).collect().toSeq
      val want = ReplayOracle.expected(spark, events)

      // WAL-shaped batching: contiguous LSN ranges (a binlog delivers DDL in
      // order — a schema change can never trail higher-LSN data), but order
      // WITHIN each batch is arbitrary (parallel readers), so shuffle it
      val sorted = events.sortBy(r => (r.getLong(0), r.getLong(1)))
      val nBatches = 1 + rnd.nextInt(4)
      val splits = sorted.grouped(math.max(1, sorted.size / nBatches)).toSeq
        .map(rnd.shuffle(_))
      // deterministic sweep: every strategy (incl. -2 adaptive) each run
      val salt = Seq(-2, -1, 0, 1, 4)(trial % 5)

      val t = new LakeTable(spark, tmpDir(s"prop$trial"))
      t.create(LakeTable.baseSchema)
      splits.zipWithIndex.foreach { case (rows, i) =>
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 3), EventLog.eventSchema)
        t.merge(df, "prop", i.toLong, saltBuckets = salt)
      }
      val got = t.read()
      assert(got.schema.fieldNames.toSeq === want.schema.fieldNames.toSeq,
        s"trial=$trial salt=$salt")
      val extra = got.exceptAll(want).count()
      val missing = want.exceptAll(got).count()
      assert(extra === 0 && missing === 0,
        s"trial=$trial salt=$salt batches=${splits.size} extra=$extra missing=$missing")
    }
  }
}
