package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton-curve) clustering for [[LakeTable.compact]].
  *
  * Range clustering on (repo, path) gives perfect manifest pruning on the
  * leading key and none on anything else: every file spans a repo range, so
  * a `lang = 'scala'` predicate overlaps every file's lang bounding box and
  * [[LakeTable.readWhere]] cannot drop a single file. Z-ordering instead
  * sorts the rewrite set by the INTERLEAVED BITS of per-column bucket ranks,
  * so each output file covers a small hyper-rectangle of the clustered
  * dimensions — every clustered column's per-file min/max tightens at once,
  * and a single-column predicate on ANY of them prunes (the Delta
  * `OPTIMIZE ... ZORDER BY` / Iceberg sort-order analog, re-derived over
  * this table format's manifest bounding boxes; reference layout context:
  * `/root/reference/src/flows/oryx.py:37-39` sorts releases by dimension
  * columns for exactly this kind of consumer-side selectivity).
  *
  * Bucket ranks come from SAMPLED per-column range boundaries — the same
  * sample-then-split scheme Spark's own RangePartitioner uses, sized at
  * [[sampleTarget]] rows regardless of table size — so the rank expression
  * is a literal when-chain: codegen-friendly, no UDF, no extra shuffle
  * beyond the repartitionByRange the compaction rewrite already pays, and
  * the sampling pass reads only the clustered columns (columnar scan).
  * Clustering quality degrades gracefully with sample error; correctness
  * never depends on it (the z-value only orders rows).
  */
object ZOrder {

  /** 16 buckets per dimension: at file granularity, pruning can never be
    * finer than file count, and 4 bits × up to 4 columns keeps the z-value
    * a small long while giving each dimension 1/16 selectivity headroom.
    */
  val bitsPerColumn = 4

  val maxColumns = 4

  /** Rows sampled to derive bucket boundaries (driver-side; a few hundred
    * KB at most — same order as RangePartitioner's reservoir).
    */
  val sampleTarget = 20000L

  /** The z-value column for `df` clustered on `cols`, or None when the
    * sample yields no boundaries at all (empty or all-null rewrite set) —
    * the caller falls back to plain key-range clustering. `totalRows` sizes
    * the sample fraction (callers have it from manifest row counts; no
    * count job).
    */
  def zColumn(df: DataFrame, cols: Seq[String], totalRows: Long): Option[Column] = {
    require(cols.nonEmpty && cols.size <= maxColumns,
      s"zorder supports 1..$maxColumns columns, got ${cols.size}")
    val names = df.schema.fieldNames.toSet
    val missing = cols.filterNot(names.contains)
    require(missing.isEmpty, s"zorder columns not in schema: ${missing.mkString(", ")}")
    val bs = boundaries(df, cols, totalRows)
    if (bs.values.forall(_.isEmpty)) None
    else Some(zValue(cols.map(c => bucketExpr(col(c), bs(c))), bitsPerColumn))
  }

  /** Per-column ascending boundary values from ONE deterministic sample job
    * over just the clustered columns. At most 2^bits − 1 boundaries each,
    * deduped (skewed samples collapse to fewer, coarser buckets — harmless).
    */
  private[lake] def boundaries(df: DataFrame, cols: Seq[String],
                               totalRows: Long): Map[String, Seq[Any]] = {
    val frac = math.min(1.0, sampleTarget.toDouble / math.max(1L, totalRows))
    val rows = df.select(cols.map(col): _*)
      .sample(withReplacement = false, frac, seed = 42L)
      .collect()
    val buckets = 1 << bitsPerColumn
    cols.zipWithIndex.map { case (c, i) =>
      val sorted = sortValues(rows.iterator.map(_.get(i)).filter(_ != null).toArray)
      val n = sorted.length
      val bs =
        if (n == 0) Seq.empty[Any]
        else (1 until buckets).map(k => sorted(((k.toLong * n) / buckets).toInt))
          .foldLeft(Vector.empty[Any])((acc, v) =>
            if (acc.nonEmpty && acc.last == v) acc else acc :+ v)
      c -> (bs: Seq[Any])
    }.toMap
  }

  /** Sort sampled values in the order Spark's `>=` will compare them in the
    * bucket expression: unsigned-UTF8 for strings (JVM compareTo is UTF-16
    * code-unit order, which diverges on supplementary planes), natural for
    * numerics and timestamps.
    */
  private def sortValues(vs: Array[Any]): Array[Any] =
    if (vs.isEmpty) vs
    else vs(0) match {
      case _: String =>
        vs.map(_.asInstanceOf[String])
          .sortWith(LakeTable.utf8Compare(_, _) < 0).toArray[Any]
      case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short =>
        vs.sortBy(_.asInstanceOf[java.lang.Number].longValue)
      case _: java.lang.Double | _: java.lang.Float =>
        vs.sortBy(_.asInstanceOf[java.lang.Number].doubleValue)
      case _: java.sql.Timestamp =>
        vs.sortBy(_.asInstanceOf[java.sql.Timestamp].getTime)
      case other => throw new IllegalArgumentException(
        s"zorder: unsupported column type ${other.getClass.getName}")
    }

  /** Bucket rank of `c` against ascending `bs`: the count of boundaries ≤
    * the value, as a literal when-chain (nulls rank 0 — they cluster with
    * the low edge, and parquet min/max ignores nulls so they cannot widen
    * any file's bounds).
    */
  private[lake] def bucketExpr(c: Column, bs: Seq[Any]): Column =
    bs.zipWithIndex.foldLeft(lit(0)) { case (acc, (b, i)) =>
      when(c.isNotNull && c >= lit(b), lit(i + 1)).otherwise(acc)
    }

  /** Interleave `bits` low bits of each bucket rank: bit `i` of column `j`
    * lands at z-bit `i*n + j` (already at position `i`, so shift by
    * `i*(n−1)+j`). Positions are disjoint, so the sum is the bitwise OR.
    */
  private[lake] def zValue(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    val terms = for { j <- 0 until n; i <- 0 until bits }
      yield shiftleft(buckets(j).cast(LongType).bitwiseAND(lit(1L << i)),
        i * (n - 1) + j)
    terms.reduce(_ + _)
  }
}
