package graft.lake

/** Broadcast-able interval index over per-file (repo, path) bounding boxes.
  *
  * Files are sorted by their repo lower bound; `prefixMaxRepo[i]` carries the
  * running maximum of repo upper bounds over files[0..i]. A lookup for key
  * `(r, p)` binary-searches the last file whose lower bound ≤ r, then scans
  * backwards — stopping as soon as the prefix max drops below r, since no
  * earlier interval can reach the key. With range-clustered output files
  * (what LakeTable.merge produces) overlaps are rare and each probe is
  * O(log F + hits); the worst case (all files overlap) degrades to O(F),
  * where every file genuinely must be touched anyway.
  *
  * All string comparisons are unsigned UTF-8 byte order, matching both
  * Parquet stat order and Spark's UTF8String sort order. None bounds are
  * unbounded (always match on that side).
  */
final case class PruneIndex(entries: Array[PruneIndex.Entry]) {
  import LakeTable.{utf8Compare => cmp}

  def lookup(repo: String, path: String): Iterator[String] = {
    // binary search: last index with minRepo <= repo (None = -inf)
    var lo = 0
    var hi = entries.length - 1
    var ub = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val minOk = entries(mid).minRepo.forall(m => cmp(m, repo) <= 0)
      if (minOk) { ub = mid; lo = mid + 1 } else hi = mid - 1
    }
    new Iterator[String] {
      private var i = ub
      private var nxt: String = advance()
      private def advance(): String = {
        while (i >= 0) {
          val e = entries(i)
          // prefix max below the key → nothing earlier can contain it
          if (e.prefixMaxBounded && cmp(e.prefixMaxRepo, repo) < 0) { i = -1; return null }
          val hit =
            e.maxRepo.forall(m => cmp(repo, m) <= 0) &&
            e.minPath.forall(m => cmp(m, path) <= 0) &&
            e.maxPath.forall(m => cmp(path, m) <= 0)
          i -= 1
          if (hit) return e.path
        }
        null
      }
      def hasNext: Boolean = nxt != null
      def next(): String = { val r = nxt; nxt = advance(); r }
    }
  }
}

object PruneIndex {
  /** @param prefixMaxBounded false when any file up to this index has an
    *        unbounded repo upper bound — the backward scan may never stop
    *        early before it.
    */
  final case class Entry(
      path: String,
      minRepo: Option[String], maxRepo: Option[String],
      minPath: Option[String], maxPath: Option[String],
      prefixMaxRepo: String, prefixMaxBounded: Boolean)

  def apply(files: Seq[DataFileEntry]): PruneIndex = {
    import LakeTable.{utf8Compare => cmp}
    val sorted = files.sortWith { (a, b) =>
      (a.minRepo, b.minRepo) match {
        case (None, None) => a.path < b.path
        case (None, _) => true
        case (_, None) => false
        case (Some(x), Some(y)) => val c = cmp(x, y); if (c != 0) c < 0 else a.path < b.path
      }
    }
    var pm = ""
    var bounded = true
    val entries = sorted.map { f =>
      f.maxRepo match {
        case Some(m) => if (cmp(m, pm) > 0) pm = m
        case None => bounded = false
      }
      Entry(f.path, f.minRepo, f.maxRepo, f.minPath, f.maxPath, pm, bounded)
    }
    PruneIndex(entries.toArray)
  }
}
