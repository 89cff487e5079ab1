package graft.domain

import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One pending download. */
final case class FetchTask(url_hash: String, url: String, evidence_source: String)

/** One resolved download row (the fetch output schema). */
final case class FetchedRow(
    url_hash: String, url: String, evidence_source: String,
    media_key: String, file_type: String, status: String, attempts: Int)

/** Bounded-concurrency media fetch with a per-source handler registry —
  * Borderlands src/borderlands/media.py:155-210 (semaphore(10) download with
  * retries), :213-285 (evidence_source_handler registry), :319-342 (dispatch;
  * sources without a handler pass through).
  *
  * Spark-first shape: the null-split (P2) keeps already-downloaded rows out
  * of the fetch path entirely; pending rows route through ONE mapPartitions
  * where a fixed pool of `concurrency` threads plays the reference's
  * anyio.Semaphore — per TASK, which is the unit that scales out, so a
  * 1000-executor run fetches at 1000×concurrency without any driver loop.
  * Failures retry with backoff and then SKIP (status="failed") rather than
  * poison the job (T6). I/O is injected via the handler functions; the stub
  * handler here is deterministic (no egress in this environment).
  */
object MediaFetch extends Serializable {

  type Handler = FetchTask => (String, String) // url -> (media_key, file_type); may throw

  /** Deterministic stub downloader: media key `media/{source}/{hash}{ext}`
    * (reference path shape, media.py:189), extension inferred from the URL
    * with a ".bin" fallback. `failing` simulates unreachable URLs.
    */
  def stubHandler(failing: String => Boolean = _ => false): Handler = { t =>
    if (failing(t.url)) throw new java.io.IOException(s"stub: unreachable ${t.url}")
    val ext = "(\\.[A-Za-z0-9]{1,5})$".r.findFirstIn(t.url).getOrElse(".bin")
    (s"media/${t.evidence_source}/${t.url_hash}$ext", ext)
  }

  /** Dispatch + fetch. Input needs columns (url_hash, url, evidence_source,
    * media_key, file_type); output is the FetchedRow schema:
    *  - rows with a media_key: passed through untouched (status "cached")
    *  - rows whose source has no registered handler: passed through
    *    (status "no_handler")
    *  - the rest: fetched under bounded concurrency with `maxAttempts`
    *    retries (status "fetched" or "failed")
    */
  def fetchAll(
      df: DataFrame,
      handlers: Map[String, Handler],
      concurrency: Int = 10,
      maxAttempts: Int = 3,
      backoffMs: Long = 0L,
      attemptTimeoutMs: Long = 30000L): DataFrame = {
    require(concurrency >= 1 && maxAttempts >= 1 && attemptTimeoutMs >= 1)
    val spark = df.sparkSession
    import spark.implicits._

    val base = df.select(col("url_hash"), col("url"), col("evidence_source"),
      col("media_key"), col("file_type"))
    val (downloaded, pending) = MediaOps.splitDownloaded(base)
    val handled = handlers.keySet.toSeq
    val cached = downloaded
      .withColumn("status", lit("cached")).withColumn("attempts", lit(0))
    val noHandler = pending.filter(!col("evidence_source").isin(handled.map(lit): _*))
      .withColumn("status", lit("no_handler")).withColumn("attempts", lit(0))

    val toFetch = pending.filter(col("evidence_source").isin(handled.map(lit): _*))
      .select(col("url_hash"), col("url"), col("evidence_source"))
      .as[FetchTask]
    val fetched: Dataset[FetchedRow] = toFetch.mapPartitions { it =>
      // fixed pool per task = the semaphore: at most `concurrency` downloads
      // RUN at once, and a sliding window of ≤ 2×concurrency futures is ever
      // materialized — a huge pending partition streams through instead of
      // holding every row's future simultaneously (the previous .toList
      // shape). Results are yielded in submission order; daemon threads plus
      // a task-completion listener keep an un-drained iterator (e.g. under a
      // LIMIT) from leaking the pool.
      val tf = new java.util.concurrent.ThreadFactory {
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, "graft-media-fetch"); t.setDaemon(true); t
        }
      }
      val pool = Executors.newFixedThreadPool(concurrency, tf)
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      // ONE handler call per future; the retry/skip decision happens at the
      // dequeue site, so a handler that BLOCKS (wedged socket) — not just one
      // that throws — is bounded by `attemptTimeoutMs` per attempt and feeds
      // the SAME retry-then-failed path. A timed-out call's thread is leaked
      // in the daemon pool (arbitrary handler I/O cannot be interrupted
      // safely); the pool is per-Spark-task and reaped by the
      // task-completion listener, so a wedge costs one slot, not the job.
      def submit(t: FetchTask, n: Int): (FetchTask, Int, Future[(String, String)]) =
        (t, n, Future {
          if (n > 1 && backoffMs > 0) Thread.sleep(backoffMs << (n - 2)) // exponential
          handlers(t.evidence_source)(t)
        })
      val window = concurrency * 2
      val inFlight =
        scala.collection.mutable.Queue.empty[(FetchTask, Int, Future[(String, String)])]
      new Iterator[FetchedRow] {
        def hasNext: Boolean = inFlight.nonEmpty || it.hasNext
        @annotation.tailrec
        def next(): FetchedRow = {
          while (it.hasNext && inFlight.size < window) {
            val t = it.next() // pull on THIS thread: the source iterator is
            inFlight.enqueue(submit(t, 1)) // not safe inside the pool
          }
          val (t, n, f) = inFlight.dequeue()
          val outcome =
            try Right(Await.result(f, Duration(attemptTimeoutMs,
              java.util.concurrent.TimeUnit.MILLISECONDS)))
            catch {
              case _: java.util.concurrent.TimeoutException => Left(())
              case scala.util.control.NonFatal(_) => Left(())
            }
          outcome match {
            case Right((key, ext)) =>
              if (!hasNext) pool.shutdown()
              FetchedRow(t.url_hash, t.url, t.evidence_source, key, ext, "fetched", n)
            case Left(_) if n < maxAttempts =>
              inFlight.enqueue(submit(t, n + 1)) // retry goes to the back
              next()
            case Left(_) =>
              if (!hasNext) pool.shutdown()
              FetchedRow(t.url_hash, t.url, t.evidence_source, null, null, "failed", n)
          }
        }
      }
    }

    fetched.toDF().unionByName(cached).unionByName(noHandler)
  }
}
