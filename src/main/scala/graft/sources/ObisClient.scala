package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** OBIS REST ingest client (SURVEY.md §2.1 S1–S2; reference
  * `whalefinder/obis.py`): statistics-driven batched occurrence fetch with
  * retry/backoff on 429/5xx, 1-request/s pacing, and JSON staging files
  * named `start--end.json` per fetch window.
  *
  * Everything impure is injected — transport ([[Http]]), sleeper — so the
  * full policy surface (retry schedule, pacing, window planning, staging
  * layout) is testable offline. [[Retry]] supplies the backoff schedule
  * (`obis.py:23` — 5 retries, backoff factor 1) and [[BatchPlanner]] the
  * fetch-window packing (`obis.py:166-203`). The staged files feed
  * [[Staging.readJson]] with a DECLARED schema, then validation — the
  * reference's fetch→stage→validate chain.
  *
  * @param http      transport (production: [[JdkHttp]]; tests: a fake)
  * @param baseUrl   API root (`obis.py:21`)
  * @param sleep     injected sleeper for backoff + pacing
  */
final class ObisClient(
    http: Http,
    baseUrl: String = "https://api.obis.org/v3",
    sleep: Long => Unit = Thread.sleep,
    retrySchedule: Seq[Long] = Retry.backoffSchedule(5, 1000, 60000),
    rateLimitMs: Long = 1000) {

  /** GET with retry on 429/5xx and the reference's fixed post-request
    * pause (`obis.py:44` — `time.sleep(1.0)` after every request).
    */
  def request(endpoint: String, params: Seq[(String, String)]): String = {
    val url = s"$baseUrl/$endpoint"
    val retryable: Exception => Boolean = {
      case _: Http.RetryableStatus => true
      case _: java.io.IOException => true // connection errors, like requests'
      case _ => false                     // adapter; 4xx is terminal
    }
    val body = Retry.withRetries(retrySchedule, sleep, retryable) { () =>
      val r = http.get(url, params)
      if (Http.RetryStatuses(r.status)) throw Http.RetryableStatus(r.status, url)
      if (r.status < 200 || r.status >= 300) throw Http.FailedRequest(r.status, url)
      r.body
    }
    sleep(rateLimitMs)
    body
  }

  /** Per-year record counts from `/statistics/years` (`obis.py:78-101`).
    * Empty start/end params are omitted, matching `requests`' handling of
    * the reference's always-present-but-possibly-empty params.
    */
  def yearStats(scientificName: String, startdate: String, enddate: String)
      : Seq[(Int, Long)] = {
    val params = Seq("scientificname" -> scientificName) ++
      Option(startdate).filter(_.nonEmpty).map("startdate" -> _) ++
      Option(enddate).filter(_.nonEmpty).map("enddate" -> _)
    val body = request("statistics/years", params)
    new ObjectMapper().readTree(body).elements().asScala
      .map { n =>
        // a 2xx body that is not the expected [{year, records}] array
        // (error envelope, metadata object) must be a descriptive
        // failure, not an NPE deep in Jackson accessors
        require(n.hasNonNull("year") && n.hasNonNull("records"),
          s"unexpected statistics/years element: $n")
        (n.get("year").asInt(), n.get("records").asLong())
      }
      .toSeq
  }

  /** `YYYY` → `YYYY-01-01`/`YYYY-12-31` date widening (`obis.py:103-122`). */
  def makeDateFormat(start: String, end: String): (String, String) = {
    val full = "\\d{4}-\\d{2}-\\d{2}.*".r
    val s = start match { case full() => start; case _ => s"$start-01-01" }
    val e = end match { case full() => end; case _ => s"$end-12-31" }
    (s, e)
  }

  /** Fetch one occurrence window and stage it as
    * `{dataDir}/{whale}/{start}--{end}.json` (`obis.py:124-164`).
    * Returns the staged file path.
    */
  def fetchOccurrences(scientificName: String, whale: String,
      startdate: String, enddate: String, size: Long, dataDir: String): String = {
    val (s, e) = makeDateFormat(startdate, enddate)
    val body = request("occurrence", Seq(
      "scientificname" -> scientificName, "startdate" -> s, "enddate" -> e,
      "size" -> size.toString))
    val dir = Paths.get(dataDir, whale)
    Files.createDirectories(dir)
    val file = dir.resolve(s"$s--$e.json")
    Files.write(file, body.getBytes(StandardCharsets.UTF_8))
    file.toString
  }

  /** The reference's batched ingest (`obis.py:166-203`): one request when
    * the total fits `size`; otherwise [[BatchPlanner.planBatches]] packs
    * per-year counts into ≤`size` windows (oversized years isolated —
    * `obis.py:141-147`), the first window honoring a caller-supplied
    * startdate and the last a caller-supplied enddate. Documented
    * deviation: when the FIRST year is itself oversized, the reference
    * silently drops the caller's startdate (`obis.py:141-147` requests
    * `year--year`); here the dedicated window still starts at the
    * caller's bound. Returns the staged file paths in fetch order.
    */
  def batchRequests(scientificName: String, whale: String,
      startdate: String, enddate: String, size: Long, dataDir: String)
      : Seq[String] = {
    val stats = yearStats(scientificName, startdate, enddate)
    require(stats.nonEmpty, s"no year statistics for $scientificName")
    val total = stats.map(_._2).sum
    // empty bounds default to the earliest/latest years seen
    // (obis.py:95-98) — min/max, never head/last: the API's ordering is
    // not a contract (planBatches sorts internally), and an unsorted
    // response would otherwise invert the first window's date range and
    // silently fetch nothing for it
    val start = if (startdate.nonEmpty) startdate else stats.map(_._1).min.toString
    val end = if (enddate.nonEmpty) enddate else stats.map(_._1).max.toString
    if (size >= total)
      return Seq(fetchOccurrences(scientificName, whale, start, end, size, dataDir))
    val windows = BatchPlanner.planBatches(stats, size)
    windows.zipWithIndex.map { case ((from, to), i) =>
      val s = if (i == 0) start else from.toString
      val e = if (i == windows.size - 1) end else to.toString
      fetchOccurrences(scientificName, whale, s, e, size, dataDir)
    }
  }
}
