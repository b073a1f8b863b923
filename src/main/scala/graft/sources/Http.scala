package graft.sources

import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets

/** Minimal injectable HTTP GET transport (SURVEY.md §2.1 S1; reference
  * `whalefinder/obis.py:17-47` wraps a `requests.Session` the same way).
  * The trait is the seam: production uses [[JdkHttp]]; tests inject a fake
  * replaying recorded responses, so the whole fetch→stage→validate path
  * runs without a network.
  */
trait Http {
  def get(url: String, params: Seq[(String, String)]): HttpResponse
}

final case class HttpResponse(status: Int, body: String)

object Http {
  /** Statuses worth retrying — the reference's `status_forcelist`
    * (`obis.py:23`).
    */
  val RetryStatuses: Set[Int] = Set(429, 500, 502, 503, 504)

  /** Raised for a retryable status so [[Retry.withRetries]] re-attempts. */
  final case class RetryableStatus(status: Int, url: String)
    extends RuntimeException(s"HTTP $status from $url")

  /** Raised for a terminal non-2xx status. */
  final case class FailedRequest(status: Int, url: String)
    extends RuntimeException(s"HTTP $status from $url")

  def encodeQuery(params: Seq[(String, String)]): String =
    params.map { case (k, v) =>
      URLEncoder.encode(k, StandardCharsets.UTF_8) + "=" +
        URLEncoder.encode(v, StandardCharsets.UTF_8)
    }.mkString("&")
}

/** Blocking transport on `java.net.HttpURLConnection` (driver-side ingest
  * planning — same place the reference runs its `requests` session; the
  * bulk data path is the staged files Spark reads, never this socket).
  */
final class JdkHttp(connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 60000)
  extends Http {
  override def get(url: String, params: Seq[(String, String)]): HttpResponse = {
    val full = if (params.isEmpty) url else s"$url?${Http.encodeQuery(params)}"
    val conn = new URI(full).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setRequestMethod("GET")
    try {
      val status = conn.getResponseCode
      val stream = if (status >= 400) conn.getErrorStream else conn.getInputStream
      val body =
        if (stream == null) ""
        else try new String(stream.readAllBytes(), StandardCharsets.UTF_8)
        finally stream.close()
      HttpResponse(status, body)
    } finally conn.disconnect()
  }
}
