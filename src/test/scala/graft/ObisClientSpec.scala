package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Http, HttpResponse, ObisClient, Staging}
import graft.validate.Validation

/** Offline end-to-end of the OBIS REST ingest (S1): a fake transport
  * replays recorded-shape responses and the client's retry, pacing,
  * window-planning, and staging behavior is pinned; the staged files then
  * flow through declared-schema JSON read + validation — the reference's
  * fetch→stage→validate chain without a network.
  */
class ObisClientSpec extends AnyFunSuite with SparkSpec {

  /** Scripted fake: pops the head response per URL prefix, records every
    * request and sleep.
    */
  private class FakeHttp(script: Seq[(String, HttpResponse)]) extends Http {
    val requests = mutable.Buffer.empty[(String, Seq[(String, String)])]
    private val remaining = mutable.Queue(script: _*)
    override def get(url: String, params: Seq[(String, String)]): HttpResponse = {
      requests += ((url, params))
      val (expectUrl, resp) = remaining.dequeue()
      assert(url.endsWith(expectUrl), s"expected $expectUrl, got $url")
      resp
    }
  }

  private def statsJson(years: (Int, Long)*): String =
    years.map { case (y, r) => s"""{"year":$y,"records":$r}""" }
      .mkString("[", ",", "]")

  private def occJson(ids: String*): String =
    ids.map { id =>
      s"""{"occurrenceID":"$id","eventDate":"2001-05-10","decimalLatitude":10.0,
         |"decimalLongitude":20.0,"species":"Orcinus orca","speciesid":137102}"""
        .stripMargin.replace("\n", "")
    }.mkString("""{"results":[""", ",", "]}")

  test("retry/backoff on 429/5xx, then success; pacing after each request") {
    val sleeps = mutable.Buffer.empty[Long]
    val fake = new FakeHttp(Seq(
      "statistics/years" -> HttpResponse(503, ""),
      "statistics/years" -> HttpResponse(429, ""),
      "statistics/years" -> HttpResponse(200, statsJson(2000 -> 10L))))
    val client = new ObisClient(fake, sleep = sleeps.append(_),
      retrySchedule = Seq(100L, 200L, 400L), rateLimitMs = 1000L)
    val stats = client.yearStats("Orcinus orca", "", "")
    assert(stats == Seq((2000, 10L)))
    assert(fake.requests.size == 3)
    // two backoff sleeps for the two retryable statuses, then the 1 req/s
    // pause after the successful request (obis.py:44)
    assert(sleeps.toSeq == Seq(100L, 200L, 1000L))
  }

  test("terminal 4xx fails without retries") {
    val fake = new FakeHttp(Seq(
      "statistics/years" -> HttpResponse(404, "not found")))
    val client = new ObisClient(fake, sleep = _ => (),
      retrySchedule = Seq(10L, 20L))
    val e = intercept[Http.FailedRequest] {
      client.yearStats("Orcinus orca", "", "")
    }
    assert(e.status == 404 && fake.requests.size == 1)
  }

  test("batchRequests plans windows from statistics and stages files") {
    val dir = Files.createTempDirectory("obis_stage").toString
    // 2000+2001 pack into one window of <=10k; 2002 is oversized (its own
    // window); 2003 trails — the obis.py:166-203 shapes
    val fake = new FakeHttp(Seq(
      "statistics/years" -> HttpResponse(200,
        statsJson(2000 -> 4000L, 2001 -> 5000L, 2002 -> 12000L, 2003 -> 3000L)),
      "occurrence" -> HttpResponse(200, occJson("a", "b")),
      "occurrence" -> HttpResponse(200, occJson("c")),
      "occurrence" -> HttpResponse(200, occJson("d"))))
    val client = new ObisClient(fake, sleep = _ => ())
    val files = client.batchRequests(
      "Orcinus orca", "killer_whale", "", "", 10000L, dir)

    assert(files.map(f => f.substring(f.lastIndexOf('/') + 1)) == Seq(
      "2000-01-01--2001-12-31.json",
      "2002-01-01--2002-12-31.json",
      "2003-01-01--2003-12-31.json"))
    val occParams = fake.requests.drop(1).map(_._2.toMap)
    assert(occParams.map(p => (p("startdate"), p("enddate"))) == Seq(
      ("2000-01-01", "2001-12-31"),
      ("2002-01-01", "2002-12-31"),
      ("2003-01-01", "2003-12-31")))
    assert(occParams.forall(p =>
      p("scientificname") == "Orcinus orca" && p("size") == "10000"))
  }

  test("single request when total fits size; explicit bounds pass through") {
    val dir = Files.createTempDirectory("obis_stage1").toString
    val fake = new FakeHttp(Seq(
      "statistics/years" -> HttpResponse(200, statsJson(1990 -> 50L, 1995 -> 20L)),
      "occurrence" -> HttpResponse(200, occJson("x"))))
    val client = new ObisClient(fake, sleep = _ => ())
    val files = client.batchRequests(
      "Orcinus orca", "killer_whale", "1990-06-15", "1995", 10000L, dir)
    assert(files.map(f => f.substring(f.lastIndexOf('/') + 1)) ==
      Seq("1990-06-15--1995-12-31.json"))
  }

  test("staged files flow through declared-schema read + validation") {
    val dir = Files.createTempDirectory("obis_e2e").toString
    val fake = new FakeHttp(Seq(
      "statistics/years" -> HttpResponse(200, statsJson(2001 -> 3L)),
      "occurrence" -> HttpResponse(200,
        // one valid record, one missing species (pydantic: required field)
        """{"results":[
          |{"occurrenceID":"ok1","eventDate":"2001-05-10","decimalLatitude":10.0,
          | "decimalLongitude":20.0,"species":"Orcinus orca","speciesid":137102},
          |{"occurrenceID":"bad1","eventDate":"2001-06-01","decimalLatitude":11.0,
          | "decimalLongitude":21.0,"speciesid":137102}
          |]}""".stripMargin.replace("\n", ""))))
    val client = new ObisClient(fake, sleep = _ => ())
    client.batchRequests("Orcinus orca", "killer_whale", "", "", 10000L, dir)

    val resultSchema = StructType(Seq(
      StructField("occurrenceID", StringType),
      StructField("eventDate", StringType),
      StructField("decimalLatitude", DoubleType),
      StructField("decimalLongitude", DoubleType),
      StructField("species", StringType),
      StructField("speciesid", LongType)))
    val schema = StructType(Seq(
      StructField("results", ArrayType(resultSchema))))
    val staged = Staging.readJson(spark, schema, s"$dir/killer_whale")
      .select(explode(col("results")).as("r")).select("r.*")
    assert(staged.count() == 2)

    val annotated = Validation.annotate(staged, Seq(
      Validation.Rule("species", "missing", "Field required",
        col("species").isNotNull),
      Validation.Rule("eventDate", "missing", "Field required",
        col("eventDate").isNotNull)))
    assert(Validation.valid(annotated).count() == 1)
    val bad = Validation.invalid(annotated).collect()
    assert(bad.length == 1 && bad(0).getAs[String]("occurrenceID") == "bad1")
  }
}
