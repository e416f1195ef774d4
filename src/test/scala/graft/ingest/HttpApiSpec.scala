package graft.ingest

import java.net.{HttpURLConnection, URL}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.TestSpark
import graft.schema.Schemas

/** The /health + /fetch-now surface (the reference's app.py endpoints,
  * working): catchup over the fixture control table must report the same
  * counts the golden spine run produces, and re-triggering must be a no-op
  * (idempotent sinks behind an at-least-once HTTP trigger).
  */
class HttpApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val now = java.sql.Timestamp.valueOf("2025-06-01 00:00:00")

  private def fixturesDir: String =
    new java.io.File(getClass.getResource("/fixtures").toURI).getAbsolutePath

  private def writeUsers(path: String): Unit = {
    val n10 = Seq.fill(10)(null)
    val rows = Seq(
      Row(Seq(1, "Acme", "acme.com", "acmegram", "acmeco", "acme-ltd",
        "https://maps.google.com/?cid=123", "acmefb", "acme-inc") ++ n10: _*))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), Schemas.users)
    Watermarks.overwriteParquet(spark, path, df)
  }

  private def get(url: String): (Int, String) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    val code = conn.getResponseCode
    val stream = if (code < 400) conn.getInputStream else conn.getErrorStream
    val body = scala.io.Source.fromInputStream(stream, "UTF-8").mkString
    conn.disconnect()
    (code, body)
  }

  test("health, fetch-now counts, idempotent re-trigger, bad mode") {
    val root = Files.createTempDirectory("graft-http").toString
    val users = s"$root/users"
    writeUsers(users)
    val api = new HttpApi(spark, users, s"$root/wh", fixturesDir).start()
    try {
      val base = s"http://127.0.0.1:${api.boundPort}"
      assert(get(s"$base/health") == (200, """{"status":"ok"}"""))

      val (code, body) = get(s"$base/fetch-now?mode=catchup&now=${now.getTime}")
      assert(code == 200, body)
      // twitter golden: Acme inserts 3 (t1,t4,t5) — same as IngestSpineSpec
      assert(body.contains(""""twitter":{"inserted":3,"per_company":{"Acme":3}}"""), body)
      assert(!body.contains("error"), body)

      // re-trigger: watermarks advanced, sinks idempotent → all zero
      val (_, again) = get(s"$base/fetch-now?mode=catchup&now=${now.getTime}")
      assert(!again.contains(""""inserted":""") ||
        """"inserted":(\d+)""".r.findAllMatchIn(again).forall(_.group(1) == "0"), again)

      assert(get(s"$base/fetch-now?mode=bogus")._1 == 400)
      assert(get(s"$base/fetch-now?mode=catchup&now=abc")._1 == 400) // bad input ≠ 500
    } finally api.stop()
  }
}
