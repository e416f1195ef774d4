package graft.ingest

import java.io.OutputStream
import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The connector tier over a REAL socket (r9 verdict ask #3): a loopback
  * `com.sun.net.httpserver` fixture serves the Apify-shaped run API
  * (start → poll → items, scripted statuses, recorded aborts) and doubles
  * as a plain-HTTP FORWARD PROXY (absolute-URI request form), so
  * `HttpRunClient` + `AsyncPollConnector` + `ProxyRotation` are exercised
  * end-to-end — lifecycle, retry/backoff, proxy cooldown, timeout abort —
  * with zero external network.
  */
class HttpRunClientSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Loopback actor-API fixture. `statusScript` maps a handle to the
    * statuses its run reports on successive polls (last repeats); `items`
    * maps a handle to its dataset's JSON lines (default: two synthetic
    * records). The fixture honors the run-input WINDOW the client
    * transmits — since/until on the twitter-format createdAt (records
    * without one pass, the FixtureConnector null contract) and a
    * newest-first limit cap — because that is what a real actor does with
    * its input.
    */
  private final class ApiFixture(statusScript: Map[String, Seq[String]],
                                 items: Map[String, Seq[String]] = Map.empty) {
    private val seq = new java.util.concurrent.atomic.AtomicLong()
    private val runs = scala.collection.concurrent.TrieMap.empty[String, String] // id -> handle
    private val runParams = scala.collection.concurrent.TrieMap.empty[String, Map[String, String]]
    private val polls = scala.collection.concurrent.TrieMap.empty[String, Int]
    // a real actor API honors the client's idempotency token: the same
    // token re-POSTed returns the ORIGINAL run instead of starting another
    private val runsByIdem = scala.collection.concurrent.TrieMap.empty[String, String]
    val aborted = scala.collection.concurrent.TrieMap.empty[String, Boolean]
    val proxiedRequests = new java.util.concurrent.atomic.AtomicInteger()
    val statusPolls = new java.util.concurrent.atomic.AtomicInteger()
    @volatile var failNextWith5xx = 0
    // acted-then-failed: the server CREATES the run, then reports 503 — the
    // response-loss case whose retry must not double-start
    @volatile var actThenFailNext = 0
    def runCount: Int = runs.size

    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length.toLong)
      if (bytes.nonEmpty) {
        val os: OutputStream = ex.getResponseBody
        os.write(bytes); os.close()
      } else ex.close()
    }

    server.createContext("/", (ex: HttpExchange) => {
      val uri = ex.getRequestURI
      // a forward-proxied plain-HTTP request arrives in absolute-URI form
      if (uri.isAbsolute) proxiedRequests.incrementAndGet()
      val path = uri.getPath
      val method = ex.getRequestMethod
      if (failNextWith5xx > 0) {
        failNextWith5xx -= 1
        respond(ex, 503, """{"error":"synthetic outage"}""")
      } else (method, path) match {
        case ("POST", "/runs") =>
          val q = Option(uri.getQuery).getOrElse("").split("&").filter(_.contains("="))
            .map { kv => val Array(k, v) = kv.split("=", 2)
              k -> java.net.URLDecoder.decode(v, "UTF-8") }.toMap
          val id = q.get("idem").flatMap(runsByIdem.get) match {
            case Some(existing) => existing // deduped re-POST of one logical start
            case None =>
              val fresh = s"run-${seq.incrementAndGet()}"
              runs.put(fresh, q.getOrElse("handle", ""))
              runParams.put(fresh, q)
              q.get("idem").foreach(runsByIdem.put(_, fresh))
              fresh
          }
          if (actThenFailNext > 0) {
            actThenFailNext -= 1
            respond(ex, 503, """{"error":"acted, then the response was lost"}""")
          } else respond(ex, 201, s"""{"id":"$id","status":"RUNNING"}""")
        case ("POST", p) if p.matches("/runs/[^/]+/abort") =>
          aborted.put(p.split("/")(2), true)
          respond(ex, 204, "")
        case ("GET", p) if p.matches("/runs/[^/]+/items") =>
          val id = p.split("/")(2)
          val handle = runs(id)
          val prm = runParams.getOrElse(id, Map.empty)
          val raw = items.getOrElse(handle, Seq(
            s"""{"post_id":1,"author_handle":"$handle","like_count":10}""",
            s"""{"post_id":2,"author_handle":"$handle","like_count":3}"""))
          def ts(line: String): Option[Long] =
            "\"createdAt\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(line).flatMap { m =>
              val fmt = new java.text.SimpleDateFormat(
                "EEE MMM dd HH:mm:ss Z yyyy", java.util.Locale.US)
              scala.util.Try(fmt.parse(m.group(1)).getTime).toOption
            }
          val since = prm.get("since").map(_.toLong)
          val until = prm.get("until").map(_.toLong)
          val windowed = raw.filter(l => ts(l) match {
            case None    => true // null event times pass (FixtureConnector contract)
            case Some(t) => since.forall(t >= _) && until.forall(t < _)
          })
          val capped = prm.get("limit").map(_.toInt) match {
            case Some(n) => windowed.sortBy(l => -ts(l).getOrElse(Long.MinValue)).take(n)
            case None    => windowed
          }
          respond(ex, 200, capped.mkString("\n"))
        case ("GET", p) if p.matches("/runs/[^/]+") =>
          statusPolls.incrementAndGet()
          val id = p.split("/")(2)
          val script = statusScript.getOrElse(runs(id), Seq("SUCCEEDED"))
          val i = polls.getOrElse(id, 0)
          polls.put(id, i + 1)
          val st = script(math.min(i, script.length - 1))
          val reason = if (st == "FAILED") ""","reason":"actor crashed"""" else ""
          respond(ex, 200, s"""{"status":"$st"$reason}""")
        case _ => respond(ex, 404, """{"error":"no such route"}""")
      }
    })

    server.start()
    def port: Int = server.getAddress.getPort
    def base: String = s"http://127.0.0.1:$port"
    def stop(): Unit = server.stop(0)
  }

  /** A port with nothing listening (opened then closed): connecting to it
    * fails fast — the dead-proxy case.
    */
  private def deadPort(): Int = {
    val s = new java.net.ServerSocket(0)
    val p = s.getLocalPort
    s.close()
    p
  }

  test("end-to-end ingest over a real socket: start, poll cadence, fetch, attribution") {
    val api = new ApiFixture(Map("acme" -> Seq("RUNNING", "RUNNING", "SUCCEEDED")))
    try {
      val client = new HttpRunClient(api.base, sleepMs = _ => ())
      var clock = 0L
      val conn = new AsyncPollConnector("instagram", client,
        pollEveryMs = 2000, timeoutMs = 60000,
        nowMs = () => clock, sleepMs = ms => clock += ms)
      val df = conn.fetchAll(spark,
        Seq(Company(1, "Acme", Some("acme")) -> None,
            Company(2, "Duo", Some("duo")) -> None), None, None)
      val rows = df.collect()
      assert(rows.length == 4) // 2 items per company, schema-on-read JSON
      assert(df.columns.contains("like_count") && df.columns.contains("__company_id"))
      // acme needed 3 polls to turn SUCCEEDED; each poll round hits both
      // runs until they complete, all over the real HTTP stack
      assert(api.statusPolls.get() >= 4)
      assert(clock == 4000, s"expected two 2s poll sleeps, clock=$clock")
    } finally api.stop()
  }

  test("requests route through the HTTP proxy (absolute-URI form) when rotated in") {
    val api = new ApiFixture(Map.empty)
    try {
      // the fixture itself plays the forward proxy: same socket, but the
      // client addresses a FAKE origin host, so delivery proves the proxy
      // route (the JDK sends plain-HTTP via the proxy in absolute form)
      val rotation = new ProxyRotation(Seq(ProxyEndpoint("127.0.0.1", api.port)))
      val client = new HttpRunClient(s"http://origin.invalid", rotation, sleepMs = _ => ())
      val id = client.startRun(Company(1, "Acme", Some("acme")), FetchParams())
      assert(client.runStatus(id) == AsyncPoll.Succeeded)
      assert(api.proxiedRequests.get() >= 2,
        "requests did not arrive in proxied absolute-URI form")
    } finally api.stop()
  }

  test("proxy-failure cooldown: dead proxy benched after IO failure, live route wins") {
    val api = new ApiFixture(Map.empty)
    try {
      val dead = ProxyEndpoint("127.0.0.1", deadPort())
      val live = ProxyEndpoint("127.0.0.1", api.port)
      var rclock = 0L
      val rotation = new ProxyRotation(Seq(dead, live), banMs = 60000,
        nowMs = () => rclock)
      var backoffs = 0
      val client = new HttpRunClient("http://origin.invalid", rotation,
        maxAttempts = 3, sleepMs = _ => backoffs += 1)
      val id = client.startRun(Company(1, "Acme", Some("acme")), FetchParams())
      assert(id.startsWith("run-"))
      assert(backoffs == 1, "the dead proxy must cost exactly one retry")
      // the bench holds: every subsequent pick is the live endpoint
      assert(rotation.next().contains(live) && rotation.next().contains(live))
      // cooldown expiry re-admits the endpoint to rotation
      rclock += 60001
      assert(Seq(rotation.next(), rotation.next()).flatten.contains(dead))
    } finally api.stop()
  }

  test("5xx benches the carrying proxy; the retry falls back to direct and lands") {
    val api = new ApiFixture(Map.empty)
    try {
      val proxy = ProxyEndpoint("127.0.0.1", api.port)
      val rotation = new ProxyRotation(Seq(proxy))
      val client = new HttpRunClient(api.base, rotation,
        maxAttempts = 3, sleepMs = _ => ())
      api.failNextWith5xx = 1
      // attempt 1 rides the proxy and eats the 503 → proxy benched;
      // attempt 2: rotation is all-benched → None → DIRECT connection to
      // the same fixture, which now answers — the degraded-but-alive path
      val id = client.startRun(Company(1, "A", Some("a")), FetchParams())
      assert(id.startsWith("run-"))
      assert(rotation.next().isEmpty, "the 503 must bench the proxy")
    } finally api.stop()
  }

  test("poll-timeout aborts the hung run OVER THE WIRE and surfaces the abort") {
    val api = new ApiFixture(Map("hung" -> Seq("RUNNING")))
    try {
      val client = new HttpRunClient(api.base, sleepMs = _ => ())
      var clock = 0L
      val conn = new AsyncPollConnector("instagram", client,
        pollEveryMs = 2000, timeoutMs = 5000,
        nowMs = () => clock, sleepMs = ms => clock += ms)
      val ex = intercept[AsyncPoll.PollTimeoutException] {
        conn.fetch(spark, Company(1, "Hung", Some("hung")), FetchParams())
      }
      assert(ex.getMessage.contains("5000ms"))
      assert(api.aborted.keySet.nonEmpty, "abort never reached the server")
    } finally api.stop()
  }

  test("IngestJob.run over HTTP: control scan → actor window pushdown → normalize → sink → watermark") {
    // the SAME acmeco twitter fixture the hermetic spine tests ingest,
    // served over a real socket: the run input carries the catchup window
    // (since = now − 90d), the "actor" filters server-side (t3, Jan 2023,
    // never crosses the wire), the normalizer F3-drops t2 (no createdAt),
    // the sink merges the duplicate t1, and the watermark advances — the
    // full K1/K9 ingest spine with HTTP as the data plane.
    import org.apache.spark.sql.Row
    import graft.schema.Schemas
    val fixture = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        getClass.getResource("/fixtures/twitter/acmeco.json").toURI)), "UTF-8")
    val api = new ApiFixture(Map.empty,
      items = Map("acmeco" -> fixture.linesIterator.filter(_.trim.nonEmpty).toSeq))
    try {
      val root = java.nio.file.Files.createTempDirectory("graft-http-wh").toString
      val usersPath = s"$root/users"
      val rows = Seq(Row(Seq(1, "Acme", null, null, "acmeco", null, null, null,
        null) ++ Seq.fill(10)(null): _*))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), Schemas.users)
      Watermarks.overwriteParquet(spark, usersPath, df)
      val now = java.sql.Timestamp.valueOf("2025-06-01 00:00:00")
      var clock = 0L
      val client = new HttpRunClient(api.base, sleepMs = _ => (),
        itemsSchema = Some(Schemas.twitterRaw))
      val spec = IngestSpec("twitter", "twitter_mentions", "twitter_username",
        new AsyncPollConnector("twitter", client,
          nowMs = () => clock, sleepMs = ms => clock += ms),
        Normalize.twitter, Seq("created_at"), 500, 500, 90)
      val res = IngestJob.run(spark, usersPath, root, spec, Catchup(), now)
      assert(res.perCompany == Map("Acme" -> 3L),
        s"expected t1,t4,t5 through the wire; got ${res.perCompany}")
      val sunk = spark.read.parquet(s"$root/twitter_mentions")
        .collect().map(_.getAs[String]("tweet_id")).toSet
      assert(sunk == Set("t1", "t4", "t5"))
      val wm = graft.ingest.Watermarks.read(spark, usersPath).collect().head
        .getAs[java.sql.Timestamp]("last_fetched_twitter")
      assert(wm == now, "watermark must advance to the batch timestamp")
    } finally api.stop()
  }

  test("a FAILED run surfaces the server-reported reason") {
    val api = new ApiFixture(Map("bad" -> Seq("RUNNING", "FAILED")))
    try {
      val client = new HttpRunClient(api.base, sleepMs = _ => ())
      var clock = 0L
      val conn = new AsyncPollConnector("instagram", client,
        pollEveryMs = 2000, timeoutMs = 60000,
        nowMs = () => clock, sleepMs = ms => clock += ms)
      val ex = intercept[AsyncPoll.RunFailedException] {
        conn.fetch(spark, Company(1, "Bad", Some("bad")), FetchParams())
      }
      assert(ex.getMessage.contains("actor crashed"))
    } finally api.stop()
  }

  test("acted-then-failed POST retry dedupes on the idempotency token: ONE run") {
    // the non-idempotent-POST hazard (r10 advice): the server starts the
    // run but the 201 is lost (modeled as a post-act 503). The retry
    // re-sends the SAME idem token, so the server returns the original run
    // instead of double-starting.
    val api = new ApiFixture(Map.empty)
    try {
      val client = new HttpRunClient(api.base, maxAttempts = 3, sleepMs = _ => ())
      api.actThenFailNext = 1
      val id = client.startRun(Company(1, "Acme", Some("acme")), FetchParams())
      assert(id == "run-1", s"retry must return the ORIGINAL run, got $id")
      assert(api.runCount == 1, s"duplicate run started: ${api.runCount} runs")
      // and two DISTINCT logical starts still get two distinct runs
      val id2 = client.startRun(Company(1, "Acme", Some("acme")), FetchParams())
      assert(id2 != id && api.runCount == 2)
    } finally api.stop()
  }

  test("4xx is terminal: no retry burn, the error carries the body") {
    val api = new ApiFixture(Map.empty)
    try {
      var backoffs = 0
      val client = new HttpRunClient(api.base, maxAttempts = 3,
        sleepMs = _ => backoffs += 1)
      val ex = intercept[RuntimeException] { client.abortRun("nope/extra") }
      assert(ex.getMessage.contains("404"))
      assert(backoffs == 0, "4xx must not retry")
    } finally api.stop()
  }
}
