package graft.ingest

/** Proxy rotation for the connector tier — the reference's
  * `utils/proxies.py:1-14` (a comma-separated proxy list from the
  * `TP_PROXIES` configuration value becomes per-request proxy endpoints),
  * modeled as an explicit POLICY object rather than ad-hoc client code,
  * plus the piece the reference leaves implicit: failure cooldown — an
  * endpoint whose request errors is benched for `banMs` before re-entering
  * rotation, so one dead proxy cannot absorb 1/n of all requests forever.
  *
  * This is control-plane plumbing for an HTTP-backed client (an Apify-like
  * `AsyncPoll.AsyncRunClient` threads `rotation.next()` into each request
  * and reports the outcome); it owns no network itself, so it is fully
  * hermetic — the clock is injected and `ProxiesSpec` drives rotation,
  * parsing, cooldown and the all-benched fallback against a virtual clock.
  * Thread-safe: `fetchAll` polls companies' runs concurrently.
  */
final case class ProxyEndpoint(host: String, port: Int) {
  /** The per-request proxy URL, the shape the reference builds its
    * requests-style proxy dict from.
    */
  def url: String = s"http://$host:$port"
}

final class ProxyRotation(
    endpoints: Seq[ProxyEndpoint],
    banMs: Long = 60000,
    nowMs: () => Long = () => System.currentTimeMillis()) {

  private val cursor = new java.util.concurrent.atomic.AtomicLong(-1L)
  private val bannedUntil =
    scala.collection.concurrent.TrieMap.empty[ProxyEndpoint, Long]

  /** The next endpoint in round-robin order, skipping benched ones.
    * None = connect DIRECTLY (no proxies configured, or every endpoint is
    * inside its cooldown — degrading to a direct attempt beats refusing
    * to fetch, which is what the reference does implicitly by running
    * proxy-less when TP_PROXIES is unset).
    */
  def next(): Option[ProxyEndpoint] = {
    if (endpoints.isEmpty) return None
    val now = nowMs()
    var tried = 0
    while (tried < endpoints.length) {
      val i = (cursor.incrementAndGet() % endpoints.length).toInt
      val p = endpoints(i)
      if (bannedUntil.get(p).forall(_ <= now)) return Some(p)
      tried += 1
    }
    None
  }

  /** Bench the endpoint for `banMs` — called on connect/5xx failure. */
  def reportFailure(p: ProxyEndpoint): Unit = {
    bannedUntil.put(p, nowMs() + banMs); ()
  }

  /** Clear any bench early — called on a successful response. */
  def reportSuccess(p: ProxyEndpoint): Unit = {
    bannedUntil.remove(p); ()
  }
}

object ProxyRotation {
  /** Parse the reference's configuration shape: a comma-separated
    * `host:port[,host:port...]` list; blanks are skipped, a malformed
    * entry fails fast (a silently dropped proxy is a capacity surprise
    * in production).
    */
  def parse(config: String): Seq[ProxyEndpoint] =
    config.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { entry =>
      entry.split(":") match {
        case Array(h, p) if h.nonEmpty && p.forall(_.isDigit) && p.nonEmpty =>
          ProxyEndpoint(h, p.toInt)
        case _ =>
          throw new IllegalArgumentException(s"malformed proxy entry: '$entry'")
      }
    }
}
