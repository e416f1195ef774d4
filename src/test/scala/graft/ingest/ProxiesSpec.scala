package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** The proxy-rotation policy proofs: configuration parsing, round-robin
  * order, failure cooldown against a virtual clock, and the all-benched
  * direct-connection fallback.
  */
class ProxiesSpec extends AnyFunSuite {

  private val a = ProxyEndpoint("p1.example", 8080)
  private val b = ProxyEndpoint("p2.example", 8080)
  private val c = ProxyEndpoint("p3.example", 3128)

  test("parses the reference's comma-separated host:port configuration") {
    assert(ProxyRotation.parse("p1.example:8080, p2.example:8080,p3.example:3128") ==
      Seq(a, b, c))
    assert(ProxyRotation.parse("") == Nil)
    assert(a.url == "http://p1.example:8080")
    intercept[IllegalArgumentException] { ProxyRotation.parse("host-no-port") }
    intercept[IllegalArgumentException] { ProxyRotation.parse("h:not_a_port") }
  }

  test("rotates round-robin and an empty list means direct connection") {
    val r = new ProxyRotation(Seq(a, b, c))
    assert((1 to 6).map(_ => r.next().get) == Seq(a, b, c, a, b, c))
    assert(new ProxyRotation(Nil).next().isEmpty)
  }

  test("a failed endpoint is benched for the cooldown, then re-enters") {
    var now = 0L
    val r = new ProxyRotation(Seq(a, b), banMs = 1000, nowMs = () => now)
    assert(r.next().contains(a))
    r.reportFailure(a)
    // a is benched: rotation serves only b
    assert((1 to 3).map(_ => r.next().get).forall(_ == b))
    now = 1000 // cooldown over
    assert((1 to 4).map(_ => r.next().get).toSet == Set(a, b))
  }

  test("success clears a bench early; all-benched degrades to direct") {
    var now = 0L
    val r = new ProxyRotation(Seq(a, b), banMs = 1000, nowMs = () => now)
    r.reportFailure(a); r.reportFailure(b)
    assert(r.next().isEmpty, "every endpoint benched -> direct connection")
    r.reportSuccess(b)
    assert(r.next().contains(b))
  }
}
