package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Triangle counting (E48): the degree-oriented wedge-join count must
  * equal the brute-force u<v<w three-way join on a hash-random graph, and
  * the normalization must ignore self-loops, duplicates and reversed
  * edges.
  */
class TriangleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ~10% density hash-random graph on 80 nodes (deterministic: xxhash64)
  private def graph = {
    import spark.implicits._
    val n = 80
    (for (i <- 0 until n; j <- i + 1 until n) yield (i.toLong, j.toLong))
      .toDF("a", "b")
      .where(pmod(xxhash64(col("a") * 1000 + col("b")), lit(10)) === 0)
  }

  test("wedge-join count equals the brute-force three-join") {
    val edges = graph.localCheckpoint(true)
    val fast = GraphQueries.triangleCount(edges, "a", "b")
      .head().getLong(0)

    // brute force: canonical u<v<w closure
    val e = edges.select(col("a").as("u"), col("b").as("v")) // already a<b
    val brute = e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .select(col("e1.u").as("u"), col("e2.v").as("v"), col("e1.v").as("mid"))
      .join(e, Seq("u", "v"), "left_semi")
      .count()
    assert(fast === brute, s"wedge count $fast != brute $brute")
    assert(fast > 0, "degenerate test graph: no triangles")
  }

  test("clustering coefficient equals the local recompute") {
    val edges = graph.localCheckpoint(true)
    val row = GraphQueries.clusteringCoefficient(edges, "a", "b").head()
    val (tri, wedges, coef) = (row.getLong(0), row.getLong(1), row.getDouble(2))

    val pairs = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = pairs.flatMap(p => Seq(p._1, p._2)).groupBy(identity).map(_._2.length.toLong)
    val localWedges = deg.map(d => d * (d - 1) / 2).sum
    assert(wedges === localWedges)
    assert(coef === 3.0 * tri / wedges)
    assert(coef > 0.0 && coef < 1.0)
  }

  test("self-loops, duplicate and reversed edges do not change the count") {
    val edges = graph
    val noisy = edges
      .unionByName(edges.select(col("b").as("a"), col("a").as("b"))) // reversed
      .unionByName(edges.limit(10))                                  // duplicates
      .unionByName(spark.range(5).select(col("id").as("a"), col("id").as("b"))) // loops
    val clean = GraphQueries.triangleCount(edges, "a", "b").head().getLong(0)
    val withNoise = GraphQueries.triangleCount(noisy, "a", "b").head().getLong(0)
    assert(clean === withNoise)
  }
}
