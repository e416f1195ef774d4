package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Every declared query must execute at sf0.001 (the t1 smoke tier) —
  * exact-value correctness is the DuckDB oracle's job (Verify + driver);
  * this guards against queries that stop running at all.
  */
class QuerySmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // s1 legitimately returns 0 rows (every customer has orders at some SFs)
  private val mayBeEmpty = Set("s1_f1_new_keys_anti", "dd_block_prefix")

  SparkEntry.allDefs.foreach { d =>
    test(s"query ${d.name} executes at sf0.001") {
      val n = d.fn(spark, sf).count()
      if (!mayBeEmpty(d.name)) assert(n > 0, s"${d.name} returned no rows")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle-less query is intentional") {
    val noOracle = SparkEntry.allDefs.filter(_.oracle.isEmpty).map(_.name)
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
  }
}
