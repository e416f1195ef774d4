package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semi-join reduction with a Bloom filter — the runtime-filter pattern for
  * joins whose build side is selective but whose probe side is the 100-TB
  * fact: build a sketch of the build-side join keys (one distributed
  * aggregate; only the serialized filter — KBs to a few MB — crosses the
  * driver, exactly like an HLL sketch), then pre-filter the probe side with
  * `might_contain` BEFORE its shuffle. False positives are removed by the
  * exact join that follows; false negatives cannot occur, so the reduction
  * is semantically free and cuts probe-side shuffle volume by the filter's
  * selectivity. The expressions are Spark's own `InjectRuntimeFilter`
  * machinery (`BloomFilterAggregate` / `BloomFilterMightContain`, both
  * sides keyed on xxhash64), registered in GraftExtensions; exposing them
  * as a library call makes the reduction available where the optimizer's
  * injection heuristics decline (e.g. below a sink-side anti-join, or when
  * the build side is a driver-known artifact reused across queries).
  */
object RuntimeFilter {

  /** One distributed pass over `build`: the serialized Bloom filter of
    * xxhash64(key), sized for `expectedItems` distinct keys.
    */
  def buildBloom(build: DataFrame, key: Column, expectedItems: Long): Array[Byte] =
    build.select(call_function("graft_bloom_agg", xxhash64(key), lit(expectedItems)))
      .head.getAs[Array[Byte]](0)

  /** Probe-side predicate: may the Bloom filter contain `probeKey`?
    * Evaluates inside codegen against the literal sketch; rows failing it
    * can never match the build side.
    */
  def mightContain(bloom: Array[Byte], probeKey: Column): Column =
    call_function("graft_might_contain", lit(bloom), xxhash64(probeKey))
}
