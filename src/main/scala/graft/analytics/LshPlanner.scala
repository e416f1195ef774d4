package graft.analytics

/** Corpus-size-aware planning for the similarity-blocking parameters
  * (SimHash band width, sign-LSH bucket bits, MinHash rows-per-band).
  *
  * Every banded blocking scheme has the same failure mode at scale: with a
  * FIXED band/bucket width w, random collisions grow as n²/2^w — quadratic
  * once n outruns 2^w. The candidate-pair load stays linear only if the
  * width grows with the corpus: w = Θ(log n). These formulas make that
  * explicit, so the fixed constants used by the oracle-checked queries
  * (DedupQueries.SimBits = 32, AnnQueries.Bits = 4 — fixed because the
  * DuckDB oracle strings are static SQL) can be VALIDATED at the tested
  * corpus sizes and recomputed for a 100-TB run.
  *
  * Candidate-load model (uniform hashing): a band of w bits collides a
  * random pair with probability 2^-w; with B bands,
  *   E[candidates] ≈ B · C(n,2) · 2^-w.
  * Holding E[candidates] ≤ cap·n (linear in corpus) gives
  *   w ≥ log2(B·(n-1) / (2·cap)).
  */
object LshPlanner {

  private def log2(x: Double): Double = math.log(x) / math.log(2)

  /** Expected random-collision candidate pairs for n docs under B bands of
    * w bits each — the quantity that must stay O(n).
    */
  def expectedBandCandidates(n: Long, bands: Int, bandBits: Int): Double =
    bands.toDouble * n.toDouble * (n - 1).toDouble / 2.0 / math.pow(2.0, bandBits.toDouble)

  /** SimHash code width for lossless Hamming ≤ maxHamming pair blocking
    * (pigeonhole: maxHamming+1 bands) with ≤ capPerDoc random candidates
    * per document. 500 docs, d=3, cap=10 → 28 bits: the static 32-bit code
    * (DedupQueries.SimBits) is adequate up to n ≈ 1 280, and a 100-TB
    * corpus (n ≈ 10⁹) needs 4·ceil(log2(4n/20)) = 112 bits — grow the code,
    * never the per-band collision rate.
    */
  def simhashCodeBits(n: Long, maxHamming: Int, capPerDoc: Double = 10.0): Int = {
    val bands = maxHamming + 1
    val w = math.ceil(log2(bands * math.max(n - 1L, 1L).toDouble / (2.0 * capPerDoc))).toInt
    bands * math.max(w, 1)
  }

  /** Sign-LSH hyperplane count for a target mean bucket size (the bucketed
    * cosine join does Σ|bucket|² ≈ n²/2^bits work — linear iff mean bucket
    * size is held constant): bits = ceil(log2(n / targetBucketSize)).
    * n=500, target 32 → 4 bits (AnnQueries.Bits); doubling the corpus adds
    * one bit, keeping per-bucket work flat.
    */
  def signLshBits(n: Long, targetBucketSize: Int = 32): Int =
    math.max(1, math.ceil(log2(math.max(n, 2L).toDouble / targetBucketSize)).toInt)

  /** MinHash rows-per-band so that pairs at the corpus's BACKGROUND
    * similarity j0 (what unrelated documents score, > 0 on a shared
    * vocabulary) stay under capPerDoc candidates per document:
    * a band matches a j0-pair with probability j0^r, so
    *   r ≥ ln(B·(n-1)/(2·cap)) / ln(1/j0).
    * n=500, B=3, j0=0.05, cap=10 → r=2; the static r=3
    * (DedupQueries.R) holds while B·(n-1)/(2·cap) ≤ 20³, i.e. to
    * n ≈ 53 000 — a 5M-doc corpus at the same j0 needs r=5 (asserted in
    * LshPlannerSpec). r also sharpens the S-curve
    * (threshold ≈ (1/B)^(1/r) ≈ 0.69 at r=3).
    */
  def minhashRowsPerBand(
      n: Long, bands: Int, backgroundJaccard: Double, capPerDoc: Double = 10.0): Int = {
    require(backgroundJaccard > 0 && backgroundJaccard < 1, "j0 in (0,1)")
    val load = bands * math.max(n - 1L, 1L).toDouble / (2.0 * capPerDoc)
    math.max(1, math.ceil(math.log(load) / math.log(1.0 / backgroundJaccard)).toInt)
  }
}
