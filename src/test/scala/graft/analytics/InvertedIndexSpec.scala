package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.functions.Norm

/** Inverted index (E49): lookups and conjunctive queries must equal
  * direct corpus scans, and incremental build must equal full rebuild —
  * with the incremental update reading only the batch's term files.
  */
class InvertedIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sf).select("doc_id", "text")

  // ground truth: docs whose cleaned token set contains `term`
  private def docsWith(term: String): Set[Long] =
    docs.select(col("doc_id"),
      split(Norm.cleanText(col("text")), " ").as("toks"))
      .where(array_contains(col("toks"), term))
      .collect().map(_.getLong(0)).toSet

  test("term lookup and AND query equal direct corpus scans") {
    val base = java.nio.file.Files.createTempDirectory("graft_invidx").toFile
    val path = s"${base.getPath}/idx"
    try {
      InvertedIndex.build(spark, path, docs)
      // a frequent and a rarer term from the shared synthetic vocabulary
      val Seq(t1, t2) = Seq("the", "data")
      val p1 = InvertedIndex.lookup(spark, path, t1)
        .select(explode(col("postings"))).collect().map(_.getLong(0)).toSet
      assert(p1 === docsWith(t1), s"postings($t1) diverge from the corpus")

      val both = InvertedIndex.andQuery(spark, path, Seq(t1, t2))
        .collect().map(_.getLong(0)).toSet
      assert(both === (docsWith(t1) intersect docsWith(t2)))

      val missing = InvertedIndex.lookup(spark, path, "zzz_not_a_term")
      assert(missing.count() === 0)
    } finally rm(base)
  }

  test("incremental build equals full rebuild") {
    val base = java.nio.file.Files.createTempDirectory("graft_invidx2").toFile
    val full = s"${base.getPath}/full"
    val incr = s"${base.getPath}/incr"
    try {
      InvertedIndex.build(spark, full, docs)
      InvertedIndex.build(spark, incr, docs.filter(col("doc_id") % 5 =!= 0))
      InvertedIndex.addDocs(spark, incr, docs.filter(col("doc_id") % 5 === 0))

      val a = graft.ingest.MergeSink.read(spark, full)
        .select(col("term"), col("postings").cast("string").as("p"))
      val b = graft.ingest.MergeSink.read(spark, incr)
        .select(col("term"), col("postings").cast("string").as("p"))
      assert(a.count() === b.count())
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        "incrementally-built index diverges from full rebuild")
    } finally rm(base)
  }

  test("removeDocs: purged docs leave every posting list; semantics equal rebuild-without (r13)") {
    val base = java.nio.file.Files.createTempDirectory("graft_invidx_rm").toFile
    val idx = s"${base.getPath}/idx"
    val twin = s"${base.getPath}/twin"
    try {
      InvertedIndex.build(spark, idx, docs)
      val dropIds = Seq(0L, 7L, 42L)
      val dropDocs = docs.filter(col("doc_id").isin(dropIds: _*))
      assert(dropDocs.count() == 3)
      InvertedIndex.removeDocs(spark, idx, dropDocs)
      // 1. no posting row still carries a dropped id
      val posted = graft.ingest.MergeSink.read(spark, idx)
        .select(explode(col("postings")).as("id"))
        .filter(col("id").isin(dropIds: _*)).count()
      assert(posted == 0, s"$posted postings still reference purged docs")
      // 2. REBUILD-WITHOUT equivalence on the live postings: every term of
      // the surviving corpus has identical postings in both indexes (the
      // purged index additionally keeps empty-array rows for vanished
      // terms — the posting-table convention; lookups return zero hits)
      InvertedIndex.build(spark, twin, docs.filter(!col("doc_id").isin(dropIds: _*)))
      val a = graft.ingest.MergeSink.read(spark, idx)
        .filter(size(col("postings")) > 0)
        .select(col("term"), col("postings").cast("string").as("p"))
      val b = graft.ingest.MergeSink.read(spark, twin)
        .select(col("term"), col("postings").cast("string").as("p"))
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        "purged index diverges from rebuild-without")
      // 3. re-removal is a content no-op
      val snap = graft.ingest.MergeSink.read(spark, idx)
        .select(col("term"), col("postings").cast("string").as("p"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      InvertedIndex.removeDocs(spark, idx, dropDocs)
      val snap2 = graft.ingest.MergeSink.read(spark, idx)
        .select(col("term"), col("postings").cast("string").as("p"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(snap2 == snap, "re-removal changed posting contents")
    } finally rm(base)
  }

  test("concurrent addDocs with overlapping terms lose no postings") {
    // the read-modify-write race the OCC pin exists for: racing writers
    // read current postings, union their docs, and merge — without
    // read-set validation the CAS loser re-merges STALE postings and the
    // winner's doc ids vanish. Every batch shares the corpus vocabulary,
    // so overlapping terms are guaranteed.
    val base = java.nio.file.Files.createTempDirectory("graft_invidx3").toFile
    val full = s"${base.getPath}/full"
    val conc = s"${base.getPath}/conc"
    try {
      InvertedIndex.build(spark, full, docs)
      InvertedIndex.build(spark, conc, docs.filter(col("doc_id") % 5 === 4))
      val writers = 4
      val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val futures = (0 until writers).map { w =>
        scala.concurrent.Future {
          InvertedIndex.addDocs(spark, conc, docs.filter(col("doc_id") % 5 === w))
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration(300, "s"))
      pool.shutdown()
      val a = graft.ingest.MergeSink.read(spark, full)
        .select(col("term"), col("postings").cast("string").as("p"))
      val b = graft.ingest.MergeSink.read(spark, conc)
        .select(col("term"), col("postings").cast("string").as("p"))
      assert(a.count() === b.count())
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        "concurrently-built index lost postings (read-modify-write race)")
    } finally rm(base)
  }

  test("addDocs OCC retry: a commit landing inside the read-merge window is recombined, not lost") {
    // DETERMINISTIC reproduction of the lost-update scenario (the
    // concurrent test above races for it; this one forces it): writer A
    // parks between its version read and its merge via the afterRead
    // seam, writer B lands a full addDocs on an overlapping term, A
    // resumes → its pinned-version merge MUST abort (ReadConflict),
    // retry against the new state, and recombine BOTH batches' doc ids.
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_invidx4").toFile
    val path = s"${base.getPath}/idx"
    try {
      InvertedIndex.build(spark, path, Seq((1L, "alpha beta")).toDF("doc_id", "text"))
      val reads = new java.util.concurrent.atomic.AtomicInteger(0)
      val readDone = new java.util.concurrent.CountDownLatch(1)
      val resume = new java.util.concurrent.CountDownLatch(1)
      @volatile var slowErr: Option[Throwable] = None
      val slow = new Thread(() => {
        try {
          InvertedIndex.addDocs(spark, path,
            Seq((100L, "alpha gamma")).toDF("doc_id", "text"),
            afterRead = () => {
              // park only the FIRST attempt; the retry runs through
              if (reads.incrementAndGet() == 1) { readDone.countDown(); resume.await() }
            })
        } catch { case t: Throwable => slowErr = Some(t) }
      })
      slow.start()
      readDone.await()
      InvertedIndex.addDocs(spark, path, Seq((200L, "alpha delta")).toDF("doc_id", "text"))
      resume.countDown()
      slow.join(120000)
      assert(!slow.isAlive, "slow writer did not finish")
      assert(slowErr.isEmpty, s"slow writer failed: $slowErr")
      assert(reads.get() == 2, "the pinned-version merge must abort exactly once and retry")
      def postings(t: String) = InvertedIndex.lookup(spark, path, t)
        .select(explode(col("postings"))).collect().map(_.getLong(0)).toSet
      assert(postings("alpha") == Set(1L, 100L, 200L), "a batch's doc ids were lost")
      assert(postings("gamma") == Set(100L))
      assert(postings("delta") == Set(200L))
    } finally rm(base)
  }

  private def rm(x: java.io.File): Unit = {
    if (x.isDirectory) Option(x.listFiles()).toSeq.flatten.foreach(rm)
    x.delete(); ()
  }
}
