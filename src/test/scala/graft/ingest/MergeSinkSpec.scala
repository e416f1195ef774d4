package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The copy-on-write MERGE contract: last-writer-wins upsert, content
  * idempotence, file-level key-range skipping (merge cost O(batch +
  * touched files), not O(sink)), and snapshot-isolated time travel.
  */
class MergeSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("merge_sink").toString + "/sink"

  private def content(path: String, v: Option[Long] = None): Set[(Long, String)] =
    MergeSink.read(spark, path, v)
      .select(col("id"), col("payload")).as[(Long, String)].collect().toSet

  test("upsert: matched rows replaced, unmatched inserted") {
    val path = tmp()
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "payload")
    val r1 = MergeSink.merge(spark, path, base, Seq("id"), Seq(col("id")))
    assert(r1.version == 1 && r1.inserted == 3 && r1.updated == 0)

    val upd = Seq((2L, "B!"), (4L, "d")).toDF("id", "payload")
    val r2 = MergeSink.merge(spark, path, upd, Seq("id"), Seq(col("id")))
    assert(r2.version == 2 && r2.inserted == 1 && r2.updated == 1)
    assert(content(path) == Set((1L, "a"), (2L, "B!"), (3L, "c"), (4L, "d")))
  }

  test("re-merging the same batch is content-idempotent") {
    val path = tmp()
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "payload")
    MergeSink.merge(spark, path, base, Seq("id"), Seq(col("id")))
    val before = content(path)
    val r = MergeSink.merge(spark, path, base, Seq("id"), Seq(col("id")))
    assert(r.updated == 2 && r.inserted == 0)
    assert(content(path) == before)
  }

  test("within-batch duplicates collapse to the tiebreak representative") {
    val path = tmp()
    val batch = Seq((1L, "late", 9L), (1L, "early", 1L)).toDF("id", "payload", "seq")
    val r = MergeSink.merge(spark, path, batch, Seq("id"), Seq(col("seq")))
    assert(r.inserted == 1)
    assert(content(path) == Set((1L, "early")))
  }

  test("file skipping: a small batch rewrites O(batch) files, not O(sink)") {
    val path = tmp()
    val base = spark.range(10000).select(col("id"), concat(lit("p"), col("id")).as("payload"))
    // ~20 range-clustered files
    val r1 = MergeSink.merge(spark, path, base, Seq("id"), Seq(col("id")),
      targetFileRows = 500)
    assert(r1.inserted == 10000)
    val nFiles = MergeSink
      .read(spark, path).select(col("_metadata.file_path")).distinct().count()
    assert(nFiles >= 10, s"expected many data files, got $nFiles")

    val upd = Seq((17L, "X"), (4242L, "Y"), (9999L, "Z")).toDF("id", "payload")
    val r2 = MergeSink.merge(spark, path, upd, Seq("id"), Seq(col("id")),
      targetFileRows = 500)
    assert(r2.updated == 3 && r2.inserted == 0)
    assert(r2.filesRewritten <= 3,
      s"3-key batch must touch <= 3 range-clustered files, rewrote ${r2.filesRewritten}")
    assert(r2.filesSkipped >= nFiles - 3)
    // and the merge is still correct
    val got = MergeSink.read(spark, path)
      .filter(col("id").isin(17L, 4242L, 9999L, 0L))
      .select(col("id"), col("payload")).as[(Long, String)].collect().toSet
    assert(got == Set((17L, "X"), (4242L, "Y"), (9999L, "Z"), (0L, "p0")))
  }

  test("delete: rows removed by key, file skipping, time travel, delete-all") {
    val path = tmp()
    val base = spark.range(10000).select(col("id"), concat(lit("p"), col("id")).as("payload"))
    MergeSink.merge(spark, path, base, Seq("id"), Seq(col("id")), targetFileRows = 500)
    val nFiles = MergeSink
      .read(spark, path).select(col("_metadata.file_path")).distinct().count()

    // small delete set touches O(keys) files, not O(sink)
    val doomed = Seq(17L, 4242L, 9999L).toDF("id")
    val r2 = MergeSink.delete(spark, path, doomed, Seq("id"), targetFileRows = 500)
    assert(r2.version == 2 && r2.updated == 3)
    assert(r2.filesRewritten <= 3,
      s"3-key delete must touch <= 3 range-clustered files, rewrote ${r2.filesRewritten}")
    assert(r2.filesSkipped >= nFiles - 3)
    val now = MergeSink.read(spark, path)
    assert(now.count() == 9997)
    assert(now.filter(col("id").isin(17L, 4242L, 9999L)).count() == 0)
    // old version still has the rows (snapshot isolation / time travel)
    assert(MergeSink.read(spark, path, Some(1L))
      .filter(col("id").isin(17L, 4242L, 9999L)).count() == 3)

    // re-deleting the same keys is a no-op commit (nothing matches)
    val r3 = MergeSink.delete(spark, path, doomed, Seq("id"), targetFileRows = 500)
    assert(MergeSink.read(spark, path).count() == 9997,
      s"re-delete changed content (result $r3)")

    // deleting an absent key is a no-op; deleting everything leaves a
    // readable empty table with its schema
    val rAbsent = MergeSink.delete(spark, path, Seq(-1L).toDF("id"), Seq("id"))
    assert(rAbsent.updated == 0)
    val rAll = MergeSink.delete(spark, path, base.select("id"), Seq("id"))
    assert(rAll.updated == 9997)
    val empty = MergeSink.read(spark, path)
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("id", "payload"))
  }

  test("time travel: every committed version stays readable") {
    val path = tmp()
    MergeSink.merge(spark, path,
      Seq((1L, "a")).toDF("id", "payload"), Seq("id"), Seq(col("id")))
    MergeSink.merge(spark, path,
      Seq((1L, "a2"), (2L, "b")).toDF("id", "payload"), Seq("id"), Seq(col("id")))
    assert(MergeSink.versions(path) == Seq(1L, 2L))
    assert(content(path, Some(1L)) == Set((1L, "a")))
    assert(content(path, Some(2L)) == Set((1L, "a2"), (2L, "b")))
  }

  test("empty batch is a no-op; empty first commit seeds a readable schema") {
    val path = tmp()
    val empty = Seq.empty[(Long, String)].toDF("id", "payload")
    val r0 = MergeSink.merge(spark, path, empty, Seq("id"), Seq(col("id")))
    assert(r0.version == 1 && r0.inserted == 0)
    assert(MergeSink.read(spark, path).count() == 0)
    assert(MergeSink.read(spark, path).columns.toSeq == Seq("id", "payload"))

    MergeSink.merge(spark, path,
      Seq((5L, "e")).toDF("id", "payload"), Seq("id"), Seq(col("id")))
    val r2 = MergeSink.merge(spark, path, empty, Seq("id"), Seq(col("id")))
    assert(r2.inserted == 0 && r2.updated == 0)
    assert(content(path) == Set((5L, "e")))
  }

  test("compact: small files coalesce, content identical, old versions intact") {
    val path = tmp()
    // ~20 small files of ~50 rows each
    val base = spark.range(1000).select(col("id"), concat(lit("p"), col("id")).as("payload"))
    MergeSink.merge(spark, path, base, Seq("id"), Seq(col("id")), targetFileRows = 50)
    val before = content(path)
    val vBefore = MergeSink.versions(path).last
    val filesBefore = MergeSink.read(spark, path)
      .select(col("_metadata.file_path")).distinct().count()
    assert(filesBefore >= 10)

    val r = MergeSink.compact(spark, path, Seq("id"), targetFileRows = 1000)
    assert(r.version == vBefore + 1 && r.filesRewritten == filesBefore)
    val filesAfter = MergeSink.read(spark, path)
      .select(col("_metadata.file_path")).distinct().count()
    assert(filesAfter < filesBefore / 2, s"$filesBefore -> $filesAfter")
    assert(content(path) == before, "compaction must not change content")
    assert(content(path, Some(vBefore)) == before, "pre-compaction version readable")

    // a second compact is a no-op (everything right-sized now)
    val r2 = MergeSink.compact(spark, path, Seq("id"), targetFileRows = 1000)
    assert(r2.version == r.version && r2.filesRewritten == 0)
  }

  test("schema evolution: new batch columns append, old rows null-fill") {
    val path = tmp()
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "payload")
    MergeSink.merge(spark, path, base, Seq("id"), Seq(col("id")))

    val evolved = Seq((2L, "B!", 7), (3L, "c", 9)).toDF("id", "payload", "score")
    val r = MergeSink.merge(spark, path, evolved, Seq("id"), Seq(col("id")))
    assert(r.inserted == 1 && r.updated == 1)
    val got = MergeSink.read(spark, path)
      .select(col("id"), col("payload"), col("score"))
      .collect().map(x => (x.getLong(0), x.getString(1), Option(x.get(2)))).toSet
    assert(got == Set((1L, "a", None), (2L, "B!", Some(7)), (3L, "c", Some(9))))

    // an old-schema batch still merges into the evolved table (null score)
    val old = Seq((1L, "a2")).toDF("id", "payload")
    MergeSink.merge(spark, path, old, Seq("id"), Seq(col("id")))
    val got2 = MergeSink.read(spark, path)
      .filter(col("id") === 1L)
      .collect().map(x => (x.getString(1), Option(x.get(2)))).toSet
    assert(got2 == Set(("a2", None)))
    // pre-evolution version still reads with its own schema
    assert(MergeSink.read(spark, path, Some(1L)).columns.toSeq == Seq("id", "payload"))

    // shared-column type changes are rejected, not silently coerced
    val bad = Seq((5L, 42)).toDF("id", "payload")
    intercept[IllegalArgumentException] {
      MergeSink.merge(spark, path, bad, Seq("id"), Seq(col("id")))
    }
  }

  test("vacuum: old versions reclaimed, retained versions intact") {
    val path = tmp()
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "payload")
    MergeSink.merge(spark, path, v1, Seq("id"), Seq(col("id")))
    MergeSink.merge(spark, path,
      Seq((2L, "b2")).toDF("id", "payload"), Seq("id"), Seq(col("id")))
    MergeSink.merge(spark, path,
      Seq((3L, "c")).toDF("id", "payload"), Seq("id"), Seq(col("id")))
    assert(MergeSink.versions(path) == Seq(1L, 2L, 3L))

    val deleted = MergeSink.vacuum(path, keepVersions = 2)
    assert(MergeSink.versions(path) == Seq(2L, 3L))
    // current + previous still read fine
    assert(content(path) == Set((1L, "a"), (2L, "b2"), (3L, "c")))
    assert(content(path, Some(2L)) == Set((1L, "a"), (2L, "b2")))
    intercept[IllegalArgumentException] { MergeSink.read(spark, path, Some(1L)) }
    // v1's single data file was rewritten by v2's merge, so only v1
    // referenced it — exactly that file is reclaimed
    assert(deleted == 1)
    val reVacuum = MergeSink.vacuum(path, keepVersions = 2)
    assert(reVacuum == 0, "vacuum is idempotent")
  }

  test("vacuumOrphans: crashed-attempt dirs reclaimed, live and fresh dirs kept") {
    val path = tmp()
    MergeSink.merge(spark, path, Seq((1L, "a")).toDF("id", "payload"),
      Seq("id"), Seq(col("id")))
    // simulate a crashed commit attempt: a data dir no manifest references
    val orphan = new java.io.File(s"$path/data/v000002-99999")
    orphan.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(orphan, "part-00000.parquet").toPath, "dead")

    // age-gated: a fresh orphan (possible in-flight commit) is untouched
    assert(MergeSink.vacuumOrphans(path) == 0)
    assert(orphan.exists())
    // past the horizon it is reclaimed; the committed dir survives
    // (negative retention puts the cutoff in the future — "everything is
    // old" — avoiding mtime-granularity flakiness a 0 ms horizon has)
    assert(MergeSink.vacuumOrphans(path, olderThanMs = -60000) == 1)
    assert(!orphan.exists())
    assert(content(path) == Set((1L, "a")))
    assert(MergeSink.vacuumOrphans(path, olderThanMs = -60000) == 0, "idempotent")
  }

  test("null key members merge null-safely") {
    val path = tmp()
    val base = Seq((Option(1L), "a"), (Option.empty[Long], "n")).toDF("id", "payload")
    MergeSink.merge(spark, path, base, Seq("id"), Seq(col("id")))
    val upd = Seq((Option.empty[Long], "N!")).toDF("id", "payload")
    val r = MergeSink.merge(spark, path, upd, Seq("id"), Seq(col("id")))
    assert(r.updated == 1 && r.inserted == 0)
    val got = MergeSink.read(spark, path)
      .select(col("id"), col("payload")).collect()
      .map(r => (Option(r.get(0)), r.getString(1))).toSet
    assert(got == Set((Some(1L), "a"), (None, "N!")))
  }

  test("change feed: ±1-weighted diff satisfies agg(v2) = agg(v1) + agg(Δ)") {
    val path = tmp()
    val base = (1L to 400L).map(i => (i, i * 10)).toDF("id", "value")
    val v1 = MergeSink.merge(spark, path, base, Seq("id"), Seq(col("id")),
      targetFileRows = 100).version
    val upd = Seq((7L, 7000L), (401L, 4010L)).toDF("id", "value")
    val v2 = MergeSink.merge(spark, path, upd, Seq("id"), Seq(col("id")),
      targetFileRows = 100).version

    // copy-on-write surface: the diff lists the touched hash slice only,
    // so the change feed scans O(touched files), never the table
    val (added, removed) = MergeSink.fileDiff(path, v1, v2)
    assert(added.nonEmpty && removed.nonEmpty && removed.size < 4,
      s"diff should touch a strict subset of the 4 v1 files: $removed")

    val ch = MergeSink.changes(spark, path, v1, v2)
    val w = col(MergeSink.WeightCol)
    // linear-aggregate identity (carry-over rows cancel as +1/-1 pairs)
    val Seq(dn, dv) = ch.agg(sum(w), sum(w * col("value"))).collect()
      .head.toSeq.map(_.asInstanceOf[Long])
    def aggAt(v: Long): (Long, Long) = {
      val r = MergeSink.read(spark, path, Some(v))
        .agg(count(lit(1)), sum(col("value"))).collect().head
      (r.getLong(0), r.getLong(1))
    }
    val (n1, s1) = aggAt(v1); val (n2, s2) = aggAt(v2)
    assert(n1 + dn == n2 && s1 + dv == s2)

    // row-level: v1 ⊎ Δ reconstructs v2 exactly as a multiset
    val rebuilt = MergeSink.read(spark, path, Some(v1))
      .withColumn(MergeSink.WeightCol, lit(1L)).unionByName(ch)
      .groupBy("id", "value").agg(sum(w).as("m"))
      .filter(col("m") =!= 0)
      .select(col("id"), col("value")).as[(Long, Long)].collect().toSet
    val atV2 = MergeSink.read(spark, path, Some(v2))
      .select(col("id"), col("value")).as[(Long, Long)].collect().toSet
    assert(rebuilt == atV2)

    // structural O(touched-files) proof: the feed's input is EXACTLY the
    // diff files — no plan rewrite can sneak a full-table scan back in
    val expected = (added ++ removed).map(f => s"$path/${f.path}").toSet
    assert(ch.inputFiles.map(u => new java.net.URI(u).getPath).toSet == expected)
  }

  test("pointRead: O(1) files scanned, exact row, absent key is empty") {
    val path = tmp()
    val base = (1L to 400L).map(i => (i, s"p$i")).toDF("id", "payload")
    MergeSink.merge(spark, path, base, Seq("id"), Seq(col("id")),
      targetFileRows = 100)
    val hit = MergeSink.pointRead(spark, path, Seq("id"), Seq(137L))
    assert(hit.select("id", "payload").as[(Long, String)].collect().toSeq ==
      Seq((137L, "p137")))
    // manifest pruning: the probe reads at most 1 of the 4 files (key-hash
    // intervals are disjoint under range clustering)
    assert(hit.inputFiles.length <= 1)
    assert(MergeSink.pointRead(spark, path, Seq("id"), Seq(9999L)).isEmpty)
  }

  test("pointReadKeys: one batched probe scans exactly the union of per-key file sets") {
    val path = tmp()
    val base = (1L to 400L).map(i => (i, s"p$i")).toDF("id", "payload")
    MergeSink.merge(spark, path, base, Seq("id"), Seq(col("id")),
      targetFileRows = 100)
    val keys = Seq(3L, 137L, 291L, 9999L) // 3 present + 1 absent
    val multi = MergeSink.pointReadKeys(spark, path, Seq("id"), keys.map(Seq(_)))
    assert(multi.select("id", "payload").as[(Long, String)].collect().toSeq.sorted ==
      Seq((3L, "p3"), (137L, "p137"), (291L, "p291")))
    // pruning must not degrade under batching: the one-job scan set is
    // EXACTLY the union of the per-key pruned sets, and never more files
    // than probes (each digest lands in at most one range-clustered file)
    val perKey = keys.flatMap(k =>
      MergeSink.pointRead(spark, path, Seq("id"), Seq(k)).inputFiles).toSet
    assert(multi.inputFiles.toSet == perKey)
    assert(multi.inputFiles.length <= keys.length)
  }

  test("change feed composes across versions and null-fills evolved columns") {
    val path = tmp()
    val v1 = MergeSink.merge(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("id", "payload"),
      Seq("id"), Seq(col("id"))).version
    val v2 = MergeSink.merge(spark, path,
      Seq((2L, "B!", 7L)).toDF("id", "payload", "extra"), // adds a column
      Seq("id"), Seq(col("id"))).version
    val v3 = MergeSink.merge(spark, path,
      Seq((3L, "c", 9L)).toDF("id", "payload", "extra"),
      Seq("id"), Seq(col("id"))).version

    def signed(df: org.apache.spark.sql.DataFrame): Map[(Long, String, Option[Long]), Long] =
      df.groupBy("id", "payload", "extra").agg(sum(col(MergeSink.WeightCol)).as("w"))
        .filter(col("w") =!= 0).collect()
        .map(r => (r.getLong(0), r.getString(1),
          Option(r.get(2)).map(_.asInstanceOf[Long])) -> r.getLong(3)).toMap

    // Δ(v1→v3) ≡ Δ(v1→v2) ⊎ Δ(v2→v3) after cancellation — the feed is a
    // proper difference operator, not just adjacent-version CDC
    val direct = signed(MergeSink.changes(spark, path, v1, v3))
    val composed = signed(
      MergeSink.changes(spark, path, v1, v2)
        .unionByName(MergeSink.changes(spark, path, v2, v3)))
    assert(direct == composed)
    // rows written before `extra` existed surface as null under v3's schema
    val rm = MergeSink.changes(spark, path, v1, v2)
      .filter(col(MergeSink.WeightCol) === -1 && col("id") === 2L)
      .select("extra").collect().map(r => Option(r.get(0)))
    assert(rm.toSeq == Seq(None))
  }

  test("high-water pointer: O(1) latest-version reads survive torn, lagging and missing pointers") {
    val path = tmp()
    val ptr = new java.io.File(path, "_manifest/_last")
    MergeSink.merge(spark, path, Seq((1L, "a")).toDF("id", "payload"),
      Seq("id"), Seq(col("id")))
    MergeSink.merge(spark, path, Seq((2L, "b")).toDF("id", "payload"),
      Seq("id"), Seq(col("id")))
    MergeSink.merge(spark, path, Seq((3L, "c")).toDF("id", "payload"),
      Seq("id"), Seq(col("id")))
    // the happy path: every commit rewrote the pointer; it IS the latest
    assert(ptr.isFile)
    assert(new String(java.nio.file.Files.readAllBytes(ptr.toPath), "UTF-8").trim == "3")
    assert(MergeSink.currentVersion(path).contains(3L))
    // LAGGING pointer (a slow CAS winner's write landing after a newer
    // commit's): the forward existence probe heals it without a listing
    java.nio.file.Files.write(ptr.toPath, "1".getBytes("UTF-8"))
    assert(MergeSink.currentVersion(path).contains(3L))
    assert(content(path) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // TORN pointer (crash mid-write): unparsable → listing fallback
    java.nio.file.Files.write(ptr.toPath, "13xyz".getBytes("UTF-8"))
    assert(MergeSink.currentVersion(path).contains(3L))
    // MISSING pointer (pre-pointer table, or swept): listing fallback, and
    // the next commit restores it
    assert(ptr.delete())
    assert(MergeSink.currentVersion(path).contains(3L))
    val r = MergeSink.merge(spark, path, Seq((4L, "d")).toDF("id", "payload"),
      Seq("id"), Seq(col("id")))
    assert(r.version == 4 && ptr.isFile && MergeSink.currentVersion(path).contains(4L))
    // uninitialized sink: no pointer, no versions, None
    assert(MergeSink.currentVersion(tmp()).isEmpty)
  }

  test("pointer-based property scan: newest value wins, walks past bare commits, stops at the vacuum boundary") {
    val path = tmp()
    def put(id: Long, props: Map[String, String]): Unit = {
      MergeSink.merge(spark, path, Seq((id, s"p$id")).toDF("id", "payload"),
        Seq("id"), Seq(col("id")), properties = props)
      ()
    }
    put(1L, Map("q" -> "old", "p" -> "a")) // v1
    put(2L, Map.empty)                     // v2 (bare)
    put(3L, Map("p" -> "c"))               // v3
    put(4L, Map.empty)                     // v4 (bare)
    // newest-first through bare commits, no directory LIST
    assert(MergeSink.lastProperty(path, "p").contains("c"))
    assert(MergeSink.lastProperty(path, "q").contains("old"))
    assert(MergeSink.lastProperty(path, "nope").isEmpty)
    // vacuum drops v1/v2: the downward walk stops at the retention
    // boundary — "p" survives on v3, "q" left with its only manifest
    MergeSink.vacuum(path, keepVersions = 2)
    assert(MergeSink.versions(path) == Seq(3L, 4L))
    assert(MergeSink.currentVersion(path).contains(4L))
    assert(MergeSink.lastProperty(path, "p").contains("c"))
    assert(MergeSink.lastProperty(path, "q").isEmpty,
      "a property whose only manifest was vacuumed must not resurrect")
    assert(content(path) == Set((1L, "p1"), (2L, "p2"), (3L, "p3"), (4L, "p4")))
  }
}
