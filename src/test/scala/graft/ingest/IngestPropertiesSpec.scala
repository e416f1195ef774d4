package graft.ingest

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** ScalaCheck properties for the ingest spine (SURVEY.md §5.4):
  * idempotence, watermark monotonicity, and null-robustness of the
  * normalizers under randomly-missing payload fields — the reference's
  * dominant failure mode.
  */
class IngestPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(name: String, prop: Prop, n: Int): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(n)
      .withInitialSeed(Seed(42L))
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name failed: ${res.status}")
  }

  private val ts1 = Timestamp.valueOf("2025-01-01 00:00:00")
  private val ts2 = Timestamp.valueOf("2025-02-01 00:00:00")
  private val ts3 = Timestamp.valueOf("2025-03-01 00:00:00")

  test("property: sink append is idempotent and dedups null-safe on the key") {
    import spark.implicits._
    val rowGen = for {
      id <- Gen.oneOf("a", "b", "c", "d", None.orNull.asInstanceOf[String])
      text <- Gen.option(Gen.alphaStr.map(_.take(8)))
      ts <- Gen.oneOf(ts1, ts2, ts3)
    } yield (id, text.orNull, ts)
    val batchGen = Gen.nonEmptyListOf(rowGen).map(_.take(12))
    val prop = Prop.forAll(batchGen) { rows =>
      val sink = Files.createTempDirectory("prop-sink").toString + "/t"
      val df = rows.toDF("tweet_id", "text", "created_at")
      val r1 = DedupSink.append(spark, sink, df, Seq("tweet_id"), Seq(col("created_at")))
      val content1 = spark.read.parquet(sink).collect().toSet
      val r2 = DedupSink.append(spark, sink, df, Seq("tweet_id"), Seq(col("created_at")))
      val content2 = spark.read.parquet(sink).collect().toSet
      // one row per distinct key (nulls collapse: null-safe semantics),
      // second append inserts nothing and changes nothing
      r1.inserted == rows.map(_._1).distinct.size &&
        r2.inserted == 0L && content1 == content2 &&
        content1.size == rows.map(_._1).distinct.size
    }
    check("sink idempotence", prop, n = 8)
  }

  test("property: watermark only moves forward under any advance sequence") {
    val seqGen = Gen.nonEmptyListOf(Gen.oneOf(ts1, ts2, ts3)).map(_.take(5))
    val prop = Prop.forAll(seqGen) { advances =>
      val usersPath = Files.createTempDirectory("prop-wm").toString + "/users"
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(
          Seq(1, "A", null, null, "h", null, null, null, null) ++ Seq.fill(10)(null): _*)), 1),
        graft.schema.Schemas.users)
      Watermarks.overwriteParquet(spark, usersPath, df)
      val observed = advances.map { t =>
        Watermarks.advance(spark, usersPath, "twitter", Set(1), t)
        Watermarks.read(spark, usersPath).collect().head
          .getAs[Timestamp]("last_fetched_twitter")
      }
      // monotone non-decreasing, and the final value is the running max
      observed.zip(observed.tail).forall { case (a, b) => !b.before(a) } &&
        observed.last == advances.max
    }
    check("watermark monotonicity", prop, n = 6)
  }

  test("property: twitter normalize never throws on randomly-missing fields; F3 drops exactly null-createdAt") {
    val recGen: Gen[String] = for {
      id <- Gen.option(Gen.identifier.map(_.take(6)))
      created <- Gen.option(Gen.oneOf(
        "Wed May 14 09:00:01 +0000 2025", "Thu May 15 12:00:00 +0000 2025", "garbage"))
      author <- Gen.option(Gen.alphaStr.map(_.take(5)))
      likes <- Gen.option(Gen.choose(0, 99))
    } yield {
      val fields = Seq(
        id.map(v => s""""id":"$v""""),
        created.map(v => s""""createdAt":"$v""""),
        author.map(v => s""""author":{"name":"$v"}"""),
        likes.map(v => s""""likeCount":$v""")).flatten
      fields.mkString("{", ",", "}")
    }
    val batchGen = Gen.nonEmptyListOf(recGen).map(_.take(10))
    val prop = Prop.forAll(batchGen) { recs =>
      val dir = Files.createTempDirectory("prop-raw")
      val f = dir.resolve("twitter"); f.toFile.mkdirs()
      Files.write(f.resolve("h.json"), recs.mkString("\n").getBytes)
      val connector = new FixtureConnector("twitter", dir.toString,
        graft.schema.Schemas.twitterRaw)
      val raw = connector.fetch(spark, Company(1, "C", Some("h")), FetchParams())
      val out = Normalize.twitter(raw, lit("C"), lit("h"),
        lit(Timestamp.valueOf("2025-06-01 00:00:00"))).collect()
      val expected = recs.count(_.contains("\"createdAt\"")) // F3: createdAt present
      out.length == expected &&
        out.forall(r => r.getAs[String]("company_name") == "C") && // P12 total
        out.forall(r => !r.isNullAt(r.fieldIndex("fetched_at"))) && // P13 total
        out.forall(r => r.getAs[Int]("reply_count") >= 0) // orZero total
    }
    check("null-robust normalize", prop, n = 8)
  }
}
