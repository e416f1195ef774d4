package graft.sources

import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** THE events read path. Batch loads (`Tables.events`), every streaming
  * drain (`EventsStream`), and the drains' file staging all come through
  * here, so the two facts a reader of `events.parquet` must get right exist
  * exactly once:
  *
  *  1. **Timestamp unit.** `ts` has shipped in two physical encodings
  *     across driver testdata generations: TIMESTAMP(NANOS) — which Spark
  *     rejects natively and, under `spark.sql.legacy.parquet.nanosAsLong`
  *     (set in Sessions.local), surfaces as a raw nanos `LongType` — and
  *     plain TIMESTAMP_MICROS, which arrives as a native timestamp. The
  *     unit is a property of the DATA, so the branch is on the column's
  *     ACTUAL arrival type read from the file footer, never an assumption
  *     baked into a hardcoded schema. (Round 6 lost all 8 streaming oracle
  *     rows to exactly that assumption: a hardcoded nanos `LongType` schema
  *     + unconditional `div 1000` shrank regenerated µs data 1000×.)
  *
  *  2. **Layout.** `events.parquet` is a single FILE in driver testdata but
  *     a DIRECTORY of part files when Spark wrote it (scaled-up bench
  *     tables). Batch reads take either transparently; the streaming file
  *     source lists its source dir non-recursively, so staging must FLATTEN
  *     the directory case into loose files.
  */
object EventsSource {

  /** Normalize `ts` to Spark's native microsecond TIMESTAMP by arrival
    * type. `div` is exact integral division — `floor(a/b)` would round
    * through double and drift by 1µs at epoch-ns magnitude (~1.7e18 >
    * 2^53). Truncation-toward-zero matches DuckDB's own ns→µs conversion
    * for post-1970 data.
    */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case _        => df.withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Batch read + unit normalization. */
  def batch(s: SparkSession, path: String): DataFrame =
    normalizeTs(s.read.parquet(path))

  /** Streaming read over a staged source dir: the stream schema is derived
    * from the staged files' own parquet footer (one driver-side metadata
    * read — file streams require an upfront schema), then the SAME
    * normalization as the batch path, so the two cannot diverge on unit.
    */
  def stream(s: SparkSession, dir: String,
             options: Map[String, String] = Map.empty): DataFrame =
    normalizeTs(s.readStream.options(options)
      .schema(s.read.parquet(dir).schema).parquet(dir))

  /** Stage a copy of `from` — a single parquet file OR a Spark-written
    * directory of part files — into `destDir` as loose `*.parquet` files
    * the streaming source can list non-recursively. `tag` suffixes every
    * staged file name (before the extension) so repeated deliveries of the
    * same source coexist in one dir: a re-delivered feed that silently
    * collides to zero new files would turn an exactly-once proof into a
    * no-op. Returns the number of files staged; callers staging a
    * redelivery should assert it is > 0.
    *
    * Each (source file, tag) may be staged into a dir at most once —
    * deliveries are distinguished by tag, so a second copy under the SAME
    * tag is a caller bug (two "deliveries" the downstream proof cannot
    * tell apart), rejected eagerly with a named error rather than letting
    * Files.copy throw a bare FileAlreadyExistsException mid-stream.
    */
  def stageInto(from: Path, destDir: Path, tag: String = ""): Int = {
    def dest(fileName: String): Path = {
      val d = destDir.resolve(fileName.stripSuffix(".parquet") + tag + ".parquet")
      require(!Files.exists(d),
        s"stageInto: $d already staged — each (source, tag) is one delivery; " +
          "use a distinct tag for a redelivery")
      d
    }
    if (Files.isDirectory(from)) {
      val children = Files.list(from)
      try {
        var n = 0
        children
          .filter(p => p.getFileName.toString.endsWith(".parquet"))
          .forEach { p =>
            Files.copy(p, dest(p.getFileName.toString)); n += 1
          }
        n
      } finally children.close()
    } else {
      Files.copy(from, dest(from.getFileName.toString))
      1
    }
  }
}
