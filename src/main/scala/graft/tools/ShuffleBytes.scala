package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Dev-only: measure TOTAL SHUFFLE WRITE BYTES (plus wall) of named
  * queries — the evidence line for shuffle-volume claims (the r11
  * hash-keyed ExactSubstr row). Also accepts the synthetic name
  * `dd_exact_substr_stringform`, which runs the PRE-r11 string-keyed
  * plan of dd_exact_substr (reconstructed here, measurement-only) so the
  * two key encodings can be compared on identical data.
  *
  * Usage: runMain graft.tools.ShuffleBytes <sfDir> <query>[,<query>...]
  */
object ShuffleBytes {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val spark = graft.Sessions.local(appName = "graft-shufflebytes")
    spark.sparkContext.setLogLevel("ERROR")
    val bytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten); () }
      }
    })
    def run(n: String): org.apache.spark.sql.DataFrame = n match {
      case "dd_exact_substr_stringform" => stringForm(spark, dir)
      case q =>
        graft.SparkEntry.prestage.get(q).foreach(_(spark, dir))
        graft.SparkEntry.queries(q)(spark, dir)
    }
    for (n <- names) {
      run(n).write.format("noop").mode("overwrite").save() // warm (JIT, cache)
      Thread.sleep(1500) // drain listener events from the warmup
      bytes.set(0L)
      val t0 = System.nanoTime()
      run(n).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // let the listener bus drain before reading
      println(f"== $n%-32s wall=$wall%7.2f s  shuffleWrite=${bytes.get()}%12d bytes")
    }
    spark.stop()
  }

  /** The pre-r11 dd_exact_substr: occurrence counts grouped on the WINDOW
    * STRING (the shape whose corpus-sized exchange shipped ~W words per
    * row). Kept only as the measurement baseline for the hash-keyed form.
    */
  private def stringForm(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val SpanW = graft.analytics.DedupQueries.SpanW // THE shared window width
    val toks = split(col("text"), " ")
    def grams = graft.Tables.documents(s, dir)
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= SpanW)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("toks")) - SpanW),
          i => array_join(slice(col("toks"), i + 1, lit(SpanW)), " "))).as("s"))
    val dups = grams.groupBy("s").agg(count(lit(1)).as("occ"))
      .filter(col("occ") > 1).select(col("s"), lit(1L).as("dup"))
    grams.join(dups, Seq("s"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_win"),
        sum(coalesce(col("dup"), lit(0L))).as("n_dup"))
  }
}
