package graft.tools

import java.nio.file.{Files, Paths}

/** Dev-only: dump SparkEntry.oracleSql as oracle_sql.json WITHOUT running
  * any Spark query — for profiling the DuckDB side of the gate alone.
  * Usage: runMain graft.tools.DumpOracle <outFile>
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val Array(out) = args
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json)
    ()
  }
}
