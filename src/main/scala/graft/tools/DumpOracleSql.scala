package graft.tools

import java.nio.file.{Files, Paths}

/** Writes SparkEntry.oracleSql as JSON without running any query —
  * feeds tools/profile_oracle.py so the per-entry DuckDB cost profile
  * can be re-measured in seconds, not after a full Verify dump.
  * (Round 14's CORRECTNESS artifact came back empty because the oracle
  * suite's cost had silently grown past the driver's budget; the
  * profile makes that growth visible BEFORE it zeroes a round.) */
object DumpOracleSql {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql.json")
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
    println(s"[dump-oracle] ${graft.SparkEntry.oracleSql.size} entries -> $out")
  }
}
