package graft.tools

import java.nio.file.{Files, Paths}

/** Dev-only: dump SparkEntry.oracleSql as oracle_sql.json WITHOUT
  * running any query — feeds tools/audit_oracle_types.py, which binds
  * every oracle through DuckDB `DESCRIBE` and flags output columns
  * whose DuckDB type a hash-based comparer handles differently from
  * the Spark parquet type (HUGEINT from SUM(BIGINT), `//` on HUGEINT,
  * uncast DECIMAL) — the root cause of the r5/r6 m05/p18 driver-gate
  * hash mismatches that value-coercing comparers cannot reproduce.
  */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("target/oracle_sql.json")
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
    Files.createDirectories(Paths.get(out).getParent)
    Files.writeString(Paths.get(out), json)
    println(s"wrote ${graft.SparkEntry.oracleSql.size} oracles to $out")
  }
}
