package graft

import java.nio.file.{Files, Paths}

/** Writes `SparkEntry.oracleSql` as `<outDir>/oracle_sql.json` WITHOUT
  * running any query — the oracle side of [[Verify]]'s dump, alone.
  *
  * Exists for the oracle-restructure loop (round-12): an oracle-SQL
  * performance fix (e.g. a MATERIALIZED hint) changes no Spark output,
  * so the existing verify parquet stays valid and only this file needs
  * regenerating before re-running `tools/check.py` — at sf10 that is
  * the difference between a 2-minute re-check and a 2-hour re-verify.
  * No SparkSession is started; the map is static strings.
  *
  * Usage: `graft.DumpOracle <outDir>`
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(
      sys.error("usage: graft.DumpOracle <outDir>"))
    new java.io.File(outDir).mkdirs()
    // same escaping contract as Verify's dump (control chars included)
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"wrote ${SparkEntry.oracleSql.size} oracle entries to " +
      s"$outDir/oracle_sql.json")
  }
}
