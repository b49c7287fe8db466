package graft.tools

import java.nio.file.{Files, Paths}

/** Writes the FULL `SparkEntry.oracleSql` map as oracle_sql.json into
  * the given directory — the chunked full-scale gate runs Verify in
  * name subsets (each of which dumps only its own oracle slice), and
  * the final check needs the complete map in one file.
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
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
    Files.createDirectories(Paths.get(outDir))
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"[dump-oracle] ${graft.SparkEntry.oracleSql.size} entries")
  }
}
