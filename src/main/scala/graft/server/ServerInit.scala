package graft.server

import org.apache.spark.sql.SparkSession

/** Server init-script execution — the reference runs `CreateDBQueries`/
  * `StartupQueries` and `*.sql` script files at boot (reference
  * mods/server/server.go:843-874, loadSqlScriptFile at 2811-2854).
  *
  * Loader semantics match the Go reader exactly (server_test.go:
  * 2108-2136 TestLoadSqlScriptFile):
  *   - `#` / `--` comment lines skip only at column 0 (the prefix test
  *     runs BEFORE TrimSpace in the reference);
  *   - blank lines (after trim) skip;
  *   - statements accumulate line-by-line until one ends with `;`,
  *     then join with single spaces and drop the terminator;
  *   - an unterminated trailing statement is DROPPED silently.
  */
object ServerInit {

  def loadSqlScript(text: String): Seq[String] = {
    val ret = Seq.newBuilder[String]
    var lineBuff = Vector.empty[String]
    text.split("\n", -1).foreach { raw =>
      val line = raw.stripSuffix("\r")
      if (!line.startsWith("#") && !line.startsWith("--")) {
        val sub = line.trim
        if (sub.nonEmpty) {
          lineBuff :+= sub
          if (sub.endsWith(";")) {
            ret += lineBuff.mkString(" ").stripSuffix(";")
            lineBuff = Vector.empty
          }
        }
      }
    }
    ret.result()
  }

  /** Run every statement of an init script through the exec door,
    * stopping at the first failure like the reference's runSqlScripts
    * (server.go:2784-2809 returns the first error). Returns the
    * per-statement result messages. */
  def runSqlScript(spark: SparkSession, text: String): Seq[String] =
    loadSqlScript(text).map { stmt =>
      val df = QueryDoor.execute(spark, stmt)
      if (df.columns.sameElements(Array("MESSAGE")))
        df.collect().headOption.map(_.getString(0)).getOrElse("executed.")
      else "executed."
    }
}
