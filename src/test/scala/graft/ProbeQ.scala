package graft
object ProbeQ {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(4)
    def t(script: String): Unit =
      try println("OK -> [" + graft.tql.Tql.run(spark, script).trim + "]")
      catch { case e: Exception => println("ERR -> " + String.valueOf(e.getMessage).take(160)) }
    t("FAKE(once(1))\nMAPVALUE(0, 1 + true)\nCSV()")
    t("FAKE(once(1))\nMAPVALUE(0, true > true)\nCSV()")
    t("FAKE(once(1))\nMAPVALUE(0, 1 =~ 'foo')\nCSV()")
    t("FAKE(once(1))\nMAPVALUE(0, 1 in 2)\nCSV()")
    t("FAKE(once(1))\nMAPVALUE(0, true ? 1 : 2)\nCSV()")
    t("FAKE(once(1))\nMAPVALUE(0, 1 && true)\nCSV()")
    t("FAKE(once(1))\nMAPVALUE(0, 'foo' =~ '[invalid')\nCSV()")
    spark.stop()
  }
}
