package graft

object ProbeQ {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(4)
    import graft.server.QueryDoor
    def tryQ(sql: String): Unit =
      try {
        val df = QueryDoor.execute(spark, sql)
        println(s"OK [$sql] -> " + df.columns.mkString(",") + " | " +
          df.collect().take(3).mkString(";"))
      } catch { case e: Exception => println(s"ERR [$sql] -> ${e.getMessage.take(120)}") }
    tryQ("create tag table stmtcache (name varchar(80) primary key, time datetime basetime, value double)")
    tryQ("insert into stmtcache values ('Alice', '2024-06-01 00:00:00', 123.45)")
    tryQ("drop table stmtcache")
    tryQ("create tag table stmtcache (name varchar(80) primary key, time datetime basetime, value double)")
    tryQ("insert into stmtcache values ('Bob', '2024-06-02 00:00:00', 678.90)")
    tryQ("select * from stmtcache")
    tryQ("create index idx_data_value on stmtcache(value)")
    tryQ("select name, type from m$sys_indexes")
    tryQ("drop index idx_data_value")
    tryQ("select '' as EMPTY_VARCHAR")
    tryQ("drop table stmtcache")
    spark.stop()
  }
}
