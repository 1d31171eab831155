package graft.server

import org.apache.spark.sql.SparkSession

/** Path router for the `/web/api` management surface — the live HTTP
  * edge over the same handlers the specs drive directly (reference route
  * table mods/server/http.go:268-335). Mounted on the loopback server by
  * [[HttpLoop.ensureServer]]; any unrouted path replies 404 with the
  * standard envelope. */
object WebRoutes {

  private def notFound(path: String): WebApi.HttpReply =
    WebApi.HttpReply(404, "application/json",
      s"""{"success":false,"reason":${graft.sinks.GoJs.quote(s"'$path' not found")}}""")

  /** Dispatch one request under the `/web/api` prefix. */
  def route(spark: SparkSession, method: String, path: String,
            body: String): WebApi.HttpReply =
    route(spark, method, path, Map.empty, body)

  def route(spark: SparkSession, method: String, path: String,
            query: Map[String, Seq[String]], body: String,
            bodyBytes: Array[Byte] = null): WebApi.HttpReply = {
    val parts = path.stripPrefix("/web/api").stripPrefix("/")
      .split("/", -1).toList.filter(_.nonEmpty)
    (method.toUpperCase, parts) match {
      // tables / tags / tag stat (http.go:277-280)
      case ("GET", List("tables")) => WebApi.tablesReply(spark, query)
      case ("GET", List("tables", table, "tags")) =>
        WebApi.tagsReply(spark, table, query)
      case ("GET", List("tables", table, "tags", tag, "stat")) =>
        WebApi.tagStatReply(spark, table, tag, query)
      // timers (http.go:310-315)
      case ("GET", List("backup", "archives")) => Backup.archivesReply()
      case ("POST", List("backup", "archive")) => Backup.archiveReply(spark, body)
      case ("GET", List("backup", "archive", "status")) => Backup.statusReply()
      case ("GET", List("backup", "mounts")) => Backup.mountsReply()
      case ("POST", List("backup", "mounts", name)) =>
        Backup.mountReply(spark, name, body)
      case ("DELETE", List("backup", "mounts", name)) =>
        Backup.unmountReply(spark, name)
      // trailing-slash = empty :name param (backupd.go:367-372, 425-430)
      case ("POST" | "DELETE", List("backup", "mounts")) =>
        Backup.mountReply(spark, "", body)

      case ("GET", List("timers")) => WebApi.timersList(spark)
      case ("GET", List("timers", name)) => WebApi.timerGet(spark, name)
      case ("POST", List("timers")) => WebApi.timersAdd(spark, body)
      case ("POST", List("timers", name, "state")) =>
        WebApi.flatJsonSafe(body).get("state").map(_.toUpperCase) match {
          case Some("START") => WebApi.timersStartStop(spark, name, start = true)
          case Some("STOP") => WebApi.timersStartStop(spark, name, start = false)
          case _ => WebApi.HttpReply(400, "application/json",
            """{"success":false,"reason":"invalid state"}""")
        }
      case ("PUT", List("timers", name)) => WebApi.timersUpdate(spark, name, body)
      case ("DELETE", List("timers", name)) => WebApi.timersDelete(spark, name)
      // bridges (http.go:316-319)
      case ("GET", List("bridges")) => WebApi.bridgesList()
      case ("POST", List("bridges")) => WebApi.bridgesAdd(body)
      case ("POST", List("bridges", name, "state")) => WebApi.bridgesState(spark, name, body)
      case ("DELETE", List("bridges", name)) => WebApi.bridgesDelete(name)
      // subscribers (http.go:320-324)
      case ("GET", List("subscribers")) => WebApi.subscribersList(spark)
      case ("GET", List("subscribers", name)) => WebApi.subscriberGet(spark, name)
      case ("POST", List("subscribers")) => WebApi.subscribersAdd(spark, body)
      case ("POST", List("subscribers", name, "state")) =>
        WebApi.subscribersState(spark, name, body)
      case ("DELETE", List("subscribers", name)) =>
        WebApi.subscribersDelete(spark, name)
      // statz output-table config (http.go handleStatzConfig; also
      // mounted at /debug/statz/config)
      case (m, List("statz", "config")) => WebApi.statzConfig(m, body)
      // script file manager (http.go:1586-1775 handleFiles over ssfs)
      case (m, "files" :: rest) =>
        ServerFiles.handle(m, "/" + rest.mkString("/"), query, body, bodyBytes)
      // splitters / rpc / refs (http.go:297-299, 332)
      case ("POST", List("splitter", "sql")) => WebApi.splitterSql(body)
      case ("POST", List("splitter", "http")) => WebApi.splitterHttp(body)
      case ("POST", List("rpc")) => JsonRpc.handleHttpRpc(spark, body)
      case ("GET", "refs" :: rest) => WebApi.refs("/" + rest.mkString("/"))
      case _ => notFound(path)
    }
  }

  /** Dispatch one request under the `/lakes` prefix (reference lake
    * handler group, http.go:341-347). */
  def routeLake(spark: SparkSession, method: String, path: String,
                query: Map[String, Seq[String]], body: String): WebApi.HttpReply = {
    val parts = path.stripPrefix("/lakes").stripPrefix("/")
      .split("/", -1).toList.filter(_.nonEmpty)
    (method.toUpperCase, parts) match {
      case ("GET", List("tags")) => LakeDoor.getTagList(spark, query)
      case ("GET", List("values", typ)) => LakeDoor.getValues(spark, typ, query)
      case ("GET", List("values")) => LakeDoor.getValues(spark, "", query)
      case ("POST", List("values")) => LakeDoor.postValues(spark, "", body)
      case ("POST", List("values", typ)) => LakeDoor.postValues(spark, typ, body)
      case ("POST", List("inter", "execquery")) => LakeDoor.execQuery(spark, body)
      case _ => notFound(path)
    }
  }
}
