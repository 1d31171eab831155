package graft.functions

import org.apache.spark.sql.SparkSession

/** Registers the reference's scalar-function names in Spark SQL so the
  * `/db/query` front door accepts TQL-style expressions (reference
  * registry: fx_definitions.go:77-334). Names that map 1:1 onto Spark
  * built-ins are NOT re-registered (callers use the native name — see
  * ScalarFns.aliases); only the missing ones are added.
  */
object SqlRegistry {
  @volatile private var done = Set.empty[SparkSession]

  def registerAll(spark: SparkSession): Unit = {
    if (done.contains(spark)) return
    synchronized {
      // native Expressions (codegen-adjacent, plan-visible)
      ArrayExprs.register(spark)
      // machbase datetime↔int64 converters (fm_dbsrc.go:191 bucket SQL;
      // see plans/MachTime). to_timestamp shadows the Spark builtin in
      // this session registry — door SQL wants the engine's semantics
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction("to_timestamp",
        graft.plans.MachTime.toTimestampBuilder, "built-in")
      reg.createOrReplaceTempFunction("from_timestamp",
        graft.plans.MachTime.fromTimestampBuilder, "built-in")
      // thin Scala UDFs for the long-tail scalar names Spark lacks
      spark.udf.register("glob", (pattern: String, text: String) =>
        text != null && pattern != null &&
          java.util.regex.Pattern.matches(ScalarFns.globToRegex(pattern), text))
      // machbase integer bit functions (machsvr_test.go TestBitTypeColumn;
      // float/double arguments are rejected at the door with MACH-ERR 2037)
      spark.udf.register("BITAND", (a: Long, b: Long) => a & b)
      spark.udf.register("BITOR", (a: Long, b: Long) => a | b)
      spark.udf.register("simplex", (seed: Long, x: Double) => Noise.simplex1(seed, x))
      spark.udf.register("simplex2", (seed: Long, x: Double, y: Double) =>
        Noise.simplex2(seed, x, y))
      spark.udf.register("roundTime", (t: Long, dur: String) => {
        val p = graft.time.TimeFns.parseDurationNs(dur)
        t - java.lang.Math.floorMod(t, p)
      })
      spark.udf.register("timeAdd", (t: Long, dur: String) =>
        t + graft.time.TimeFns.parseDurationNs(dur))
      spark.udf.register("parseTimeNs", (s: String, fmt: String) => {
        val pattern = graft.time.TimeFns.translateTimeformat(fmt)
        val f = java.time.format.DateTimeFormatter.ofPattern(pattern)
          .withZone(java.time.ZoneOffset.UTC)
        val inst = java.time.Instant.from(f.parse(s))
        inst.getEpochSecond * 1000000000L + inst.getNano
      })
      spark.udf.register("isIPv4", (s: String) =>
        s != null && s.matches("^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$"))
      spark.udf.register("isIPv6", (s: String) =>
        s != null && s.contains(":") && (try {
          java.net.InetAddress.getByName(s).isInstanceOf[java.net.Inet6Address]
        } catch { case _: Exception => false }))
      // geo constructors (fx_definitions.go:111-119, nums/geography.go):
      // SQL surface takes [lat,lon] pairs and emits the same layer/feature
      // JSON text the TQL expressions build (GEOMAP parses it back)
      def pt(ll: Seq[Double], lonLat: Boolean): String =
        if (lonLat) s"[${ll(1)},${ll(0)}]" else s"[${ll(0)},${ll(1)}]"
      def feature(t: String, coords: String): String =
        s"""{"type":"Feature","geometry":{"type":"$t","coordinates":$coords},"properties":{}}"""
      def layer(t: String, coord: String, props: String = "{}"): String =
        s"""{"type":"$t","coordinates":$coord,"properties":$props}"""
      spark.udf.register("latlon", (lat: Double, lon: Double) => Array(lat, lon))
      spark.udf.register("geoPoint", (ll: Seq[Double]) =>
        feature("Point", pt(ll, lonLat = true)))
      spark.udf.register("geoLineString", (a: Seq[Double], b: Seq[Double]) =>
        feature("LineString", s"[${pt(a, lonLat = true)},${pt(b, lonLat = true)}]"))
      spark.udf.register("geoPointMarker", (ll: Seq[Double]) =>
        layer("marker", pt(ll, lonLat = false)))
      spark.udf.register("geoCircle", (ll: Seq[Double], r: Double) =>
        layer("circle", pt(ll, lonLat = false), s"""{"radius":${graft.sinks.GoJs.goNum(r)}}"""))
      spark.udf.register("geoCircleMarker", (ll: Seq[Double], r: Double) =>
        layer("circleMarker", pt(ll, lonLat = false), s"""{"radius":${graft.sinks.GoJs.goNum(r)}}"""))
      done += spark
    }
  }
}
