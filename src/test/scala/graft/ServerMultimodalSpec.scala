package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.server.QueryDoor

class ServerMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("query door classifies and executes SELECT / SHOW / DESC / EXPLAIN") {
    spark.read.parquet(s"$sf/nation.parquet").createOrReplaceTempView("nation")
    assert(QueryDoor.detect("select 1") == QueryDoor.Select)
    assert(QueryDoor.detect(" SHOW TABLES") == QueryDoor.Show)
    assert(QueryDoor.detect("create table t(a int)") == QueryDoor.DdlDml)
    assert(QueryDoor.detect("EXPLAIN select 1") == QueryDoor.Explain)

    val rows = QueryDoor.execute(spark, "SELECT count(*) AS n FROM nation").collect()
    assert(rows.head.getLong(0) == 25L)

    val tables = QueryDoor.execute(spark, "SHOW TABLES")
      .select("TABLE_NAME").as[String].collect()
    assert(tables.contains("nation"))

    val desc = QueryDoor.execute(spark, "DESC nation").collect()
    assert(desc.length == 3 && desc(0).getString(1) == "n_nationkey")

    val plan = QueryDoor.execute(spark, "EXPLAIN SELECT * FROM nation WHERE n_nationkey = 1")
      .as[String].collect().mkString("\n")
    assert(plan.contains("Scan parquet") || plan.contains("FileScan"))
  }

  test("query door renders the JSON envelope wire format") {
    val out = QueryDoor.query(spark, "SELECT 1 AS one", "JSON")
    assert(out.contains("\"columns\":[\"one\"]") && out.contains("\"rows\":[[1]]"))
  }

  test("multimodal meta sniffs media type without decoding") {
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0x01, 0x02)
    val wav = "RIFFxxxxWAVE".getBytes("ISO-8859-1")
    val df = Seq((1L, jpeg), (2L, wav)).toDF("id", "payload")
    val got = Multimodal.withMeta(df, "payload")
      .select($"id", $"meta.media_type", $"meta.n_bytes")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, "image/jpeg", 5L)))
    assert(got(1) == ((2L, "audio/wav", 12L)))
  }

  test("decodeFeatures produces deterministic fixed-dim vectors in batches") {
    val df = (0L until 10L).map(i => (i, Array.fill((i + 1).toInt * 10)(i.toByte)))
      .toDF("id", "payload")
    val feats = Multimodal.decodeFeatures(df, "id", "payload", dim = 8, batchSize = 3)
    val rows = feats.collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getSeq[Float](1).size == 8))
    // deterministic: same input → same feature
    val again = Multimodal.decodeFeatures(df, "id", "payload", dim = 8, batchSize = 7).collect()
    assert(rows.map(r => (r.getLong(0), r.getSeq[Float](1))).toMap ==
      again.map(r => (r.getLong(0), r.getSeq[Float](1))).toMap)
  }

  test("sampleFrames windows a blob into frames") {
    val blob = (0 until 100).map(_.toByte).toArray
    val df = Seq((1L, blob)).toDF("id", "payload")
    val frames = Multimodal.sampleFrames(df, "id", "payload", frameBytes = 10, everyNth = 2)
    val got = frames.select("frame_idx", "frame").collect()
    assert(got.length == 5)
    assert(got.head.getAs[Array[Byte]](1).length == 10)
  }
}
