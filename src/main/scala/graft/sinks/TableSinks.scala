package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table-writing sinks (reference: fm_dbsink.go — INSERT 38-165, APPEND
  * 167-253 with the async batching worker spi/append_worker.go).
  *
  * On Spark the two paths collapse: INSERT (row-by-row with column
  * mapping) and APPEND (bulk fast path) are both partition-parallel
  * columnar appends; the reference's max-rows/bytes/delay batching maps
  * to streaming triggers (see graft.streaming.Watch.appendWriter).
  */
object TableSinks {
  /** INSERT(cols…, table(T)): column-mapped append into a table path.
    * Missing target columns go null, extras are dropped — the
    * reference's INSERT lists the columns it fills. */
  def insert(df: DataFrame, tablePath: String, columns: Seq[String]): Unit =
    df.select(columns.map(col): _*).write.mode("append").parquet(tablePath)

  /** APPEND(table(T)): whole-row fast path, schema taken as-is. */
  def append(df: DataFrame, tablePath: String): Unit =
    df.write.mode("append").parquet(tablePath)

  /** APPEND with tag-table layout: partitioned by series name bucket so
    * per-tag scans prune files at 100 TB (name-bucket + time-ordered
    * within files). `buckets` keeps partition count bounded regardless
    * of tag cardinality. */
  def appendTagTable(df: DataFrame, tablePath: String, nameCol: String,
                     timeCol: String, buckets: Int = 64): Unit =
    df.withColumn("__name_bucket", pmod(xxhash64(col(nameCol)), lit(buckets)))
      .repartition(col("__name_bucket"))
      .sortWithinPartitions(col(nameCol), col(timeCol))
      .write.mode("append")
      .partitionBy("__name_bucket")
      .parquet(tablePath)

  /** WHEN(cond, action): per-matching-record side effect (reference
    * fm_monad.go:2171-2413 — doLog/doHttp/do-subroutine). The action runs
    * on executors via foreachPartition; the DataFrame passes through
    * unchanged, exactly like the reference's tee semantics. */
  def when_(df: DataFrame, cond: org.apache.spark.sql.Column,
            action: org.apache.spark.sql.Row => Unit): DataFrame = {
    df.filter(cond).foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      it.foreach(action)
    }
    df
  }
}
