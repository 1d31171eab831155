package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev-only probe for the Structured-Streaming fixed cost (r19 item 2):
  * runs selected q_stream_* gate queries N times and dumps, per run, the
  * engine's own durationMs buckets (addBatch / walCommit / commitOffsets
  * / getBatch / latestOffset / queryPlanning / triggerExecution) plus
  * batch count and state-operator commit times — the attribution the
  * fixed-vs-kernel split in bench_full.json is too coarse for.
  *
  * Usage: `sbt "runMain graft.DevStreamProbe [sfDir] [n] [name...]"`
  */
object DevStreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else 3
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("q_stream_avg", "q_stream_movavg", "q_stream_hopping")
    val spark = graft.core.Sessions.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.streaming.numRecentProgressUpdates", "10000")
    ).getOrCreate()
    graft.core.Sessions.installRules(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$dir/events.parquet").count()
    spark.read.parquet(s"$dir/documents.parquet").count()

    val progress = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.streaming.StreamingQueryProgress]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit =
        progress.add(e.progress)
      override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    for (name <- names; run <- 1 to n) {
      progress.clear()
      graft.queries.StreamRun.lastSplit.clear()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      df.queryExecution.toRdd.count()
      val total = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a moment
      Thread.sleep(300)
      val (fx, kn) = graft.queries.StreamRun.lastSplit.getOrElse(name, (-1d, -1d))
      println(f"== $name run $run total=$total%.3f fixed=$fx%.3f kernel=$kn%.3f")
      import scala.jdk.CollectionConverters._
      progress.asScala.foreach { p =>
        println(s"  batch ${p.batchId}: rows=${p.numInputRows} durationMs=${p.durationMs}")
        p.stateOperators.foreach { so =>
          println(s"    state: updates=${so.allUpdatesTimeMs}ms removes=${so.allRemovalsTimeMs}ms commit=${so.commitTimeMs}ms rows=${so.numRowsTotal} parts=${so.numShufflePartitions}")
        }
      }
    }
    spark.stop()
  }
}
