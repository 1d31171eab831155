package graft

/** Dev-only: run one query and print per-Spark-job wall times + stage
  * counts, so the cost of multi-job driver loops (GD iterations,
  * checkpoints, collects) is attributable. Not part of the gate.
  * Usage: sbt "runMain graft.DevJobTrace <sfDir> <query> [n]" */
object DevJobTrace {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args(1)
    val n = if (args.length > 2) args(2).toInt else 2
    val spark = graft.core.Sessions.local(32)
    val jobs = new scala.collection.concurrent.TrieMap[Int, (Long, Int)]
    val done = new scala.collection.concurrent.TrieMap[Int, Long]
    val stages = new scala.collection.concurrent.TrieMap[Int, (String, Long, Long, Int)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (js.time, js.stageIds.length))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        done.put(je.jobId, je.time)
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.put(si.stageId, (si.name.take(60),
          si.taskMetrics.executorRunTime, si.taskMetrics.executorCpuTime / 1000000L,
          si.numTasks))
      }
    })
    val fn = SparkEntry.queries(name)
    for (run <- 1 to n) {
      jobs.clear(); done.clear(); stages.clear()
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      df.queryExecution.toRdd.count()
      val tTotal = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"== $name run $run: build=${tBuild}%.2f total=${tTotal}%.2f ==")
      jobs.toSeq.sortBy(_._1).foreach { case (id, (t0j, nst)) =>
        val dur = done.get(id).map(t => (t - t0j) / 1e3).getOrElse(-1d)
        println(f"  job $id%3d  ${dur}%6.2f s  stages=$nst")
      }
      stages.toSeq.sortBy(_._1).foreach { case (id, (nm, run, cpu, nt)) =>
        if (run > 20)
          println(f"  stage $id%3d run=${run / 1e3}%6.2f cpu=${cpu / 1e3}%6.2f tasks=$nt%3d  $nm")
      }
    }
    spark.stop()
  }
}
