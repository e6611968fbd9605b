package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Optimization-round profiler (guide §1): runs named queries under the
  * exact Bench session and prints WHERE the wall-clock goes — per-job
  * wall intervals (with descriptions/callsites), per-stage task-time and
  * shuffle bytes, and the DRIVER GAP (wall time covered by no running
  * job: plan/commit/listing work that executor metrics can't see).
  *
  * Usage: runMain graft.ProfileQuery <queryName> [queryName ...]
  * Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like Bench. Each query
  * runs twice; the second (warm) run is the one profiled.
  */
object ProfileQuery {
  final case class JobRec(id: Int, var desc: String, start: Long,
      var end: Long = 0L)
  final case class StageRec(id: Int, name: String, var taskMs: Long = 0L,
      var shufReadB: Long = 0L, var shufWriteB: Long = 0L,
      var inputB: Long = 0L, var tasks: Int = 0)

  class Prof extends SparkListener {
    val jobs = mutable.LinkedHashMap[Int, JobRec]()
    val stages = mutable.LinkedHashMap[Int, StageRec]()
    val execs = mutable.LinkedHashMap[Long, (Long, Long)]() // id -> (start, end)
    val execDesc = mutable.LinkedHashMap[Long, String]() // id -> callsite
    var enabled = false
    override def onOtherEvent(e: SparkListenerEvent): Unit = if (enabled)
      e match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          execs(s.executionId) = (s.time, 0L)
          execDesc(s.executionId) = s.description.linesIterator
            .nextOption().getOrElse("?").take(100)
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd =>
          execs.get(s.executionId).foreach(t =>
            execs(s.executionId) = (t._1, s.time))
        case _ => ()
      }
    override def onJobStart(e: SparkListenerJobStart): Unit = if (enabled) {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .orElse(Option(e.properties).flatMap(p =>
          // attribute SQL-execution jobs to their execution's callsite
          Option(p.getProperty("spark.sql.execution.id")).map(id =>
            "sql#" + id + " " + execDesc.getOrElse(id.toLong, "")))
          .filter(_.nonEmpty))
        .orElse(Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))))
        .getOrElse("?")
      jobs(e.jobId) = JobRec(e.jobId, desc, e.time)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = if (enabled)
      jobs.get(e.jobId).foreach(_.end = e.time)
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      if (enabled) {
        val si = e.stageInfo
        val r = stages.getOrElseUpdate(si.stageId,
          StageRec(si.stageId, si.name))
        r.taskMs += si.taskMetrics.executorRunTime
        r.shufReadB += si.taskMetrics.shuffleReadMetrics.totalBytesRead
        r.shufWriteB += si.taskMetrics.shuffleWriteMetrics.bytesWritten
        r.inputB += si.taskMetrics.inputMetrics.bytesRead
        r.tasks += si.numTasks
      }
    def reset(): Unit = { jobs.clear(); stages.clear(); execs.clear() }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // same default as Bench.scala so an env-less profile represents what
    // Bench measures (parallelism, shuffle.partitions, skew behavior)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val prof = new Prof
    spark.sparkContext.addSparkListener(prof)
    try SparkEntry.entry(spark).count()
    catch { case e: Throwable => System.err.println(s"warmup: $e") }
    // Optional: dump .explain("formatted") per query into this dir
    // (plans/r16 deliverable). Dumped from the warm run's DataFrame.
    val plansDir = sys.env.get("SPARK_GRAFT_PLANS_DIR")
    val plansSuffix = sys.env.getOrElse("SPARK_GRAFT_PLANS_SUFFIX", "before")
    // validate names up front: a typo aborts BEFORE any query runs (and
    // with near-matches), instead of a NoSuchElementException mid-run
    val unknown = args.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      val near = unknown.map(u => u + " (try: " + SparkEntry.queries.keys
        .filter(_.take(4) == u.take(4)).take(3).mkString(", ") + ")")
      System.err.println(s"unknown queries: ${near.mkString("; ")}")
      spark.stop(); sys.exit(2)
    }
    try {
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      // cold run (not profiled) to absorb JIT/classload for this path
      fn(spark, sfDir).count()
      plansDir.foreach { d =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(d, s"${name}_$plansSuffix.txt"), txt)
      }
      prof.reset(); prof.enabled = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wallMs = (System.nanoTime() - t0) / 1e6
      // drain the async listener bus BEFORE disabling, so trailing
      // JobEnd/StageCompleted/SQLExecutionEnd events still land (an
      // undrained bus leaves end=0 records that inflate driverGap);
      // listenerBus is private[spark], hence reflection
      try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethod("waitUntilEmpty", java.lang.Long.TYPE)
          .invoke(bus, java.lang.Long.valueOf(2000L))
      } catch { case _: Throwable => Thread.sleep(300) }
      prof.enabled = false
      // merge job intervals to compute driver-gap
      val iv = prof.jobs.values.toSeq.filter(_.end > 0)
        .map(j => (j.start, j.end)).sortBy(_._1)
      var covered = 0L; var cs = -1L; var ce = -1L
      for ((s0, e0) <- iv) {
        if (s0 > ce) { covered += ce - cs max 0; cs = s0; ce = e0 }
        else if (e0 > ce) ce = e0
      }
      covered += (ce - cs) max 0
      // union of SQL-execution intervals: wall inside executions but not
      // inside jobs = planning/AQE/codegen; wall outside executions =
      // driver protocol work (FS ops, manifest IO) + non-SQL actions
      val eiv = prof.execs.values.toSeq.filter(_._2 > 0).sortBy(_._1)
      var ecov = 0L; var es = -1L; var ee = -1L
      for ((s0, e0) <- eiv) {
        if (s0 > ee) { ecov += ee - es max 0; es = s0; ee = e0 }
        else if (e0 > ee) ee = e0
      }
      ecov += (ee - es) max 0
      println(f"%n=== $name  wall=${wallMs / 1e3}%.3f s  " +
        f"jobs=${prof.jobs.size}  jobCovered=${covered / 1e3}%.3f s  " +
        f"driverGap=${(wallMs - covered) / 1e3}%.3f s  " +
        f"sqlExecs=${prof.execs.size} sqlCovered=${ecov / 1e3}%.3f s ===")
      val byDesc = prof.jobs.values.toSeq.filter(_.end > 0)
        .groupBy(_.desc).view
        .mapValues(js => (js.size, js.map(j => j.end - j.start).sum))
        .toSeq.sortBy(-_._2._2)
      for ((d, (n, ms)) <- byDesc.take(18))
        println(f"  job  ${ms / 1e3}%8.3f s  x$n%-3d  $d")
      val topStages = prof.stages.values.toSeq.sortBy(-_.taskMs).take(12)
      for (s <- topStages)
        println(f"  stg  ${s.taskMs / 1e3}%8.3f s(task)  tasks=${s.tasks}%-4d " +
          f"in=${s.inputB / 1e6}%.1fMB sr=${s.shufReadB / 1e6}%.1fMB " +
          f"sw=${s.shufWriteB / 1e6}%.1fMB  ${s.name.take(90)}")
    }
    } finally spark.stop()
  }
}
