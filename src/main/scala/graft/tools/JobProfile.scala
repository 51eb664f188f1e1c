package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Per-JOB decomposition of a registry query's wall time — the guide-§1
  * "where does the time go" instrument for queries whose sf0.1 cost is
  * fixed overhead (jobs × stages × scheduling), not dataflow.
  *
  * For each named query: runs it `SPARK_GRAFT_RUNS` times (default 3)
  * in the Bench session shape, and prints, for the LAST run, every
  * Spark job with its wall clock, stage count and task count, plus the
  * residual (wall − Σ jobs = driver-side planning/analysis/collect
  * gaps).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.JobProfile q186_calibrated_neardup"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.get("SPARK_GRAFT_RUNS").flatMap(_.toIntOption).getOrElse(3)
    // same scratch redirect as graft.Bench: shuffle blocks on tmpfs so
    // timings measure the engine, not /tmp's disk fsync latency
    val scratch = (sys.env.get("SPARK_GRAFT_SCRATCH").toSeq ++
        Seq("/dev/shm", sys.props("java.io.tmpdir")))
      .find(p => { val f = new java.io.File(p); f.mkdirs(); f.canWrite })
      .map(_ + "/graft-bench-scratch")
    scratch.foreach { s =>
      new java.io.File(s).mkdirs()
      sys.props("java.io.tmpdir") = s
    }
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", scratch.getOrElse(sys.props("java.io.tmpdir")))
    // A/B knob: GRAFT_COALESCE=1 → coalesce post-shuffle partitions by
    // data volume (advisory size), not up to core count
    if (sys.env.get("GRAFT_COALESCE").contains("1")) {
      builder.config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      builder.config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m"): Unit
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()

    final case class JobRec(id: Int, t0: Long, var t1: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0, desc: String, names: String,
      var runMs: Long = 0L, var gcMs: Long = 0L, var deserMs: Long = 0L,
      var resSerMs: Long = 0L)
    val jobs = mutable.ArrayBuffer.empty[JobRec]
    val stageToJob = mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
        jobs += JobRec(e.jobId, e.time,
          stages = e.stageInfos.size,
          tasks = e.stageInfos.map(_.numTasks).sum,
          desc = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse(""),
          names = e.stageInfos.map(s => s.name.takeWhile(_ != ' '))
            .mkString("|")): Unit
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.find(_.id == e.jobId).foreach(_.t1 = e.time)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = jobs.synchronized {
        for {
          jid <- stageToJob.get(e.stageId)
          j <- jobs.find(_.id == jid)
          m <- Option(e.taskMetrics)
        } {
          j.runMs += m.executorRunTime
          j.gcMs += m.jvmGCTime
          j.deserMs += m.executorDeserializeTime
          j.resSerMs += m.resultSerializationTime
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // GRAFT_AB=coalesce → alternate parallelismFirst true/false per run
    // GRAFT_AB=explain → alternate spark.sql.ui.explainMode
    //   formatted/simple per run (AQE posts a plan-description string
    //   per stage update even with the UI off — this prices it)
    // (paired in-JVM samples, immune to box-noise drift between arms;
    // valid for conf that does NOT change the plan shape — plan-variant
    // alternation in one JVM measured unreliable, see bench/
    // r21_referee_sf01.txt q182)
    val abMode = sys.env.get("GRAFT_AB")
    val ab = abMode.exists(m => m == "coalesce" || m == "explain")
    for (name <- args) {
      Registry.timingPrep.get(name).foreach(_(spark, dir))
      var lastWall = 0.0
      val abWalls = mutable.Map("pfTrue" -> mutable.ArrayBuffer.empty[Double],
        "pfFalse" -> mutable.ArrayBuffer.empty[Double])
      val walls = (1 to runs).map { i =>
        val arm = if (i % 2 == 1) "pfTrue" else "pfFalse"
        if (ab && abMode.contains("coalesce")) spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.parallelismFirst",
          (arm == "pfTrue").toString)
        if (ab && abMode.contains("explain")) spark.conf.set(
          "spark.sql.ui.explainMode",
          if (arm == "pfTrue") "formatted" else "simple")
        jobs.synchronized(jobs.clear())
        val t0 = System.nanoTime()
        val n = Registry.all(name).impl(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.functions.PersistLeases.releaseAll()
        spark.catalog.clearCache()
        lastWall = dt
        if (ab) abWalls(arm) += dt
        println(f"$name run$i${if (ab) s" [$arm]" else ""}: $dt%.3f s rows=$n")
        dt
      }
      if (ab) {
        def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
        // drop each arm's first sample (codegen warm-up for that arm's
        // distinct plan shape)
        val t = abWalls("pfTrue").drop(1)
        val f = abWalls("pfFalse").drop(1)
        if (t.nonEmpty && f.nonEmpty)
          println(f"  == AB $name: pfTrue med ${med(t.toSeq)}%.3f (n=${t.size}) " +
            f"pfFalse med ${med(f.toSeq)}%.3f (n=${f.size})")
      }
      Thread.sleep(300) // let the listener bus drain the last job-end events
      val snap = jobs.synchronized(jobs.toVector)
      val jobSum = snap.map(j => (j.t1 - j.t0) / 1e3).sum
      println(f"  == last run: ${snap.size} jobs, " +
        f"${snap.map(_.stages).sum} stages, ${snap.map(_.tasks).sum} tasks; " +
        f"jobs sum $jobSum%.3f s, wall $lastWall%.3f s, " +
        f"driver residual ${lastWall - jobSum}%.3f s " +
        f"(median wall ${walls.sorted.apply(walls.size / 2)}%.3f)")
      snap.foreach { j =>
        println(f"    job ${j.id}%4d  ${(j.t1 - j.t0) / 1e3}%7.3f s  " +
          f"stages=${j.stages}%2d tasks=${j.tasks}%4d  " +
          f"run=${j.runMs / 1e3}%6.2f gc=${j.gcMs / 1e3}%5.2f " +
          f"deser=${j.deserMs / 1e3}%5.2f ${j.desc.take(30)} ${j.names.take(60)}")
      }
    }
    spark.stop()
  }
}
