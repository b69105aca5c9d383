package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-entry job profile (optimization guide §1: measure first): runs named
  * SparkEntry entries through the SAME noop-sink methodology as Bench, with
  * a listener recording every Spark job's wall time, task count and
  * description. Separates "many small orchestration jobs" from "few big
  * compute jobs" — the two need different optimizations.
  *
  * Usage: runMain graft.tools.ProbeJobs <sfDir> <entry> [entry...]
  */
object ProbeJobs {

  private final case class JobRec(id: Int, var desc: String = "",
                                  var start: Long = 0L, var end: Long = 0L,
                                  var tasks: Int = 0, var stages: Int = 0)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toList
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val r = JobRec(js.jobId)
        r.desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse(js.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct
            .mkString(" | "))
        r.start = js.time
        r.stages = js.stageInfos.size
        jobs.put(js.jobId, r)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach(_.end = je.time)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = ()
    }
    spark.sparkContext.addSparkListener(listener)

    // action-level view: one line per SQL execution (funcName, ms, plan head)
    val execs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = {
        val head = qe.optimizedPlan.toString.linesIterator
          .map(_.trim).filter(_.nonEmpty).take(3).mkString(" ⇐ ")
        execs.add(f"${durationNs / 1e9}%7.2f s  $funcName%-18s ${head.take(220)}")
      }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    })

    // warmup, like Bench
    try {
      spark.read.parquet(s"$sfDir/region.parquet")
        .groupBy("r_regionkey").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    names.foreach { name =>
      jobs.clear()
      execs.clear()
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain before reading
      import scala.jdk.CollectionConverters._
      val recs = jobs.values.asScala.toSeq.sortBy(_.id)
      val jobSec = recs.map(r => (r.end - r.start) / 1e3).sum
      println(f"===== $name: ${sec}%.2f s total, ${recs.size} jobs, ${jobSec}%.2f s inside jobs =====")
      recs.sortBy(r => -(r.end - r.start)).take(25).foreach { r =>
        println(f"  job ${r.id}%4d ${(r.end - r.start) / 1e3}%7.2f s  stages=${r.stages}%2d  ${r.desc.take(120)}")
      }
      println(s"  -- ${execs.size} tracked actions (in order):")
      execs.forEach(l => println(s"  act $l"))
    }
    spark.stop()
  }
}
