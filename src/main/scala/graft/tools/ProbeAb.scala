package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-session A/B timing harness (optimization guide §1: this host shows
  * multi-x wall-clock noise BETWEEN runs, so before/after comparisons from
  * separate sessions are unusable; interleaved reps inside ONE session share
  * the noise window). Runs each named entry alternating a session conf
  * between two values, reports per-mode medians.
  *
  * Usage: runMain graft.tools.ProbeAb <sfDir> <reps> <confKey> <valA> <valB> <entry...>
  * valA/valB value "-" means unset (library default).
  */
object ProbeAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val confKey = args(2)
    val valA = args(3)
    val valB = args(4)
    val names = args.drop(5).toList
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      spark.read.parquet(s"$sfDir/region.parquet")
        .groupBy("r_regionkey").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    def setMode(v: String): Unit =
      if (v == "-") spark.conf.unset(confKey) else spark.conf.set(confKey, v)

    val times = scala.collection.mutable.Map[(String, String), List[Double]]()
      .withDefaultValue(Nil)
    for (r <- 1 to reps; mode <- Seq(valA, valB); name <- names) {
      setMode(mode)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      times((name, mode)) = sec :: times((name, mode))
      println(f"AB rep=$r mode=$mode $name ${sec}%.2f s")
    }
    def med(xs: List[Double]): Double = {
      val s = xs.sorted; s(s.size / 2)
    }
    names.foreach { n =>
      val a = med(times((n, valA))); val b = med(times((n, valB)))
      // min is the noise-robust estimator for repeated identical work on a
      // host with multiplicative neighbor noise
      val am = times((n, valA)).min; val bm = times((n, valB)).min
      println(f"AB-RESULT $n $confKey: A=$valA med=${a}%.2f min=${am}%.2f s  " +
        f"B=$valB med=${b}%.2f min=${bm}%.2f s  Bmin/Amin=${bm / am}%.3f")
    }
    spark.stop()
  }
}
