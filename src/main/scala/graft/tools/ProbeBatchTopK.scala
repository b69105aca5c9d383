package graft.tools

import graft.ext.{Ann, Pq}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the r19 batched top-k ranking (OPTIMIZATION_r19 §7c):
  * replicate the sf0.1 vectors `copies`× (400 → ~800k vectors), then
  * interleave the old per-query-scan arm and the new one-scan arm of
  * `Ann.exactTopK` and `Pq.adcTopK` inside ONE session (the host's
  * between-run noise makes separate runs incomparable — same methodology
  * as ProbeAb, min-of-reps reported). Also pins output EQUALITY of the two
  * arms at this scale (50-row result sets, set-compared).
  *
  * Writes BENCH_scale_<copies>x_r19batch.json in the cwd. Run:
  * `sbt "runMain graft.tools.ProbeBatchTopK [copies] [reps]"`.
  */
object ProbeBatchTopK {
  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 400
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val metrics = scala.collection.mutable.LinkedHashMap[String, Any]()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $label: $secs%.1f s")
      metrics += (label -> math.round(secs * 10) / 10.0)
      r
    }
    time("calib_sec")(
      spark.range(20000000L)
        .select(($"id" % 997).as("k"), $"id")
        .groupBy($"k").agg(sum($"id").as("s"))
        .agg(sum($"s")).head())

    val vbase = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id".cast("string").as("id"), $"embedding")
    // FILE-backed corpus (not .persist()): the whole point of the batched
    // arm is paying the store scan once per query batch — an in-memory
    // cached input would hide exactly that cost and both arms would tie
    val root = java.nio.file.Files.createTempDirectory("graft-batchtopk-")
    root.toFile.deleteOnExit()
    spark.range(copies).withColumnRenamed("id", "copy").crossJoin(vbase)
      .repartition(64)
      .select(concat($"id", lit("_"), $"copy").as("id"), $"embedding")
      .write.mode("overwrite").parquet(s"$root/vecs")
    val vecs = spark.read.parquet(s"$root/vecs")
    metrics += ("vectors" -> vecs.count())
    val qs = (0 until 5).map(i => i.toString ->
      vbase.filter($"id" === i.toString).select($"embedding").head().getSeq[Float](0).toSeq)

    val times = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    def ab(label: String, conf: String, on: Boolean)(f: => Unit): Unit = {
      spark.conf.set(conf, on.toString)
      try {
        val t0 = System.nanoTime(); f
        val s = (System.nanoTime() - t0) / 1e9
        val key = label + (if (on) "_new" else "_old")
        times(key) = s :: times(key)
        println(f"PROBE $label on=$on $s%.1f s")
      } finally spark.conf.unset(conf)
    }

    // equality pin once per operator (50 rows each side, set-compared —
    // identical replicated embeddings make heavy sim ties, so this also
    // pins the shared (score desc, id asc) tie-break across the two arms)
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    spark.conf.set("spark.graft.ann.batchExact", "false")
    val exOld = rows(Ann.exactTopK(vecs, qs, 10))
    spark.conf.unset("spark.graft.ann.batchExact")
    val exNew = rows(Ann.exactTopK(vecs, qs, 10))
    require(exOld == exNew, s"exactTopK arm mismatch: ${exOld.size}/${exNew.size}")
    metrics += ("exact_rows_equal" -> (exOld == exNew))

    for (_ <- 1 to reps; on <- Seq(false, true))
      ab("exact_topk", "spark.graft.ann.batchExact", on)(
        Ann.exactTopK(vecs, qs, 10).write.format("noop").mode("overwrite").save())

    val cb = Pq.train(vecs, m = 8, k = 256, iters = 5, maxSample = 20000)
    Pq.encode(vecs, cb).write.mode("overwrite").parquet(s"$root/codes")
    val codes = spark.read.parquet(s"$root/codes")
    metrics += ("codes" -> codes.count())
    spark.conf.set("spark.graft.pq.batchAdc", "false")
    val adcOld = rows(Pq.adcTopK(codes, cb, qs, 10))
    spark.conf.unset("spark.graft.pq.batchAdc")
    val adcNew = rows(Pq.adcTopK(codes, cb, qs, 10))
    require(adcOld == adcNew, s"adcTopK arm mismatch: ${adcOld.size}/${adcNew.size}")
    metrics += ("adc_rows_equal" -> (adcOld == adcNew))

    for (_ <- 1 to reps; on <- Seq(false, true))
      ab("adc_topk", "spark.graft.pq.batchAdc", on)(
        Pq.adcTopK(codes, cb, qs, 50).write.format("noop").mode("overwrite").save())

    times.toSeq.sortBy(_._1).foreach { case (k, xs) =>
      metrics += (s"${k}_min_sec" -> math.round(xs.min * 10) / 10.0)
      println(f"PROBE RESULT $k min=${xs.min}%.1f s (${xs.size} reps)")
    }
    metrics += ("copies" -> copies, "reps" -> reps)
    val json = metrics.map {
      case (k, v: String) => s""""$k":"$v""""
      case (k, v) => s""""$k":$v"""
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"BENCH_scale_${copies}x_r19batch.json"), json)
    println(json)
    spark.stop()
  }
}
