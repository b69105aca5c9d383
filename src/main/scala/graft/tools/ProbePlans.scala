package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan audit: explain("formatted") for the hot paths; checks pushed
  * filters, codegen spans, TakeOrderedAndProject, exchange counts.
  */
object ProbePlans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val q = graft.SparkEntry.queries
    def audit(name: String): Unit = {
      val df = q(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      val fmt = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.treeString.take(4000))
      val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).take(4).toList
      println(s"-- pushed: ${pushed.mkString(" | ").take(600)}")
      println(s"-- exchanges: ${plan.linesIterator.count(_.trim.startsWith("Exchange"))}, codegen spans: ${fmt.linesIterator.count(_.contains("WholeStageCodegen"))}")
    }
    args.drop(1).toList match {
      case Nil => List("q1_fts_and", "q5_vector_topk", "q4_bm25_rank").foreach(audit)
      case names => names.foreach(audit)
    }
    spark.stop()
  }
}
