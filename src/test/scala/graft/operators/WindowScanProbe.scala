package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}

/** Builder-side diagnostic: walk every declared query's optimized plan and
  * report Window nodes with an EMPTY partition spec (the WindowExec
  * "moving all data to a single partition" family). Static — nothing runs.
  *
  * Usage: Test/runMain graft.operators.WindowScanProbe /root/testdata/sf0.01
  */
object WindowScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def globalWindows(p: LogicalPlan): Int = {
      var n = 0
      p.foreach {
        case w: Window if w.partitionSpec.isEmpty => n += 1
        case _ => ()
      }
      p.subqueries.foreach(sq => n += globalWindows(sq))
      n
    }
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val n = globalWindows(df.queryExecution.optimizedPlan)
        if (n > 0) println(s"[winscan] $name global_windows=$n")
      } catch { case e: Throwable =>
        println(s"[winscan] $name ERROR ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    println("[winscan] done")
    spark.stop()
  }
}
