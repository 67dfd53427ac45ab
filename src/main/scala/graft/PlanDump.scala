package graft

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for declared queries to text files —
  * the optimization-round evidence trail (`plans/rNN/<qid>_before.txt`
  * / `_after.txt`).
  *
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> [qid,qid,...]"
  *
  * With no qid list every declared query is dumped. The suffix is
  * appended as `<qid>_<suffix>.txt`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r18")
    val suffix = args.lift(2).getOrElse("before")
    val only = args.lift(3).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          // queryExecution.explainString is the string form of
          // df.explain("formatted") — same renderer, capturable.
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
          System.err.println(s"[plandump] $name ok")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
