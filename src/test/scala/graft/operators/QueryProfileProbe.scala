package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Builder-side profiling probe: runs declared qids with a
  * stage-metrics listener — the Spark-UI substitute in this headless
  * sandbox (guide §1/§7: decide whether time goes to shuffle, compute,
  * or scheduling BEFORE changing anything).
  *
  *   sbt "Test/runMain graft.operators.QueryProfileProbe <sfDir> <qid,qid> [reps]"
  *
  * Per rep prints the wall; afterwards the per-stage table (duration,
  * task count, shuffle read/write bytes, input bytes) for the LAST rep
  * only (earlier reps' stages are drained between runs).
  */
object QueryProfileProbe {
  case class St(id: Int, name: String, ms: Long, tasks: Int,
      shRead: Long, shWrite: Long, input: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qids = args.lift(1).getOrElse("text_langid_nb").split(",").toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.local(32)
    val buf = new scala.collection.mutable.ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        buf.synchronized {
          buf += St(si.stageId, si.name.takeWhile(_ != '\n'),
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            si.numTasks, m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead)
        }
      }
    })
    val all = graft.SparkEntry.queries
    qids.foreach { qid =>
      val fn = all(qid)
      (1 to reps).foreach { i =>
        buf.synchronized(buf.clear())
        spark.sparkContext.setJobDescription(s"$qid rep$i")
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $qid rep$i $wall%.3fs rows=$n")
      }
      // small settle so straggler stage-completed events land
      Thread.sleep(300)
      val stages = buf.synchronized(buf.toVector)
      println(s"[probe] $qid last-rep stages=${stages.size} " +
        f"stage-ms-sum=${stages.map(_.ms).sum}")
      stages.sortBy(-_.ms).take(25).foreach { s =>
        println(f"[probe]   ${s.ms}%6dms tasks=${s.tasks}%3d " +
          f"shR=${s.shRead}%9d shW=${s.shWrite}%9d in=${s.input}%9d  ${s.name}")
      }
    }
    spark.stop()
  }
}
