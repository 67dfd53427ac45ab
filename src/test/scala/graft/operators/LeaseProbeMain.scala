package graft.operators

/** Child-process entry point for [[CrossJvmLeaseSpec]]: a REAL second
  * JVM that takes a serve or maintenance lease on an index root, so
  * the durable lease layer is proven across actual process boundaries
  * — distinct process tokens, distinct epoch files, real exit-time
  * heartbeat retraction — not just a cleared in-JVM map.
  *
  * Protocol (line-oriented over stdio, no timing assumptions):
  *   - on acquiring the lease, prints `LEASE_HELD` and blocks reading
  *     one line from stdin (the parent releases it by writing a line);
  *   - on release, the body returns, the lease is dropped, the process
  *     prints `LEASE_DONE` and exits 0 (a clean exit retracts the
  *     serve epoch via its deleteOnExit hook — part of what the spec
  *     asserts);
  *   - if the lease REFUSES (foreign fresh heartbeat), prints
  *     `LEASE_REFUSED:<message>` and exits 2.
  *
  * No SparkSession: the lease layer is pure file ops by design (a
  * serve fleet's heartbeat writes cannot cost a Spark job).
  */
object LeaseProbeMain {
  def main(args: Array[String]): Unit = {
    val Array(mode, root) = args
    def hold(): Unit = {
      println("LEASE_HELD")
      Console.out.flush()
      scala.io.StdIn.readLine() // parent-controlled release
    }
    try {
      mode match {
        case "serve" => IndexLease.withServeLease(root)(hold())
        case "maint" => IndexLease.withMaintenance(root)(hold())
        case other   => sys.error(s"unknown mode $other")
      }
      println("LEASE_DONE")
      Console.out.flush()
    } catch {
      case e: IllegalStateException =>
        println(s"LEASE_REFUSED:${e.getMessage}")
        Console.out.flush()
        sys.exit(2)
    }
  }
}
