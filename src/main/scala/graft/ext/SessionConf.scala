package graft.ext

import org.apache.spark.sql.SparkSession

/** Scoped session-conf overrides: set, run, RESTORE — no setting leaks
  * into whatever the session runs next (the round-3 verdict's streaming
  * nit, generalized). Callers that return a lazy DataFrame must
  * materialize INSIDE the scope (e.g. localCheckpoint) — a frame
  * executed after the body would plan under the restored confs. */
object SessionConf {
  def withConfs[A](spark: SparkSession)(kvs: (String, String)*)(body: => A): A = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
