package graft
import org.apache.spark.sql.SparkSession

/** Reflection shim over `SparkContext.listenerBus.waitUntilEmpty()` —
  * both are private[spark] in source but package-private Scala compiles
  * to PUBLIC bytecode, so plain `getMethod` reaches them. This is the
  * idiom Spark's own listener tests use after an action: it blocks
  * until every posted event is dispatched to every registered queue,
  * i.e. exact listener quiescence in microseconds, replacing polled
  * sleeps (Bench's old 2x25ms loop cost ~2.5min of suite elapsed over
  * 1133 queries x ~2.5 timed executions; StageProbe's leading edge had
  * NO guard at all, so late cold-run stage events could be attributed
  * to the warm run — round-15 advice item).
  *
  * Returns None (callers fall back to their polled loop) if the
  * reflective path is missing or the probe call fails.
  */
object BusDrain {
  def waiter(spark: SparkSession): Option[() => Unit] =
    try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      val waitM = bus.getClass.getMethod("waitUntilEmpty")
      waitM.invoke(bus) // probe once so a broken path is caught here
      Some(() => { waitM.invoke(bus); () })
    } catch { case e: Throwable =>
      System.err.println("[busdrain] listener-bus reflection unavailable " +
        s"(${e.getClass.getSimpleName}); callers use their polled drain")
      None
    }
}
