package graft.index

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

/** Wall-clock attribution for index builds.
  *
  * The bench's `index_build` headline is the wall-clock of the FIRST
  * `Q.ctx` call — four concurrent table builds on a cold JVM. The
  * sequential `index_build_*` probes run at the END of the bench on a warm
  * JVM, so they cannot see cold-start costs (codegen compile, class
  * loading, first parquet footer reads): round 11's +7.5 s regression was
  * invisible to every probe. This object records wall-clock INSIDE the
  * first build itself, per table and per phase, so the full bench record
  * prices the headline number whatever environment it runs in.
  *
  * `timed` ACCUMULATES on repeated keys (a heal rebuild re-enters a
  * phase); Bench snapshots and clears right after the first ctx call, so
  * later probe rebuilds never contaminate the cold numbers.
  */
object BuildPhases {
  private val times = new ConcurrentHashMap[String, Double]()

  def timed[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally times.merge(name, (System.nanoTime() - t0) / 1e9, (a, b) => Double.box(a + b))
  }

  /** Manual accumulation for phases that are awkward to wrap in `timed`
    * (e.g. a span of local definitions inside a larger method). */
  def add(name: String, sec: Double): Unit =
    times.merge(name, sec, (a, b) => Double.box(a + b))

  def snapshot(): Map[String, Double] = times.asScala.toMap

  def clear(): Unit = times.clear()
}
