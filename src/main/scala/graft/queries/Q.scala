package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{Graft, Tables}
import graft.index.{IndexBuilder, UWheelBuilder, UWheelIndex}

/** Shared query-context plumbing for the driver contract
  * (`SparkEntry.queries`): registers the corpus views and builds the wheel
  * indices once per (session, scale-factor dir).
  *
  * Index configuration mirrors the reference benchmark's setup
  * (`/root/reference/benchmarks/nyc_taxi_bench/src/main.rs:79-120`): a
  * COUNT(*) wheel + min/max wheel over the measure column + a keyed SUM wheel
  * for one residual predicate.
  */
object Q {

  private val prepared = ConcurrentHashMap.newKeySet[String]()
  private val registeredDir = new ConcurrentHashMap[Integer, String]()

  def ctx(spark: SparkSession, sfDir: String): SparkSession = {
    // Re-register the corpus views only when this session switches sfDir —
    // doing it per query would put 10 parquet schema reads on every call.
    val sid = Integer.valueOf(System.identityHashCode(spark))
    if (registeredDir.put(sid, sfDir) != sfDir) Tables.registerAll(spark, sfDir)
    val key = sid + "#" + sfDir
    if (prepared.add(key)) {
      Graft.enable(spark)
      val ev = s"$sfDir/events.parquet"
      // count + min/max + keyed SUM wheels, all from ONE scan
      UWheelBuilder("ts", Seq("value"))
        .withKeyedWheel(IndexBuilder("value", Some("event_type = 'click'")))
        .build(spark, ev)
    }
    spark
  }

  /** A query whose Spark side is a plain SQL string over the corpus views. */
  def sql(text: String): (SparkSession, String) => DataFrame =
    (spark, sfDir) => ctx(spark, sfDir).sql(text)
}
