package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-corpus table loaders (TESTDATA.md).
  *
  * `events.ts` has shipped in two physical layouts across corpus
  * generations, and [[events]] adapts to whichever the file carries:
  *
  *  - parquet TIMESTAMP(MICROS), `isAdjustedToUTC = false` — Spark reads it
  *    as `TIMESTAMP_NTZ`, the same type `lineitem.l_shipdate` uses, and the
  *    column is served as-is (DuckDB, the correctness oracle, sees the
  *    identical naive micros values).
  *  - parquet INT64 TIMESTAMP(NANOS) — Spark 4 has no nanosecond timestamp
  *    type and refuses the file unless
  *    `spark.sql.legacy.parquet.nanosAsLong` is set, in which case the
  *    column surfaces as a raw nanosecond Long and we derive the
  *    microsecond-precision `ts` with `timestamp_micros(ts div 1000)` — the
  *    same ns→µs truncation DuckDB applies, so both engines see identical
  *    timestamps. The wheel optimizer sees through the conversion:
  *    `graft.expr.Extract` matches `timestamp_micros(<nanosCol> div 1000)`
  *    as the indexed time column, so predicates written against the derived
  *    `ts` still hit the wheel index built over the raw nanos column.
  */
object Tables {

  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def ensureNanosConf(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    ensureNanosConf(spark)
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw // TIMESTAMP_NTZ (or TIMESTAMP): wheel-indexable as-is
    }
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Registers every corpus table as a temp view named after the file.
    * Schema reads run CONCURRENTLY (each `spark.read.parquet` is a footer
    * read + Catalyst analysis — ~100 ms each cold, and ten of them
    * sequential were a visible slice of the bench's cold index_build
    * window); view registration itself stays on this thread per table
    * future, and the catalog's temp-view map is concurrent. */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(
      Future.sequence(All.map(n =>
        Future(load(spark, sfDir, n).createOrReplaceTempView(n)))),
      Duration.Inf)
  }
}
