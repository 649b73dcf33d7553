package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Graft
import graft.index.{UWheelBuilder, WheelRegistry}

/** Round-3 features end to end: a DATE-typed time column (real TPC-H dumps
  * keep `o_orderdate` as DATE) indexed and rewritten with exact
  * inclusive-day bounds, plus slot-span coarsening — the memory guard for
  * always-active multi-year tables.
  *
  * Run: `sbt "runMain graft.examples.DateSpanExample [sfDir]"`
  */
object DateSpanExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.enable(spark)

    // date-typed orders (the shared derivation the contract queries use;
    // the corpus stores timestamps, real TPC-H dumps store DATE)
    val dated = graft.queries.Q.derivedOrdersPath(spark, sfDir)

    val t = UWheelBuilder("o_odate", Seq("o_totalprice")).build(spark, dated)
    println(f"index over DATE column: ${t.indexUsageBytes / 1024.0}%.1f KiB")

    // built fresh per use: a Dataset memoizes its QueryExecution, so reusing
    // one `val q` across index rebuilds would replay the FIRST plan
    def q = spark.read.parquet(dated)
      .filter(col("o_odate") >= lit("1995-01-01").cast("date") &&
              col("o_odate") <= lit("1995-12-31").cast("date")) // inclusive: exact on day slots
      .agg(count(lit(1)).as("orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("revenue"))
    println("plan: " + q.queryExecution.optimizedPlan.toString.linesIterator.next())
    q.show()

    val byYear = spark.read.parquet(dated)
      .groupBy(trunc(col("o_odate"), "year").as("y"))
      .agg(count(lit(1)).as("orders")).orderBy("y")
    println("trunc-year plan: " + byYear.queryExecution.optimizedPlan.toString.linesIterator.next())
    byYear.show()

    // slot-span coarsening: the same table indexed at day slots — memory
    // drops, day-aligned queries still rewrite exactly
    WheelRegistry.clear()
    val coarse = UWheelBuilder("o_odate", Seq("o_totalprice"))
      .withSlotSpan(86400).build(spark, dated)
    println(f"day-slotted index: ${coarse.indexUsageBytes / 1024.0}%.1f KiB " +
      f"(slot span ${coarse.countWheel.get.wheel.slotSpan}%d s)")
    println("still rewritten: " +
      q.queryExecution.optimizedPlan.toString.linesIterator.next())
    q.show()

    spark.stop()
  }
}
