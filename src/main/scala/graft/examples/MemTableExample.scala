package graft.examples

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.index.{UWheelBuilder, UWheelIndex}

/** End-to-end in-memory example — the Spark re-expression of
  * `/root/reference/examples/memtable/src/main.rs`: build the canonical
  * 10-row fixture as a DataFrame, index it, run a landmark aggregate through
  * SQL and show that the optimized plan is a plan-time constant.
  *
  * Run: `sbt "runMain graft.examples.MemTableExample"`
  */
object MemTableExample {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    Graft.enable(spark)
    val base = Timestamp.valueOf("2024-05-10 00:00:00").getTime
    val df = (0 until 10)
      .map(i => (new Timestamp(base + i * 1000L), (i + 1).toDouble))
      .toDF("timestamp", "agg_col")
    df.createOrReplaceTempView("memtable_t")
    UWheelIndex.buildFromDataFrame(df, "memtable_t",
      UWheelBuilder("timestamp", Seq("agg_col")))

    val q = spark.sql(
      """SELECT count(*) AS cnt, min(agg_col) AS mn, max(agg_col) AS mx,
        |       CAST(sum(CAST(agg_col AS DECIMAL(18,2))) AS DOUBLE) AS s
        |FROM memtable_t""".stripMargin)
    println("optimized plan:\n" + q.queryExecution.optimizedPlan)
    q.show()
    spark.stop()
  }
}
