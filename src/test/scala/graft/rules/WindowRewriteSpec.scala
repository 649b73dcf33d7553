package graft.rules

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Project}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WindowRewriteSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("WindowStruct matches the optimizer-form tumbling struct") {
    import spark.implicits._
    val df = spark.range(100)
      .select(timestamp_seconds(col("id") * 3600 + 1704067200L).as("ts"),
        (col("id") % 7).cast("double").as("v"))
    val q = df.groupBy(window(col("ts"), "1 day")).agg(count(lit(1)).as("c"))
    val opt = q.queryExecution.optimizedPlan
    val structs = opt.collect {
      case p: Project => p.projectList.collect {
        case a: Alias if a.name == "window" => a.child
      }
    }.flatten
    assert(structs.nonEmpty, s"no window alias in:\n$opt")
    val e = structs.head
    val m = UWheelRule.WindowStruct.unapply(e)
    assert(m.isDefined, s"WindowStruct did not match:\n${e.treeString}")
    val (_, s, o, c, l) = m.get
    assert((s, o, c, l) === ((86400000000L, 0L, 0L, 86400000000L)))
  }

  test("window group-by rewrites on a plain parquet table") {
    graft.Graft.enable(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-win").toString
    val p = s"$dir/t.parquet"
    spark.range(200)
      .select(timestamp_seconds(col("id") * 3600 + 1704067200L).as("ts"),
        (col("id") % 7).cast("double").as("value"))
      .write.mode("overwrite").parquet(p)
    graft.index.UWheelBuilder("ts", Seq("value")).build(spark, p)
    val df = spark.read.parquet(p)
    def q = df.groupBy(window(col("ts"), "1 day")).agg(count(lit(1)).as("c"))
    val opt = q.queryExecution.optimizedPlan
    assert(opt.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.nonEmpty, s"no LocalRelation in:\n$opt")
    val got = q.orderBy("window").collect().map(_.toString).toSeq
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val saved = cs.experimental.extraOptimizations
    cs.experimental.extraOptimizations = Nil
    val exp =
      try q.orderBy("window").collect().map(_.toString).toSeq
      finally cs.experimental.extraOptimizations = saved
    assert(got === exp)
  }

  /** Round-9 verdict task 2: bucket-materializing arms must compare their
    * driver-side cost against the scan they replace and DECLINE when the
    * grid dwarfs the data — a correct rewrite that is slower than its scan
    * is still a defect. Only GAP windows (member not a stride multiple)
    * sweep grid positions; exact-cover windows use the sparse bucketized
    * read whose cost is data-bound, so they must rewrite even over huge
    * spans. */
  test("pathological gap window declines; exact-cover twin still rewrites") {
    graft.Graft.enable(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-guard").toString
    val p = s"$dir/t.parquet"
    // 400 rows spread across ~2 years: a 60 s stride sweeps ~1.05M aligned
    // positions >> 262144 + 16*400 — the guard must decline the gap form
    spark.range(400)
      .select(timestamp_seconds(col("id") * 157687L + 1704067200L).as("ts"),
        (col("id") % 7).cast("double").as("value"))
      .write.mode("overwrite").parquet(p)
    graft.index.UWheelBuilder("ts", Seq("value")).build(spark, p)
    val df = spark.read.parquet(p)
    def local(q: org.apache.spark.sql.DataFrame) = q.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }

    val gap = df.groupBy(window(col("ts"), "90 seconds", "60 seconds"))
      .agg(count(lit(1)).as("c"), max(col("value")).as("mx"))
    assert(local(gap).isEmpty, "gap window over a ~1M-position grid must decline")

    val cover = df.groupBy(window(col("ts"), "120 seconds", "60 seconds"))
      .agg(count(lit(1)).as("c"), max(col("value")).as("mx"))
    assert(local(cover).nonEmpty,
      "exact-cover sliding window is data-bound and must still rewrite")

    // and the declined query still answers correctly through the scan
    val got = gap.orderBy("window").collect().map(_.toString).toSeq
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val saved = cs.experimental.extraOptimizations
    cs.experimental.extraOptimizations = Nil
    val exp =
      try gap.orderBy("window").collect().map(_.toString).toSeq
      finally cs.experimental.extraOptimizations = saved
    assert(got === exp)

    // a narrow-range gap window (few positions) stays rewritten: the guard
    // keys on grid size vs data, not on the gap shape itself
    val narrow = df
      .where(col("ts") >= lit("2024-01-01").cast("timestamp") &&
        col("ts") < lit("2024-01-02").cast("timestamp"))
      .groupBy(window(col("ts"), "90 seconds", "60 seconds"))
      .agg(count(lit(1)).as("c"))
    assert(local(narrow).nonEmpty, "narrow gap window should still rewrite")
  }
}
