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
}
