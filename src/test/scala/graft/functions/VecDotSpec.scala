package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Graft

class VecDotSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("vec_dot equals the higher-order fold bit-for-bit (float arrays)") {
    Graft.enable(spark)
    val session = spark
    import session.implicits._
    val df = Seq(
      (Array(1.0f, 2.5f, -3.25f), Array(0.5f, -1.5f, 2.0f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.4f, 0.5f, 0.6f)),
      (Array.empty[Float], Array.empty[Float]))
      .toDF("a", "b")
    val got = df.selectExpr(
      "vec_dot(a, b) AS nativ",
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (s, x) -> s + x) AS hof")
      .collect()
    got.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("vec_dot works in both codegen and interpreted modes") {
    Graft.enable(spark)
    val session = spark
    import session.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(df.selectExpr("vec_dot(a, b)").collect()(0).getDouble(0) === 32.0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(df.selectExpr("vec_dot(a, b)").collect()(0).getDouble(0) === 32.0)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("vec_dot rejects non-array inputs at analysis") {
    Graft.enable(spark)
    val session = spark
    import session.implicits._
    val df = Seq((1, 2)).toDF("a", "b")
    val e = intercept[Exception](df.selectExpr("vec_dot(a, b)").collect())
    assert(e.getMessage.toLowerCase.contains("vec_dot") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("NULL array yields NULL; NULL elements contribute zero") {
    Graft.enable(spark)
    val df = spark.sql(
      "SELECT vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS a, " +
      "       vec_dot(array(1.0D, CAST(NULL AS DOUBLE), 3.0D), array(2.0D, 5.0D, 4.0D)) AS b")
    val r = df.collect()(0)
    assert(r.isNullAt(0))
    assert(r.getDouble(1) === 2.0 + 12.0)
  }
}
