package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SrpBandKeysSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("codegen result equals interpreted eval and manual plane dots") {
    import spark.implicits._
    graft.Graft.enable(spark)
    val rnd = new scala.util.Random(3)
    val rows = (0 until 50).map(i => (i.toLong, Array.fill(16)(rnd.nextGaussian())))
    val df = rows.toDF("id", "v")
    val got = df.selectExpr("id", "srp_band_keys(v, 64, 8) AS k")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toVector)).toMap
    // manual model straight from the plane definition
    val planes = SrpBandKeys.planesFor(64, 16)
    rows.foreach { case (id, v) =>
      val keys = Array.fill(8)(0L)
      for (p <- 0 until 64) {
        val dot = v.indices.map(d => v(d) * planes(p)(d)).sum
        if (dot > 0) keys(p / 8) |= 1L << (p % 8)
      }
      assert(got(id) === keys.toVector, s"id=$id")
    }
    // interpreted eval agrees with the codegen'd path
    val e = SrpBandKeys(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        rows.head._2, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)), 64, 8)
    val interp = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toVector
    assert(interp === got(0L))
  }

  test("parameter validation rejects bad band shapes at analysis") {
    import spark.implicits._
    graft.Graft.enable(spark)
    val df = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "v")
    intercept[Exception](df.selectExpr("srp_band_keys(v, 64, 7)").collect())
    intercept[Exception](df.selectExpr("srp_band_keys(id, 64, 8)").collect())
  }
}
