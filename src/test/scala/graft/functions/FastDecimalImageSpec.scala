package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fast decimal image must be BIT-IDENTICAL to `try_cast(v AS
  * decimal(p, s))` — it replaces the cast inside the index build's
  * exactness probes, where any divergence would silently change which rows
  * a wheel considers exact. Fuzzed over the value shapes the corpus
  * actually holds (s-digit money amounts) plus adversarial ones (ties,
  * subnormals, >s-digit noise, huge magnitudes, NaN/Inf). */
class FastDecimalImageSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def slow(v: Double, p: Int, s: Int): Any = {
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) return null
    val d = org.apache.spark.sql.types.Decimal(v)
    if (d.changePrecision(p, s)) d else null
  }

  private def checkOne(v: Double, p: Int, s: Int): Unit = {
    val fast = FastDecimalImages.convert(v, p, s, math.pow(10d, s))
    val want = slow(v, p, s)
    assert(fast == want, s"v=$v (bits=${java.lang.Double.doubleToLongBits(v)}) p=$p s=$s: fast=$fast want=$want")
  }

  test("driver-side fuzz: 1M doubles across shapes, scales 0/2/4/6") {
    val rnd = new scala.util.Random(0xfdec11L)
    val scales = Array(0, 2, 4, 6)
    var i = 0
    while (i < 1000000) {
      val s = scales(i % scales.length)
      val v = (i % 5) match {
        case 0 => // exact s-digit money values (the corpus shape)
          (rnd.nextLong() % 100000000L).toDouble / math.pow(10d, s)
        case 1 => // raw uniform bit patterns (includes subnormals, huge)
          java.lang.Double.longBitsToDouble(rnd.nextLong())
        case 2 => // near .5 rounding ties at the scale
          ((rnd.nextInt(2000000) - 1000000).toDouble + 0.5) / math.pow(10d, s)
        case 3 => // > s-digit noise
          rnd.nextDouble() * 1e6 - 5e5
        case 4 => // around the 2^50 fast-path boundary
          ((1L << 50) + rnd.nextInt(1000) - 500).toDouble / math.pow(10d, s)
      }
      checkOne(v, 38, s)
      checkOne(v, 18, s)
      checkOne(v, 10, s) // small precision: fast path must NULL, never throw
      i += 1
    }
  }

  test("small precisions return NULL on overflow like try_cast (never throw)") {
    // review finding: 1e12 fits 2^50 and round-trips at scale 0, but has
    // 13 digits — Decimal(u, 10, 0) would throw; try_cast yields NULL
    checkOne(1e12, 10, 0)
    checkOne(-1e12, 10, 0)
    checkOne(9999999999.0, 10, 0)  // exactly 10 digits: fast path serves
    checkOne(10000000000.0, 10, 0) // 11 digits: NULL
    checkOne(99999999.99, 10, 2)
    checkOne(123456789.01, 10, 2)  // 11 digits at scale 2: NULL
  }

  test("edge values") {
    for (s <- Seq(0, 2, 6); p <- Seq(18, 38)) {
      Seq(0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
        Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
        Double.MaxValue, -Double.MaxValue, 1e18, -1e18, 0.1, -0.1,
        1.005, 2.675, 1.0 / 3.0, math.Pi, (1L << 53).toDouble,
        4.35, -4.35, 0.615, 1234.565).foreach(checkOne(_, p, s))
    }
  }

  test("SQL plan parity: the build's probe columns equal try_cast on real data") {
    import org.apache.spark.sql.graft.ColumnBridge
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(200000).select(
      (when(col("id") % 97 === 0, lit(null))
        .otherwise(col("id").cast("double") / 100.0 - 500.0)).as("v"))
    val fast = ColumnBridge.column(FastDecimalImage(ColumnBridge.expression(col("v")), 38, 2))
    val bad = df.select(
      fast.as("f"), col("v").try_cast("decimal(38,2)").as("c"))
      .where(not(col("f") <=> col("c")))
      .count()
    assert(bad == 0L, s"$bad rows diverged from try_cast")
  }
}
