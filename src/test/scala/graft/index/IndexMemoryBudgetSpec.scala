package graft.index

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Memory tripwire for the per-family index bytes (round-11 verdict task 4:
  * `index_mib_events` grew every round with no budget and no attribution).
  * The bench's `index_mib_events_<family>` rows attribute growth in the
  * RECORD; this spec makes unintended growth fail the BUILD: a fixed
  * deterministic corpus (50k rows, 2k active seconds, known cardinalities)
  * is indexed with every family enabled, and each family's measured bytes
  * must stay inside a band around today's footprint. The corpus never
  * changes, so a band breach can only come from a code change — either a
  * regression (caught) or a deliberate trade the new code must re-state by
  * updating the band, which is exactly the budget discipline the bench
  * record alone couldn't enforce.
  *
  * Bands are ±2× today's measured values (generous enough for allocator /
  * representation jitter, tight enough that an accidental dense-format
  * flip, a rollup level added by default, or a sketch width doubling all
  * trip it).
  */
class IndexMemoryBudgetSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("per-family bytes of a fixed corpus stay inside their bands") {
    val session = spark
    import session.implicits._
    graft.Graft.enable(spark)
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    // 50k rows over 2,000 active seconds (25 rows/sec), 500 users, values
    // in [0, 1000) — deterministic (no RNG), multiplicative-hash scatter
    val df = (0 until 50000).map { i =>
      val sec = i % 2000
      val user = (i * 2654435761L % 500).toInt
      val value = (i * 40503L % 1000).toDouble
      (new Timestamp(base + sec * 1000L + (i % 1000)), user.toLong, value,
        if (i % 3 == 0) "purchase" else "view")
    }.toDF("ts", "user_id", "value", "event_type")
    df.createOrReplaceTempView("membudget_t")
    val t = UWheelIndex.buildFromDataFrame(df, "membudget_t",
      UWheelBuilder("ts", Seq("value"))
        .withMinMaxWheels(Seq("value"))
        .withKeyedWheel(IndexBuilder("value", Some("event_type = 'purchase'")))
        .withMillisWheels("value")
        .withDistinctWheel("user_id")
        .withQuantileWheel("value")
        .withMomentWheel("value")
        .withCoMomentWheel("value", "user_id")
        .withFreqWheel("user_id")
        .withTopKWheel("user_id", cap = 64))
    val byFam = t.indexUsageBytesByFamily
    info(byFam.toSeq.sortBy(_._1)
      .map { case (f, b) => s"$f=${b / 1024} KiB" }.mkString(", "))
    // measured 2026-08 (band = [half, double], KiB): numeric 220, ms 169,
    // hll 69, hdr 112, cms 300, topk 197, moment 93, comoment 218
    val bands: Map[String, (Long, Long)] = Map(
      "numeric" -> (110L << 10, 440L << 10),
      "ms" -> (85L << 10, 338L << 10),
      "hll" -> (35L << 10, 138L << 10),
      "hdr" -> (56L << 10, 224L << 10),
      "cms" -> (150L << 10, 600L << 10),
      "topk" -> (99L << 10, 394L << 10),
      "moment" -> (47L << 10, 186L << 10),
      "comoment" -> (109L << 10, 436L << 10),
    )
    bands.foreach { case (fam, (lo, hi)) =>
      val b = byFam.getOrElse(fam, 0L)
      assert(b >= lo && b <= hi,
        s"family $fam: $b bytes outside [$lo, $hi] — a representation " +
          "change must re-state the budget band here deliberately")
    }
    assert(byFam.values.sum === t.indexUsageBytes)
  }
}
