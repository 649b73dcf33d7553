package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** `bloom_agg` / `bloom_contains` — the broadcast decontamination membership
  * filter. The contract this pins:
  *
  *  - NO FALSE NEGATIVES: every inserted item probes true, under any
  *    partitioning (the property ds_bloom_decon_check relies on);
  *  - DETERMINISM: the blob is byte-identical regardless of partition count
  *    or row order (bit-set is order-free, merge is byte OR) — so a bloom
  *    entry re-run over a reshuffled corpus is hash-stable;
  *  - BOUNDED fpp: absent items probe true at a rate near the sizing
  *    formula, not wildly above it;
  *  - NULL discipline: null keys are skipped; a null blob or item probes
  *    null; zero rows lower to the empty blob (contains nothing).
  */
class BloomSqlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def setup(): Unit = {
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.enable(spark)
  }

  test("no false negatives end-to-end: every inserted key probes true") {
    setup()
    import spark.implicits._
    (0L until 5000L).map(i => i * 2654435761L).toDF("x").createOrReplaceTempView("bloom_in")
    val missed = spark.sql(
      """WITH bf AS (SELECT bloom_agg(x, 65536, 5) AS b FROM bloom_in)
        |SELECT count(*) AS missed FROM bloom_in CROSS JOIN bf
        |WHERE NOT bloom_contains(bf.b, x)""".stripMargin).head().getLong(0)
    assert(missed == 0L, s"bloom lost $missed inserted keys — impossible by construction")
  }

  test("blob is byte-identical under any partitioning and row order") {
    setup()
    import spark.implicits._
    val keys = (0L until 3000L).map(i => BloomBlob.mix(i))
    def blobOf(parts: Int, shuffled: Boolean): Array[Byte] = {
      val data = if (shuffled) scala.util.Random.shuffle(keys) else keys
      data.toDF("x").repartition(parts)
        .createOrReplaceTempView("bloom_det")
      spark.sql("SELECT bloom_agg(x, 131072, 3) AS b FROM bloom_det")
        .head().getAs[Array[Byte]](0)
    }
    val one = blobOf(1, shuffled = false)
    assert(java.util.Arrays.equals(one, blobOf(13, shuffled = true)))
    assert(java.util.Arrays.equals(one, blobOf(4, shuffled = true)))
  }

  test("false-positive rate stays near the sizing formula") {
    setup()
    import spark.implicits._
    val n = 5000
    (0L until n.toLong).toDF("x").createOrReplaceTempView("bloom_fpp_in")
    // probe 20k keys disjoint from the inserted range
    (1000000L until 1020000L).toDF("x").createOrReplaceTempView("bloom_fpp_probe")
    val m = 65536
    val k = 5
    val fp = spark.sql(
      s"""WITH bf AS (SELECT bloom_agg(x, $m, $k) AS b FROM bloom_fpp_in)
         |SELECT count(*) AS fp FROM bloom_fpp_probe CROSS JOIN bf
         |WHERE bloom_contains(bf.b, x)""".stripMargin).head().getLong(0)
    val expected = math.pow(1 - math.exp(-k.toDouble * n / m), k) // ~1.1%
    val rate = fp / 20000.0
    assert(rate < expected * 3 + 0.01, f"fpp $rate%.4f vs theoretical $expected%.4f")
  }

  test("null keys are skipped; zero rows lower to the empty blob") {
    setup()
    spark.sql("SELECT CAST(NULL AS BIGINT) AS x UNION ALL SELECT CAST(NULL AS BIGINT)")
      .createOrReplaceTempView("bloom_nulls")
    val blob = spark.sql("SELECT bloom_agg(x, 64, 2) AS b FROM bloom_nulls")
      .head().getAs[Array[Byte]](0)
    assert(BloomBlob.kOf(blob) == 2 && BloomBlob.numBitsOf(blob) == 64)
    assert(blob.drop(BloomBlob.HeaderBytes).forall(_ == 0), "null keys set bits")
    assert(!BloomBlob.contains(blob, 0L) && !BloomBlob.contains(blob, 42L))
  }

  test("null blob or null item probes null; malformed blob fails loud") {
    setup()
    val r = spark.sql(
      """SELECT bloom_contains(CAST(NULL AS BINARY), 1L) AS a,
        |       bloom_contains(x'4742463105000000' || x'00', CAST(NULL AS BIGINT)) AS b""".stripMargin)
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    val e = intercept[Exception] {
      spark.sql("SELECT bloom_contains(x'00112233', 1L)").collect()
    }
    assert(e.getMessage != null)
    // corrupted header with k=0: valid magic + length, but the probe loop
    // would never run and everything would read as "contained" — must fail
    // loud instead of silently flagging the whole corpus
    val kZero = BloomBlob.alloc(64, 1); kZero(4) = 0
    val ez = intercept[Exception] { BloomBlob.contains(kZero, 1L) }
    assert(ez.getMessage != null)
  }

  test("stateless streaming ingest gate: the blob filters a stream with no state") {
    setup()
    val session = spark
    import session.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.ColumnBridge
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).where(col("text").isNotNull)
    docs.createOrReplaceTempView("bloom_gate_docs")
    // offline step (the deployment artifact): eval-slice grams → one blob
    val blob = spark.sql(
      """SELECT bloom_agg(xxhash64(s), 1048576, 5) AS b FROM (
        |  SELECT DISTINCT explode(word_ngrams(split(text, ' '), 4)) AS s
        |  FROM bloom_gate_docs WHERE doc_id % 97 = 0)""".stripMargin)
      .head().getAs[Array[Byte]](0)
    // exact truth: training docs sharing any 4-gram with the eval slice
    val exact = spark.sql(
      """WITH g AS (SELECT doc_id, explode(word_ngrams(split(text, ' '), 4)) AS s
        |           FROM bloom_gate_docs),
        |e AS (SELECT DISTINCT s FROM g WHERE doc_id % 97 = 0)
        |SELECT DISTINCT g.doc_id FROM g JOIN e ON g.s = e.s
        |WHERE g.doc_id % 97 <> 0""".stripMargin).as[Long].collect().toSet
    assert(exact.nonEmpty, "corpus has no contaminated docs — spec setup drifted")

    // ingest tier: the blob rides the stream as a LITERAL — a stateless
    // per-row filter (no state store, no watermark), the shape an ingest
    // pipeline actually deploys after the offline bloom build
    val grams = expr("word_ngrams(split(text, ' '), 4)")
    val hit = exists(grams, g => ColumnBridge.column(BloomContains(
      ColumnBridge.expression(lit(blob)), ColumnBridge.expression(xxhash64(g)))))
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .where(col("doc_id") % 97 =!= 0)
      .withColumn("contaminated", hit)
      .writeStream.format("memory").queryName("bloom_gate").outputMode("append")
      .start()
    try {
      val all = docs.as[(Long, String)].collect().sortBy(_._1)
      input.addData(all.take(100)); q.processAllAvailable()
      input.addData(all.drop(100)); q.processAllAvailable()
      val flagged = spark.table("bloom_gate")
        .where(col("contaminated")).select("doc_id").as[Long].collect().toSet
      assert(exact.subsetOf(flagged),
        s"gate missed ${exact.diff(flagged)} — a bloom false negative is impossible")
      // 2^20 bits / k=5 over this tiny eval set: false positives are
      // theoretically ~1e-8 per gram — any beyond a handful is a bug
      assert(flagged.size <= exact.size + 3,
        s"gate over-flagged wildly: ${flagged.size} vs exact ${exact.size}")
    } finally q.stop()
  }

  test("sizeFor: optimal-formula sizing, rounding, and clamps (round-14 task 1)") {
    // textbook optima at 1%: m/n ≈ 9.585 bits/item, k = 7
    val (m1, k1) = BloomBlob.sizeFor(100000L, 0.01)
    assert(m1 % 8 == 0)
    assert(m1 >= 958000 && m1 <= 959000, s"unexpected bits for 100k @1%: $m1")
    assert(k1 == 7)
    // a 10× larger eval suite sizes ~10× larger — the property the fixed
    // 2^20 default lacks (it would sit at ~63% fpp for 1M items)
    val (m10, _) = BloomBlob.sizeFor(1000000L, 0.01)
    assert(m10 > m1 * 9 && m10 < m1 * 11)
    // clamps: tiny sets floor at 64 bits / k ≤ 8; absurd demands cap at 2^30
    val (mLo, kLo) = BloomBlob.sizeFor(1L, 0.01)
    assert(mLo == 64 && kLo <= 8 && kLo >= 1)
    val (mHi, kHi) = BloomBlob.sizeFor(Long.MaxValue / 4, 0.001)
    assert(mHi == (1 << 30) && kHi >= 1 && kHi <= 8)
    assertThrows[IllegalArgumentException](BloomBlob.sizeFor(10L, 0.0))
    assertThrows[IllegalArgumentException](BloomBlob.sizeFor(10L, 1.0))
    // the sized blob actually delivers the target: measured fpp over keys
    // disjoint from the inserted set stays near 1%
    import spark.implicits._
    val n = 20000L
    val (m, k) = BloomBlob.sizeFor(n, 0.01)
    (0L until n).map(BloomBlob.mix).toDF("x").createOrReplaceTempView("bloom_sized_in")
    (5000000L until 5040000L).toDF("x").createOrReplaceTempView("bloom_sized_probe")
    val fp = spark.sql(
      s"""WITH bf AS (SELECT bloom_agg(x, $m, $k) AS b FROM bloom_sized_in)
         |SELECT count(*) FROM bloom_sized_probe
         |WHERE bloom_contains((SELECT b FROM bf), x)""".stripMargin).head().getLong(0)
    val rate = fp / 40000.0
    assert(rate < 0.03, f"sized blob missed its 1%% target: measured $rate%.4f")
  }

  test("bloomDeconAuto: counted-eval sizing, never misses an exact hit") {
    setup()
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    // ensureViews, not ctxViewsOnly — the suite shares one SparkSession
    // across specs, and ctxViewsOnly's empty prepared marker would make
    // later Q.ctx callers (TopKWheelSpec) silently skip the wheel builds
    graft.queries.Q.ensureViews(spark, sfDir)
    val exact = spark.sql(graft.queries.PipelineQueries.sqlFor("txt_decontaminate"))
      .select("doc_id").as[Long].collect().toSet
    assert(exact.nonEmpty, "corpus has no contaminated docs — spec setup drifted")
    val (df, bits, k, nGrams) = graft.queries.PipelineQueries.bloomDeconAuto(spark, sfDir)
    // sizing responds to the counted gram set: far smaller than the fixed
    // 2^20 default on this tiny eval slice (floored at 1 KiB, never below),
    // valid parameters throughout
    assert(bits >= (1 << 13) && bits % 8 == 0 && k >= 1 && k <= 8)
    assert(bits < (1 << 20), s"tiny eval slice should size well under 2^20, got $bits")
    assert(nGrams > 0, "counted eval gram set must be non-empty")
    val flagged = df.select("doc_id").as[Long].collect().toSet
    assert(exact.subsetOf(flagged),
      s"auto-sized bloom lost exact hits: ${exact.diff(flagged)}")
    // the per-doc compounded over-flag margin stays small at the 1e-4
    // per-gram default (a 1% per-gram target measured 208 vs 8 here)
    assert(flagged.size <= exact.size + math.max(3, exact.size / 10),
      s"auto-sized blob over-flagged: ${flagged.size} vs exact ${exact.size}")
    // over-flag BUDGET (round-15 verdict task 5): the measured
    // flagged-minus-exact delta must sit within ~2× the closed-form
    // expectation from the sized blob's realized per-gram fpp and the
    // clean docs' gram counts — the same budget the dedup scale record
    // publishes per scale point, pinned here so a sizing or probe
    // regression that inflates false positives fails a spec, not just
    // drifts a record. (+3 absorbs Poisson noise at a tiny expectation:
    // this corpus budgets ~a doc.)
    val expected = graft.queries.PipelineQueries.bloomDeconExpectedOverFlag(
      spark, sfDir, bits, k, nGrams)
    val measured = (flagged.size - exact.size).toDouble
    info(f"over-flag: measured $measured%.0f vs expected $expected%.2f (bits=$bits k=$k grams=$nGrams)")
    assert(measured <= 2.0 * expected + 3.0,
      f"measured over-flag $measured%.0f exceeds ~2x the $expected%.2f budget")
  }

  test("per-group blooms: each group's blob contains exactly its own keys") {
    setup()
    import spark.implicits._
    Seq((0, 10L), (0, 11L), (1, 20L), (1, 21L))
      .toDF("g", "x").createOrReplaceTempView("bloom_groups")
    val rows = spark.sql(
      "SELECT g, bloom_agg(x, 4096, 4) AS b FROM bloom_groups GROUP BY g ORDER BY g")
      .collect()
    val b0 = rows(0).getAs[Array[Byte]](1)
    val b1 = rows(1).getAs[Array[Byte]](1)
    assert(BloomBlob.contains(b0, 10L) && BloomBlob.contains(b0, 11L))
    assert(BloomBlob.contains(b1, 20L) && BloomBlob.contains(b1, 21L))
    // tight blobs with 2 keys / 4096 bits: cross-group keys must miss
    assert(!BloomBlob.contains(b0, 20L) && !BloomBlob.contains(b1, 10L))
  }
}
