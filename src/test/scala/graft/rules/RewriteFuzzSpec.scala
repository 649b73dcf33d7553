package graft.rules

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, Tables}
import graft.index.{IndexBuilder, UWheelBuilder}

/** Cross-arm differential fuzzer: random query shapes — every combination
  * of predicate form × aggregate set × grouping the rule has arms for —
  * must return EXACTLY the same rows with the rewrite on and off. The
  * per-arm specs pin each arm's semantics in isolation; this suite is the
  * composition net: a random walk over the whole surface (including shapes
  * that must DECLINE — unaligned bounds, unindexed residuals — where
  * equality via the scan is the assertion). Seeded, so failures replay.
  *
  * Every aggregate used is engine-order-independent by construction
  * (counts, DECIMAL sums, min/max, the graft sketch/moment aggregates),
  * so strict Row equality is the right check — any mismatch is a real
  * rewrite bug, never float noise.
  */
class RewriteFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"
  val path = s"$dir/events.parquet"
  val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** The full index surface the contract events table carries, plus ms
    * wheels — so the fuzz can hit every family. Shared by [[setup]] (the
    * single-root soak) and the multi-root split fuzz (which builds the
    * identical surface over a random root set). */
  private def fullSurface: UWheelBuilder = {
    val numeric = eventTypes.foldLeft(UWheelBuilder("ts", Seq("value"))) { (b, et) =>
      b.withKeyedWheel(IndexBuilder("value", Some(s"event_type = '$et'")))
    }
    eventTypes.foldLeft(
      eventTypes.foldLeft(
        numeric.withDistinctWheel("user_id").withQuantileWheel("value")
          .withMomentWheel("value")
          .withFreqWheel("user_id")
          .withKeyedFreqWheel("user_id", "event_type = 'purchase'")
          .withExprWheel("value * 2", scale = 4)
          .withKeyedExprWheel("value * 2", "event_type = 'view'", scale = 4)) { (b, et) =>
        b.withKeyedDistinctWheel("user_id", s"event_type = '$et'")
          .withKeyedMomentWheel("value", s"event_type = '$et'")
      }) { (b, et) =>
      b.withKeyedQuantileWheel("value", s"event_type = '$et'")
    }.withMillisWheels("value")
      .withTopKWheel("user_id")
      .withKeyedTopKWheel("user_id", "event_type = 'purchase'")
  }

  lazy val setup: Unit = {
    spark.sparkContext.setLogLevel("WARN")
    Graft.enable(spark)
    Tables.registerAll(spark, dir)
    fullSurface.build(spark, path)
  }

  // ---- generators (data spans 2024-01-01 .. 2024-01-28-ish)

  private def ts(rnd: scala.util.Random): String = {
    val day = 1 + rnd.nextInt(30)
    val h = rnd.nextInt(24); val m = rnd.nextInt(60); val s = rnd.nextInt(60)
    val frac = rnd.nextInt(4) match {
      case 0 => ""                                  // second-aligned
      case 1 => f".${rnd.nextInt(1000)}%03d"        // ms-aligned
      case _ => f".${rnd.nextInt(1000000)}%06d"     // µs (usually declines)
    }
    f"2024-01-$day%02d $h%02d:$m%02d:$s%02d$frac"
  }

  private def predicate(rnd: scala.util.Random): String = {
    def orderedPair(): (String, String) = {
      val (a, b) = (ts(rnd), ts(rnd))
      if (a <= b) (a, b) else (b, a)
    }
    rnd.nextInt(10) match {
      case 0 =>
        val (a, b) = orderedPair()
        s"ts >= TIMESTAMP '$a' AND ts < TIMESTAMP '$b'"
      case 1 => s"ts >= TIMESTAMP '${ts(rnd)}'"
      case 2 => s"ts < TIMESTAMP '${ts(rnd)}'"
      case 3 =>
        val (a, b) = orderedPair()
        s"ts BETWEEN TIMESTAMP '$a' AND TIMESTAMP '$b'"
      case 4 =>
        val d = 1 + rnd.nextInt(30)
        f"date_trunc('day', ts) = TIMESTAMP '2024-01-$d%02d 00:00:00'"
      case 5 =>
        val ds = Seq.fill(1 + rnd.nextInt(3))(1 + rnd.nextInt(30)).distinct
        s"to_date(ts) IN (${ds.map(d => f"DATE '2024-01-$d%02d'").mkString(", ")})"
      case 6 =>
        val (a, b) = orderedPair(); val (c, d) = orderedPair()
        s"(ts >= TIMESTAMP '$a' AND ts < TIMESTAMP '$b') OR " +
          s"(ts >= TIMESTAMP '$c' AND ts < TIMESTAMP '$d')"
      case 7 =>
        val (a, b) = orderedPair()
        val et = eventTypes(rnd.nextInt(eventTypes.length))
        s"ts >= TIMESTAMP '$a' AND ts < TIMESTAMP '$b' AND event_type = '$et'"
      case 8 =>
        val (a, b) = orderedPair()
        val ets = rnd.shuffle(eventTypes).take(1 + rnd.nextInt(3))
        s"ts >= TIMESTAMP '$a' AND ts < TIMESTAMP '$b' AND " +
          s"event_type IN (${ets.map(e => s"'$e'").mkString(", ")})"
      case _ =>
        // far-future range: the count-pruning arm (empty result)
        "ts >= TIMESTAMP '2031-01-01 00:00:00' AND ts < TIMESTAMP '2031-06-01 00:00:00'"
    }
  }

  private val aggPool = Seq(
    "count(*) AS cnt",
    "count(value) AS cnt_val",
    "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val",
    "min(value) AS mn",
    "max(value) AS mx",
    "hll_distinct(user_id) AS du",
    "hdr_quantile(value, 0.9) AS p90",
    "wheel_var_samp(CAST(value AS DECIMAL(18,2))) AS vs",
    "wheel_stddev_pop(CAST(value AS DECIMAL(18,2))) AS sp",
    "count(DISTINCT user_id) AS xdu",
    // per-need predicates: FILTER clauses and CASE WHEN children route to
    // keyed wheels (or decline composably with the other shapes)
    "count(*) FILTER (WHERE event_type = 'click') AS f_clicks",
    "CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'view') AS DOUBLE) AS f_sum",
    "hll_distinct(user_id) FILTER (WHERE event_type = 'purchase') AS f_du",
    "count(CASE WHEN event_type = 'error' THEN 1 END) AS c_errs",
    "min(value) FILTER (WHERE event_type = 'signup') AS f_mn",
    // Count-Min point frequencies: present key, provably-absent key, and a
    // FILTER routing to the keyed counter wheel
    "cms_freq(user_id, 42) AS fq42",
    "cms_freq(user_id, 424242) AS fq_absent",
    "cms_freq(user_id, 7) FILTER (WHERE event_type = 'purchase') AS fq_purch",
    // derived-expression measures: the decimal-cast sum and min/max serve
    // from the expr wheel (plain double sums are EXCLUDED from the pool on
    // purpose — when the gate admits one, the wheel returns the correctly
    // rounded TRUE sum, which may differ from the scan's float accumulation
    // order by an ulp; that documented asymmetry would trip the strict
    // bit-equality this fuzzer asserts). An UNINDEXED expression declines
    // to the scan on both sides.
    "CAST(sum(CAST(value * 2 AS DECIMAL(18,4))) AS DOUBLE) AS rev2",
    "min(value * 2) AS mn2",
    "max(value * 2) FILTER (WHERE event_type = 'view') AS mx2v",
    "CAST(sum(CAST(value / 3 AS DECIMAL(18,4))) AS DOUBLE) AS s_declines")

  private def aggs(rnd: scala.util.Random): Seq[String] =
    rnd.shuffle(aggPool).take(1 + rnd.nextInt(3))

  private def grouping(rnd: scala.util.Random): Option[String] = rnd.nextInt(12) match {
    case 0 => None
    case 1 => Some("date_trunc('hour', ts)")
    case 2 => Some("date_trunc('day', ts)")
    case 3 => Some("date_trunc('week', ts)")
    case 4 => Some("to_date(ts)")
    case 5 => Some("window(ts, '6 hours')")
    case 6 => Some("window(ts, '1 day', '12 hours')")
    case 7 => Some("event_type")
    // GAP windows (member not a stride multiple): the per-position sweep
    // plus its cost guard — wide predicates push the sub-second form past
    // the positions-vs-rows decline threshold, narrow ones rewrite
    case 8 => Some("window(ts, '90 seconds', '1 minute')")
    case 9 => Some("window(ts, '1500 milliseconds', '1 second')")
    case 10 => Some("window(ts, '1 day', '1 day', '6 hours')") // startTime offset
    case _ => Some("date_trunc('day', ts); event_type")
  }

  private def render(pred: String, as: Seq[String], grp: Option[String]): String =
    grp match {
      case None => s"SELECT ${as.mkString(", ")} FROM events WHERE $pred"
      case Some(g) if g.startsWith("window") =>
        // window group-bys name the window expression in GROUP BY (the
        // analyzer's TimeWindowing lowering), projecting window.start
        s"SELECT window.start AS ws, ${as.mkString(", ")} FROM events WHERE $pred " +
          s"GROUP BY $g ORDER BY 1"
      case Some(g) =>
        val keys = g.split("; ").zipWithIndex.map { case (k, i) => s"$k AS k$i" }.mkString(", ")
        val n = g.split("; ").length
        s"SELECT $keys, ${as.mkString(", ")} FROM events WHERE $pred " +
          s"GROUP BY ${(1 to n).map(i => s"$i").mkString(", ")} ORDER BY ${(1 to n).map(i => s"$i").mkString(", ")}"
    }

  /** The heavy-hitter arm's shape: GROUP BY key ORDER BY cnt DESC LIMIT n.
    * The key tiebreak is ALWAYS pinned — without it a tie at the cut lets
    * the scan return a different (equally valid) subset than the wheel,
    * and this fuzzer asserts strict equality. `user_id` serves (keyed for
    * the 'purchase' residual, declining other residuals); `event_id` has
    * no wheel, so both sides scan. Round-12 (verdict task 8): the decline
    * lattice is hammered explicitly — random `key IS NOT NULL` waivers
    * (consumed by the arm, never routed), explicit keyed residuals (the
    * registered 'purchase' one and an unregistered one that must decline),
    * composed on top of `predicate`'s own residual/IN forms, and small
    * LIMITs that cut at count ties (the pinned tiebreak keeps both sides
    * deterministic). */
  private def topkSql(rnd: scala.util.Random): String = {
    val key = if (rnd.nextInt(4) == 0) "event_id" else "user_id"
    val k = 1 + rnd.nextInt(8)
    val residual = rnd.nextInt(4) match {
      case 0 => Seq("event_type = 'purchase'") // the registered keyed top-k wheel
      case 1 => Seq("event_type = 'click'")    // unregistered residual — must decline
      case _ => Nil
    }
    val waiver = if (rnd.nextBoolean()) Seq(s"$key IS NOT NULL") else Nil
    val preds = (Seq(predicate(rnd)) ++ residual ++ waiver).mkString(" AND ")
    s"SELECT $key, count(*) AS cnt FROM events WHERE $preds " +
      s"GROUP BY $key ORDER BY cnt DESC, $key LIMIT $k"
  }

  private def sortedRows(rows: Array[Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  private def fuzz(seed: Long, n: Int): Unit = {
    setup
    val rnd = new scala.util.Random(seed)
    var rewritten = 0
    var topkShapes = 0
    var topkRewritten = 0
    (1 to n).foreach { i =>
      val isTopk = rnd.nextInt(8) == 0
      val sql =
        if (isTopk) topkSql(rnd)
        else render(predicate(rnd), aggs(rnd), grouping(rnd))
      if (isTopk) topkShapes += 1
      val dfOn = spark.sql(sql)
      val wasLocal = dfOn.queryExecution.optimizedPlan.collectFirst {
        case l: LocalRelation => l
      }.isDefined
      if (wasLocal) rewritten += 1
      if (wasLocal && isTopk) topkRewritten += 1
      val on = try dfOn.collect() catch {
        case e: Throwable => fail(s"case $i threw with rewrites ON: $sql\n$e")
      }
      Graft.rewritesEnabled = false
      val off = try spark.sql(sql).collect() catch {
        case e: Throwable => fail(s"case $i threw with rewrites OFF: $sql\n$e")
      } finally Graft.rewritesEnabled = true
      assert(sortedRows(on) === sortedRows(off), s"case $i mismatch: $sql")
    }
    info(s"rewritten at plan time: $rewritten / $n " +
      s"(top-k arm: $topkRewritten / $topkShapes shapes)")
    // the fuzz must actually exercise the index, not just the scan
    assert(rewritten >= n / 5, s"only $rewritten/$n shapes rewrote — generator drifted off the arms")
    // ... and the heavy-hitter arm specifically must FIRE, not just decline
    // its way through the lattice (round-12 verdict task 8)
    if (topkShapes >= 20)
      assert(topkRewritten > 0, s"0/$topkShapes top-k shapes rewrote — arm never exercised")
  }

  test("400 random query shapes: rewrite on == rewrite off, exactly") {
    fuzz(0x9A0814L, 400)
  }

  // an independent walk: seed-specific near-misses in the first corpus
  // (e.g. a boundary the first seed never lands on) get a second chance
  test("a second seed's 200 shapes: rewrite on == rewrite off, exactly") {
    fuzz(0xBEEFCAFEL, 200)
  }

  // The plan-size decline lattice (round-13 task 1): under a starvation
  // budget EVERY bucket-serving arm must decline before materializing a
  // row, and the declined query's scan answer must equal the un-starved
  // rewrite's. Same generator, so the walk hits window()/date_trunc/
  // to_date/keyed shapes; non-grouped constant-row arms may still rewrite
  // (they materialize one row, no bucket walk) — the assertion is strict
  // on/off equality plus zero GROUPED rewrites.
  test("plan-size starvation budget: every grouped shape declines, equal via scan") {
    setup
    val saved = Graft.planSizeBudget
    Graft.planSizeBudget = 0L
    try {
      val rnd = new scala.util.Random(0x14D3C11EL)
      (1 to 60).foreach { i =>
        val grp = grouping(rnd)
        val sql = render(predicate(rnd), aggs(rnd), grp)
        val dfOn = spark.sql(sql)
        val grouped = grp.isDefined && !grp.contains("event_type")
        if (grouped) {
          // the zero-proof PRUNE arm may legitimately still fire (it
          // materializes zero rows — exactly what the budget permits);
          // what must never appear is a bucket-materialized row
          val localRows = dfOn.queryExecution.optimizedPlan.collect {
            case l: LocalRelation => l.data.size
          }.sum
          assert(localRows == 0,
            s"case $i materialized $localRows rows at budget 0: $sql")
        }
        val on = dfOn.collect()
        Graft.rewritesEnabled = false
        val off = try spark.sql(sql).collect() finally Graft.rewritesEnabled = true
        assert(sortedRows(on) === sortedRows(off), s"case $i mismatch: $sql")
      }
    } finally Graft.planSizeBudget = saved
  }

  // The multi-root lookup chain (round-15 verdict task 8): the SAME rows
  // split across 1–3 directories, read as one relation, with the index
  // registered under a random root-set — the root-SET key when the set is
  // the full split (must SERVE: rewrites fire and equal the scan) and a
  // random PROPER subset otherwise (must DECLINE soundly: the root-set key
  // misses, the per-member fallback's fingerprint gate rejects over the
  // combined listing, and every shape answers via the scan). Soaks
  // `unwrap`'s fallback chain under the same differential harness as every
  // other arm; seeded, so failures replay.
  test("multi-root split fuzz: random root splits, rewrite on == off, serve/decline as keyed") {
    setup
    val rnd = new scala.util.Random(0x300716L)
    val base = java.nio.file.Files.createTempDirectory("graft-fuzz-mroot").toString
    val src = spark.read.parquet(path)
    try {
      (1 to 3).foreach { nSplit =>
        val roots = (0 until nSplit).map(i => s"$base/s$nSplit/r$i.parquet")
        roots.zipWithIndex.foreach { case (r, i) =>
          // deterministic disjoint split that exactly covers the rows
          src.where(org.apache.spark.sql.functions.pmod(
              org.apache.spark.sql.functions.col("event_id"),
              org.apache.spark.sql.functions.lit(nSplit)) === i)
            .write.mode("overwrite").parquet(r)
        }
        // registration dimension: the full set serves; a random proper
        // subset (possible only when the relation has >1 root) declines
        val regSets: Seq[(Seq[String], Boolean)] =
          Seq((roots, true)) ++ (if (nSplit > 1)
            Seq((rnd.shuffle(roots.toList).take(1 + rnd.nextInt(nSplit - 1)), false))
          else Nil)
        regSets.foreach { case (reg, servable) =>
          fullSurface.build(spark, reg)
          try {
            // random read order — the root-set key must not care
            spark.read.parquet(rnd.shuffle(roots.toList): _*)
              .createOrReplaceTempView("events")
            var rewritten = 0
            (1 to 20).foreach { i =>
              val sql = render(predicate(rnd), aggs(rnd), grouping(rnd))
              val dfOn = spark.sql(sql)
              if (dfOn.queryExecution.optimizedPlan.collectFirst {
                    case l: LocalRelation => l
                  }.isDefined) rewritten += 1
              val on = dfOn.collect()
              Graft.rewritesEnabled = false
              val off = try spark.sql(sql).collect()
                finally Graft.rewritesEnabled = true
              assert(sortedRows(on) === sortedRows(off),
                s"split=$nSplit reg=${reg.size} case $i mismatch: $sql")
            }
            if (servable)
              assert(rewritten >= 4,
                s"split=$nSplit full-set registration: only $rewritten/20 shapes rewrote")
            else
              assert(rewritten === 0,
                s"split=$nSplit subset registration must decline every shape, $rewritten rewrote")
          } finally graft.index.WheelRegistry.deregister(
            graft.index.WheelRegistry.rootSetKey(reg))
        }
      }
    } finally {
      // restore the shared session's contract view for the later tests
      Tables.registerAll(spark, dir)
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(base)
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverseIterator
        .foreach(p => try java.nio.file.Files.deleteIfExists(p)
          catch { case _: Throwable => () })
    }
  }

  // opt-in deep blast (SPARK_GRAFT_FUZZ_N=2000 sbt "testOnly *RewriteFuzzSpec"):
  // same generator, third seed, operator-chosen depth — for long-soak
  // confidence runs without growing the default suite's wall-clock
  test("extended fuzz blast (opt-in via SPARK_GRAFT_FUZZ_N)") {
    sys.env.get("SPARK_GRAFT_FUZZ_N").map(_.toInt) match {
      case Some(n) if n > 0 => fuzz(0x5EEDF00DL, n)
      case _ => cancel("set SPARK_GRAFT_FUZZ_N to run the deep blast")
    }
  }
}
