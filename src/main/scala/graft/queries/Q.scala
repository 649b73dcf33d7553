package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{Graft, Tables}
import graft.index.{IndexBuilder, UWheelBuilder, UWheelIndex}

/** Shared query-context plumbing for the driver contract
  * (`SparkEntry.queries`): registers the corpus views and builds the wheel
  * indices once per (session, scale-factor dir).
  *
  * Index configuration mirrors the reference benchmark's setup
  * (`/root/reference/benchmarks/nyc_taxi_bench/src/main.rs:79-120`): a
  * COUNT(*) wheel + min/max wheel over the measure column + a keyed SUM wheel
  * for one residual predicate.
  */
object Q {

  /** (session#sfDir) → registry MARKERS present right after that key's
    * build completed. "Prepared" is a claim about the registry, not just a
    * memo: a later `deregister`/`clear()` silently withdraws what we
    * built, and queries would stay scan-only forever if ctx never
    * re-checked. Comparing against the RECORDED snapshot (rather than a
    * fixed expectation) keeps the heal targeted: only a marker that WAS
    * present and vanished triggers a rebuild — a build that permanently
    * fails for one table records its absence once and is not retried on
    * every query (review finding: the fixed-expectation check turned one
    * broken table into a 4-way rebuild per query). */
  private val prepared = new ConcurrentHashMap[String, Set[String]]()
  private val registeredDir = new ConcurrentHashMap[String, String]()

  /** The registry-presence snapshot the heal logic compares. A LIVE
    * streaming registration (fingerprint 0) counts as present regardless
    * of its families: a stream publisher that displaced our batch index
    * owns the path, and a heal rebuild would clobber it (the publisher
    * would displace right back — a registration ping-pong). */
  private def registryMarkers(sfDir: String): Set[String] = {
    val b = Set.newBuilder[String]
    // presence and the top-k family are SEPARATE markers (round-11 advice):
    // a top-k-less events index (withTopK = false) must still record its
    // presence, so a later deregister/clear of it triggers the heal
    // rebuild instead of leaving queries scan-only until session rotation.
    // A live streaming registration (fingerprint 0) counts as carrying the
    // family — the publisher owns the path (see class doc above).
    val ev = graft.index.WheelRegistry.lookup(s"$sfDir/events.parquet")
    if (ev.isDefined) b += "events"
    if (ev.exists(t => t.fingerprint == 0L || t.topKWheel("user_id").isDefined))
      b += "events_topk"
    if (graft.index.WheelRegistry.lookup(s"$sfDir/lineitem.parquet").isDefined)
      b += "lineitem"
    Option(datedDirs.get(sfDir))
      .filter(p => graft.index.WheelRegistry.lookup(p).isDefined)
      .foreach(_ => b += "orders_dated")
    Option(decDirs.get(sfDir))
      .filter(p => graft.index.WheelRegistry.lookup(p).isDefined)
      .foreach(_ => b += "lineitem_dec")
    b.result()
  }

  /** View-registration-only ctx for tools that measure NON-wheel operators
    * over derived corpora ([[graft.tools.BenchDedupScale]]): registers the
    * same corpus views [[ctx]] does and marks the (session, dir) prepared
    * with an empty marker set — the heal check's `∅ ⊆ markers` is always
    * true, so later `Q.ctx` calls from inside query functions skip the
    * wheel builds the tool never exercises (several seconds of fused
    * scans per derived scale point, pure setup waste there). Do NOT use
    * where any `uw_*` query may run: those would silently stay scan-only
    * for the session. */
  def ctxViewsOnly(spark: SparkSession, sfDir: String): Unit = {
    ensureViews(spark, sfDir)
    val sid = org.apache.spark.sql.graft.ColumnBridge.sessionUUID(spark)
    prepared.put(s"$sid#$sfDir", Set.empty)
  }

  /** View registration WITHOUT [[ctxViewsOnly]]'s prepared-marker side
    * effect: the prelude for production helpers that run plain SQL over
    * the corpus views ([[PipelineQueries.bloomDeconAuto]]). Unlike
    * ctxViewsOnly — whose empty marker makes every later [[ctx]] on the
    * session SKIP the wheel builds (fine inside a dedicated tool JVM,
    * session-poisoning anywhere else: a later `uw_*` query would silently
    * stay scan-only) — this leaves the build state untouched. */
  private[graft] def ensureViews(spark: SparkSession, sfDir: String): Unit = {
    val sid = org.apache.spark.sql.graft.ColumnBridge.sessionUUID(spark)
    if (registeredDir.put(sid, sfDir) != sfDir) Tables.registerAll(spark, sfDir)
    Graft.enable(spark)
  }

  def ctx(spark: SparkSession, sfDir: String): SparkSession = {
    // Re-register the corpus views only when this session switches sfDir —
    // doing it per query would put 10 parquet schema reads on every call.
    // sessionUUID, not identityHashCode: identity hashes can collide across
    // GC'd sessions, aliasing one session's registration state to another.
    val sid = org.apache.spark.sql.graft.ColumnBridge.sessionUUID(spark)
    if (registeredDir.put(sid, sfDir) != sfDir) {
      // timed: 10 parquet schema reads — a real cold-JVM cost inside the
      // bench's index_build window, attributed like the builds themselves
      graft.index.BuildPhases.timed("register_views")(Tables.registerAll(spark, sfDir))
      // orders_dated must track the dir too: on a switch BACK to an already-
      // prepared dir the build block below is skipped, and a view left
      // pointing at another dir's derived parquet would silently answer
      // from the wrong corpus (review finding).
      Option(datedDirs.get(sfDir)).foreach(p =>
        spark.read.parquet(p).createOrReplaceTempView("orders_dated"))
      Option(decDirs.get(sfDir)).foreach(p =>
        spark.read.parquet(p).createOrReplaceTempView("lineitem_dec"))
    }
    val key = s"$sid#$sfDir"
    // Heal check: rebuild iff never built for this (session, dir), or a
    // marker that was present at build time has since vanished from the
    // registry (deregister/clear by another actor). Builds are idempotent
    // and layering-safe, so the worst case of a race is duplicate work,
    // never a lost family.
    val recorded = Option(prepared.get(key))
    val needBuild = recorded match {
      case None          => true
      case Some(markers) => !markers.subsetOf(registryMarkers(sfDir))
    }
    if (needBuild) {
      Graft.enable(spark)
      // A failed build must not poison the session: queries stay correct
      // through the scan path, so log and continue without that index.
      // Builds run concurrently — they are independent Spark actions and
      // touch no shared session state (the NTZ path is expression-level
      // timezone-free).
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      def tryBuild(what: String)(b: => Unit): Future[Unit] = Future {
        // per-table wall-clock INSIDE the concurrent build — the bench's
        // index_build headline decomposes as max over these (plus await
        // overhead), and the per-phase splits recorded in buildFrom
        // attribute each table's own time (BuildPhases doc)
        try graft.index.BuildPhases.timed(what)(b) catch {
          case e: Throwable =>
            System.err.println(s"[graft] index build failed for $what: ${e.getMessage}")
        }
      }
      Await.result(Future.sequence(Seq(
        tryBuild("events")(buildEvents(spark, sfDir)),
        tryBuild("lineitem")(buildLineitem(spark, sfDir)),
        tryBuild("orders_dated")(buildDatedOrders(spark, sfDir)),
        tryBuild("lineitem_dec")(buildDecLineitem(spark, sfDir)),
      )), Duration.Inf)
      // record what actually made it into the registry — the baseline the
      // next call's heal check compares against
      prepared.put(key, registryMarkers(sfDir))
    }
    spark
  }

  /** events: count + min/max + keyed SUM wheels from ONE scan (one
    * equality wheel per event_type value — the COMPLETE per-value set the
    * multi-column GROUP BY arm routes on, proof-checked at plan time),
    * plus HLL distinct-sketch wheels over user_id FUSED INTO THE SAME
    * scan, so hll_distinct(user_id) range queries answer at plan time.
    * `withDistinct = false` is the bench's attribution probe: the same
    * build minus the sketch wheels, so (full − numeric) prices the HLL
    * register columns line-item. */
  def buildEvents(spark: SparkSession, sfDir: String, withDistinct: Boolean = true,
      withMillis: Boolean = true, withFreq: Boolean = true,
      withMoments: Boolean = true, withQuantiles: Boolean = true,
      withHll: Boolean = true, withTopK: Boolean = true): Unit = {
    val eventTypes = Seq("click", "error", "purchase", "signup", "view")
    val numeric = eventTypes
      .foldLeft(UWheelBuilder("ts", Seq("value"))) { (b, et) =>
        b.withKeyedWheel(IndexBuilder("value", Some(s"event_type = '$et'")))
      }
    val conf =
      if (withDistinct) {
        // the COMPLETE per-value keyed sketch sets: the GROUP BY bucket ×
        // event_type and key-only arms route hll_distinct / hdr_quantile
        // per value (sparse registers / bins keep the extra aggregate
        // columns cheap); (full − numeric) in the bench prices ALL sketch
        // columns (HLL registers + HDR bins + CMS counters) line-item,
        // (full − nofreq) the CMS counter columns alone, and the no<f>
        // variants (nomoment/nohdr/nohll) each drop ONE family so the
        // bench attributes the build per family (round-9 task 3)
        var sketch = numeric
        if (withHll) sketch = sketch.withDistinctWheel("user_id")
        if (withQuantiles) sketch = sketch.withQuantileWheel("value")
        if (withMoments) sketch = sketch.withMomentWheel("value")
        if (withFreq)
          // Count-Min frequency wheel: per-user activity counts over
          // any range from ONE wheel (user_id is too high-cardinality
          // for per-value keyed wheels), + a purchase-keyed variant
          sketch = sketch.withFreqWheel("user_id")
            .withKeyedFreqWheel("user_id", "event_type = 'purchase'")
        eventTypes.foreach { et =>
          if (withHll) sketch = sketch.withKeyedDistinctWheel("user_id", s"event_type = '$et'")
          if (withMoments) sketch = sketch.withKeyedMomentWheel("value", s"event_type = '$et'")
          if (withQuantiles) sketch = sketch.withKeyedQuantileWheel("value", s"event_type = '$et'")
        }
        sketch
      } else numeric
    // millisecond bottom level: sub-second window() group-bys
    // (uw_window_subsec/uw_window_ms) rewrite instead of paying the
    // scan's Expand — one extra build scan grouped by ms, opt-in.
    // `withMillis = false` is the bench's attribution probe for that scan.
    val conf2 = if (withMillis) conf.withMillisWheels("value") else conf
    // heavy-hitter wheels: "top-k users by activity over any range",
    // certified-exact on this corpus's sparse slots (uw_topk_users), plus
    // the purchase-keyed variant (uw_topk_purchasers — residual routing
    // through the optimizer arm, like every other family's keyed twin)
    val conf3 =
      if (withTopK)
        conf2.withTopKWheel("user_id")
          .withKeyedTopKWheel("user_id", "event_type = 'purchase'")
      else conf2
    conf3.build(spark, s"$sfDir/events.parquet")
  }

  /** lineitem: second indexed table (multi-year NTZ time span, so calendar
    * group-bys produce real multi-bucket results). Also carries
    * derived-EXPRESSION wheels for the TPC-H revenue measure
    * `l_extendedprice * (1 - l_discount)` — a 2-dec × 2-dec product needs
    * scale 4 for the decimal-cast sum form to match digit-for-digit —
    * unfiltered plus one keyed variant (returned lines). */
  val revenueExpr = "l_extendedprice * (1 - l_discount)"
  def buildLineitem(spark: SparkSession, sfDir: String, withExpr: Boolean = true,
      withMoments: Boolean = true, withQuantiles: Boolean = true): Unit = {
    var b = UWheelBuilder("l_shipdate", Seq("l_quantity"))
    if (withExpr)
      b = b.withExprWheel(revenueExpr, scale = 4)
        .withKeyedExprWheel(revenueExpr, "l_returnflag = 'R'", scale = 4)
    // the typed families take the expression too (column-or-expression
    // contract): exact revenue variance + revenue p90 over any range.
    // The no<f> flags are the bench's per-family attribution probes.
    if (withMoments) b = b.withMomentWheel(revenueExpr)
    if (withQuantiles) b = b.withQuantileWheel(revenueExpr)
    b.build(spark, s"$sfDir/lineitem.parquet")
  }

  private val datedDirs = new ConcurrentHashMap[String, String]()

  /** Materializes the date-typed projection of `orders` (o_orderdate →
    * DATE) to a process-temp parquet, once per sfDir. This is corpus
    * DERIVATION, not indexing (real TPC-H dumps store o_orderdate as DATE
    * already) — Bench calls it before its index-build timer. The
    * UTC-session `to_date` equals DuckDB's `CAST(o_orderdate AS DATE)`,
    * which is what the oracles use. */
  def derivedOrdersPath(spark: SparkSession, sfDir: String): String =
    datedDirs.computeIfAbsent(sfDir, _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft-dated").toString
      val p = s"$dir/orders_dated.parquet"
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/orders.parquet")
        .withColumn("o_odate", to_date(col("o_orderdate")))
        .drop("o_orderdate")
        .write.mode("overwrite").parquet(p)
      p
    })

  /** Registers the `orders_dated` view and wheel-indexes its DATE column. */
  def buildDatedOrders(spark: SparkSession, sfDir: String): Unit = {
    val path = derivedOrdersPath(spark, sfDir)
    spark.read.parquet(path).createOrReplaceTempView("orders_dated")
    UWheelBuilder("o_odate", Seq("o_totalprice")).build(spark, path)
  }

  private val decDirs = new ConcurrentHashMap[String, String]()

  /** Materializes the DECIMAL-typed projection of `lineitem`
    * (l_quantity → DECIMAL(12,2)) once per sfDir — corpus derivation, like
    * [[derivedOrdersPath]]: real TPC-H dumps store quantities/prices as
    * DECIMAL already, the synthetic corpus stores doubles. */
  def derivedLineitemDecPath(spark: SparkSession, sfDir: String): String =
    decDirs.computeIfAbsent(sfDir, _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft-dec").toString
      val p = s"$dir/lineitem_dec.parquet"
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_shipdate"),
          col("l_quantity").cast("decimal(12,2)").as("l_quantity"),
          col("l_extendedprice").cast("decimal(18,2)").as("l_extendedprice"))
        .write.mode("overwrite").parquet(p)
      p
    })

  /** Registers the `lineitem_dec` view and wheel-indexes its DECIMAL
    * measure column (at the column's own scale — see UWheelIndex). */
  def buildDecLineitem(spark: SparkSession, sfDir: String): Unit = {
    val path = derivedLineitemDecPath(spark, sfDir)
    spark.read.parquet(path).createOrReplaceTempView("lineitem_dec")
    UWheelBuilder("l_shipdate", Seq("l_quantity"))
      .withMomentWheel("l_quantity")
      .withCoMomentWheel("l_quantity", "l_extendedprice")
      .build(spark, path)
  }

  /** A query whose Spark side is a plain SQL string over the corpus views. */
  def sql(text: String): (SparkSession, String) => DataFrame =
    (spark, sfDir) => ctx(spark, sfDir).sql(text)

  // ---- adaptive scan fan-out (optimization round 18, guide §2.5) ---------

  /** Scan partition count of a registered corpus view, memoized per
    * (session, dir, table) — one physical planning of the bare scan, never
    * a job. */
  private val scanParts = new ConcurrentHashMap[String, Int]()

  /** Fan-out width for explode-/compute-amplified consumers of `table`:
    * the session's default parallelism when the table's scan yields fewer
    * than half that many splits, else 0 (= leave the plan alone).
    *
    * Why (guide §2.5, input skew): the corpus files are small enough that a
    * scan is ONE split, but consumers amplify each input byte by orders of
    * magnitude (n-gram explosion, 64 MinHash probes/gram, 512 SRP dots or a
    * 16×256-centroid PQ encode per vector), so the whole stage serializes
    * on one core while the rest idle. At production scale the scan itself
    * produces ≥ cores splits and the gate returns 0 — no extra exchange is
    * ever paid where the input already parallelizes; the repartition width
    * derives from the session (never a constant), so the driver's
    * lower-core bench runs keep their proportions. Row-identical: a
    * repartition reorders rows only, and every consumer is
    * order-insensitive (aggregates, joins, sorted collect_lists, final
    * ORDER BYs). */
  private[graft] def fanWidth(spark: SparkSession, table: String): Int = {
    val sid = org.apache.spark.sql.graft.ColumnBridge.sessionUUID(spark)
    val dir = registeredDir.get(sid)
    val parts = scanParts.computeIfAbsent(s"$sid#$dir#$table",
      _ => spark.table(table).rdd.getNumPartitions)
    val target = spark.sparkContext.defaultParallelism
    if (parts * 2 >= target) 0 else target
  }

  /** [[fanWidth]] applied to a DataFrame: gated round-robin repartition. */
  private[graft] def fanOut(df: DataFrame, table: String = "documents"): DataFrame = {
    val w = fanWidth(df.sparkSession, table)
    if (w == 0) df else df.repartition(w)
  }

  /** A SQL query parametrized on the fan-out width of its driving table —
    * `build(0)` must be the un-hinted text (the production / at-scale
    * form). */
  def sqlFan(table: String)(build: Int => String): (SparkSession, String) => DataFrame =
    (spark, sfDir) => {
      val s = ctx(spark, sfDir)
      s.sql(build(fanWidth(s, table)))
    }

  /** `/*+ REPARTITION(w) */` when fanned, empty at scale — splice directly
    * after SELECT in the scan-side CTE. */
  private[graft] def repHint(w: Int): String =
    if (w > 0) s"/*+ REPARTITION($w) */ " else ""

  /** Keyed variant: `/*+ REPARTITION(w, cols…) */` pins the WIDTH of a
    * CPU-dense post-shuffle stage (AQE coalesces exchanges by BYTES, which
    * under-parallelizes stages whose per-byte compute is extreme — in-task
    * pair generation, 64-column signature votes). Keying on the group-by
    * columns lets the aggregation reuse the exchange (no extra shuffle);
    * empty at scale, where post-shuffle bytes are a good width proxy. */
  private[graft] def repHintBy(w: Int, cols: String): String =
    if (w > 0) s"/*+ REPARTITION($w, $cols) */ " else ""

  /** [[repHintBy]] as a DataFrame transform. */
  private[graft] def pinWidth(df: DataFrame, w: Int,
      cols: Seq[String]): DataFrame =
    if (w <= 0) df
    else df.repartition(w, cols.map(org.apache.spark.sql.functions.col): _*)
}
