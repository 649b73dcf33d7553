package graft.rules

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, SparkEntry}

/** CI promotion of the bench record's ledger invariants (round-13 task 8):
  * until now `rewrites_arms_minus_plans` ≥ 0 and the bounded no-match
  * apply() cost lived only in `BENCH_full_r*.json` for a human to read —
  * a future arm that rewrites without counting, or a registry growth that
  * makes the rule expensive on plans it cannot touch, would ship silently.
  * This spec runs a mini-suite through the production contract entries
  * (`SparkEntry.queries` → `Q.ctx`), snapshots [[Graft.rewriteStats]]
  * around it, and FAILS the build on either regression.
  *
  * Assertions are DELTA-based (before/after snapshots, never reset):
  * `rewriteStats` is JVM-global and other suites may interleave — but the
  * per-pass invariant "every counted pass rewrote ≥ 1 arm" makes
  * `Δarms ≥ Δplans` hold over any window, so interleaving cannot produce
  * a false pass or a false failure.
  */
class RewriteLedgerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("mini-suite ledger reconciles: arms - plans >= 0, every family fires") {
    spark.sparkContext.setLogLevel("WARN")
    val before = Graft.rewriteStats.snapshot
    // one entry per counter family: agg (range + grouped), prune, topk
    val names = Seq("uw_count_range", "uw_multi_agg", "uw_groupby_hour",
      "uw_prune_time", "uw_topk_users")
    names.foreach { n =>
      val rows = SparkEntry.queries(n)(spark, dir).collect()
      assert(rows != null, s"$n returned null")
    }
    val after = Graft.rewriteStats.snapshot
    def d(k: String): Long = after(k) - before(k)
    val arms = d("agg") + d("prune") + d("topk")
    assert(arms >= d("plans"),
      s"REWRITE LEDGER BROKEN: arms Δ$arms < plans Δ${d("plans")} — " +
        "an arm rewrote without incrementing its counter")
    assert(d("agg") > 0, "no agg-arm rewrite across the mini-suite")
    assert(d("prune") > 0, "the prune arm never fired (uw_prune_time regressed?)")
    assert(d("topk") > 0, "the top-k arm never fired (uw_topk_users regressed?)")
    assert(d("plans") > 0, "no optimizer pass recorded a rewrite at all")
  }

  test("no-match apply() cost stays bounded with the registry loaded") {
    spark.sparkContext.setLogLevel("WARN")
    // ann_ivf touches no wheel-indexed leaf: the rule's cost on it is the
    // pure no-match tax — the cheap touchesIndexedLeaf probe. The bench
    // bar is 1 ms on an idle host; CI shares cores with parallel suites,
    // so the gate here is 10× that — loose enough to never flake, tight
    // enough that an accidental O(registry) scan per apply (the r12
    // regression class, measured 860 ms) fails loudly.
    val df = SparkEntry.queries("ann_ivf")(spark, dir)
    val plan = df.queryExecution.optimizedPlan
    var k = 0
    while (k < 50) { UWheelRule(plan); k += 1 } // warm
    val t0 = System.nanoTime()
    var i = 0
    while (i < 500) { UWheelRule(plan); i += 1 }
    val usPerApply = (System.nanoTime() - t0) / 1e3 / 500
    info(f"no-match apply(): $usPerApply%.1f µs")
    assert(usPerApply < 10000.0,
      f"no-match apply() costs $usPerApply%.1f µs — the rule is scanning " +
        "state on plans it cannot rewrite")
  }
}
