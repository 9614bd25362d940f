package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench protocol's sizing decisions are what guarantee "≥ 2 timed
  * scaling pairs by construction" — the round-over-round failure mode
  * they close (a single unprotected pair under driver-VM load recorded
  * efficiency 0.335 on code that measures 0.72–0.84 sampled twice) only
  * reproduces under weather a local session can't stage on demand, so
  * the pure decision functions are pinned here instead. No SparkSession
  * involved. */
class BenchSizingSpec extends AnyFunSuite {
  import Bench.Sizing._

  test("quiet VM: picks a large ladder size whose two pairs fit") {
    // c ≈ 0.70 ms/doc (quiet sessions measure 0.66–0.80):
    // est pair(180k) = (8 + 126)·1.45 ≈ 194, two pairs ×1.15 ≈ 447;
    // est pair(200k) ≈ 215, two pairs ≈ 494
    assert(chooseCorpus(remainingSec = 450, cPerDoc = 0.70e-3) === 180000L)
    // more room admits the next rung up
    assert(chooseCorpus(remainingSec = 500, cPerDoc = 0.70e-3) === 200000L)
  }

  test("loaded VM: smaller rung — size degrades before pair count") {
    // c ≈ 1.2 ms/doc (observed degraded sessions 1.1–1.5)
    val n = chooseCorpus(remainingSec = 450, cPerDoc = 1.2e-3)
    assert(n === 100000L)
    assert(2 * estPairSec(1.2e-3, n) * 1.15 <= 450)
    // today's moderate load (c ≈ 0.87) lands mid-ladder, not at 120k —
    // the fine rungs exist exactly for this region
    assert(chooseCorpus(remainingSec = 450, cPerDoc = 0.87e-3) === 140000L)
  }

  test("tiny budget: continuous fallback below the ladder, floor 20k") {
    val n = chooseCorpus(remainingSec = 70, cPerDoc = 1.0e-3)
    assert(n === 20000L) // derived 13k clamps up to the floor
    val n2 = chooseCorpus(remainingSec = 150, cPerDoc = 1.0e-3)
    assert(n2 > 20000L && n2 < 60000L)
    // the chosen size really leaves room for ~2 estimated pairs
    assert(2 * estPairSec(1.0e-3, n2) * 1.15 <= 150 * 1.25)
  }

  test("degenerate per-doc cost: ladder top (estimates are all floor)") {
    assert(chooseCorpus(remainingSec = 500, cPerDoc = 0.0) === 250000L)
  }

  test("monotonicity: more budget or less load never shrinks the corpus") {
    val cs = Seq(0.5e-3, 0.8e-3, 1.2e-3, 2.0e-3)
    val budgets = Seq(80.0, 150.0, 300.0, 450.0, 600.0)
    for (c <- cs; Seq(b1, b2) <- budgets.sliding(2))
      assert(chooseCorpus(b1, c) <= chooseCorpus(b2, c), s"c=$c $b1 vs $b2")
    for (b <- budgets; Seq(c1, c2) <- cs.sliding(2))
      assert(chooseCorpus(b, c1) >= chooseCorpus(b, c2), s"b=$b $c1 vs $c2")
  }

  test("perDocCost: warmup floor subtracted, slope-calibrated, never negative") {
    assert(perDocCost(30.6, 25000) === (30.6 - 10.0) / 25000 * 1.35)
    assert(perDocCost(7.0, 25000) === 0.0)
    // the observed round-5 miss: a 25.0 s cluster-mode warmup read
    // 0.60 ms/doc raw where the 180k slope is ~0.85 — calibrated it
    // projects 0.81, sizing 180k pairs within 10% of their real wall
    assert(perDocCost(25.0, 25000) > 0.75e-3)
  }

  test("cluster-mode constants: the 18:42 session's mis-pick is corrected") {
    // Observed: cluster warmup 30.2 s; the thread-mode constants read
    // c = 1.09 ms/doc → est pair 202 s → picked 120k where the real pair
    // was 131 s (sizing 54% high, ceiling wasted). Cluster constants
    // (floor 13 s, cal 1.1) read the measured 120–220k slope:
    val c = perDocCost(30.2, 25000, warmupFloorSec = 13.0, slopeCal = 1.1)
    assert(c > 0.70e-3 && c < 0.82e-3) // measured slope 0.66–0.69 + margin
    // with the ~465 s that session had left, sizing lands 160k, not 120k
    assert(chooseCorpus(remainingSec = 465, cPerDoc = c, floorSec = 13.0) === 160000L)
    // and the pair estimate is within ~25% of the measured 220k pair
    // (215–225 s), instead of the 54% miss
    val est220 = estPairSec(0.66e-3, 220000, floorSec = 13.0)
    assert(est220 > 215 && est220 < 270)
  }

  test("projectedSameSizePair: anomalous big wall is capped by the small wall") {
    // the observed round-5 anomaly: pair 1 = (113.65 small, 127.15 big) at
    // 150k — raw projection (241·1.05 ≈ 253) forced a size split; the
    // capped projection trusts the small wall and expects a normal big
    assert(projectedSameSizePair(113.65, 127.15) === 113.65 * 1.05 + 113.65 * 0.6)
    assert(projectedSameSizePair(113.65, 127.15) < 188)
    // a normal pair projects from its own measured big wall
    assert(projectedSameSizePair(105.4, 43.7) === 105.4 * 1.05 + 43.7)
    // a genuinely degraded big level (r4 driver: 212 small / 158 big)
    // still projects bounded by 1.65× small — the worst overrun past the
    // projection is one big wall minus 0.6× small, inside the hard reserve
    assert(projectedSameSizePair(212.0, 158.0) === 212.0 * 1.05 + 212.0 * 0.6)
  }

  test("downsize: reproduces the observed rescue and refuses below 20k") {
    // observed in-session: pair 1 155 s at 150k, 101 s of room → 87k
    assert(downsize(150000, roomSec = 101, pairWallSec = 155) === Some(87000L))
    // the rescued pair really fits the room: wall scales ~linearly
    val Some(n2) = downsize(150000, 101, 155)
    assert(155.0 * n2 / 150000 <= 101)
    // catastrophic blowup: nothing sane fits → single pair, no tiny corpus
    assert(downsize(150000, roomSec = 15, pairWallSec = 300) === None)
  }
}
