package graft

import org.scalatest.funsuite.AnyFunSuite

/** The r15 verdict-#2 contract for the host-phase-aware tripwire: a clean
  * run on a SLOW host phase (all rows uniformly inflated, canary floors
  * inflated the same way) stays quiet, while a row-specific regression
  * injected on top of that same slow phase still trips.
  */
class BenchTripwireSpec extends AnyFunSuite {
  import BenchTripwire._

  private val tripK = 1.25
  private val slack = 0.1

  test("parse: legacy numbers, floor objects, __floor defaults, junk") {
    val m = parse("""{
      "__floor": {"spin": 0.116, "mem": 0.011},
      "legacy_row": 1.5,
      "floored_row": {"min": 10.2, "spin": 0.120},
      "int_row": 3
    }""")
    assert(m.rows("legacy_row") == MinRow(1.5, Floors(None, None)))
    assert(m.rows("floored_row") == MinRow(10.2, Floors(Some(0.120), None)))
    assert(m.rows("int_row").min == 3.0)
    assert(m.defaultFloors == Floors(Some(0.116), Some(0.011)))
    assert(!m.rows.contains("__floor"), "__floor is reserved, never a row")
    assert(parse("not json") == Empty)
    assert(parse("[1,2]") == Empty)
  }

  test("slow host phase: uniformly inflated clean rows stay quiet") {
    // minima recorded in a fast morning window (spin floor 0.116); the
    // run's own floor reads 0.165 (≈1.42× — the observed bimodal spread)
    // and every row runs ~1.4× its minimum. Raw compare would flag all of
    // them; phase-adjusted compare must flag none.
    val defaults = Floors(Some(0.116), Some(0.011))
    val rows = Map(
      "build" -> MinRow(10.2, Floors(None, None)),
      "scan" -> MinRow(0.87, Floors(None, None)),
      "join" -> MinRow(1.48, Floors(None, None)))
    val runSpin = Some(0.165)
    val runMem = Some(0.012)
    rows.foreach { case (name, r) =>
      val cleanSlowValue = r.min * 1.40
      // sanity: the OLD raw rule would have tripped this row
      assert(cleanSlowValue > tripK * r.min && cleanSlowValue - r.min > slack,
        s"fixture must represent a raw-rule trip: $name")
      assert(trippedRatio(cleanSlowValue, r, defaults, runSpin, runMem,
        tripK, slack).isEmpty,
        s"clean slow-phase row must stay quiet: $name")
    }
  }

  test("injected 1.5x row regression still trips on the same slow phase") {
    val defaults = Floors(Some(0.116), Some(0.011))
    val r = MinRow(10.2, Floors(None, None))
    val runSpin = Some(0.165) // phase factor ≈ 1.42
    // the regressed row: 1.5× on TOP of the phase slowdown
    val regressed = r.min * 1.42 * 1.5
    val got = trippedRatio(regressed, r, defaults, runSpin, Some(0.011),
      tripK, slack)
    assert(got.isDefined, "a real row regression must trip through the phase lens")
    assert(got.get > 1.4 && got.get < 1.6,
      s"the reported ratio is net of phase: ${got.get}")
  }

  test("phase factor: clamped to [1, cap], needs both sides, max of channels") {
    val d = Floors(Some(0.1), Some(0.01))
    val row = MinRow(1.0, Floors(None, None))
    // faster phase than the minima: factor clamps at 1.0 (strictest)
    assert(phaseFactor(row, d, Some(0.05), Some(0.005)) == 1.0)
    // absurdly slow phase: clamped at PhaseCap — past that it's weather,
    // and the dirty/contended verdicts own it
    assert(phaseFactor(row, d, Some(1.0), None) == PhaseCap)
    // no floor evidence anywhere: raw compare
    assert(phaseFactor(row, Floors(None, None), Some(0.2), Some(0.02)) == 1.0)
    // the SLOWEST channel wins (mem contention with idle spins — the r10
    // signature — must not be averaged away by the quiet spin channel)
    val f = phaseFactor(row, d, Some(0.1), Some(0.018))
    assert(math.abs(f - 1.8) < 1e-9, s"mem channel 1.8x must win: $f")
    // a per-row floor overrides the file default
    val rowF = MinRow(1.0, Floors(Some(0.2), None))
    assert(phaseFactor(rowF, d, Some(0.2), None) == 1.0)
  }

  test("absolute slack still suppresses sub-second jitter") {
    val r = MinRow(0.08, Floors(None, None))
    // 1.9× relative but only 72 ms absolute — below the 100 ms slack
    assert(trippedRatio(0.152, r, Floors(None, None), None, None,
      tripK, slack).isEmpty)
  }
}
