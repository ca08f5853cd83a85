package graft

/** Formats the bench's final stdout line so it survives the driver's
  * tail capture intact (r18 verdict #1).
  *
  * The driver keeps only the LAST ~2000 bytes of bench stdout, and sbt
  * appends its own `[success] Total time: ...` line after the program
  * exits; sbt also re-logs the program's stderr as `[error] ...` lines
  * into the same stream. Every round r1-r18 the per-row evidence line
  * was front-truncated — r18's attempt budgeted `ROWS {…} EV {…}` to
  * 1995 bytes but the TRIPWIRE stderr warning printed AFTER it and ate
  * ~250 bytes of the window exactly when the evidence mattered.
  *
  * Contract of this object (pinned by BenchTailSpec against the real
  * 72 row names and a worst-case sbt success line):
  *   - [[finalLine]] returns ONE bare JSON object
  *     `{"rows":{…},"ev":{…}}` — no prefix, so a JSON parser can latch
  *     the last line of the tail directly;
  *   - its length never exceeds [[TailWindow]] - [[SuccessReserve]],
  *     degrading row precision level by level (full 3dp values always
  *     live in the long `{"metric":…}` line and BENCH_FULL_c<cpus>.json);
  *   - all stderr warnings must be printed BEFORE it (Bench.scala's
  *     print order, not enforceable here — noted for the reader).
  */
object BenchTail {

  /** The driver's measured tail capture window, bytes. */
  val TailWindow = 2000

  /** Reserve for everything that legitimately follows the final line in
    * the captured stream: its own newline plus sbt's success line
    * (measured 73-82 bytes across rounds, e.g. `[success] Total time:
    * 1013 s (16:53), completed September 28, 2026, 11:59:59 AM`),
    * padded for slack. */
  val SuccessReserve = 110

  /** Adaptive value formatting at a degradation level; trailing zeros
    * stripped (stays a valid JSON number). Level 0 mirrors r18's scheme;
    * each level up trades precision on larger values for bytes. Sub-0.1 s
    * rows always keep 2dp so a 30 ms row never prints as "0.0". */
  def fmt(v: Double, level: Int): String = {
    val s = level match {
      case 0 => if (v >= 100) f"$v%.1f" else f"$v%.2f"
      case 1 => if (v >= 10) f"$v%.1f" else f"$v%.2f"
      case 2 => if (v >= 1) f"$v%.1f" else f"$v%.2f"
      case _ =>
        if (v >= 10) f"$v%.0f"
        else if (v >= 0.1) f"$v%.1f"
        else f"$v%.2f"
    }
    if (s.contains('.')) {
      val t = s.reverse.dropWhile(_ == '0').reverse
      if (t.endsWith(".")) t.dropRight(1) else t
    } else s
  }

  def rowsJson(rows: Seq[(String, Double)], level: Int): String =
    rows.map { case (k, v) => "\"" + k + "\":" + fmt(v, level) }
      .mkString("{", ",", "}")

  /** The compact evidence core riding the final line: contention and
    * ramp verdicts, run + preflight steal, dirty/tripwire counts, worst
    * tripwire ratio, and the core count the run was measured at (so a
    * c8 scaling artifact is self-describing). */
  def evJson(contended: Boolean, ramped: Boolean, stealPct: Double,
      preflightSteal: Double, dirtyN: Int, tripN: Int, topTrip: Double,
      cpus: Int): String =
    f"""{"c":$contended,"r":$ramped,"sp":$stealPct%.2f,"pf":$preflightSteal%.2f,"dn":$dirtyN,"tn":$tripN,"tx":$topTrip%.2f,"cpus":$cpus}"""

  /** The true last stdout line. Tries precision levels 0..3; if even
    * level 3 overflows (row set grew far beyond 72), the rows dict is
    * dropped and the evidence core alone survives — rows then live only
    * in the long line and BENCH_FULL, which is strictly better than an
    * unparseable truncated front. */
  def finalLine(rows: Seq[(String, Double)], ev: String): String = {
    val budget = TailWindow - SuccessReserve
    (0 to 3).iterator
      .map(l => s"""{"rows":${rowsJson(rows, l)},"ev":$ev}""")
      .find(_.length <= budget)
      .getOrElse(s"""{"rows":{},"ev":$ev}""")
  }
}
