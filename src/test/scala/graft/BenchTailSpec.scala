package graft

import org.scalatest.funsuite.AnyFunSuite

/** The synthetic 2000-byte-tail contract (r18 verdict #1, "done =" item):
  * compose a worst-case end-of-run stream — long metric line, a firing
  * TRIPWIRE stderr warning as sbt re-logs it, the final rows line, sbt's
  * success line — take the LAST 2000 bytes exactly as the driver does,
  * and assert the final line survives complete and parses with every
  * bench row. Uses the REAL row names from tools/bench_clean_minima.json
  * so a grown row set fails here before it fails in an official artifact.
  */
class BenchTailSpec extends AnyFunSuite {

  private def realRows(mult: Double): Seq[(String, Double)] = {
    val path = java.nio.file.Paths.get("tools/bench_clean_minima.json")
    val minima = BenchTripwire.parse(java.nio.file.Files.readString(path))
    assert(minima.size >= 70, "minima file should carry the full bench row set")
    minima.rows.toSeq.sortBy(_._1).map { case (k, r) => k -> r.min * mult }
  }

  // worst observed shape, padded: long duration, long month name, PM
  private val successLine =
    "[success] Total time: 10139 s (168:59), completed September 28, 2026, 11:59:59 AM"

  private def evWorst = BenchTail.evJson(
    contended = false, ramped = true, stealPct = 12.34, preflightSteal = 12.34,
    dirtyN = 72, tripN = 72, topTrip = 99.99, cpus = 32)

  test("final line fits the tail budget at clean and dirty-window values") {
    for (mult <- Seq(1.0, 1.37, 2.0, 3.0)) {
      val line = BenchTail.finalLine(realRows(mult), evWorst)
      assert(line.length <= BenchTail.TailWindow - BenchTail.SuccessReserve,
        s"mult=$mult: ${line.length} bytes")
    }
  }

  test("last 2000 bytes of a worst-case stream carry the complete parseable line") {
    val rows = realRows(2.0)
    val line = BenchTail.finalLine(rows, evWorst)
    val tripNames = rows.take(5).map { case (k, _) => f"$k (9.99x)" }.mkString(", ")
    val stream =
      ("{\"metric\":\"total\"," + "x" * 4000 + "}\n") + // long line, tail-cut as always
      s"[error] [graft.Bench] TRIPWIRE: 72 row(s) exceed 1.25x their recorded " +
      s"clean minimum — $tripNames, ...; treat this artifact's deltas with suspicion\n" +
      s"[error] [graft.Bench] WARNING: hypervisor steal 12.34% of cpu time during " +
      "this run — JVM-synchronization-heavy queries inflate far more than the " +
      "steal share suggests; prefer per-query minima across runs\n" +
      line + "\n" + successLine + "\n"
    val tail = stream.takeRight(BenchTail.TailWindow)
    val lines = tail.split("\n")
    assert(lines(lines.length - 2) === line, "final line must survive intact")
    // parse exactly what a driver-side JSON parser would latch
    import org.json4s._
    val parsed = org.json4s.jackson.JsonMethods.parse(line).asInstanceOf[JObject]
    val parsedRows = (parsed \ "rows").asInstanceOf[JObject].obj
    assert(parsedRows.size === rows.size)
    assert(parsedRows.map(_._1).toSet === rows.map(_._1).toSet)
    for (key <- Seq("c", "r", "sp", "pf", "dn", "tn", "tx", "cpus"))
      assert((parsed \ "ev" \ key) !== JNothing, s"ev.$key missing")
    // every row parses as a number
    assert(parsedRows.forall { case (_, v) => v.isInstanceOf[JDouble] ||
      v.isInstanceOf[JInt] || v.isInstanceOf[JDecimal] || v.isInstanceOf[JLong] })
  }

  test("an absurdly grown row set degrades to evidence-only, never truncates") {
    val rows = (1 to 500).map(i => s"synthetic_row_with_a_long_name_$i" -> 123.456)
    val line = BenchTail.finalLine(rows, evWorst)
    assert(line.length <= BenchTail.TailWindow - BenchTail.SuccessReserve)
    assert(line.startsWith("""{"rows":{},"ev":"""))
  }

  test("fmt precision ladder keeps small rows nonzero and strips zeros") {
    assert(BenchTail.fmt(0.03, 3) === "0.03")   // 30 ms row never "0.0"
    assert(BenchTail.fmt(113.3, 3) === "113")
    assert(BenchTail.fmt(50.30, 3) === "50")
    assert(BenchTail.fmt(1.14, 3) === "1.1")
    assert(BenchTail.fmt(0.62, 0) === "0.62")
    assert(BenchTail.fmt(1.10, 0) === "1.1")    // trailing zero stripped
    assert(BenchTail.fmt(100.0, 0) === "100")
    assert(BenchTail.fmt(-1.0, 3) === "-1")     // failed-row sentinel stays valid JSON
  }
}
