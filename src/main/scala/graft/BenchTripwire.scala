package graft

/** Clean-minima tripwire arithmetic, host-phase aware (r15 verdict #2).
  *
  * The minima file (`tools/bench_clean_minima.json`) recorded raw best
  * seconds per row; the bench host is BIMODAL (ARCHITECTURE §6b15 — fast
  * mornings vs late phases 25-60% slower across the board with steal
  * <1%), so minima set in a fast window made clean slow-phase runs flag
  * 12-27 rows at 1.3-1.7× — all global host phase, not row-specific
  * regression, and alarm fatigue buries the real thing.
  *
  * Fix: the minima file may now carry the CANARY FLOORS the minima were
  * measured at — per row (`{"min": s, "spin": f, "mem": f}`) or
  * file-wide under the reserved `"__floor"` key — and each comparison
  * scales the minimum by the run's own floor ratio
  * (`row / (min × run_floor/min_floor)`), so a global slowdown that the
  * canaries see cancels and only row-specific divergence trips. The
  * phase factor is clamped to [1.0, PhaseCap]: a faster-phase run keeps
  * the raw minimum (strictest), and no phase argument may excuse more
  * than PhaseCap× — past that the run is weather the dirty/contended
  * verdicts own, not a "phase". Plain-number rows without any floor
  * compare raw, exactly as before (first round on a new host).
  *
  * Kept as data-in/data-out arithmetic so the slow-phase-quiet /
  * injected-regression-still-trips contract is spec-testable without
  * running a bench (BenchTripwireSpec).
  */
object BenchTripwire {

  /** Ceiling on the phase normalization factor: a host phase slower than
    * this is indistinguishable from genuine contention and must keep
    * tripping rather than be normalized away. */
  val PhaseCap = 2.0

  /** Canary floors observed when a minimum was recorded (seconds; either
    * side optional — absent channels contribute no phase evidence). */
  final case class Floors(spin: Option[Double], mem: Option[Double])

  final case class MinRow(min: Double, floors: Floors)

  final case class Minima(rows: Map[String, MinRow], defaultFloors: Floors) {
    def size: Int = rows.size
  }

  val Empty: Minima = Minima(Map.empty, Floors(None, None))

  /** Parse the minima JSON: each row value is either a bare number
    * (legacy — no floor, raw compare) or `{"min": s, "spin": f,
    * "mem": f}`; the reserved `"__floor"` key carries file-wide default
    * floors for legacy rows. Unparseable content yields [[Empty]] (a
    * disarmed tripwire, never a crashed bench).
    */
  def parse(json: String): Minima = try {
    import org.json4s._
    val root = org.json4s.jackson.JsonMethods.parse(json) match {
      case o: JObject => o
      case _ => return Empty
    }
    def num(v: JValue): Option[Double] = v match {
      case JDouble(d) => Some(d)
      case JInt(i) => Some(i.toDouble)
      case JDecimal(d) => Some(d.toDouble)
      case JLong(l) => Some(l.toDouble)
      case _ => None
    }
    def floorsOf(o: JObject): Floors =
      Floors(num(o \ "spin"), num(o \ "mem"))
    val defaults = root \ "__floor" match {
      case o: JObject => floorsOf(o)
      case _ => Floors(None, None)
    }
    val rows = root.obj.flatMap {
      case ("__floor", _) => None
      case (k, o: JObject) => num(o \ "min").map(m => k -> MinRow(m, floorsOf(o)))
      case (k, v) => num(v).map(m => k -> MinRow(m, Floors(None, None)))
    }.toMap
    Minima(rows, defaults)
  } catch { case _: Throwable => Empty }

  /** The host-phase factor for one run: the largest clamped floor ratio
    * across the channels where BOTH sides are known. 1.0 when no channel
    * has evidence (raw compare).
    */
  def phaseFactor(row: MinRow, defaults: Floors, runSpinFloor: Option[Double],
      runMemFloor: Option[Double]): Double = {
    def ratio(minF: Option[Double], runF: Option[Double]): Option[Double] =
      for (m <- minF; r <- runF; if m > 0 && r > 0) yield r / m
    val candidates = Seq(
      ratio(row.floors.spin.orElse(defaults.spin), runSpinFloor),
      ratio(row.floors.mem.orElse(defaults.mem), runMemFloor)).flatten
    if (candidates.isEmpty) 1.0
    else math.min(PhaseCap, math.max(1.0, candidates.max))
  }

  /** The tripped ratio of `value` against the row's PHASE-ADJUSTED
    * minimum, if it exceeds both the relative threshold and the absolute
    * slack — None when quiet. The returned ratio is value/adjustedMin so
    * artifact readers see the divergence net of host phase.
    */
  def trippedRatio(value: Double, row: MinRow, defaults: Floors,
      runSpinFloor: Option[Double], runMemFloor: Option[Double],
      tripK: Double, slack: Double): Option[Double] = {
    val adj = row.min * phaseFactor(row, defaults, runSpinFloor, runMemFloor)
    if (value > 0 && adj > 0 && value > tripK * adj && value - adj > slack)
      Some(value / adj)
    else None
  }
}
