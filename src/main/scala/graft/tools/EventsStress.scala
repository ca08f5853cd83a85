package graft.tools

import org.apache.spark.sql.functions._

/** Diagnostic: the event-analytics trio one order up (not part of the
  * driver contract — records the measured evidence for ARCHITECTURE).
  *
  * Generates `rows` synthetic events (users × a 60-day window, five event
  * types) and times [[graft.ops.Relational.funnelCounts]],
  * [[graft.ops.Relational.retention]], and
  * [[graft.ops.Relational.activeUsers]] — the shapes whose scale story is
  * "stage-selective joins", "day-grain distinct is the only event-volume
  * shuffle", and "one HLL sketch per day", respectively.
  *
  * Usage: runMain graft.tools.EventsStress [rows] [users]
  */
object EventsStress {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val users = args.lift(1).map(_.toLong).getOrElse(100000L)
    val spark = graft.Bench.session()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"EVENTSSTRESS $label sec=${(System.nanoTime() - t0) / 1e9}%.2f result=$r")
    }
    val types = typedlit(Seq("view", "click", "purchase", "signup", "error"))
    val events = spark.range(rows).select(
      pmod(xxhash64(col("id")), lit(users)).as("user_id"),
      element_at(types, (pmod(xxhash64(col("id"), lit(1)), lit(5)) + 1).cast("int"))
        .as("event_type"),
      timestamp_seconds(lit(1704067200L) + // 2024-01-01 UTC
        pmod(xxhash64(col("id"), lit(2)), lit(60L * 86400))).as("ts"))
      .localCheckpoint(true) // generation cost out of the measurements
    time("funnel_3_stage")(
      graft.ops.Relational.funnelCounts(events, col("user_id"),
        col("event_type"), col("ts"), Seq("view", "click", "purchase"))
        .collect().map(r => s"${r.getString(1)}=${r.getLong(2)}").mkString(","))
    time("retention_day_grain")(
      graft.ops.Relational.retention(events, col("user_id"), col("ts")).count())
    time("active_users_wau7")(
      graft.ops.Relational.activeUsers(events, col("user_id"), col("ts"), 7)
        .count())
    spark.stop()
  }
}
