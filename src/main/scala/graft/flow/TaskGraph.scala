package graft.flow

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.SnowFns

/** Task schedule (ST4/ST5): interval (`schedule='3 minute'`) or daily
  * cron with an IANA timezone (`USING CRON 0 2 * * * Europe/Paris`,
  * A4:1029-1035). DST rules follow java.time resolution: a wall time
  * inside a spring-forward gap shifts forward by the gap (02:00 on the
  * missing night fires at 03:00), and a fall-back overlap uses the
  * earlier offset — one fire per day either way. */
sealed trait Schedule
case class Every(seconds: Long) extends Schedule
case class DailyAt(hour: Int, minute: Int, zone: String = "UTC") extends Schedule

/** One task: root tasks have a schedule; child tasks run AFTER parents
  * (A4:506-605). `when` is the `system$stream_has_data` gate (ST6). */
case class TaskDef(name: String, schedule: Option[Schedule] = None,
    after: Seq[String] = Seq.empty,
    when: () => Boolean = () => true,
    body: () => Unit)

/** task_history row (ST11, A4:714-728). */
case class TaskRun(task_name: String, scheduled_time: Timestamp,
    completed_time: Timestamp, status: String)

/** ST4-ST11: a deterministic, synchronous task-DAG scheduler.
  *
  * Snowflake TASKs form a DAG via AFTER edges with interval/cron roots,
  * conditional gates, suspend/resume, and a queryable task_history
  * (A4:364-683). This scheduler is deliberately synchronous with an
  * injectable clock (SURVEY.md §7.4.2): `tick(now)` runs everything due
  * at `now`, cascading through AFTER edges with proper fan-in barriers —
  * a multi-parent task runs once per cycle, only after ALL its parents
  * completed in that cycle (ST8). Determinism > thread pools: on a real
  * cluster each body is itself a distributed Spark job, so the scheduler
  * loop is metadata-scale and needs no parallelism of its own.
  */
class TaskGraph(clock: () => Timestamp = () =>
    new Timestamp(System.currentTimeMillis())) {

  private val tasks = mutable.LinkedHashMap.empty[String, TaskDef]
  private val suspended = mutable.Set.empty[String]
  private val lastFire = mutable.Map.empty[String, Long]
  private val runs = mutable.ArrayBuffer.empty[TaskRun]

  def add(t: TaskDef): this.type = {
    require(!tasks.contains(t.name), s"duplicate task ${t.name}")
    t.after.foreach(p => require(tasks.contains(p),
      s"task ${t.name} AFTER unknown parent $p"))
    tasks(t.name) = t
    suspended += t.name // Snowflake tasks are created suspended (A4:369)
    this
  }

  /** ALTER TASK ... RESUME; `system$task_dependents_enable` resumes the
    * whole subtree (A4:543). A DailyAt root resumed AFTER today's wall
    * time waits for the NEXT occurrence (the Snowflake cron semantic) —
    * seeding lastFire at resume keeps an afternoon resume from firing
    * the nightly job immediately. Interval (Every) roots keep their
    * fire-on-first-tick behavior. */
  def resume(name: String, dependents: Boolean = false): Unit = {
    tasks.get(name).foreach { t =>
      // unconditional for DailyAt (not just never-fired): a task that
      // fired yesterday, was suspended, and resumes this afternoon must
      // also wait for tomorrow's boundary — its stale lastFire sits
      // below TODAY's boundary and would fire the nightly job now
      if (suspended(name) && t.schedule.exists(_.isInstanceOf[DailyAt]))
        lastFire(name) = clock().getTime
    }
    suspended -= name
    if (dependents) children(name).foreach(c => resume(c.name, dependents = true))
  }
  def suspend(name: String): Unit = suspended += name
  def isSuspended(name: String): Boolean = suspended(name)

  private def children(name: String): Seq[TaskDef] =
    tasks.values.filter(_.after.contains(name)).toSeq

  private def due(t: TaskDef, now: Timestamp): Boolean = t.schedule match {
    case None => false
    case Some(Every(s)) =>
      lastFire.get(t.name).forall(last => now.getTime - last >= s * 1000)
    case Some(DailyAt(h, m, zone)) =>
      val zid = java.time.ZoneId.of(zone)
      val today = java.time.Instant.ofEpochMilli(now.getTime)
        .atZone(zid).toLocalDate
      // the most RECENT boundary at or before now — today's if the wall
      // time has passed, otherwise yesterday's. Anchoring on today's
      // boundary alone loses a fire whenever no tick lands between the
      // boundary and local midnight (DailyAt(23,55) with hourly :30
      // ticks: the 00:30 tick would recompute the boundary into the new
      // day and never look back). With the lookback, the first tick
      // after a missed boundary catches up — at most one fire, since
      // firing sets lastFire ≥ that boundary.
      val todayBoundary = today.atTime(h, m).atZone(zid).toInstant.toEpochMilli
      val boundary =
        if (todayBoundary <= now.getTime) todayBoundary
        else today.minusDays(1).atTime(h, m).atZone(zid).toInstant.toEpochMilli
      lastFire.get(t.name).forall(_ < boundary)
  }

  /** EXECUTE TASK (A4:405): run one root now, cascading through the DAG
    * with fan-in barriers. Does NOT touch the schedule state — like
    * Snowflake's EXECUTE TASK, a manual run neither delays nor consumes
    * the next scheduled fire (only [[tick]] advances lastFire). */
  def executeNow(root: String): Unit = runCycle(root, clock())

  /** Scheduler heartbeat: fire every enabled, due root task. */
  def tick(now: Timestamp = clock()): Unit =
    tasks.values.toSeq
      .filter(t => t.schedule.isDefined && !suspended(t.name) && due(t, now))
      .foreach { t => lastFire(t.name) = now.getTime; runCycle(t.name, now) }

  private def runCycle(root: String, scheduled: Timestamp): Unit = {
    val completed = mutable.Set.empty[String]
    val queue = mutable.Queue(root)
    val enqueued = mutable.Set(root)
    while (queue.nonEmpty) {
      val t = tasks(queue.dequeue())
      val status =
        if (suspended(t.name) && t.name != root) "SUSPENDED"
        else if (!t.when()) "SKIPPED" // ST6 gate: no data, no compute
        else {
          try { t.body(); "SUCCEEDED" }
          catch { case e: Exception => s"FAILED: ${e.getMessage}" }
        }
      runs += TaskRun(t.name, scheduled, clock(), status)
      if (status == "SUCCEEDED" || status == "SKIPPED") {
        completed += t.name
        // ST8 fan-in barrier: a child runs only when ALL parents
        // completed in this cycle, and only once.
        children(t.name)
          .filter(c => !enqueued(c.name) && c.after.forall(completed))
          .foreach { c => enqueued += c.name; queue.enqueue(c.name) }
      }
    }
  }

  /** information_schema.task_history (ST11, A4:425-431). */
  /** `SHOW TASKS` (A4:641): one row per registered task with its
    * suspend state — the introspection result the reference pipes into
    * `result_scan(last_query_id())` to audit a pipeline teardown
    * ([[graft.core.QueryHistory]] replays that exact composition;
    * SessionCtxSpec). Metadata-scale by construction. */
  def showTasks(spark: SparkSession): DataFrame = {
    import spark.implicits._
    tasks.values.toSeq.map(t => (t.name,
        if (suspended(t.name)) "suspended" else "started",
        t.schedule.map(_.toString).getOrElse(""),
        t.after.mkString(",")))
      .toDF("name", "state", "schedule", "after")
  }

  def history: Seq[TaskRun] = runs.toSeq

  def historyDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.createDataset(runs.toSeq).toDF()
  }

  /** Latency/bottleneck observability (A15, A4:714-728): avg/max
    * schedule→completion seconds per task. */
  def latencyStats(spark: SparkSession): DataFrame =
    historyDf(spark)
      .groupBy("task_name")
      .agg(count(lit(1)).as("n_runs"),
        round(avg(SnowFns.datediffUnits("second",
          col("scheduled_time"), col("completed_time"))), 4).as("avg_latency_s"),
        max(SnowFns.datediffUnits("second",
          col("scheduled_time"), col("completed_time"))).as("max_latency_s"))
      .orderBy("task_name")
}
