package graft.platform

import graft.sqlgate.{ScriptRunner, SqlValidator}
import graft.streaming.Savepoints
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import scala.collection.concurrent.TrieMap

/** In-process job-control plane — the §2.4 platform verbs
  * (`/api/start|stop|savepoint|restart`, dup-run guard, optimistic-lock
  * status transitions, `${var}` substitution, monitor → auto-restart)
  * restated without the shell-out/stdout-scrape machinery: queries run in
  * this SparkSession and `StreamingQuery.id` replaces the JobID scrape
  * (`CommandRpcClinetAdapterImpl.java:148-161`); a StreamingQueryListener
  * replaces REST polling (`SchedulerTask.java:47-128`).
  */
class JobManager(spark: SparkSession, checkpointRoot: String,
    savepointRoot: String, vars: Map[String, String] = Map.empty) {

  import JobManager._

  private val jobs = TrieMap[String, JobState]()
  private val queryToJob = TrieMap[java.util.UUID, String]()
  // alarm fan-out (DingDing/HTTP callbacks of the reference's
  // web-alarm module → pluggable handlers here)
  private val alarmHandlers =
    scala.collection.mutable.Buffer[AlarmEvent => Unit]()

  def addAlarmHandler(h: AlarmEvent => Unit): Unit =
    alarmHandlers.synchronized { alarmHandlers += h }

  private def fireAlarm(e: AlarmEvent): Unit =
    alarmHandlers.synchronized { alarmHandlers.toSeq }.foreach { h =>
      try h(e) catch { case _: Throwable => () } // alarm failure ≠ job failure
    }

  // monitor: mark FAILED + optional auto-restart (AUTO_START_JOB policy,
  // TaskServiceAOImpl.java:208-295)
  spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
    override def onQueryStarted(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
    override def onQueryTerminated(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
      queryToJob.get(e.id).foreach { jobId =>
        if (e.exception.isDefined) onJobFailure(jobId, e.exception.get)
      }
  })

  /** `${var}` substitution (JobBaseServiceAOImpl.java:420-461). */
  private[platform] def substitute(script: String): String =
    vars.foldLeft(script) { case (s, (k, v)) => s.replace("${" + k + "}", v) }

  // serializes all lifecycle mutations (start/stop/fail/restart); the
  // per-state `version` remains the externally visible optimistic-lock
  // counter, but mutual exclusion comes from this lock — a bare
  // read-check-write on the map would let a user stop() race the
  // listener's failure handling.
  private val lifecycleLock = new Object
  private val restartCounter = new java.util.concurrent.atomic.AtomicLong

  /** /api/start: validate → dup-run guard → optimistic-lock transition →
    * run. Returns the job id.
    */
  def start(name: String, script0: String, batchMode: Boolean = false,
      autoRestart: Boolean = false,
      restoreCheckpoint: Option[String] = None): String = {
    val script = substitute(script0)
    val (id, runner) = lifecycleLock.synchronized {
      // dup-run guard incl. Starting (JobStandaloneServerAOImpl.java:58-64)
      if (jobs.values.exists(j => j.name == name &&
        (j.status == Running || j.status == Starting)))
        throw new IllegalStateException(s"job '$name' is already active")
      val verdict = SqlValidator.validate(spark, script)
      if (!verdict.ok)
        throw new IllegalArgumentException(
          s"validation failed: ${verdict.errors.mkString("; ")}")
      val id = java.util.UUID.randomUUID().toString.take(8)
      val ckpt = restoreCheckpoint.getOrElse(s"$checkpointRoot/$id")
      jobs(id) = JobState(id, name, script, Starting, version = 1,
        checkpointDir = ckpt, queries = Nil, autoRestart = autoRestart)
      (id, new ScriptRunner(spark, Some(ckpt), batchMode))
    }
    try {
      val res = runner.run(script)
      lifecycleLock.synchronized {
        res.queries.foreach(q => queryToJob(q.id) = id)
        // a purely batch script has finished by now — a terminal state,
        // not a phantom RUNNING that blocks tomorrow's run of this name
        if (res.queries.isEmpty)
          transition(id, Starting, Stopped)(identity)
        else
          transition(id, Starting, Running)(_.copy(queries = res.queries))
      }
      id
    } catch {
      case e: Throwable =>
        lifecycleLock.synchronized {
          transition(id, Starting, Failed)(identity)
        }
        throw e
    }
  }

  /** /api/stop (+ savepoint first if requested, §3.3). */
  def stop(id: String, withSavepoint: Boolean = true): Option[String] =
    lifecycleLock.synchronized {
      val st = jobs.getOrElse(id,
        throw new NoSuchElementException(s"unknown job $id"))
      require(st.status == Running, s"job $id is ${st.status}, not RUNNING")
      st.queries.foreach(_.stop())
      st.queries.foreach(q => queryToJob.remove(q.id))
      val sp =
        if (withSavepoint &&
          java.nio.file.Files.isDirectory(java.nio.file.Paths.get(st.checkpointDir)))
          Some(Savepoints.snapshot(st.checkpointDir, savepointRoot, st.name))
        else None
      transition(id, Running, Stopped)(s =>
        s.copy(lastSavepoint = sp.orElse(s.lastSavepoint)))
      sp
    }

  /** /api/start with -s <savepoint> (restore). Each restore materializes
    * into a FRESH uniquely-numbered checkpoint dir — deriving it from the
    * stopped job's frozen version would let a second restore wipe the
    * live checkpoint of the first.
    */
  def restartFromSavepoint(id: String, savepoint: Option[String] = None): String = {
    val st = jobs.getOrElse(id,
      throw new NoSuchElementException(s"unknown job $id"))
    val sp = savepoint.orElse(st.lastSavepoint).getOrElse(
      throw new IllegalStateException(s"job $id has no savepoint"))
    val newCkpt =
      s"$checkpointRoot/${st.id}-r${restartCounter.incrementAndGet()}"
    Savepoints.restore(sp, newCkpt)
    start(st.name, st.script, autoRestart = st.autoRestart,
      restoreCheckpoint = Some(newCkpt))
  }

  /** Monitor hook: stop surviving queries, mark FAILED, fire alarms,
    * auto-restart FROM THE FAILED JOB'S CHECKPOINT if opted in (the
    * reference's monitor → alarm → AUTO_START_JOB recover semantics —
    * restarting with fresh state would re-read sources from scratch).
    */
  private[platform] def onJobFailure(id: String, reason: String): Unit = {
    val restart = lifecycleLock.synchronized {
      jobs.get(id) match {
        case Some(st) if st.status == Running =>
          // stop surviving sibling queries of a multi-query job — leaving
          // them running would double-write once the job restarts
          st.queries.foreach(q => try q.stop() catch { case _: Throwable => () })
          st.queries.foreach(q => queryToJob.remove(q.id))
          transition(id, Running, Failed)(identity)
          fireAlarm(AlarmEvent(id, st.name, "JOB_FAILED", reason))
          st.autoRestart
        case _ => false
      }
    }
    if (restart) jobs.get(id).foreach { st =>
      try {
        val newId = start(st.name, st.script, autoRestart = true,
          restoreCheckpoint = Some(st.checkpointDir))
        fireAlarm(AlarmEvent(newId, st.name, "AUTO_RESTARTED",
          s"restarted after: $reason"))
      } catch {
        case e: Throwable =>
          fireAlarm(AlarmEvent(id, st.name, "RESTART_FAILED",
            Option(e.getMessage).getOrElse("")))
      }
    }
  }

  def status(id: String): Status = jobs(id).status
  def info(id: String): JobState = jobs(id)
  def list(): Seq[JobState] = jobs.values.toSeq.sortBy(_.name)

  /** Status transition with version increment (the optimistic-lock
    * `updateStatusByStart ... WHERE version = ?` of
    * JobStandaloneServerAOImpl.java:72-78). Callers hold lifecycleLock.
    */
  private def transition(id: String, from: Status, to: Status)(
      f: JobState => JobState): Unit = {
    val cur = jobs(id)
    if (cur.status != from)
      throw new IllegalStateException(
        s"optimistic lock failure: job $id is ${cur.status}, expected $from")
    jobs(id) = f(cur).copy(status = to, version = cur.version + 1)
  }
}

object JobManager {
  sealed trait Status
  case object Starting extends Status
  case object Running extends Status
  case object Stopped extends Status
  case object Failed extends Status

  final case class JobState(id: String, name: String, script: String,
      status: Status, version: Int, checkpointDir: String = "",
      queries: Seq[StreamingQuery] = Nil, autoRestart: Boolean = false,
      lastSavepoint: Option[String] = None)

  final case class AlarmEvent(jobId: String, jobName: String,
      kind: String, detail: String)
}
