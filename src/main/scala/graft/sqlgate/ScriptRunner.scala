package graft.sqlgate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import scala.collection.mutable

/** The statement router/executor — Spark-native restatement of the
  * reference driver (`flink-streaming-core/.../execute/ExecuteSql.java:
  * 26-59` + `JobApplication.java:40-100`):
  *
  *   SET k=v                → session conf (with Flink-knob translation)
  *   CREATE TABLE ... WITH  → connector registry entry (no execution)
  *   other DDL / SHOW       → `spark.sql` (eager, like `tEnv.executeSql`)
  *   SELECT                 → rejected (parity: `LogPrint.java:54-58`)
  *   INSERT INTO sink query → build DataFrame from query with registry
  *                            sources registered as temp views; start a
  *                            streaming write or run a batch write
  *   BEGIN STATEMENT SET/END→ no-op (sql-client compat)
  *
  * All INSERTs in one script form one statement set: built first, then
  * started together (reference: `StatementSet.execute` single job). The
  * returned queries are the in-process replacement for the JobID scrape
  * (`StreamingQuery.id` vs `CommandRpcClinetAdapterImpl.java:148-161`).
  */
class ScriptRunner(spark: SparkSession,
    checkpointRoot: Option[String] = None,
    batchMode: Boolean = false) {

  val registry: mutable.Map[String, TableSpec] = mutable.LinkedHashMap()
  private val sourcesInstantiated = mutable.Set[String]()

  final case class RunResult(queries: Seq[StreamingQuery],
      shown: Seq[String], configsSet: Map[String, String])

  private val InsertRe =
    """(?is)INSERT\s+(INTO|OVERWRITE)\s+([`"\w.]+)\s*(\([^)]*\))?\s+(.*)""".r
  private val CreateFnRe =
    ("""(?is)CREATE\s+(?:TEMPORARY\s+)?FUNCTION\s+(?:IF\s+NOT\s+EXISTS\s+)?""" +
      """([\w.]+)\s+AS\s+'([^']+)'""" +
      """(?:\s+LANGUAGE\s+\w+)?(?:\s+USING\s+JAR\s+'([^']+)')?.*""").r

  /** Trigger derived from `table.exec.mini-batch.allow-latency` (SET in
    * the script, demo_4.md:35-39): micro-batch latency → ProcessingTime
    * trigger. Defaults to AvailableNow (drain-and-stop) when unset.
    */
  private[sqlgate] var trigger: org.apache.spark.sql.streaming.Trigger =
    org.apache.spark.sql.streaming.Trigger.AvailableNow()

  private val DurationRe = """(?i)\s*(\d+)\s*(ms|s|sec|second|min|minute|h|hour)\s*""".r
  private def parseFlinkDuration(v: String): Option[Long] = v match {
    case DurationRe(n, u) =>
      val mult = u.toLowerCase match {
        case "ms" => 1L
        case "s" | "sec" | "second" => 1000L
        case "min" | "minute" => 60000L
        case _ => 3600000L
      }
      Some(n.toLong * mult)
    case _ => None
  }

  /** Map Flink tuning keys onto their Spark analogs (SURVEY §4 table). */
  private def translateConf(k: String): Option[String] = k match {
    case "table.exec.mini-batch.enabled" => None // micro-batch is inherent
    case "table.exec.mini-batch.allow-latency" => None // handled via trigger
    case "table.exec.mini-batch.size" => None
    case "table.exec.resource.default-parallelism" =>
      Some("spark.sql.shuffle.partitions")
    case "table.exec.source.cdc-events-duplicate" => None // dropDuplicates
    case s if s.startsWith("spark.") => Some(s)
    case _ => None // unknown knobs accepted+ignored, like Flink's tolerant SET
  }

  /** One INSERT of the statement set: sink, the built (possibly
    * streaming) DataFrame, overwrite flag, and the rewritten SELECT +
    * column list kept for the fused execution path, which must re-plan
    * the query against each micro-batch.
    */
  private final case class Insert(sink: TableSpec, df: DataFrame,
      overwrite: Boolean, query: String, colList: Option[Seq[String]])

  def run(script: String): RunResult = {
    val stmts = SqlSplitter.parse(script)
    val inserts = mutable.Buffer[Insert]()
    val shown = mutable.Buffer[String]()
    val confs = mutable.LinkedHashMap[String, String]()

    stmts.foreach { c =>
      c.command match {
        case SqlCommand.Set =>
          if (c.operands.size >= 3) {
            // Flink sql-client accepts both SET k=v and SET 'k'='v'
            val k = c.operands(1).stripPrefix("'").stripSuffix("'")
            val v = c.operands(2).stripSuffix(";").trim
              .stripPrefix("'").stripSuffix("'")
            confs(k) = v
            if (k == "table.exec.mini-batch.allow-latency")
              parseFlinkDuration(v).foreach(ms =>
                trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(ms))
            translateConf(k).foreach(spark.conf.set(_, v))
          }
        case SqlCommand.BeginStatementSet | SqlCommand.End => // no-op
        case SqlCommand.Select =>
          // parity with LogPrint.java:55 — SELECT has no sink; reject.
          throw new IllegalArgumentException(
            "SELECT statements are not supported in job scripts")
        case SqlCommand.CreateTable if TableSpec.isConnectorDdl(c.text) =>
          val spec = TableSpec.parse(c.text)
          registry(spec.name) = spec
        case SqlCommand.CreateFunction =>
          // `CREATE FUNCTION name AS 'class'` (SqlCommand.java:32-34,
          // docs/manual-sql.md:102-119); jar shipping becomes classpath.
          c.text match {
            case CreateFnRe(fname, clazz, jar) if jar != null =>
              graft.functions.Udx.registerFromJar(spark, fname, clazz, jar)
            case CreateFnRe(fname, clazz, _) =>
              graft.functions.Udx.registerByClass(spark, fname, clazz)
            case _ => spark.sql(c.text) // Spark-native CREATE FUNCTION forms
          }
        case SqlCommand.InsertInto | SqlCommand.InsertOverwrite =>
          val m = InsertRe.findFirstMatchIn(c.text).getOrElse(
            throw new IllegalArgumentException(
              s"unparseable INSERT: ${c.text.take(80)}"))
          val overwrite = m.group(1).equalsIgnoreCase("OVERWRITE")
          val sinkName = m.group(2).replace("`", "")
          val colList = Option(m.group(3)).map(_.stripPrefix("(")
            .stripSuffix(")").split(",").map(_.trim.replace("`", "")).toSeq)
          registry.get(sinkName) match {
            case Some(sink) =>
              // MATCH_RECOGNIZE / dedup TVFs resolve their source DURING
              // the rewrite (the operator runs over spark.table), so
              // registry sources they reference must be instantiated first
              if (FlinkSqlRewrite.needsPreInstantiation(m.group(4)))
                instantiateRefs(FlinkSqlRewrite.preInstantiationTables(m.group(4)))
              val (query, mrViews) = FlinkSqlRewrite.applyTracking(spark, m.group(4))
              instantiateSources(query)
              val df0 = spark.sql(query) // Dataset ctor analyzes eagerly:
              // the MR views are resolved into df0's plan — drop them so
              // long-lived sessions don't accumulate catalog entries
              mrViews.foreach(spark.catalog.dropTempView)
              val df = renameForSink(df0, colList, sink)
              inserts += Insert(sink, df, overwrite, query, colList)
            case None if spark.catalog.tableExists(sinkName) =>
              // catalog (managed/Hive) table: eager Spark SQL INSERT —
              // the demo_batch.md batch-write path. Referenced registry
              // sources must be batch DataFrames here regardless of the
              // runner mode: an eager INSERT cannot read streaming views.
              if (FlinkSqlRewrite.needsPreInstantiation(c.text))
                instantiateRefs(FlinkSqlRewrite.preInstantiationTables(c.text),
                  forceBatch = true)
              val (rewritten, mrViews) = FlinkSqlRewrite.applyTracking(spark, c.text)
              instantiateSources(rewritten, forceBatch = true)
              spark.sql(rewritten)
              mrViews.foreach(spark.catalog.dropTempView)
            case None =>
              throw new IllegalArgumentException(
                s"unknown sink table: $sinkName")
          }
        case SqlCommand.ShowCatalogs | SqlCommand.ShowDatabases |
            SqlCommand.ShowTables | SqlCommand.ShowFunctions =>
          shown += spark.sql(c.text).collect().map(_.mkString(",")).mkString("\n")
        case SqlCommand.ShowModules =>
          shown += registry.keys.mkString(",") // gate-level registry listing
        case SqlCommand.CreateCatalog | SqlCommand.UseCatalog =>
          // Spark catalogs are configured, not created by DDL; accept as
          // session-level no-op (SURVEY §2.2).
          shown += s"ok: ${c.command.name}"
        case SqlCommand.CreateView =>
          // view bodies are queries in the reference dialect too
          if (FlinkSqlRewrite.needsPreInstantiation(c.text))
            instantiateRefs(FlinkSqlRewrite.preInstantiationTables(c.text))
          spark.sql(FlinkSqlRewrite(spark, c.text))
        case _ =>
          // remaining DDL (CREATE DATABASE, USE, DROP, ALTER, plain
          // CREATE TABLE) goes straight to Spark, like tEnv.executeSql.
          spark.sql(c.text)
      }
    }

    // statement set: start all INSERTs after the whole script parsed.
    // Per-insert index disambiguates several INSERTs into one sink
    // (memory queryName / checkpoint subdir must be unique per query).
    val seen = mutable.Map[String, Int]()
    val started = mutable.Buffer[org.apache.spark.sql.streaming.StreamingQuery]()
    try {
      fusedSource(inserts.toSeq, confs) match {
        case Some(srcName) =>
          started += startFused(srcName, inserts.toSeq)
        case None =>
          inserts.foreach { ins =>
            val n = seen.getOrElse(ins.sink.name, 0)
            seen(ins.sink.name) = n + 1
            val tag = if (n == 0) "" else s"_$n"
            val ckpt = checkpointRoot.map(r => s"$r/${ins.sink.name}$tag")
            Connectors.write(spark, ins.sink, ins.df, ckpt, trigger, tag,
              ins.overwrite).foreach(started += _)
          }
      }
    } catch {
      case e: Throwable =>
        // statement-set atomicity: if the Nth INSERT fails to start, the
        // already-started siblings must not keep writing unmanaged
        started.foreach(q => try q.stop() catch { case _: Throwable => () })
        throw e
    }
    RunResult(started.toSeq, shown.toSeq, confs.toMap)
  }

  /** Flink INSERT maps the query output to the sink schema by POSITION,
    * not by name (a `COUNT(x)` with no alias lands in the declared
    * column): an explicit column list renames to that list, otherwise
    * the sink DDL's declared columns do.
    */
  private def renameForSink(df0: DataFrame, colList: Option[Seq[String]],
      sink: TableSpec): DataFrame = colList match {
    case Some(cs) => df0.toDF(cs: _*)
    case None =>
      val declared = sink.columns.map(_._1)
      if (declared.nonEmpty && declared.size == df0.columns.length)
        df0.toDF(declared: _*)
      else df0
  }

  /** Decide whether this statement set can run FUSED — one streaming
    * read fanned out to every sink inside a single `foreachBatch`, the
    * closer analog of the reference's single-DAG `StatementSet.execute`
    * (`JobApplication.java:78-88`) than N independent queries each
    * re-reading the source. Opt-in via
    * `SET 'graft.exec.statement-set.fuse' = 'true'`, and only for the
    * router shape where per-micro-batch re-planning is semantics-
    * preserving: ≥2 streaming appends (no OVERWRITE), all STATELESS (an
    * aggregate would lose cross-batch state under re-planning), reading
    * exactly one common source table, into sinks whose batch write is an
    * append/upsert (memory's batch path replaces per batch — excluded).
    * Anything else falls back to the independent-queries path.
    */
  private def fusedSource(ins: Seq[Insert],
      confs: collection.Map[String, String]): Option[String] = {
    if (confs.getOrElse("graft.exec.statement-set.fuse", "false") != "true")
      return None
    if (ins.size < 2 || ins.exists(i => !i.df.isStreaming || i.overwrite))
      return None
    val fusableSink = (s: TableSpec) => s.connector != "memory"
    if (!ins.forall(i => fusableSink(i.sink))) return None
    // WHITELIST of row-local plan nodes: fusion re-plans the SELECT per
    // micro-batch, which is only semantics-preserving when every node
    // processes rows independently of batch boundaries. A blocklist kept
    // growing holes (Distinct, then LIMIT/ORDER BY/OFFSET — a fused
    // `LIMIT 5` would emit 5 rows PER BATCH instead of the stateful
    // StreamingGlobalLimit's 5 total), so anything not provably
    // row-local falls back to independent queries.
    import org.apache.spark.sql.catalyst.plans.logical._
    val rowLocal = (n: LogicalPlan) => n match {
      case _: LeafNode | _: Project | _: Filter | _: Generate | _: Expand |
           _: SubqueryAlias | _: View | _: Union | _: Repartition |
           _: RepartitionByExpression | _: EventTimeWatermark => true
      case _ => false
    }
    val stateless = ins.forall(
      _.df.queryExecution.analyzed.collectFirst {
        case n if !rowLocal(n) => n
      }.isEmpty)
    if (!stateless) return None
    val srcSets = ins.map(i => referencedTables(i.query)
      .filter(sourcesInstantiated.map(_.toLowerCase(java.util.Locale.ROOT))))
    srcSets.flatten.distinct match {
      case Seq(one) if srcSets.forall(_ == Set(one)) => Some(one)
      case _ => None
    }
  }

  /** Start the fused statement set: ONE streaming query over the shared
    * source; each micro-batch is pinned (persist) and every INSERT's
    * SELECT re-planned against it as a temp view, writing through the
    * sinks' batch paths (append/upsert — idempotent under micro-batch
    * retry for keyed sinks, exactly like the unfused foreachBatch
    * sinks). One checkpoint governs the whole set, so the sinks advance
    * in lockstep — the reference's single-job semantics.
    */
  private def startFused(srcName: String,
      ins: Seq[Insert]): StreamingQuery = {
    val src = spark.table(srcName)
    val ckpt = checkpointRoot.map(r => s"$r/__stmtset")
    val writer = src.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        val s2 = batch.sparkSession
        batch.persist()
        try {
          batch.createOrReplaceTempView(srcName)
          ins.foreach { i =>
            val df = renameForSink(s2.sql(i.query), i.colList, i.sink)
            Connectors.write(s2, i.sink, df, None, trigger)
            ()
          }
        } finally { batch.unpersist(); () }
    }
    ckpt.fold(writer)(d => writer.option("checkpointLocation", d))
      .queryName(s"stmtset_$srcName")
      .trigger(trigger)
      .start()
  }

  /** Exact table references of a query: parse (not analyze) the SQL and
    * collect `UnresolvedRelation` names, traversing expression subqueries
    * too. Names inside string literals or comments can't false-positive
    * (the old word-boundary regex did), and backtick-quoted names with
    * special characters resolve exactly.
    */
  private def referencedTables(query: String): Set[String] = {
    val plan = spark.sessionState.sqlParser.parsePlan(query)
    plan.collectWithSubqueries {
      case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        r.multipartIdentifier.last.toLowerCase(java.util.Locale.ROOT)
    }.toSet
  }

  /** Register every referenced registry table as a temp view so the
    * INSERT's SELECT resolves source tables through the registry.
    */
  private def instantiateSources(query: String,
      forceBatch: Boolean = false): Unit =
    instantiateRefs(referencedTables(query), forceBatch)

  private def instantiateRefs(refs: Set[String],
      forceBatch: Boolean = false): Unit = {
    registry.foreach { case (name, spec) =>
      if (refs.contains(name.toLowerCase(java.util.Locale.ROOT)) &&
        !sourcesInstantiated.contains(name) && !isSinkOnly(spec)) {
        val df = Connectors.source(spark, spec,
          streaming = !batchMode && !forceBatch)
        df.createOrReplaceTempView(name)
        sourcesInstantiated += name
      }
    }
  }

  /** print/blackhole/memory/jdbc-upsert tables can't be sources. */
  private def isSinkOnly(spec: TableSpec): Boolean =
    Set("print", "blackhole", "memory").contains(spec.connector) ||
      (spec.connector == "jdbc" && spec.primaryKey.nonEmpty)
}
