package graft.sqlgate

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** DDL-`WITH`-options → Spark source/sink bridge (SURVEY §7.3: "the one
  * piece Spark SQL lacks"). Each connector maps the reference's options
  * (`docs/sql_demo`) onto the idiomatic Spark primitive:
  *
  *   datagen     → `format("rate")` stream (or `spark.range` batch) +
  *                 per-field exprs (`demo_datagen.md:29-45`)
  *   filesystem  → parquet/csv/json read/readStream on `path`
  *   kafka       → `format("kafka")` with option passthrough
  *                 (`demo_1.md:34-44`); JSON decode via from_json
  *   print       → console sink (`demo_6.md:229-237`)
  *   blackhole   → noop sink
  *   memory      → memory sink (tests / SELECT-materialization)
  *   jdbc        → batch scan / foreachBatch upsert sink (`demo_1.md:46-56`)
  */
object Connectors {

  /** Native-producer record encoding for the upsert-kafka sink — the
    * same envelope semantics as KafkaRest.recordsBody: PK columns as the
    * JSON key, a debezium envelope as the value, and an `op` column (if
    * present) routing `d` rows to a before-image delete with the op
    * excluded from the row payload. Rows without an op column (or with
    * a NULL op) are upserts. (`to_json` omits null fields where the
    * REST body spells them explicitly — equivalent to debezium readers,
    * for which absent and null envelope sides are the same.)
    */
  private[sqlgate] def upsertKafkaRecords(df: DataFrame,
      pk: Seq[String]): DataFrame = {
    val dataCols = df.columns.filterNot(_ == "op")
    val rowStruct = struct(dataCols.map(col): _*)
    val opCol =
      if (df.columns.contains("op")) coalesce(col("op"), lit("u"))
      else lit("u")
    // same delete spellings as KafkaRest.isDeleteOp: d / -D / delete,
    // case-insensitive, trimmed
    val del = lower(trim(opCol)).isin("d", "-d", "delete")
    df.select(
      to_json(struct(pk.map(col): _*)).as("key"),
      // normalize delete spellings to op:"d", matching
      // KafkaRest.recordsBody, so both sink paths emit one envelope shape
      to_json(struct(when(del, lit("d")).otherwise(opCol).as("op"),
        when(del, rowStruct).otherwise(lit(null)).as("before"),
        when(del, lit(null)).otherwise(rowStruct).as("after"))).as("value"))
  }

  /** Raw kafka consume frame (key/value/partition/offset columns): the
    * live REST-proxy wire when 'rest.endpoint' is set (the sandbox path
    * — see [[graft.sources.KafkaRestSource]]), else the native broker
    * format with Flink option names mapped to Spark's.
    */
  private def kafkaLoad(spark: SparkSession, spec: TableSpec,
      streaming: Boolean): DataFrame =
    spec.options.get("rest.endpoint") match {
      case Some(_) =>
        val fmt = classOf[graft.sources.KafkaRestSource].getName
        val ropts = Map(
          "rest.endpoint" -> spec.options("rest.endpoint"),
          "topic" -> spec.options.getOrElse("topic", "")) ++
          spec.options.get("scan.startup.mode").map("scan.startup.mode" -> _) ++
          spec.options.get("fetch.count").map("fetch.count" -> _)
        if (streaming) spark.readStream.format(fmt).options(ropts).load()
        else spark.read.format(fmt).options(ropts).load()
      case None =>
        val opts = Map(
          "kafka.bootstrap.servers" ->
            spec.options.getOrElse("properties.bootstrap.servers", ""),
          "subscribe" -> spec.options.getOrElse("topic", ""),
          "startingOffsets" -> (spec.options.get("scan.startup.mode") match {
            case Some("latest-offset") => "latest"
            case _                     => "earliest"
          })) ++
          spec.options.get("properties.group.id").map("kafka.group.id" -> _)
        if (streaming) spark.readStream.format("kafka").options(opts).load()
        else spark.read.format("kafka").options(opts).load()
    }

  /** Materialize a keyed changelog topic to its current snapshot: decode
    * debezium envelopes against the declared row schema, keep the last
    * event per PK in (ts_ms, kafka-offset) order, drop deletes. With
    * `tombstones`, a NULL (or literal `null`) value deletes the key it
    * was produced under (upsert-kafka compaction semantics); the PK
    * image is recovered from the record key. Batch gate mode only —
    * continuous MERGE is `CdcOps.applyChangelogJdbc`.
    */
  private def materializeChangelog(spec: TableSpec, loaded: DataFrame,
      streaming: Boolean, tombstones: Boolean): DataFrame = {
    require(spec.primaryKey.nonEmpty,
      s"${spec.connector} table ${spec.name}: changelog materialization " +
        "is keyed — PRIMARY KEY required")
    require(!streaming,
      s"${spec.connector} table ${spec.name}: changelog materialization " +
        "is batch-only in the gate; use CdcOps.applyChangelogJdbc for " +
        "continuous MERGE")
    val env = graft.streaming.CdcOps.decodeDebezium(
      loaded, spec.schema, carryCols = Seq("key", "value", "offset"))
    val decoded =
      if (!tombstones) env
      else {
        val isTomb = col("value").isNull ||
          trim(col("value").cast("string")) === "null"
        env
          .withColumn("before", when(isTomb,
            from_json(col("key").cast("string"), spec.schema))
            .otherwise(col("before")))
          .withColumn("op", when(isTomb, lit("d")).otherwise(col("op")))
          // Compacted-topic truth is the kafka offset, full stop: a
          // tombstone carries no ts_ms, so ordering by ts_ms first
          // (nulls-last) would rank it BELOW any earlier upsert whose
          // producer stamped ts_ms and resurrect the deleted key. Null
          // the column out so lastPerKey's (ts_ms, offset) order
          // degenerates to pure offset order for upsert-kafka reads.
          .withColumn("ts_ms", lit(null).cast("long"))
      }
    graft.streaming.CdcOps
      .lastPerKey(decoded, spec.primaryKey, seqCol = Some("offset"))
      .filter(col("op") =!= "d")
      .select(col("after.*"))
  }

  /** Build the source DataFrame for a registered table spec.
    * Streaming when the connector is unbounded or `streaming` is forced.
    */
  def source(spark: SparkSession, spec: TableSpec, streaming: Boolean): DataFrame = {
    val base = spec.connector match {
      case "datagen" =>
        val rps = spec.options.getOrElse("rows-per-second", "1000").toLong
        if (streaming)
          // 'rows-per-batch' selects the deterministic rate-micro-batch
          // source (fixed rows per micro-batch — reproducible tests);
          // plain 'rows-per-second' is the wall-clock rate source.
          spec.options.get("rows-per-batch") match {
            case Some(rpb) =>
              spark.readStream.format("rate-micro-batch")
                .option("rowsPerBatch", rpb.toLong).load()
                .select(datagenColumns(spec, col("value")): _*)
            case None =>
              spark.readStream.format("rate")
                .option("rowsPerSecond", rps).load()
                .select(datagenColumns(spec, col("value")): _*)
          }
        else {
          val n = spec.options.getOrElse("number-of-rows", "1000").toLong
          spark.range(n).select(datagenColumns(spec, col("id")): _*)
        }
      case "filesystem" =>
        val path = spec.options("path")
        val fmt = spec.options.getOrElse("format", "parquet")
        // 'source.bounded' = 'true': a BATCH relation even in streaming
        // runner mode — the frozen side of stream-static joins (lookup
        // corpora, DEDUP_CROSS_PAIRS indexes). Mirrors Flink's
        // filesystem source being bounded unless a monitor interval is
        // configured; here boundedness is opt-in so existing streaming
        // scripts keep streaming their file sources.
        if (streaming &&
            !spec.options.get("source.bounded").contains("true")) {
          // File streams REQUIRE a user schema, and for parquet the
          // declared types override the file's: declaring BIGINT over a
          // column the file stores as timestamp[us] would silently read
          // raw micros as longs and corrupt every derived value (the
          // round-9 failure class). Probe the file's own schema and fail
          // loudly on a numeric/timestamp mismatch instead.
          if (fmt == "parquet") {
            val fileSchema = spark.read.parquet(path).schema
            spec.schema.foreach { f =>
              fileSchema.find(_.name.equalsIgnoreCase(f.name)).foreach { g =>
                val integral = Set[org.apache.spark.sql.types.DataType](
                  org.apache.spark.sql.types.LongType,
                  org.apache.spark.sql.types.IntegerType)
                def isTs(t: org.apache.spark.sql.types.DataType) =
                  t == org.apache.spark.sql.types.TimestampType ||
                    t == org.apache.spark.sql.types.TimestampNTZType
                require(!(integral(f.dataType) && isTs(g.dataType)) &&
                  !(isTs(f.dataType) && integral(g.dataType)),
                  s"table ${spec.name}: column ${f.name} declared " +
                    s"${f.dataType.simpleString} but the parquet file " +
                    s"stores ${g.dataType.simpleString} — a schema " +
                    "override would silently reinterpret raw values; " +
                    "declare the file's type and derive the conversion " +
                    "in a computed column")
              }
            }
          }
          spark.readStream.format(fmt).schema(spec.schema).load(path)
        } else {
          val r = spark.read.format(fmt)
          (if (fmt == "parquet") r else r.schema(spec.schema)).load(path)
        }
      case "kafka" =>
        // value bytes → decode into the declared schema
        spec.options.get("format") match {
          case Some("debezium-json") =>
            // demo_6.md:205-236: a kafka source with a PK reading back a
            // debezium-json changelog is a continuously-materializing
            // keyed table. Batch gate mode materializes the replayed
            // changelog exactly like the mysql-cdc connector (last event
            // per key in (ts_ms, kafka-offset) order, deletes dropped);
            // continuous materialization is CdcOps.applyChangelogJdbc.
            materializeChangelog(spec,
              kafkaLoad(spark, spec, streaming), streaming,
              tombstones = false)
          case _ =>
            kafkaLoad(spark, spec, streaming).select(
              from_json(col("value").cast("string"), spec.schema).as("v"))
              .select(col("v.*"))
        }
      case "upsert-kafka" =>
        // Read side of the keyed-changelog connector: a compacted topic
        // where the key is the PK and the value is the last image (our
        // sink's debezium envelope — upsertKafkaRecords/KafkaRest emit
        // one envelope shape) or a NULL tombstone deleting the key.
        // Same batch materialization as debezium-json, plus tombstones.
        materializeChangelog(spec, kafkaLoad(spark, spec, streaming),
          streaming, tombstones = true)
      case "mysql-cdc" =>
        // No binlog client exists in this environment; the gate emulates
        // the connector by replaying a debezium-json changelog (one
        // envelope per line, the exact wire format the reference's CDC
        // jobs consume — `demo_6.md:87-99,186-204`) to its current
        // snapshot: decode → last event per key → drop deletes. A batch
        // read therefore sees the same rows a Flink job sees after binlog
        // catch-up. Continuous materialization into a keyed store is
        // graft.streaming.CdcOps.applyChangelogJdbc.
        val path = spec.options.getOrElse("changelog-path",
          throw new IllegalArgumentException(
            s"mysql-cdc table ${spec.name}: no binlog client in this " +
              "environment; set 'changelog-path' to a debezium-json " +
              "changelog file/dir to replay"))
        require(!streaming,
          s"mysql-cdc table ${spec.name}: snapshot replay is batch-only; " +
            "use CdcOps.applyChangelogJdbc for continuous materialization")
        require(spec.primaryKey.nonEmpty,
          s"mysql-cdc table ${spec.name}: PRIMARY KEY required (changelog " +
            "replay is keyed)")
        val decoded = graft.streaming.CdcOps.decodeDebezium(
          spark.read.text(path), spec.schema)
        graft.streaming.CdcOps.lastPerKey(decoded, spec.primaryKey)
          .filter(col("op") =!= "d")
          .select(col("after.*"))
      case "jdbc" =>
        val r = spark.read.format("jdbc")
          .option("url", spec.options.getOrElse("url", ""))
          .option("dbtable", spec.options.getOrElse("table-name", spec.name))
        val r2 = spec.options.get("username").fold(r)(r.option("user", _))
        val r3 = spec.options.get("password").fold(r2)(r2.option("password", _))
        val r4 = spec.options.get("driver").fold(r3)(r3.option("driver", _))
        r4.load()
      case other =>
        throw new IllegalArgumentException(s"unknown source connector: $other")
    }
    withDerived(spec, base)
  }

  /** Apply computed columns and watermark on top of the physical schema. */
  private def withDerived(spec: TableSpec, df: DataFrame): DataFrame = {
    val withComputed = spec.computed.foldLeft(df) { case (d, (name, ex)) =>
      val sparkExpr = ex.trim match {
        // whitespace-tolerant: the demos write both PROCTIME() and
        // PROCTIME () (demo_2.md:31)
        case e if e.replaceAll("\\s+", "").equalsIgnoreCase("PROCTIME()") =>
          "current_timestamp()"
        case e if e.equalsIgnoreCase("localtimestamp") => "localtimestamp()"
        case e => e
      }
      d.withColumn(name, expr(sparkExpr))
    }
    spec.watermark match {
      case Some((c, delay)) if withComputed.isStreaming =>
        withComputed.withWatermark(c, delay)
      case _ => withComputed
    }
  }

  /** datagen per-field expressions from `fields.<name>.*` options. */
  private def datagenColumns(spec: TableSpec, seq: org.apache.spark.sql.Column) = {
    spec.columns.map { case (name, tpe) =>
      val kind = spec.options.getOrElse(s"fields.$name.kind", "random")
      val c = kind match {
        case "sequence" =>
          val lo = spec.options.getOrElse(s"fields.$name.start", "0").toLong
          (seq + lit(lo))
        case _ => // random within [min,max] or full-range
          val mn = spec.options.get(s"fields.$name.min").map(_.toDouble)
          val mx = spec.options.get(s"fields.$name.max").map(_.toDouble)
          (mn, mx) match {
            case (Some(lo), Some(hi)) => floor(rand() * (hi - lo + 1) + lo)
            case _ if tpe.toUpperCase.startsWith("VARCHAR") ||
              tpe.toUpperCase == "STRING" =>
              concat(lit("v"), (seq % 1000).cast("string"))
            case _ => floor(rand() * 1000)
          }
      }
      c.cast(spec.schema(name).dataType).as(name)
    }
  }

  /** Start (streaming) or run (batch) an INSERT into a sink table.
    * `queryTag` disambiguates several INSERTs into the same sink within
    * one statement set (memory queryName / checkpoint subdir);
    * `overwrite` carries INSERT OVERWRITE semantics (batch only — the
    * streaming path has no overwrite analog and rejects it).
    */
  def write(spark: SparkSession, spec: TableSpec, df: DataFrame,
      checkpointDir: Option[String],
      trigger: Trigger = Trigger.AvailableNow(),
      queryTag: String = "", overwrite: Boolean = false): Option[StreamingQuery] = {
    val name = if (queryTag.isEmpty) spec.name else s"${spec.name}$queryTag"
    if (df.isStreaming) {
      require(!overwrite,
        s"INSERT OVERWRITE is not supported for streaming sink ${spec.name}")
      val w0: DataStreamWriter[Row] = spec.connector match {
        case "print" => df.writeStream.format("console")
        case "blackhole" => df.writeStream.format("noop")
        case "memory" => df.writeStream.format("memory").queryName(name)
        case "filesystem" =>
          df.writeStream.format(spec.options.getOrElse("format", "parquet"))
            .option("path", spec.options("path"))
        case "kafka" =>
          df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
            .writeStream.format("kafka")
            .option("kafka.bootstrap.servers",
              spec.options.getOrElse("properties.bootstrap.servers", ""))
            .option("topic", spec.options.getOrElse("topic", ""))
        case "upsert-kafka" =>
          // keyed changelog sink (demo_6.md:206-226): PK columns as the
          // compaction key, debezium-json envelope as the value. With a
          // 'rest.endpoint' the records POST over a live socket
          // (KafkaRest); otherwise the native producer path (construct-
          // only here — no broker in the container). Same bytes either way.
          require(spec.primaryKey.nonEmpty,
            s"upsert-kafka sink ${spec.name} requires a PRIMARY KEY")
          spec.options.get("rest.endpoint") match {
            case Some(ep) =>
              df.writeStream.foreachBatch(KafkaRest.writer(spec.primaryKey,
                KafkaRest.httpPost(ep,
                  spec.options.getOrElse("topic", spec.name))) _)
            case None =>
              upsertKafkaRecords(df, spec.primaryKey)
                .writeStream.format("kafka")
                .option("kafka.bootstrap.servers",
                  spec.options.getOrElse("properties.bootstrap.servers", ""))
                .option("topic", spec.options.getOrElse("topic", ""))
          }
        case "jdbc" =>
          df.writeStream.foreachBatch { (batch: Dataset[Row], _: Long) =>
            JdbcUpsert.upsert(batch, spec); ()
          }
        case "elasticsearch-7" =>
          df.writeStream.foreachBatch(EsBulk.writer(
            spec.options.getOrElse("index", spec.name), spec.primaryKey,
            EsBulk.httpPost(spec.options.getOrElse("hosts", ""))) _)
        case other =>
          throw new IllegalArgumentException(s"unknown sink connector: $other")
      }
      // Output mode: filesystem sinks only support append; otherwise an
      // aggregating plan needs update (PK-less console/memory aggregation
      // is legal in the reference and must not die with "Append output
      // mode not supported").
      val aggregating = df.queryExecution.analyzed.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.isDefined
      val mode =
        if (spec.connector == "filesystem") "append"
        else if (spec.primaryKey.nonEmpty || aggregating) "update"
        else "append"
      val w1 = checkpointDir.fold(w0)(d => w0.option("checkpointLocation", d))
      Some(w1.outputMode(mode).trigger(trigger).start())
    } else {
      spec.connector match {
        case "print" => df.show(20, truncate = false); None
        case "blackhole" => df.foreach(_ => ()); None
        case "memory" =>
          df.createOrReplaceTempView(spec.name + "_out"); None
        case "filesystem" =>
          df.write.mode(if (overwrite) "overwrite" else "append")
            .format(spec.options.getOrElse("format", "parquet"))
            .save(spec.options("path")); None
        case "kafka" =>
          require(!overwrite,
            s"INSERT OVERWRITE is not supported for kafka sink ${spec.name}")
          df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
            .write.format("kafka")
            .option("kafka.bootstrap.servers",
              spec.options.getOrElse("properties.bootstrap.servers", ""))
            .option("topic", spec.options.getOrElse("topic", ""))
            .save(); None
        case "upsert-kafka" =>
          require(!overwrite, "INSERT OVERWRITE is not supported for " +
            s"upsert-kafka sink ${spec.name}")
          require(spec.primaryKey.nonEmpty,
            s"upsert-kafka sink ${spec.name} requires a PRIMARY KEY")
          spec.options.get("rest.endpoint") match {
            case Some(ep) =>
              KafkaRest.writer(spec.primaryKey, KafkaRest.httpPost(ep,
                spec.options.getOrElse("topic", spec.name)))(df, 0L)
            case None =>
              upsertKafkaRecords(df, spec.primaryKey)
                .write.format("kafka")
                .option("kafka.bootstrap.servers",
                  spec.options.getOrElse("properties.bootstrap.servers", ""))
                .option("topic", spec.options.getOrElse("topic", ""))
                .save()
          }
          None
        case "jdbc" =>
          // OVERWRITE = replace table contents (Flink batch overwrite
          // semantics); a silent upsert-append here would corrupt the
          // caller's replace intent
          if (overwrite) JdbcUpsert.deleteAll(spec)
          JdbcUpsert.upsert(df, spec); None
        case "elasticsearch-7" =>
          // no bulk delete-by-index here; _id-from-PK upserts are the
          // idempotent path, so OVERWRITE (truncate-then-write) is
          // rejected rather than silently degraded to an upsert
          require(!overwrite,
            s"INSERT OVERWRITE is not supported for elasticsearch sink ${spec.name}")
          EsBulk.writer(spec.options.getOrElse("index", spec.name),
            spec.primaryKey,
            EsBulk.httpPost(spec.options.getOrElse("hosts", "")))(df, 0L)
          None
        case other =>
          throw new IllegalArgumentException(s"unknown sink connector: $other")
      }
    }
  }
}

/** Keyed JDBC upsert used by the PK sink (`demo_1.md:46-56`). Two
  * dialects: MySQL `INSERT ... ON DUPLICATE KEY UPDATE` (the reference's
  * target) and ANSI `MERGE INTO` (Derby/DB2/SQLServer-style; exercised
  * against embedded Derby in JdbcRoundTripSpec). Dialect selected by the
  * table option 'dialect' = 'mysql' (default) | 'merge'.
  */
object JdbcUpsert {
  def upsertSql(table: String, cols: Seq[String], pk: Seq[String]): String = {
    val collist = cols.mkString(", ")
    val params = cols.map(_ => "?").mkString(", ")
    val updates = cols.filterNot(pk.contains)
      .map(c => s"$c = VALUES($c)").mkString(", ")
    // key-only table: nothing to update on conflict → no-op update of the
    // first PK column (an empty ON DUPLICATE KEY UPDATE list is a syntax
    // error; INSERT IGNORE would swallow FK/truncation errors too, not
    // just duplicate keys)
    if (updates.isEmpty)
      s"INSERT INTO $table ($collist) VALUES ($params) " +
        s"ON DUPLICATE KEY UPDATE ${pk.head} = ${pk.head}"
    else
      s"INSERT INTO $table ($collist) VALUES ($params) " +
        s"ON DUPLICATE KEY UPDATE $updates"
  }

  /** ANSI MERGE upsert; `sqlTypes` aligns with cols (Derby requires typed
    * parameter markers inside VALUES).
    */
  def mergeSql(table: String, cols: Seq[String], sqlTypes: Seq[String],
      pk: Seq[String]): String = {
    val typedParams = sqlTypes.map(t => s"CAST(? AS $t)").mkString(", ")
    val src = s"(VALUES ($typedParams)) AS v(${cols.mkString(", ")})"
    val on = pk.map(k => s"t.$k = v.$k").mkString(" AND ")
    val sets = cols.filterNot(pk.contains)
      .map(c => s"t.$c = v.$c").mkString(", ")
    val insCols = cols.mkString(", ")
    val insVals = cols.map(c => s"v.$c").mkString(", ")
    // key-only table: no WHEN MATCHED clause (empty SET list is invalid)
    val matched =
      if (sets.isEmpty) "" else s"WHEN MATCHED THEN UPDATE SET $sets "
    s"MERGE INTO $table t USING $src ON $on " + matched +
      s"WHEN NOT MATCHED THEN INSERT ($insCols) VALUES ($insVals)"
  }

  private def jdbcType(dt: org.apache.spark.sql.types.DataType): String =
    dt.typeName match {
      case "long" => "BIGINT"
      case "integer" => "INT"
      case "double" => "DOUBLE"
      case "string" => "VARCHAR(255)"
      case "boolean" => "BOOLEAN"
      case other => other.toUpperCase
    }

  /** java.sql.Types code for typed setNull (drivers like Derby reject an
    * untyped setObject(i, null)).
    */
  private def sqlTypeCode(dt: org.apache.spark.sql.types.DataType): Int =
    dt.typeName match {
      case "long" => java.sql.Types.BIGINT
      case "integer" => java.sql.Types.INTEGER
      case "double" => java.sql.Types.DOUBLE
      case "boolean" => java.sql.Types.BOOLEAN
      case _ => java.sql.Types.VARCHAR
    }

  def upsert(df: Dataset[Row], spec: TableSpec): Unit = {
    val table = spec.options.getOrElse("table-name", spec.name)
    val cols = df.columns.toSeq
    val pk = spec.primaryKey
    val dialect = spec.options.getOrElse("dialect", "mysql")
    val url = spec.options.getOrElse("url", "")
    val user = spec.options.getOrElse("username", "")
    val pass = spec.options.getOrElse("password", "")
    dialect match {
      case "two-step" =>
        // Portable UPDATE-then-INSERT (works on any JDBC store, incl.
        // Derby which restricts MERGE sources to base tables). Key-only
        // tables have no SET list, so probe existence instead.
        val nonPk = cols.filterNot(pk.contains)
        val probeSql =
          if (nonPk.isEmpty)
            s"SELECT 1 FROM $table WHERE " +
              pk.map(k => s"$k = ?").mkString(" AND ")
          else
            s"UPDATE $table SET " + nonPk.map(c => s"$c = ?").mkString(", ") +
              " WHERE " + pk.map(k => s"$k = ?").mkString(" AND ")
        val insSql = s"INSERT INTO $table (${cols.mkString(", ")}) VALUES " +
          cols.map(_ => "?").mkString("(", ", ", ")")
        val colIdx = cols.zipWithIndex.toMap
        df.foreachPartition { rows: Iterator[Row] =>
          if (rows.hasNext) {
            val conn = java.sql.DriverManager.getConnection(url, user, pass)
            try {
              val probe = conn.prepareStatement(probeSql)
              val ins = conn.prepareStatement(insSql)
              rows.foreach { r =>
                (nonPk ++ pk).zipWithIndex.foreach { case (c, i) =>
                  probe.setObject(i + 1, r.get(colIdx(c)))
                }
                val exists =
                  if (nonPk.isEmpty) {
                    val rs = probe.executeQuery()
                    try rs.next() finally rs.close()
                  } else probe.executeUpdate() > 0
                if (!exists) {
                  cols.zipWithIndex.foreach { case (c, i) =>
                    ins.setObject(i + 1, r.get(colIdx(c)))
                  }
                  ins.executeUpdate()
                }
              }
              ()
            } finally conn.close()
          }
        }
      case _ =>
        val sql = dialect match {
          case "merge" => mergeSql(table, cols,
            df.schema.fields.map(f => jdbcType(f.dataType)).toSeq, pk)
          case _ => upsertSql(table, cols, pk)
        }
        df.foreachPartition { rows: Iterator[Row] =>
          if (rows.hasNext) {
            val conn = java.sql.DriverManager.getConnection(url, user, pass)
            try {
              val ps = conn.prepareStatement(sql)
              rows.foreach { r =>
                (0 until r.length).foreach(i => ps.setObject(i + 1, r.get(i)))
                ps.addBatch()
              }
              ps.executeBatch()
              ()
            } finally conn.close()
          }
        }
    }
  }

  /** Empty the sink table — the INSERT OVERWRITE path (one driver-side
    * statement; the store does the work).
    */
  def deleteAll(spec: TableSpec): Unit = {
    val conn = java.sql.DriverManager.getConnection(
      spec.options.getOrElse("url", ""),
      spec.options.getOrElse("username", ""),
      spec.options.getOrElse("password", ""))
    try {
      conn.createStatement().executeUpdate(
        s"DELETE FROM ${spec.options.getOrElse("table-name", spec.name)}")
      ()
    } finally conn.close()
  }

  /** Executor-side keyed DELETE: every column of `df` is a key column of
    * the WHERE clause. [[graft.streaming.CdcOps.applyChangelogJdbc]]
    * routes `op='d'` rows here so CDC deletes reach the same keyed JDBC
    * table the upserts target. The predicate is null-safe: a NULL key
    * component matches NULL-keyed rows instead of silently never matching
    * (plain `k = NULL` is UNKNOWN under SQL semantics) — each key binds
    * the value plus an is-null flag, portable across dialects.
    */
  def delete(df: Dataset[Row], spec: TableSpec): Unit = {
    val table = spec.options.getOrElse("table-name", spec.name)
    val url = spec.options.getOrElse("url", "")
    val user = spec.options.getOrElse("username", "")
    val pass = spec.options.getOrElse("password", "")
    val sql = s"DELETE FROM $table WHERE " +
      df.columns.map(k => s"($k = ? OR ($k IS NULL AND ? = 1))")
        .mkString(" AND ")
    val typeCodes = df.schema.fields.map(f => sqlTypeCode(f.dataType))
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val conn = java.sql.DriverManager.getConnection(url, user, pass)
        try {
          val ps = conn.prepareStatement(sql)
          rows.foreach { r =>
            (0 until r.length).foreach { i =>
              if (r.isNullAt(i)) {
                ps.setNull(2 * i + 1, typeCodes(i))
                ps.setInt(2 * i + 2, 1)
              } else {
                ps.setObject(2 * i + 1, r.get(i))
                ps.setInt(2 * i + 2, 0)
              }
            }
            ps.addBatch()
          }
          ps.executeBatch()
          ()
        } finally conn.close()
      }
    }
  }
}
