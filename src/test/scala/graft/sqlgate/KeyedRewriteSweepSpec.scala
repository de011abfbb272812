package graft.sqlgate

import graft.SparkSpec
import java.nio.file.Files
import java.sql.DriverManager

/** Property-style sweep over generated demo_3-shaped statements for the
  * STREAMING keyed-lookup rewrite (`ScriptRunner.
  * rewriteStreamingKeyedJoin`) — the one gate path that performs
  * textual SQL surgery. Textual rewriting cannot scope identifiers by
  * construction, so the contract under test is:
  *
  *   every generated statement either (a) produces EXACTLY the rows the
  *   BATCH gate produces for the same statement over the same data (the
  *   keyed slice path — itself oracle-checked by q_gate_lookup_keyed),
  *   or (b) throws, naming the dim — NEVER a silent wrong-scope
  *   rewrite.
  *
  * Generated axes: prefix-colliding table names (every case's dim is
  * `<src>_dim`, the demo_3 trap), inner/LEFT/multi-line `LEFT OUTER`
  * join spellings, probe alias styles (AS / bare / none), whitespace
  * fuzz around the ON clause, `--` comments containing join-like text,
  * and a derived-table wrap of the whole join. Conflict shapes (dim
  * alias re-bound by a FROM, by a derived table in a NESTED scope, the
  * dim's table name re-bound, the probe qualifier double-bound, a
  * backticked dim alias the temporal matcher does not accept) must all
  * reject loudly.
  */
class KeyedRewriteSweepSpec extends SparkSpec {

  private def derby(db: String): String = {
    val url = s"jdbc:derby:memory:$db;create=true"
    DriverManager.getConnection(url).close()
    url
  }

  // ---- shared fixtures -------------------------------------------------
  private lazy val dimUrl: String = {
    val url = derby("swpdim")
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.execute(
        "CREATE TABLE swp_dim (id BIGINT PRIMARY KEY, label VARCHAR(24))")
      val ps = c.prepareStatement("INSERT INTO swp_dim VALUES (?, ?)")
      (0L until 60L).foreach { i =>
        ps.setLong(1, i); ps.setString(2, s"label_$i"); ps.addBatch()
      }
      ps.executeBatch()
    } finally c.close()
    url
  }

  // probe rows: two hits on one key, one other hit, one MISSING key
  // (null-extends under LEFT, drops under inner — join-kind sensitive)
  private val probeRows: Seq[(Long, Double)] =
    Seq((7L, 1.5), (7L, 2.5), (42L, 3.0), (999L, 4.0))

  private lazy val probeParquet: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("swp_probe").toString
    probeRows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(d)
    d
  }

  private def srcDdl(name: String, streaming: Boolean,
      broker: Option[graft.sources.StubBroker]): String =
    if (streaming)
      s"""create table $name (k BIGINT, v DOUBLE) with (
         |  'connector' = 'kafka', 'topic' = 'swp_topic',
         |  'rest.endpoint' = '${broker.get.endpoint}',
         |  'scan.startup.mode' = 'earliest-offset', 'format' = 'json'
         |);""".stripMargin
    else
      s"""create table $name (k BIGINT, v DOUBLE) with (
         |  'connector' = 'filesystem', 'path' = '$probeParquet',
         |  'format' = 'parquet'
         |);""".stripMargin

  private def dimDdl(name: String): String =
    s"""create table $name (id BIGINT, label VARCHAR) with (
       |  'connector' = 'jdbc', 'url' = '$dimUrl',
       |  'table-name' = 'swp_dim',
       |  'lookup.cache.strategy' = 'keyed',
       |  'lookup.cache.ttl' = '60 s',
       |  'lookup.cache.max-rows' = '50'
       |);""".stripMargin

  /** Run one generated INSERT in BOTH gate modes over the same rows and
    * return (batchRows, streamRows) as comparable sets.
    */
  private def bothModes(i: Int, insertSql: String)
      : (Set[(Any, Any, Any)], Set[(Any, Any, Any)]) = {
    val src = s"swp_src_$i"; val dim = s"swp_src_${i}_dim"
    val sink = s"swp_sink_$i"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.get(0), r.get(1), r.get(2))).toSet
    // batch comparator: keyed slice path
    val bRunner = new ScriptRunner(spark, batchMode = true)
    val batch =
      try {
        bRunner.run(
          s"""${srcDdl(src, streaming = false, None)}
             |${dimDdl(dim)}
             |CREATE TABLE $sink (k BIGINT, label STRING, v DOUBLE)
             |WITH ('connector' = 'memory');
             |$insertSql
             |""".stripMargin)
        rows(spark.table(s"${sink}_out"))
      } finally bRunner.close()
    // streaming: the surgery under test, on a real drain
    val broker = new graft.sources.StubBroker("swp_topic", 1)
    val sRunner = new ScriptRunner(spark,
      checkpointRoot = Some(Files.createTempDirectory("swp_ck").toString))
    val stream =
      try {
        probeRows.foreach { case (k, v) =>
          broker.append(0, "null", s"""{"k":$k,"v":$v}""")
        }
        val res = sRunner.run(
          s"""${srcDdl(src, streaming = true, Some(broker))}
             |${dimDdl(dim)}
             |CREATE TABLE $sink (k BIGINT, label STRING, v DOUBLE)
             |WITH ('connector' = 'memory');
             |$insertSql
             |""".stripMargin)
        val q = res.queries.head
        try { q.processAllAvailable(); rows(spark.table(sink)) }
        finally q.stop()
      } finally { sRunner.close(); broker.stop() }
    (batch, stream)
  }

  /** One success-shaped statement from the generation axes. */
  private def genStatement(i: Int, joinKind: String, probeAlias: String,
      dimAlias: String, ws1: String, ws2: String, comment: Boolean,
      wrap: Boolean): String = {
    val src = s"swp_src_$i"; val dim = s"swp_src_${i}_dim"
    val sink = s"swp_sink_$i"
    val (probeRef, q) = probeAlias match {
      case "AS"   => (s"$src AS f$i", s"f$i")
      case "bare" => (s"$src f$i", s"f$i")
      case _      => (src, src)
    }
    val core =
      s"""SELECT $q.k,$ws1$dimAlias.label, $q.v
         |FROM $probeRef
         |$joinKind $dim FOR SYSTEM_TIME AS OF $q.k AS $dimAlias$ws2 ON $q.k = $dimAlias.id""".stripMargin
    val sel = if (wrap) s"SELECT * FROM (\n$core\n) wrapped_t" else core
    val cmt = if (comment)
      s"-- JOIN $dim FOR SYSTEM_TIME AS OF x.k AS zz ON x.k = zz.id\n"
    else ""
    s"INSERT INTO $sink\n$cmt$sel;"
  }

  test("sweep: every generated demo_3 shape rewrites to the batch " +
    "keyed-slice answer exactly (prefix-colliding names, alias styles, " +
    "multi-line LEFT OUTER, comments, derived-table wrap)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val joinKinds =
      Seq("JOIN", "LEFT JOIN", "LEFT\n  OUTER\n  JOIN", "LEFT OUTER JOIN")
    val aliasStyles = Seq("AS", "bare", "none")
    val wsGen = Gen.oneOf(" ", "\n  ", "\t ", "\n")
    val shapeGen = for {
      jk <- Gen.oneOf(joinKinds)
      as <- Gen.oneOf(aliasStyles)
      da <- Gen.oneOf("d", "dd1", "dAlias")
      w1 <- wsGen; w2 <- wsGen
      cm <- Gen.oneOf(true, false)
      wr <- Gen.oneOf(true, false)
    } yield (jk, as, da, w1, w2, cm, wr)
    // seeded draws: reproducible, and forced coverage of the two
    // join-kind extremes (inner drops the missing key, LEFT null-extends)
    val drawn = (1 to 9).map { s =>
      shapeGen.apply(Gen.Parameters.default, Seed(s.toLong)).get
    } ++ Seq(
      ("JOIN", "none", "d", " ", " ", true, false),
      ("LEFT\n  OUTER\n  JOIN", "AS", "dd1", "\n  ", "\n  ", false, true))
    drawn.zipWithIndex.foreach { case ((jk, as, da, w1, w2, cm, wr), ix) =>
      val sqlText = genStatement(ix, jk, as, da, w1, w2, cm, wr)
      val (batch, stream) = bothModes(ix, sqlText)
      // non-vacuous: the missing key must make join kinds distinguishable
      val isLeft = jk.toUpperCase.startsWith("LEFT")
      assert(batch.exists(_._1 == 42L), s"case $ix vacuous:\n$sqlText")
      assert(batch.exists(_._1 == 999L) == isLeft,
        s"case $ix join-kind wrong in batch:\n$sqlText\n$batch")
      assert(stream == batch,
        s"case $ix stream/batch divergence:\n$sqlText\n" +
          s"stream=$stream\nbatch=$batch")
    }
  }

  test("sweep: conflict shapes reject loudly, never silently " +
    "wrong-scope (alias re-bound, nested derived table, dim table " +
    "name re-bound, probe qualifier double-bound)") {
    val i = 90
    val src = s"swp_src_$i"; val dim = s"swp_src_${i}_dim"
    val sink = s"swp_sink_$i"
    val base = s"""FROM $src f
                  |JOIN $dim FOR SYSTEM_TIME AS OF f.k AS d ON f.k = d.id""".stripMargin
    val conflicts: Seq[(String, String)] = Seq(
      // dim ALIAS bound by another plain FROM/JOIN
      ("alias re-bound by a cross join",
        s"""INSERT INTO $sink
           |SELECT f.k, d.label, f.v $base
           |CROSS JOIN swp_other d;""".stripMargin),
      // dim alias bound by a DERIVED TABLE in a nested scope — the
      // FromAliasRe-invisible bind; its d.id would otherwise be
      // clobbered and resolved from the OUTER scope, silently wrong
      ("alias re-bound by a nested derived table",
        s"""INSERT INTO $sink
           |SELECT f.k, d.label, f.v $base
           |WHERE EXISTS (SELECT 1 FROM (SELECT 5 AS id) d
           |              WHERE d.id = f.k);""".stripMargin),
      // the dim's TABLE NAME re-bound by an unrelated relation
      ("dim table name re-bound",
        s"""INSERT INTO $sink
           |SELECT f.k, d.label, f.v $base
           |CROSS JOIN swp_other AS $dim;""".stripMargin),
      // probe qualifier bound twice (subquery re-selecting the probe)
      ("probe qualifier double-bound",
        s"""INSERT INTO $sink
           |SELECT f.k, d.label, f.v $base
           |CROSS JOIN (SELECT k FROM $src) f;""".stripMargin))
    val broker = new graft.sources.StubBroker("swp_topic", 1)
    try {
      probeRows.foreach { case (k, v) =>
        broker.append(0, "null", s"""{"k":$k,"v":$v}""")
      }
      conflicts.foreach { case (what, stmt) =>
        val runner = new ScriptRunner(spark, checkpointRoot =
          Some(Files.createTempDirectory("swp_ck").toString))
        try {
          val e = intercept[IllegalArgumentException] {
            runner.run(
              s"""${srcDdl(src, streaming = true, Some(broker))}
                 |${dimDdl(dim)}
                 |create table swp_other (k BIGINT, v DOUBLE) with (
                 |  'connector' = 'filesystem', 'path' = '$probeParquet',
                 |  'format' = 'parquet', 'source.bounded' = 'true'
                 |);
                 |CREATE TABLE $sink (k BIGINT, label STRING, v DOUBLE)
                 |WITH ('connector' = 'memory');
                 |$stmt
                 |""".stripMargin)
          }
          assert(e.getMessage.contains(dim),
            s"$what: message must name the dim — ${e.getMessage}")
        } finally runner.close()
      }
    } finally broker.stop()
  }

  test("sweep: a backticked dim alias the temporal matcher does not " +
    "accept stays LOUD (keyed dim unreachable), not silent") {
    val i = 91
    val src = s"swp_src_$i"; val dim = s"swp_src_${i}_dim"
    val broker = new graft.sources.StubBroker("swp_topic", 1)
    val runner = new ScriptRunner(spark, checkpointRoot =
      Some(Files.createTempDirectory("swp_ck").toString))
    try {
      val e = intercept[IllegalArgumentException] {
        runner.run(
          s"""${srcDdl(src, streaming = true, Some(broker))}
             |${dimDdl(dim)}
             |CREATE TABLE swp_sink_$i (k BIGINT, label STRING, v DOUBLE)
             |WITH ('connector' = 'memory');
             |INSERT INTO swp_sink_$i
             |SELECT f.k, `d`.label, f.v FROM $src f
             |JOIN $dim FOR SYSTEM_TIME AS OF f.k AS `d`
             |  ON f.k = `d`.id;
             |""".stripMargin)
      }
      assert(e.getMessage.contains(dim), e.getMessage)
    } finally { runner.close(); broker.stop() }
  }
}
