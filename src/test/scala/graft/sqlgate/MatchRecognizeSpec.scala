package graft.sqlgate

import graft.SparkSpec
import java.sql.Timestamp

/** Executable semantics of the MATCH_RECOGNIZE rewrite: the rewritten
  * SQL runs on Spark and produces the earliest-anchored first match per
  * partition key, with FIRST/LAST measures reading the right rows.
  */
class MatchRecognizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private lazy val ev = Seq(
    // user 1: x@1, y@2, y@3, z@4 — full match, B+ spans rows 2-3
    (1L, ts(1), "x", 10.0), (1L, ts(2), "y", 20.0),
    (1L, ts(3), "y", 30.0), (1L, ts(4), "z", 40.0),
    // user 2: y@1 precedes the first x@2 — its y must NOT anchor B;
    // match is x@2, y@5 (gap row at 3 ignored), z@6
    (2L, ts(1), "y", 1.0), (2L, ts(2), "x", 2.0),
    (2L, ts(3), "w", 3.0), (2L, ts(5), "y", 5.0), (2L, ts(6), "z", 6.0),
    // user 3: x then z but no y — no match
    (3L, ts(1), "x", 1.0), (3L, ts(2), "z", 2.0),
    // user 4: pattern out of order (z y x) — no match
    (4L, ts(1), "z", 1.0), (4L, ts(2), "y", 2.0), (4L, ts(3), "x", 3.0)
  ).toDF("user_id", "t", "kind", "v")

  private val clause =
    """SELECT user_id, a_t, b_first, b_last, z_v FROM ev MATCH_RECOGNIZE (
      |  PARTITION BY user_id
      |  ORDER BY t
      |  MEASURES A.t AS a_t, FIRST(B.t) AS b_first, LAST(B.t) AS b_last,
      |    C.v AS z_v
      |  ONE ROW PER MATCH
      |  AFTER MATCH SKIP PAST LAST ROW
      |  PATTERN (A B+ C)
      |  DEFINE A AS A.kind = 'x', B AS B.kind = 'y', C AS C.kind = 'z'
      |)""".stripMargin

  test("first match per key; FIRST/LAST on a + variable; no-match keys drop") {
    ev.createOrReplaceTempView("ev")
    val rows = spark.sql(FlinkSqlRewrite(clause))
      .orderBy("user_id")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
        r.getTimestamp(2).getTime / 1000, r.getTimestamp(3).getTime / 1000,
        r.getDouble(4)))
      .toSeq
    assert(rows == Seq(
      (1L, 1L, 2L, 3L, 40.0), // B+ spans y@2..y@3: FIRST=2, LAST=3
      (2L, 2L, 5L, 5L, 6.0))) // y@1 before the x anchor is ignored
  }

  test("WITHIN prunes matches that exceed the duration bound") {
    ev.createOrReplaceTempView("ev")
    val bounded = clause.replace("PATTERN (A B+ C)",
      "PATTERN (A B+ C) WITHIN INTERVAL '3' SECOND")
    val keys = spark.sql(FlinkSqlRewrite(bounded))
      .select("user_id").as[Long].collect().sorted.toSeq
    // user 1 spans 1→4 s (= 3 s, kept); user 2 spans 2→6 s (4 s, dropped)
    assert(keys == Seq(1L))
    val loose = clause.replace("PATTERN (A B+ C)",
      "PATTERN (A B+ C) WITHIN INTERVAL '10' SECOND")
    val keys2 = spark.sql(FlinkSqlRewrite(loose))
      .select("user_id").as[Long].collect().sorted.toSeq
    assert(keys2 == Seq(1L, 2L))
  }
}
