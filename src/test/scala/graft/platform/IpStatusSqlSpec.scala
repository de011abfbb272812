package graft.platform

import org.scalatest.funsuite.AnyFunSuite

/** Pins the EXACT SQL text [[IpStatusSql]] generates for both dialects.
  * The sandbox only ever executes the Derby branch against a live
  * database (embedded Derby; no MySQL server exists here), so the MySQL
  * spellings are asserted by text — the round-10/11 lesson is that the
  * dialect branch nothing executes is the one that ships broken.
  */
class IpStatusSqlSpec extends AnyFunSuite {

  test("MySQL clock read is a TZ-free epoch, not a zone-mapped DATETIME") {
    // UNIX_TIMESTAMP is epoch-defined regardless of connection zone;
    // CURRENT_TIMESTAMP read via getTimestamp would go through the
    // client zone and skew instances apart (ADVICE r11 finding #1)
    assert(IpStatusSql.nowQuery(mysql = true) ===
      "SELECT ROUND(UNIX_TIMESTAMP(NOW(3)) * 1000)")
    assert(!IpStatusSql.nowQuery(mysql = true).contains("CURRENT_TIMESTAMP"))
  }

  test("Derby clock read uses the VALUES form") {
    assert(IpStatusSql.nowQuery(mysql = false) === "VALUES CURRENT_TIMESTAMP")
  }

  test("MySQL DDL: AUTO_INCREMENT id, no Derby identity clause") {
    val ddl = IpStatusSql.createTableDdl(mysql = true)
    assert(ddl.contains("id BIGINT AUTO_INCREMENT PRIMARY KEY"))
    assert(!ddl.contains("GENERATED ALWAYS AS IDENTITY"))
    assert(ddl.contains("ip VARCHAR(64) NOT NULL UNIQUE"))
    assert(ddl.contains("last_time BIGINT"))
  }

  test("Derby DDL: identity clause, no MySQL AUTO_INCREMENT") {
    val ddl = IpStatusSql.createTableDdl(mysql = false)
    assert(ddl.contains("id BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY"))
    assert(!ddl.contains("AUTO_INCREMENT"))
  }

  test("table-exists detection is dialect-exact (MySQL 1050 / Derby X0Y32)") {
    val mysqlDup = new java.sql.SQLException("Table exists", "42S01", 1050)
    val mysqlSyntax = new java.sql.SQLException("syntax", "42000", 1064)
    val derbyDup = new java.sql.SQLException("Table exists", "X0Y32")
    assert(IpStatusSql.isTableExists(mysqlDup, mysql = true))
    // 1064 is a SYNTAX error — swallowing it would hide a broken DDL
    assert(!IpStatusSql.isTableExists(mysqlSyntax, mysql = true))
    assert(IpStatusSql.isTableExists(derbyDup, mysql = false))
    // Derby's duplicate state must not satisfy the MySQL branch & v.v.
    assert(!IpStatusSql.isTableExists(derbyDup, mysql = true))
    assert(!IpStatusSql.isTableExists(mysqlDup, mysql = false))
  }
}
