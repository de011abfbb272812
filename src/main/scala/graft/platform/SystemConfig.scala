package graft.platform

/** System configuration store — the reference's `system_config` table +
  * `SystemConfigService` (`flink_web.sql:143-156`,
  * `ConfigApiController.java:34-75`): a key-value map holding platform
  * settings, notably the alarm webhook URLs (`SysConfigEnum.java:47-53`
  * — the reference's key spellings `dingding_alart_url` /
  * `callback_alart_url` are kept verbatim for config-file parity).
  * Handlers read it at fire time, so edits apply to the next alarm
  * without restarts, like the reference's per-send config lookup.
  */
object SystemConfig {
  val DingDingAlarmUrl = "dingding_alart_url"
  val CallbackAlarmUrl = "callback_alart_url"
}

trait SystemConfig {
  def get(key: String): Option[String]
  def upsert(key: String, value: String): Unit
  def delete(key: String): Unit
  def all(): Seq[(String, String)]
}

final class InMemorySystemConfig extends SystemConfig {
  private val m = scala.collection.concurrent.TrieMap[String, String]()
  def get(key: String): Option[String] = m.get(key)
  def upsert(key: String, value: String): Unit = m(key) = value
  def delete(key: String): Unit = { m.remove(key); () }
  def all(): Seq[(String, String)] = m.toSeq.sortBy(_._1)
}

/** JDBC-backed store following [[JdbcJobRegistry]]'s pattern. */
final class JdbcSystemConfig(url: String, user: String = "",
    pass: String = "") extends SystemConfig {

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(url, user, pass)
    try f(c) finally c.close()
  }

  withConn { c =>
    try {
      c.createStatement().execute(
        """CREATE TABLE system_config (
          |  cfg_key VARCHAR(128) PRIMARY KEY,
          |  cfg_val VARCHAR(1024))""".stripMargin)
      ()
    } catch {
      case e: java.sql.SQLException
        if e.getSQLState == "X0Y32" || e.getErrorCode == 1050 => ()
    }
  }

  def get(key: String): Option[String] = withConn { c =>
    val ps = c.prepareStatement(
      "SELECT cfg_val FROM system_config WHERE cfg_key = ?")
    ps.setString(1, key)
    val rs = ps.executeQuery()
    if (rs.next()) Option(rs.getString(1)) else None
  }

  def upsert(key: String, value: String): Unit = withConn { c =>
    val upd = c.prepareStatement(
      "UPDATE system_config SET cfg_val = ? WHERE cfg_key = ?")
    upd.setString(1, value); upd.setString(2, key)
    if (upd.executeUpdate() == 0) {
      val ins = c.prepareStatement(
        "INSERT INTO system_config (cfg_key, cfg_val) VALUES (?, ?)")
      ins.setString(1, key); ins.setString(2, value)
      ins.executeUpdate()
    }
    ()
  }

  def delete(key: String): Unit = withConn { c =>
    val ps = c.prepareStatement(
      "DELETE FROM system_config WHERE cfg_key = ?")
    ps.setString(1, key)
    ps.executeUpdate()
    ()
  }

  def all(): Seq[(String, String)] = withConn { c =>
    val rs = c.createStatement().executeQuery(
      "SELECT cfg_key, cfg_val FROM system_config ORDER BY cfg_key")
    val out = scala.collection.mutable.Buffer[(String, String)]()
    while (rs.next()) out += (rs.getString(1) -> rs.getString(2))
    out.toSeq
  }
}
