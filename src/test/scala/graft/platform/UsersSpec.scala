package graft.platform

import graft.SparkSpec
import java.nio.file.Files

/** User management + login-interceptor parity: md5 credential semantics
  * (incl. the reference's legacy plain-stored fallback), session token
  * round trip, Derby-backed store, and the HTTP facade guarding every
  * verb except login/logout behind the session cookie.
  */
class UsersSpec extends SparkSpec {

  test("login issues a verifiable session; wrong/stopped users rejected") {
    val svc = new UserService(new InMemoryUserStore)
    svc.addUser("admin", "Administrator", "123456")
    val tok = svc.login("admin", "123456")
    assert(svc.checkLogin(tok))
    assert(svc.userOf(tok).exists(_.username == "admin"))
    // the token's password field is salted — never the stored hash, nor
    // anything derivable from it without this process's secret
    assert(Users.decodeSession(tok).exists(s =>
      s.password != Users.md5("123456") &&
        s.password != Users.md5(Users.md5("123456"))))
    // a token minted from the leaked stored hash alone must NOT validate
    val forged = Users.encodeSession(
      Users.Session(1, "admin", Users.md5(Users.md5("123456"))))
    assert(!svc.checkLogin(forged))

    intercept[IllegalArgumentException](svc.login("admin", "wrong"))
    intercept[IllegalArgumentException](svc.login("ghost", "123456"))
    svc.stopOrOpen("admin", open = false)
    intercept[IllegalArgumentException](svc.login("admin", "123456"))
    // stopping also revokes sessions issued BEFORE the stop
    assert(!svc.checkLogin(tok))
    assert(svc.userOf(tok).isEmpty)
    svc.stopOrOpen("admin", open = true)
    assert(svc.login("admin", "123456").nonEmpty)
    assert(svc.checkLogin(tok)) // reopen restores the unexpired session
  }

  test("usernames with quotes/backslashes round-trip through the session") {
    val svc = new UserService(new InMemoryUserStore)
    svc.addUser("""he"llo\wo rld""", "Escapee", "pw")
    val tok = svc.login("""he"llo\wo rld""", "pw")
    assert(svc.checkLogin(tok))
    assert(svc.userOf(tok).exists(_.fullname == "Escapee"))
  }

  test("the stored hash itself is not a usable password (no pass-the-hash)") {
    val svc = new UserService(new InMemoryUserStore)
    svc.addUser("admin", "Administrator", "s3cret")
    val leakedHash = Users.md5("s3cret")
    intercept[IllegalArgumentException](svc.login("admin", leakedHash))
  }

  test("legacy plain-stored password logs in and yields a valid session") {
    val store = new InMemoryUserStore
    // a pre-md5 row, as the reference tolerates (UserServiceImpl.java:46-50)
    store.save(Users.User(1, "legacy", "Old Timer", "plainpw", enabled = true))
    val svc = new UserService(store)
    val tok = svc.login("legacy", "plainpw")
    assert(svc.checkLogin(tok))
    intercept[IllegalArgumentException](svc.login("legacy", "other"))
    // a legacy user can rotate their own password (same tolerance as
    // login); afterwards the row is md5-shaped and plain login stops
    intercept[IllegalArgumentException](
      svc.updatePassword("legacy", "wrong", "newpw"))
    svc.updatePassword("legacy", "plainpw", "newpw")
    assert(svc.checkLogin(svc.login("legacy", "newpw")))
    intercept[IllegalArgumentException](svc.login("legacy", "plainpw"))
  }

  test("password update requires the old one; sessions die with the change") {
    val svc = new UserService(new InMemoryUserStore)
    svc.addUser("u1", "User One", "first")
    val tok = svc.login("u1", "first")
    intercept[IllegalArgumentException](
      svc.updatePassword("u1", "not-first", "second"))
    svc.updatePassword("u1", "first", "second")
    assert(!svc.checkLogin(tok)) // old session token invalidated
    assert(svc.checkLogin(svc.login("u1", "second")))
  }

  test("JDBC store round-trips users through Derby") {
    val svc = new UserService(
      new JdbcUserStore("jdbc:derby:memory:usersdb;create=true"))
    svc.addUser("admin", "Administrator", "pw1")
    svc.addUser("ops", "Operator", "pw2")
    svc.updateFullName("ops", "Operations")
    assert(svc.queryAll().map(u => (u.id, u.username, u.fullname)) ==
      Seq((1, "admin", "Administrator"), (2, "ops", "Operations")))
    assert(svc.checkLogin(svc.login("ops", "pw2")))
    intercept[IllegalStateException](svc.addUser("ops", "dup", "pw3"))
  }

  test("facade guards every verb except login/logout behind the session") {
    val svc = new UserService(new InMemoryUserStore)
    svc.addUser("admin", "Administrator", "s3cret")
    val mgr = new JobManager(spark,
      Files.createTempDirectory("auth_ckpt").toString,
      Files.createTempDirectory("auth_sp").toString)
    val api = new HttpApi(mgr, spark, users = Some(svc))
    val base = s"http://127.0.0.1:${api.port}/api"
    def post(verb: String, cookie: Option[String],
        params: (String, String)*): (Int, String) = {
      val conn = new java.net.URL(s"$base/$verb")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      cookie.foreach(t => conn.setRequestProperty("Cookie",
        s"${Users.SessionCookie}=$t"))
      conn.getOutputStream.write(params.map { case (k, v) =>
        k + "=" + java.net.URLEncoder.encode(v, "UTF-8")
      }.mkString("&").getBytes("UTF-8"))
      val status = conn.getResponseCode
      val setCookie = Option(conn.getHeaderField("Set-Cookie"))
      val in = if (status < 400) conn.getInputStream else conn.getErrorStream
      val body = new String(in.readAllBytes(), "UTF-8")
      conn.disconnect()
      if (verb == "login" || verb == "logout")
        // session cookie must be script-inaccessible and same-site
        setCookie.foreach(c => assert(
          c.contains("HttpOnly") && c.contains("SameSite=Lax"), c))
      (status, body)
    }
    try {
      // unauthenticated: 401 on a guarded verb, login itself open
      assert(post("listTask", None)._1 == 401)
      val (ls, lb) = post("login", None,
        "name" -> "admin", "password" -> "s3cret")
      assert(ls == 200, lb)
      val tok = "\"data\":\"([^\"]*)\"".r.findFirstMatchIn(lb).get.group(1)
      // session cookie unlocks the verbs
      assert(post("listTask", Some(tok))._1 == 200)
      val (uis, uib) = post("getUserInfo", Some(tok))
      assert(uis == 200 && uib.contains("\"username\":\"admin\"") &&
        !uib.contains("password"), uib)
      // user CRUD over HTTP
      assert(post("addUser", Some(tok), "name" -> "ops",
        "fullname" -> "Operator", "password" -> "pw")._1 == 200)
      assert(post("userList", Some(tok))._2.contains("\"username\":\"ops\""))
      // bad credentials are 401 (authentication, not a malformed
      // request); bogus cookie stays locked out
      assert(post("login", None, "name" -> "admin",
        "password" -> "nope")._1 == 401)
      assert(post("listTask", Some("not-a-token"))._1 == 401)
      assert(post("logout", Some(tok))._1 == 200)
    } finally api.close()
  }
}
