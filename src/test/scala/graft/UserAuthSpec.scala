package graft

import graft.operators.UserAuth
import org.apache.spark.sql.functions._

class UserAuthSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def users: DataFrame = {
    import spark.implicits._
    UserAuth.usersFrom(
      (0L to 20L).map(k => (k, s"Customer#$k")).toDF("c_custkey", "c_name"))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("session token resolves only active users") {
    // custkey 7: active with token -> one row
    val ok = UserAuth.bySessionToken(users, md5Hex("tok7")).collect()
    assert(ok.length === 1 && ok.head.getAs[Long]("user_id") === 7L)
    // custkey 10: has a token but is INACTIVE -> the active conjunct
    // must suppress the row even though the key matches
    assert(UserAuth.bySessionToken(users, md5Hex("tok10")).isEmpty)
  }

  test("logged-out users (NULL token) never match any probe") {
    // custkey 9: active but 9%3==0 -> token NULL; probing with the
    // token it WOULD have had must not match via null semantics
    assert(UserAuth.bySessionToken(users, md5Hex("tok9")).isEmpty)
  }

  test("login lookup strips the supplied email and gates on active") {
    val ok = UserAuth.byEmail(users, "  user2@example.com \n").collect()
    assert(ok.length === 1 && ok.head.getAs[String]("full_name") === "Customer#2")
    // custkey 15: right email, inactive -> nothing
    assert(UserAuth.byEmail(users, "user15@example.com").isEmpty)
  }

  test("derived projection is deterministic: token is md5(tok+custkey)") {
    val row = users.filter(col("user_id") === 7L).head()
    assert(row.getAs[String]("session_token") === md5Hex("tok7"))
    assert(row.getAs[String]("email") === "user7@example.com")
    assert(row.getAs[Boolean]("active"))
  }
}
