package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Active-user lookups — the reference's auth-layer FILTERS (the one
  * analytically meaningful part of auth; bcrypt/cookies/HTTP stay
  * non-goals, SURVEY §7.5):
  *
  *   - login lookup: `email == :e AND active == true` with the email
  *     stripped before comparison (`web/api/auth.py:39-42` filters on
  *     `form_data.username.strip()`);
  *   - session resolution: `session_token == :t AND active == true`
  *     (`web/dependencies.py:26-29`).
  *
  * Both are scan-speed point filters; on a cluster they plan as a
  * pushed-down predicate over the users table (and would be an index /
  * bucket lookup on a real store). The inactive-user rows exist
  * precisely so the `active` conjunct is observable: a token or email
  * that matches an inactive row must return nothing, not a row.
  */
object UserAuth {

  /** Deterministic users projection derived from a TPC-H-shaped
    * customer table: email keyed by custkey, every 5th user inactive,
    * every 3rd user logged out (NULL session token), tokens derived as
    * md5("tok" + custkey) so any engine can reconstruct a probe token
    * without a fixture dump.
    */
  def usersFrom(customers: DataFrame): DataFrame =
    customers.select(
      col("c_custkey").cast("long").as("user_id"),
      concat(lit("user"), col("c_custkey"), lit("@example.com")).as("email"),
      col("c_name").as("full_name"),
      (pmod(col("c_custkey"), lit(5)) =!= 0).as("active"),
      when(pmod(col("c_custkey"), lit(3)) =!= 0,
        md5(concat(lit("tok"), col("c_custkey")))).as("session_token"))

  /** Session resolution (web/dependencies.py:26-29). A NULL-token row
    * never matches (SQL three-valued equality), mirroring the
    * reference's logged-out users having no token to present.
    */
  def bySessionToken(users: DataFrame, token: String): DataFrame =
    users.filter(col("session_token") === lit(token) && col("active"))

  /** Login lookup (web/api/auth.py:39-42): the supplied email is
    * trimmed exactly as the reference strips `form_data.username`.
    */
  def byEmail(users: DataFrame, email: String): DataFrame =
    users.filter(col("email") === lit(email.trim) && col("active"))
}
