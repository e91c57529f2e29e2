package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, DatabaseMetaData, Driver, DriverManager, DriverPropertyInfo, ResultSet}
import java.util.Properties
import java.util.logging.Logger

/** Test-only JDBC driver `jdbc:graftlower:` that delegates to embedded
  * Derby but makes its metadata behave like Postgres's identifier
  * folding: `storesLowerCaseIdentifiers` = true, `storesUpperCase` =
  * false, and `getTables` accepts LOWERCASE name patterns (translated to
  * Derby's stored-uppercase form underneath). Derby itself cannot be
  * told to fold lowercase, and no Postgres server exists in this
  * offline sandbox — this proxy is what lets the spec drive
  * JdbcProductStore's lowercase-folding branch (the Postgres code path
  * of `tableExists`) against a REAL database engine instead of leaving
  * the claimed portability untested.
  */
object LowerFoldingDriver {
  val Prefix = "jdbc:graftlower:"

  @volatile private var registered = false
  def ensureRegistered(): Unit = if (!registered) synchronized {
    if (!registered) {
      DriverManager.registerDriver(new LowerFoldingDriver)
      registered = true
    }
  }

  private def wrapMetaData(md: DatabaseMetaData): DatabaseMetaData =
    Proxy.newProxyInstance(md.getClass.getClassLoader,
      Array(classOf[DatabaseMetaData]),
      new InvocationHandler {
        override def invoke(proxy: Any, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "storesLowerCaseIdentifiers" => java.lang.Boolean.TRUE
            case "storesUpperCaseIdentifiers" => java.lang.Boolean.FALSE
            case "storesMixedCaseIdentifiers" => java.lang.Boolean.FALSE
            case "getTables" =>
              // lowercase table-name pattern -> Derby's stored uppercase,
              // and fold the RETURNED names back to lowercase — Postgres
              // both matches and REPORTS lowercase, and callers verify
              // the hit via an exact TABLE_NAME comparison
              val a = args.clone()
              a(2) = a(2) match {
                case s: String => s.toUpperCase
                case other => other
              }
              wrapTablesResult(m.invoke(md, a: _*).asInstanceOf[ResultSet])
            case _ =>
              try m.invoke(md, args: _*)
              catch { case e: java.lang.reflect.InvocationTargetException => throw e.getCause }
          }
      }).asInstanceOf[DatabaseMetaData]

  private def wrapTablesResult(rs: ResultSet): ResultSet =
    Proxy.newProxyInstance(rs.getClass.getClassLoader,
      Array(classOf[ResultSet]),
      new InvocationHandler {
        override def invoke(proxy: Any, m: Method, args: Array[AnyRef]): AnyRef = {
          val out =
            try m.invoke(rs, args: _*)
            catch { case e: java.lang.reflect.InvocationTargetException => throw e.getCause }
          val isTableName = m.getName == "getString" && args != null &&
            args.length == 1 &&
            (args(0) == "TABLE_NAME" || args(0) == Integer.valueOf(3))
          out match {
            case s: String if isTableName => s.toLowerCase
            case other => other
          }
        }
      }).asInstanceOf[ResultSet]

  private def wrapConnection(c: Connection): Connection =
    Proxy.newProxyInstance(c.getClass.getClassLoader,
      Array(classOf[Connection]),
      new InvocationHandler {
        override def invoke(proxy: Any, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "getMetaData" => wrapMetaData(c.getMetaData)
            case _ =>
              try m.invoke(c, args: _*)
              catch { case e: java.lang.reflect.InvocationTargetException => throw e.getCause }
          }
      }).asInstanceOf[Connection]
}

class LowerFoldingDriver extends Driver {
  import LowerFoldingDriver._
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(Prefix)
  override def connect(url: String, info: Properties): Connection =
    if (!acceptsURL(url)) null
    else wrapConnection(DriverManager.getConnection(
      "jdbc:derby:" + url.substring(Prefix.length), info))
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty
  override def getParentLogger: Logger =
    Logger.getLogger("graft.LowerFoldingDriver")
}
