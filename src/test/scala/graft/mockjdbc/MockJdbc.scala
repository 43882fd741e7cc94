package graft.mockjdbc

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, Driver, DriverPropertyInfo, ResultSet, SQLException}
import java.util.Properties
import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** An in-JVM JDBC endpoint (`jdbc:graftmock:<db>`) implementing just enough
  * of java.sql — via dynamic proxies — to run Spark's JDBC write path and
  * ClickHouseSink's DriverManager bookkeeping end-to-end with NO server:
  * table create (capturing `createTableOptions`, i.e. the MergeTree/ORDER BY
  * clause), probe queries, prepared-statement INSERT batches (observing the
  * `batchsize` flush), and plain statement execute/executeQuery.
  *
  * Everything lands in a per-db in-memory store ([[MockJdbc.db]]) that specs
  * assert against: DDL strings, batch flush sizes, inserted rows. Unknown
  * JDBC methods return type-appropriate defaults and are recorded in
  * [[MockDb.unknownCalls]] so a behavior change in Spark's JdbcUtils shows
  * up as an observable rather than a silent wrong answer.
  *
  * Scope: test-only. The live-server path (LiveSinkSpec) remains the ground
  * truth when SPARK_GRAFT_CH_URL is set; this double pins the Spark-side
  * mechanics offline.
  */
/** Top-level class: Spark's DriverRegistry re-loads the driver by
  * `getClass.getCanonicalName`, which is only Class.forName-able for a
  * top-level class with a no-arg constructor (a nested Scala object's
  * canonical name is not).
  */
class MockDriver extends Driver {
  override def acceptsURL(url: String): Boolean = url.startsWith(MockJdbc.Prefix)
  override def connect(url: String, info: Properties): Connection =
    if (!acceptsURL(url)) null else MockJdbc.connect(url)
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty
  override def getParentLogger: java.util.logging.Logger =
    java.util.logging.Logger.getGlobal
}

object MockJdbc {
  val Prefix = "jdbc:graftmock:"

  private val dbs = new ConcurrentHashMap[String, MockDb]()

  def db(name: String): MockDb =
    dbs.computeIfAbsent(name, _ => new MockDb(name))

  def reset(name: String): MockDb = { dbs.remove(name); db(name) }

  /** One mock database: tables with schemas and row buffers. */
  final class MockDb(val name: String) {
    val ddl = mutable.ArrayBuffer[String]()
    val statements = mutable.ArrayBuffer[String]()
    val batchFlushes = mutable.ArrayBuffer[(String, Int)]() // table -> rows per executeBatch
    val unknownCalls = mutable.ArrayBuffer[String]()
    // table -> (columns, rows); columns as (name, sqlTypeName)
    val tables = mutable.LinkedHashMap[String, Table]()
    def table(t: String): Option[Table] = synchronized(tables.get(norm(t)))
    def rows(t: String): Seq[Seq[Any]] = table(t).map(_.rows.toSeq).getOrElse(Nil)
    private[mockjdbc] def norm(t: String): String = t.replace("`", "")
  }

  final class Table(val cols: Seq[(String, String)]) {
    val rows = mutable.ArrayBuffer[Seq[Any]]()
  }

  private lazy val registered: Unit =
    java.sql.DriverManager.registerDriver(new MockDriver)

  /** Register the driver with DriverManager (idempotent). */
  def ensureRegistered(): Unit = registered

  private[mockjdbc] def connect(url: String): Connection =
    connectionFor(db(url.stripPrefix(Prefix)))

  // ---- dynamic-proxy plumbing -------------------------------------------

  private def proxy[T](iface: Class[T], h: (Method, Array[AnyRef]) => AnyRef,
                       store: MockDb): T =
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface),
      new InvocationHandler {
        override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = {
          val a = if (args == null) Array.empty[AnyRef] else args
          m.getName match {
            case "hashCode" => Int.box(System.identityHashCode(p))
            case "equals"   => java.lang.Boolean.valueOf(p.asInstanceOf[AnyRef] eq a(0))
            case "toString" => s"MockJdbc(${iface.getSimpleName})"
            case _ =>
              val r = h(m, a)
              if (r != NotHandled) r
              else {
                store.synchronized { store.unknownCalls += s"${iface.getSimpleName}.${m.getName}" }
                defaultFor(m.getReturnType)
              }
          }
        }
      }).asInstanceOf[T]

  private object NotHandled extends AnyRef

  private def defaultFor(t: Class[_]): AnyRef = t match {
    case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
    case java.lang.Integer.TYPE => Int.box(0)
    case java.lang.Long.TYPE    => Long.box(0L)
    case java.lang.Short.TYPE   => Short.box(0)
    case java.lang.Byte.TYPE    => Byte.box(0)
    case java.lang.Double.TYPE  => Double.box(0.0)
    case java.lang.Float.TYPE   => Float.box(0.0f)
    case java.lang.Void.TYPE    => null
    case _                      => null
  }

  private val CreateRe =
    """(?is)\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?[`"]?([\w.\-]+)[`"]?\s*\((.*)\)\s*(.*)""".r
  private val InsertRe =
    """(?is)\s*INSERT\s+INTO\s+[`"]?([\w.\-]+)[`"]?\s*\(([^)]*)\)\s*VALUES\s*\((.*)\)\s*""".r
  private val CountRe =
    """(?is)\s*SELECT\s+COUNT\(\*\)\s+FROM\s+[`"]?([\w.\-]+)[`"]?\s*(?:WHERE\s+[`"]?(\w+)[`"]?\s*=\s*(\S+))?\s*""".r
  private val ProbeRe =
    """(?is)\s*SELECT\s+.*\s+FROM\s+[`"]?([\w.\-]+)[`"]?\s+WHERE\s+1\s*=\s*0\s*""".r

  private def parseCols(colSpec: String): Seq[(String, String)] =
    colSpec.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { c =>
      val parts = c.replace("`", "").replace("\"", "").split("\\s+")
      (parts(0), parts.drop(1).mkString(" "))
    }

  private def runDdlOrDml(store: MockDb, sql: String): Int = store.synchronized {
    store.statements += sql
    sql match {
      case CreateRe(t, cols, _*) =>
        store.ddl += sql.trim
        if (!store.tables.contains(store.norm(t)))
          store.tables(store.norm(t)) = new Table(parseCols(cols))
        0
      case InsertRe(t, cols, values) =>
        val tab = store.tables.getOrElseUpdate(store.norm(t),
          new Table(parseCols(cols)))
        tab.rows += values.split(",").toSeq.map(_.trim)
        1
      case _ => 0
    }
  }

  /** Single-value or probe result sets. */
  private def resultSetFor(store: MockDb, sql: String): ResultSet =
    sql match {
      case CountRe(t, col, v) =>
        val n = store.synchronized {
          store.statements += sql
          store.tables.get(store.norm(t)) match {
            case None => throw new SQLException(s"no table ${store.norm(t)}", "42S02")
            case Some(tab) if col == null => tab.rows.size.toLong
            case Some(tab) =>
              val idx = tab.cols.indexWhere(_._1.equalsIgnoreCase(col))
              tab.rows.count(r => r.lift(idx).exists(_.toString == v)).toLong
          }
        }
        scalarResultSet(store, n)
      case ProbeRe(t) =>
        val tab = store.synchronized {
          store.statements += sql
          store.tables.getOrElse(store.norm(t),
            throw new SQLException(s"no table ${store.norm(t)}", "42S02"))
        }
        emptyProbeResultSet(store, tab)
      case _ =>
        store.synchronized { store.statements += sql }
        scalarResultSet(store, 0L)
    }

  private def scalarResultSet(store: MockDb, value: Long): ResultSet = {
    var cursor = -1
    proxy(classOf[ResultSet], (m, _) => m.getName match {
      case "next"    => cursor += 1; java.lang.Boolean.valueOf(cursor == 0)
      case "getLong" | "getInt" =>
        if (m.getReturnType == java.lang.Integer.TYPE) Int.box(value.toInt)
        else Long.box(value)
      case "close" | "wasNull" => if (m.getName == "close") null else java.lang.Boolean.FALSE
      case _ => NotHandled
    }, store)
  }

  private def sqlTypeOf(typeName: String): Int = typeName.toUpperCase match {
    case t if t.startsWith("INT64") || t.startsWith("BIGINT")  => java.sql.Types.BIGINT
    case t if t.startsWith("INT")                              => java.sql.Types.INTEGER
    case t if t.startsWith("FLOAT64") || t.startsWith("DOUBLE") => java.sql.Types.DOUBLE
    case t if t.startsWith("DATETIME") || t.startsWith("TIMESTAMP") => java.sql.Types.TIMESTAMP
    case _                                                     => java.sql.Types.VARCHAR
  }

  private def probeMetaData(store: MockDb, tab: Table): java.sql.ResultSetMetaData =
    proxy(classOf[java.sql.ResultSetMetaData], (m, a) => m.getName match {
      case "getColumnCount" => Int.box(tab.cols.size)
      case "getColumnName" | "getColumnLabel" =>
        tab.cols(a(0).asInstanceOf[Integer] - 1)._1
      case "getColumnType" =>
        Int.box(sqlTypeOf(tab.cols(a(0).asInstanceOf[Integer] - 1)._2))
      case "getColumnTypeName" => tab.cols(a(0).asInstanceOf[Integer] - 1)._2
      case "isSigned"    => java.lang.Boolean.TRUE
      case "isNullable"  => Int.box(java.sql.ResultSetMetaData.columnNullable)
      case "getPrecision" => Int.box(0)
      case "getScale"     => Int.box(0)
      case _ => NotHandled
    }, store)

  private def emptyProbeResultSet(store: MockDb, tab: Table): ResultSet =
    proxy(classOf[ResultSet], (m, _) => m.getName match {
      case "next"        => java.lang.Boolean.FALSE
      case "getMetaData" => probeMetaData(store, tab)
      case "close"       => null
      case _             => NotHandled
    }, store)

  private def preparedInsert(store: MockDb, sql: String): java.sql.PreparedStatement = {
    val (tableName, colNames) = sql match {
      case InsertRe(t, cols, _) =>
        (store.norm(t), cols.replace("`", "").replace("\"", "")
          .split(",").toSeq.map(_.trim))
      case _ => throw new SQLException(s"mock prepares only INSERT, got: $sql")
    }
    val current = mutable.ArrayBuffer[AnyRef]()
    val pending = mutable.ArrayBuffer[Seq[Any]]()
    def ensureSize(i: Int): Unit =
      while (current.size < i) current += null
    proxy(classOf[java.sql.PreparedStatement], (m, a) => m.getName match {
      case n if n.startsWith("set") && a.length >= 2 &&
          a(0).isInstanceOf[Integer] =>
        val i = a(0).asInstanceOf[Integer].intValue()
        ensureSize(i)
        current(i - 1) = if (a.length > 1) a(1) else null
        null
      case "addBatch" =>
        pending += current.toSeq
        null
      case "executeBatch" =>
        val n = pending.size
        store.synchronized {
          val tab = store.tables.getOrElseUpdate(tableName,
            new Table(colNames.map((_, "String"))))
          pending.foreach(tab.rows += _)
          store.batchFlushes += ((tableName, n))
        }
        pending.clear()
        Array.fill(n)(1)
      case "executeUpdate" =>
        store.synchronized {
          val tab = store.tables.getOrElseUpdate(tableName,
            new Table(colNames.map((_, "String"))))
          tab.rows += current.toSeq
        }
        Int.box(1)
      case "clearParameters" => current.clear(); null
      case "close" | "clearBatch" => null
      case _ => NotHandled
    }, store)
  }

  private def statementFor(store: MockDb): java.sql.Statement =
    proxy(classOf[java.sql.Statement], (m, a) => m.getName match {
      case "execute" =>
        runDdlOrDml(store, a(0).asInstanceOf[String]); java.lang.Boolean.FALSE
      case "executeUpdate" =>
        Int.box(runDdlOrDml(store, a(0).asInstanceOf[String]))
      case "executeQuery" =>
        resultSetFor(store, a(0).asInstanceOf[String])
      case "close" | "setQueryTimeout" => null
      case _ => NotHandled
    }, store)

  private def connectionFor(store: MockDb): Connection =
    proxy(classOf[Connection], (m, a) => m.getName match {
      case "createStatement" => statementFor(store)
      case "prepareStatement" =>
        val sql = a(0).asInstanceOf[String]
        if (ProbeRe.findFirstIn(sql).isDefined || CountRe.findFirstIn(sql).isDefined)
          proxy(classOf[java.sql.PreparedStatement], (pm, _) => pm.getName match {
            case "executeQuery" => resultSetFor(store, sql)
            case "close"        => null
            case _              => NotHandled
          }, store)
        else preparedInsert(store, sql)
      case "setAutoCommit" | "commit" | "rollback" | "close"
           | "setTransactionIsolation" => null
      case "getAutoCommit" => java.lang.Boolean.TRUE
      case "isClosed"      => java.lang.Boolean.FALSE
      case "isValid"       => java.lang.Boolean.TRUE
      case "getMetaData" =>
        proxy(classOf[java.sql.DatabaseMetaData], (dm, _) => dm.getName match {
          case "getURL" => Prefix + store.name
          case "getDatabaseProductName" => "GraftMock"
          case "supportsTransactions" => java.lang.Boolean.FALSE
          case _ => NotHandled
        }, store)
      case _ => NotHandled
    }, store)
}
