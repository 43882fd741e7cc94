package graft.sources

import org.apache.spark.sql.SparkSession

/** S9/S10 — catalog maintenance: truncate and prefix-filtered cleanup
  * (reference: src/utils/clickhouse.py:58-60, 75-114 — SHOW TABLES, filter
  * `load_` prefix, DROP each; reference: src/utils/kafka.py:89-144 does the
  * same for topics).
  *
  * Against the Spark catalog these are metadata ops; against an external
  * sink the same prefix-filter + drop runs over JDBC metadata. Driver-side
  * by design — catalog listings are tiny.
  */
object CatalogOps {

  /** Tables in `db` whose names start with `prefix` (reference predicate:
    * table.startswith('load_'), src/utils/clickhouse.py:85).
    */
  def listByPrefix(spark: SparkSession, prefix: String,
                   db: String = "default"): Seq[String] =
    spark.catalog.listTables(db).collect()
      .map(_.name).filter(_.startsWith(prefix)).toSeq

  /** Drop every `prefix*` table; returns the dropped names. */
  def cleanup(spark: SparkSession, prefix: String,
              db: String = "default"): Seq[String] = {
    val doomed = listByPrefix(spark, prefix, db)
    doomed.foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$db`.`$t`"))
    doomed
  }

  /** TRUNCATE analog for path-backed sinks: clear and recreate the location
    * (catalog TRUNCATE TABLE only covers managed tables).
    */
  def truncatePath(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    fs.mkdirs(p)
  }
}
