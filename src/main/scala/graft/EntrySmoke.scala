package graft


/** Local smoke for the driver's entry contract: prints the flagship row
  * count and schema (driver checks rows > 0 on sf0.001).
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-entry")
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println(s"ENTRY_SCHEMA=${df.columns.mkString(",")}")
    println(s"ENTRY_ROWS=${df.count()}")
    spark.stop()
  }
}
