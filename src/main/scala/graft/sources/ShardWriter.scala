package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Publish step of a corpus pipeline: write a dataset as hive-partitioned
  * parquet shards, sorted within each file — the layout downstream trainers
  * and engines prune on (`lang=en/source=web/part-*.parquet`).
  *
  * - `partitionBy` drives directory-level pruning (partition columns are
  *   encoded in the path, not the file);
  * - `sortWithinPartitions` gives run-length/dictionary-friendly pages and
  *   deterministic shard content for a given partitioning;
  * - `maxRecordsPerFile` bounds shard size so a skewed partition splits
  *   instead of producing one giant file.
  */
object ShardWriter {

  def publish(df: DataFrame, outDir: String, partitionCols: Seq[String],
              sortCols: Seq[String], maxRecordsPerFile: Long = 1000000L): Unit =
    df.sortWithinPartitions(sortCols.map(col): _*)
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(outDir)
}
