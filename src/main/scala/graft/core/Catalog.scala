package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Parquet-backed named-table catalog (SURVEY.md §2.1 S6–S9).
  *
  * Replaces the reference's BigQuery dataset as the table namespace:
  *  - S6 query-destination CTAS (`taxi_trips_etl.py:100-109`) → [[save]]
  *    with overwrite
  *  - S5 truncate-then-append load (`taxi_trips_etl.py:32-40,77-80`) →
  *    [[save]](Overwrite) then [[append]]
  *  - S7 existence probe (`taxi_trips_etl.py:88-93`) → [[exists]]
  *  - S8 drop (`taxi_trips_etl.py:112,141`) → [[drop]]
  *  - S9 date-suffixed names (`taxi_trips_etl.py:118-124`) → plain string
  *    interpolation by callers; the catalog is name-agnostic.
  *
  * All path operations go through Hadoop `FileSystem` resolved from the
  * warehouse URI — the same abstraction the reads/writes use — so the
  * catalog behaves identically on local disk, HDFS, or an object store
  * (`s3a://…` warehouse); java.nio would silently see only the driver's
  * local filesystem. At 100 TB each table is a parquet directory; writes
  * go through Spark's committer, reads get partition/row-group pruning
  * from the vectorized reader. No driver-side data movement.
  */
final class Catalog(val spark: SparkSession, val warehouseDir: String) {

  private val root = new Path(warehouseDir)
  private val fs: FileSystem =
    root.getFileSystem(spark.sessionState.newHadoopConf())
  fs.mkdirs(root)

  private def pathOf(name: String): Path = new Path(root, name)

  def exists(name: String): Boolean = fs.exists(pathOf(name))

  def save(name: String, df: DataFrame,
           mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(pathOf(name).toString)

  def append(name: String, df: DataFrame): Unit =
    save(name, df, SaveMode.Append)

  def load(name: String): DataFrame =
    spark.read.parquet(pathOf(name).toString)

  /** Register under a logical name for spark.sql / dbt-style `ref` (S10/S11). */
  def view(name: String): Unit = load(name).createOrReplaceTempView(name)

  def drop(name: String): Unit = {
    val p = pathOf(name)
    if (fs.exists(p)) fs.delete(p, true)
  }

  def tables(): Seq[String] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).map(_.getPath.getName).toSeq.sorted
}
