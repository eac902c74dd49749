package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

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
  * At 100 TB scale each table is a parquet directory; writes go through
  * Spark's committer (atomic rename per task), reads get partition/row-group
  * pruning from the vectorized reader. No driver-side data movement.
  */
final class Catalog(val spark: SparkSession, val warehouseDir: String) {
  Files.createDirectories(Paths.get(warehouseDir))

  private def pathOf(name: String): Path = Paths.get(warehouseDir, name)

  def exists(name: String): Boolean = Files.exists(pathOf(name))

  def save(name: String, df: DataFrame, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(pathOf(name).toString)

  def append(name: String, df: DataFrame): Unit = save(name, df, SaveMode.Append)

  def load(name: String): DataFrame = spark.read.parquet(pathOf(name).toString)

  /** Register under a logical name for spark.sql / dbt-style `ref` (S10/S11). */
  def view(name: String): Unit = load(name).createOrReplaceTempView(name)

  def drop(name: String): Unit = {
    val p = pathOf(name)
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally s.close()
    }
  }

  def tables(): Seq[String] = {
    val d = Paths.get(warehouseDir)
    if (!Files.exists(d)) Seq.empty
    else {
      val s = Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString).toSeq.sorted
      } finally s.close()
    }
  }
}
