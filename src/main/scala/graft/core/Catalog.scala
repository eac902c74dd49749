package graft.core

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

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

  // ---- pinned schemas (schema evolution at catalog speed) ----------------
  // `mergeSchema` footer reconciliation is an INGEST-time discovery tool:
  // at 100 TB a million-file footer sweep is itself a job, so the superset
  // schema is pinned here once (by the writer that evolved it, or by one
  // discovery pass) and every query reads through [[loadPinned]] —
  // `spark.read.schema(...)`, zero schema-inference I/O, missing columns
  // null-filled per file by the vectorized reader.

  private def schemaPath(name: String): Path =
    new Path(root, s"_schemas/$name.json")

  /** Record `schema` as the table's authoritative read schema.
    * Write-to-temp + rename: an in-place overwrite would let a
    * concurrent [[pinnedSchema]] read a truncated JSON (rename is atomic
    * on the filesystems the catalog targets). */
  def pinSchema(name: String, schema: StructType): Unit = {
    val dst = schemaPath(name)
    val tmp = new Path(dst.getParent, s".${dst.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(schema.json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new IllegalStateException(s"failed to publish schema pin $dst")
  }

  def pinnedSchema(name: String): Option[StructType] =
    if (!fs.exists(schemaPath(name))) None
    else {
      val in = fs.open(schemaPath(name))
      val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      Some(DataType.fromJson(json).asInstanceOf[StructType])
    }

  /** Read through the pinned schema — no footer-based inference runs at
    * all (partition columns are still appended from directory names). */
  def loadPinned(name: String): DataFrame = {
    val sch = pinnedSchema(name).getOrElse(throw new IllegalStateException(
      s"no pinned schema for table '$name' — pinSchema first"))
    spark.read.schema(sch).parquet(pathOf(name).toString)
  }

  /** Register under a logical name for spark.sql / dbt-style `ref` (S10/S11). */
  def view(name: String): Unit = load(name).createOrReplaceTempView(name)

  /** Directory-rename table commit (staged single-action writes publish
    * through this; rename is atomic on the filesystems the catalog
    * targets). Fails loudly — a half-published table must not look like
    * a clean short-circuit. */
  def rename(from: String, to: String): Unit =
    if (!fs.rename(pathOf(from), pathOf(to)))
      throw new IllegalStateException(
        s"catalog rename $from -> $to failed under $warehouseDir")

  def drop(name: String): Unit = {
    val p = pathOf(name)
    if (fs.exists(p)) fs.delete(p, true)
  }

  def tables(): Seq[String] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).map(_.getPath.getName).toSeq
      .filterNot(_.startsWith("_")) // metadata dirs (Spark convention)
      .sorted
}
