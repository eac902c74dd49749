package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.H3

/** Native Catalyst expression for H3 grid disks: cell hex-string →
  * sorted array of the hex-string ids of every cell within grid
  * distance `k` (including the cell itself) — the ring-expansion
  * primitive of an H3 spatial join (index points to cells, explode the
  * k-disk of one side, equi-join on the cell id; the join cost is
  * collision volume, never n²).
  *
  * `k` is a compile-time Int, so the generated code carries it as a
  * constant and the call participates in whole-stage codegen: one
  * static JVM call per row, no UDF SerDe. The traversal itself is
  * [[H3.gridDisk]] — EXACT since the round-12 overage-normalization
  * repair (canonical integer stepping across derived face-neighbor
  * isometries): every disk is complete and false-positive-free.
  */
case class H3Disk(child: Expression, k: Int)
    extends UnaryExpression with Serializable {
  require(k >= 0 && k <= 10, s"h3 disk k must be in [0, 10], got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"h3_grid_disk expects a string cell id, got " +
          child.dataType.simpleString)
  }

  override def nullSafeEval(cell: Any): Any =
    H3Disk.diskData(cell.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, cellC => {
      s"""
         |${ev.value} = graft.plans.H3Disk.diskData($cellC, $k);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): H3Disk =
    copy(child = newChild)

  override def prettyName: String = "h3_grid_disk"
}

object H3Disk {
  /** Static bridge for generated code: hex cell → ArrayData of hex
    * cells in the k-disk, sorted. */
  def diskData(cell: UTF8String, k: Int): ArrayData = {
    val ids = H3.gridDiskHex(cell.toString, k)
    new GenericArrayData(
      ids.map(UTF8String.fromString(_).asInstanceOf[Any]))
  }
}
