package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.H3

/** Native Catalyst expressions for the H3 hierarchy (h3lib
  * `cellToParent` / `cellToChildren` / `compactCells`) — the multi-res
  * containment machinery: polyfill a polygon fine, [[H3Compact]] the
  * cover, index facts by point, and join each fact's parent chain
  * against the compacted cover. All three stay inside whole-stage
  * codegen (static JVM calls, no UDF SerDe); the underlying ops are
  * pure 64-bit digit arithmetic ([[graft.functions.H3]] hierarchy
  * section), so the per-row cost is nanoseconds even on a 100 TB scan.
  */

/** `h3_cell_to_parent(cell, parentRes)` — res is a runtime column so a
  * fact row can take parents at each resolution present in a compacted
  * cover (exploded from the cover's distinct-res dimension). */
case class H3Parent(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable || right.nullable
  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"h3_cell_to_parent expects (string cell, int res), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(cell: Any, res: Any): Any =
    UTF8String.fromString(H3.cellToParentHex(
      cell.asInstanceOf[UTF8String].toString, res.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cellC, resC) => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.H3.cellToParentHex($cellC.toString(), $resC));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): H3Parent =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "h3_cell_to_parent"
}

/** `h3_cell_to_children(cell, childRes)` — the full descendant set at
  * `childRes` (pentagon-aware: center paths lose the deleted-K
  * subtree), ascending. `childRes` is a compile-time Int: the fan-out
  * is 7^(childRes−res), so call sites state the bound in the plan. */
case class H3Children(child: Expression, childRes: Int)
    extends UnaryExpression with Serializable {
  require(childRes >= 0 && childRes <= H3.MaxRes,
    s"h3 child res must be in [0, ${H3.MaxRes}], got $childRes")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"h3_cell_to_children expects a string cell id, got " +
        child.dataType.simpleString)
  }

  override def nullSafeEval(cell: Any): Any =
    H3Children.childrenData(cell.asInstanceOf[UTF8String], childRes)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, cellC => {
      s"""
         |${ev.value} = graft.plans.H3Children.childrenData($cellC, $childRes);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): H3Children = copy(child = newChild)

  override def prettyName: String = "h3_cell_to_children"
}

object H3Children {
  def childrenData(cell: UTF8String, childRes: Int): ArrayData =
    new GenericArrayData(
      H3.cellToChildrenHex(cell.toString, childRes)
        .map(UTF8String.fromString(_).asInstanceOf[Any]))
}

/** `h3_compact_array(cells)` — h3lib `compactCells` over an in-row
  * array of uniform-res cells. This is the per-group kernel of the
  * distributed [[graft.ops.H3Compact]]: cells are first co-grouped by
  * a shared ancestor, so every merge decision is local to the array
  * and the result is exact. */
case class H3CompactArray(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"h3_compact_array expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(cells: Any): Any =
    H3CompactArray.compactData(cells.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, cellsC => {
      s"""
         |${ev.value} = graft.plans.H3CompactArray.compactData($cellsC);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): H3CompactArray = copy(child = newChild)

  override def prettyName: String = "h3_compact_array"
}

object H3CompactArray {
  def compactData(cells: ArrayData): ArrayData = {
    val in = new Array[String](cells.numElements())
    var i = 0
    while (i < in.length) {
      // checkInputDataTypes accepts containsNull arrays (SQL literals
      // default to it); fail with the function's name, not an NPE
      if (cells.isNullAt(i))
        throw new IllegalArgumentException(
          "h3_compact_cells: null cell id in input array")
      in(i) = cells.getUTF8String(i).toString
      i += 1
    }
    new GenericArrayData(
      H3.compactCellsHex(in).map(UTF8String.fromString(_).asInstanceOf[Any]))
  }
}

/** `h3_grid_distance(a, b)` — h3lib `gridDistance`: shortest-grid-path
  * length between two same-res cells ([[H3.gridDistance]]: flat chart
  * formula through the derived face-neighbor isometries, exact-BFS
  * fallback for pentagon-involved or non-adjacent-chart pairs). The
  * proximity-filter primitive (`h3_grid_distance(a, b) <= k`) when the
  * disk-explode join shape doesn't fit. */
case class H3GridDistance(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"h3_grid_distance expects (string cell, string cell), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    H3.gridDistanceHex(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (aC, bC) => {
      s"""
         |${ev.value} = graft.functions.H3.gridDistanceHex(
         |  $aC.toString(), $bC.toString());
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): H3GridDistance =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "h3_grid_distance"
}

/** `h3_grid_path(a, b)` — canonical minimal grid path (round 14):
  * gridDistance+1 cells from `a` to `b`, each step taking the SMALLEST
  * id among distance-reducing neighbors ([[H3.gridPathCells]] — h3lib's
  * own gridPathCells disclaims which minimal path it returns, so the
  * engine defines the deterministic one the oracle can restate). */
case class H3GridPath(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable
  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"h3_grid_path expects (string cell, string cell), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    H3GridPath.pathData(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (aC, bC) => {
      s"""
         |${ev.value} = graft.plans.H3GridPath.pathData($aC, $bC);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): H3GridPath =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "h3_grid_path"
}

object H3GridPath {
  def pathData(a: UTF8String, b: UTF8String): ArrayData =
    new GenericArrayData(
      H3.gridPathCellsHex(a.toString, b.toString)
        .map(UTF8String.fromString(_).asInstanceOf[Any]))
}
