package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The child's Spark type name (`catalogString`) as a string column — a
  * working stand-in for `functions.typeof`, whose Spark 4.1.2 codegen
  * interpolates the type name into the generated Java WITHOUT quotes
  * (`UTF8String.fromString(bigint)`), so every generated predicate
  * containing it fails Janino compilation and the whole predicate drops to
  * interpreted mode (observable as `WARN Predicate: Expr codegen error and
  * falling back to interpreter mode` — found via the Mango `$type` tests).
  *
  * The type name is a plan-time constant, so this never evaluates the
  * child: eval returns the cached literal and codegen emits a referenced
  * constant (no string escaping to get wrong). `foldable` lets the
  * optimizer collapse it into a plain `Literal` besides.
  */
case class SparkTypeOf(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = true

  @transient private lazy val typeName: UTF8String =
    UTF8String.fromString(child.dataType.catalogString)

  override def eval(input: InternalRow): Any = typeName

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftTypeName", typeName,
      classOf[UTF8String].getName)
    ev.copy(code = code"", isNull = org.apache.spark.sql.catalyst.expressions
      .codegen.FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
        .global(ref, StringType))
  }

  override def prettyName: String = "graft_typeof"

  override protected def withNewChildInternal(newChild: Expression): SparkTypeOf =
    copy(child = newChild)
}

object SparkTypeOf {
  def apply(c: Column): Column =
    GraftSqlBridge.column(SparkTypeOf(GraftSqlBridge.expression(c)))
}
