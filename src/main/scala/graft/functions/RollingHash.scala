package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Polynomial rolling hash over a string's code points:
 * h = fold(cp => (h * 31 + cp) mod (2^31 - 1)), seeded with 7 —
 * the classic document-fingerprint primitive. Chosen so the SAME
 * value is expressible in ANSI-ish SQL (DuckDB:
 * `list_reduce(list_prepend(7, codepoints), (a,c) -> (a*31+c) %
 * 2147483647)`), making the fingerprint oracle-checkable, unlike
 * md5-of-engine-internal-bytes schemes.
 *
 * Codegen'd (no UDF); NULL in → NULL out.
 */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"rolling_hash expects string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  final val Mod = 2147483647L // 2^31 - 1
  final val Base = 31L
  final val Seed = 7L

  def hash(s: String): Long = {
    var h = Seed
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  def rolling_hash(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_rolling_hash", c)

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rolling_hash", { exprs =>
        if (exprs.length != 1) throw new IllegalArgumentException(
          s"graft_rolling_hash expects 1 argument, got ${exprs.length}")
        RollingHash(exprs.head)
      }, "built-in")
}
