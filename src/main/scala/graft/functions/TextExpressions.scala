package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 16-bit SimHash over an array of (32-bit-ranged) token hashes: per bit
  * j, majority vote of the tokens' bit-j values (±1 contributions); the
  * output sets bit j iff the vote is positive, i.e. 2·ones_j > n.
  *
  * Exists for the same reason as [[DotProduct]] (SURVEY.md §7.4 preference
  * order): the HOF spelling — a 16-step fold whose body is another fold
  * over the token array — is interpreted per element with boxing, making
  * SimHash the single slowest query in the bench; this expression is one
  * tight primitive loop (16 popcount-style adds per token) inside
  * whole-stage codegen. Bitwise-identical to the HOF spelling (and the
  * DuckDB oracle, which keeps the naive form) — asserted in Simhash16Spec.
  *
  * Null semantics: null for a null array; token hashes are assumed
  * non-null (they come from md5 of non-null tokens).
  */
case class Simhash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash16 expects array<bigint>, got ${t.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val ones = new Array[Int](16)
    var i = 0
    while (i < n) {
      val h = a.getLong(i)
      var j = 0
      while (j < 16) {
        ones(j) += ((h >> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 16) {
      if (2 * ones(j) > n) out |= 1L << j
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val ones = ctx.freshName("ones")
      val out = ctx.freshName("out")
      s"""
        int $n = $a.numElements();
        int[] $ones = new int[16];
        for (int $i = 0; $i < $n; $i++) {
          long $h = $a.getLong($i);
          for (int $j = 0; $j < 16; $j++) {
            $ones[$j] += (int) (($h >> $j) & 1L);
          }
        }
        long $out = 0L;
        for (int $j = 0; $j < 16; $j++) {
          if (2 * $ones[$j] > $n) $out |= 1L << $j;
        }
        ${ev.value} = $out;
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object TextFunctions {
  /** 16-bit majority-vote SimHash of an array of token hashes. */
  def simhash16(hashes: Column): Column =
    Shim.toColumn(Simhash16(Shim.toExpression(hashes)))
}
