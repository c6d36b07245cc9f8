package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct character-n-gram generator — one pass over the
  * string, one hash set, emitted straight as an ArrayData. Replaces
  * the `array_distinct(transform(sequence(1, len-n+1), i ->
  * substring(s, i, n)))` chain (an Integer-sequence allocation + a
  * lambda-evaluated substring per position + a second distinct pass)
  * on dedup's hottest path; same output SET per document, so every
  * md5-derived downstream (minhash, Jaccard, LSH bands) and its
  * DuckDB oracle are unchanged. Code-point semantics match Spark's
  * `substring` (and DuckDB's): UTF8String.substringSQL slices by
  * character, not byte. Stays inside whole-stage codegen via a
  * static-call doGenCode.
  */
case class CharGramsExpr(child: Expression, nExpr: Expression)
    extends BinaryExpression {
  override def left: Expression = child
  override def right: Expression = nExpr
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // loud analysis-time rejection: the SQL facade exposes char_grams,
  // so a wrong-typed argument must not surface as an executor-side
  // codegen/ClassCastException
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType &&
      nExpr.dataType == org.apache.spark.sql.types.IntegerType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_grams expects (STRING, INT), got " +
          s"(${child.dataType.sql}, ${nExpr.dataType.sql})")
    }

  override protected def nullSafeEval(s: Any, n: Any): Any =
    CharGramsExpr.grams(s.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, n) =>
      s"graft.functions.CharGramsExpr.grams($s, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharGramsExpr =
    copy(child = newLeft, nExpr = newRight)
}

object CharGramsExpr {
  def grams(s: UTF8String, n: Int): ArrayData = {
    // loud, not [""]-for-every-row: n<=0 would make substringSQL(_, n)
    // emit the empty gram for every position and silently collapse
    // all documents into one shingle class
    require(n > 0, s"char_grams n must be positive, got $n")
    val chars = s.numChars()
    if (chars < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    val last = chars - n
    while (i <= last) {
      seen.add(s.substringSQL(i + 1, n))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
