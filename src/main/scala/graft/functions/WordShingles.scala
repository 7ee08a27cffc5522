package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word w-shingles of a token array as a native codegen expression: one
  * fused loop emitting `concat_ws(" ", t[i..i+w-1])` for every window.
  *
  * This is the hot inner step of every n-gram pipeline (Jaccard /
  * MinHash / SimHash candidate generation, decontamination, leakage
  * audit): the composable `transform(sequence(...), i -> concat_ws(...))`
  * formulation it replaces is a higher-order function, which Spark
  * evaluates interpreted — per-element lambda dispatch plus a per-window
  * `element_at` re-walk. The fused loop does one pass, no dispatch.
  *
  * Callers guarantee `size(t) >= w` (the [[graft.queries.Shingles]]
  * wrapper guards short/null inputs with `when(...)`); element order and
  * values are identical to the HOF formulation bit for bit, and null
  * elements are skipped inside a window exactly like `concat_ws`.
  */
case class WordShingles(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"shingle width must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects ARRAY<STRING>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_shingles"

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val m = math.max(n - w + 1, 0)
    val out = new Array[AnyRef](m)
    val win = new Array[UTF8String](w)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < w) { win(j) = a.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, win: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sep, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val win = ctx.freshName("win")
      val u = classOf[UTF8String].getName
      s"""
         |int $n = $a.numElements();
         |int $m = java.lang.Math.max($n - $w + 1, 0);
         |Object[] $out = new Object[$m];
         |$u[] $win = new $u[$w];
         |for (int $i = 0; $i < $m; $i++) {
         |  for (int $j = 0; $j < $w; $j++) {
         |    $win[$j] = $a.getUTF8String($i + $j);
         |  }
         |  $out[$i] = $u.concatWs($sepRef, $win);
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
