package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression for word-shingle generation.
  *
  * Why custom: the built-in formulation —
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ',
  * element_at(tk, i+1), ...)))` — is a higher-order function, which
  * Spark always evaluates interpreted; worse, when the optimizer inlines
  * the tokenizer into the lambda (CollapseProject) or replicates the
  * whole tree into an inferred pushed-down filter
  * (InferFiltersFromGenerate), each `element_at` re-evaluates its
  * inlined child, turning shingling O(tokens²) per row. This expression
  * evaluates its child ONCE and runs a compact loop — same cost whether
  * interpreted or codegen'd, immune to expression duplication.
  *
  * Semantics are identical to the built-in form (and to the DuckDB twin
  * [[Text.shinglesSql]]): distinct n-grams joined with single spaces,
  * first-occurrence order, empty array when the doc has fewer than n
  * tokens.
  */
object TextExpressions {

  case class ShingleGrams(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, "shingle size must be >= 1")

    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_shingles expects array<string>, got $t")
      }

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      ShingleGrams.build(toks, n)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val cls = ShingleGrams.getClass.getName.stripSuffix("$") + "$"
        s"""${ev.value} = ($cls.MODULE$$).build($v, $n);"""
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object ShingleGrams {
    private val SPACE = UTF8String.fromString(" ")

    /** Shared by interpreted eval and generated code — one loop, one
      * pass over the token array, first-occurrence dedup. */
    def build(toks: ArrayData, n: Int): ArrayData = {
      val ntok = toks.numElements()
      val m = ntok - n + 1
      if (m <= 0) return new GenericArrayData(Array.empty[Any])
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i < m) {
        val parts = new Array[UTF8String](n)
        var k = 0
        while (k < n) {
          parts(k) = toks.getUTF8String(i + k)
          k += 1
        }
        seen.add(UTF8String.concatWs(SPACE, parts: _*))
        i += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
    }
  }

  /** Whitespace tokenizer as a single codegen'd byte scan. The built-in
    * form — `filter(split(text, " "), t => t != "")` — stacks a regex
    * split under an interpreted higher-order filter, the exact per-row
    * cost every text query pays once per document. This expression
    * splits on the space byte in one pass over the UTF-8 buffer (0x20
    * can never occur inside a multi-byte sequence, so byte-level
    * splitting is unicode-safe) and drops empty runs inline. Semantics
    * identical to the built-in form and the DuckDB twin
    * `list_filter(string_split(text, ' '), x -> x != '')`. */
  case class TokenizeWords(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_tokenize expects string, got $t")
      }

    override def nullSafeEval(input: Any): Any =
      TokenizeWords.build(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val cls = TokenizeWords.getClass.getName.stripSuffix("$") + "$"
        s"""${ev.value} = ($cls.MODULE$$).build($v);"""
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object TokenizeWords {
    /** Shared by interpreted eval and generated code. */
    def build(s: UTF8String): ArrayData = {
      val b = s.getBytes
      val n = b.length
      val out = new java.util.ArrayList[AnyRef]()
      var start = 0
      var i = 0
      while (i <= n) {
        if (i == n || b(i) == 0x20.toByte) {
          if (i > start) out.add(UTF8String.fromBytes(b, start, i - start))
          start = i + 1
        }
        i += 1
      }
      new GenericArrayData(out.toArray)
    }
  }

  /** Column wrapper: distinct word n-grams of a token-array column. */
  def shingleGrams(toks: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      ShingleGrams(org.apache.spark.sql.GraftSqlBridge.expression(toks), n))

  /** Column wrapper: codegen'd whitespace tokenizer. */
  def tokenizeWords(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      TokenizeWords(org.apache.spark.sql.GraftSqlBridge.expression(text)))
}
