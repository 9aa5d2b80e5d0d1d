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

  /** Word n-grams IN POSITION ORDER with duplicates kept — the seed
    * stream for exact-substring span detection ([[graft.operators.Dedup
    * .duplicatedSpans]]), where position i of the output is the gram
    * starting at token i. Same one-pass loop as [[ShingleGrams]] minus
    * the dedup; empty when the doc has fewer than n tokens (parity with
    * DuckDB `generate_series(1, len-n+1)`). */
  case class PositionalGrams(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, "n-gram size must be >= 1")

    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_positional_grams expects array<string>, got $t")
      }

    override def nullSafeEval(input: Any): Any =
      PositionalGrams.build(input.asInstanceOf[ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val cls = PositionalGrams.getClass.getName.stripSuffix("$") + "$"
        s"""${ev.value} = ($cls.MODULE$$).build($v, $n);"""
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object PositionalGrams {
    private val SPACE = UTF8String.fromString(" ")

    /** Shared by interpreted eval and generated code. */
    def build(toks: ArrayData, n: Int): ArrayData = {
      val ntok = toks.numElements()
      val m = ntok - n + 1
      if (m <= 0) return new GenericArrayData(Array.empty[Any])
      val out = new Array[AnyRef](m)
      var i = 0
      while (i < m) {
        val parts = new Array[UTF8String](n)
        var k = 0
        while (k < n) {
          parts(k) = toks.getUTF8String(i + k)
          k += 1
        }
        out(i) = UTF8String.concatWs(SPACE, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Most-frequent word n-gram of a token array, WITH multiplicity —
    * the Gopher repetition signal t09/t11 don't cover: the character
    * mass of the single most repeated n-gram. Returns
    * `struct(gram string, cnt long, m long)` where `m` is the total
    * n-gram count (`max(ntok - n + 1, 0)`); ties break to the
    * lexicographically smallest gram (byte order — the same order
    * DuckDB's default binary collation sorts by, so the oracle's
    * `ORDER BY c DESC, gram ASC ... row_number() = 1` picks the same
    * winner). Docs with fewer than n tokens report ('', 0, 0).
    *
    * Why an expression and not explode→groupBy: per-row counting keeps
    * the whole signal inside one WholeStageCodegen scan pass — at
    * 100 TB the explode form shuffles one (doc_id, gram) pair per
    * TOKEN of corpus, while this shuffles nothing at all.
    */
  case class TopGram(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, "n-gram size must be >= 1")

    override def dataType: DataType = TopGram.schema

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_top_gram expects array<string>, got $t")
      }

    override def nullSafeEval(input: Any): Any =
      TopGram.build(input.asInstanceOf[ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val cls = TopGram.getClass.getName.stripSuffix("$") + "$"
        s"""${ev.value} = ($cls.MODULE$$).build($v, $n);"""
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object TopGram {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}

    val schema: StructType = StructType(Seq(
      StructField("gram", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("m", LongType, nullable = false)))

    private val SPACE = UTF8String.fromString(" ")
    private val EMPTY = UTF8String.fromString("")

    /** Shared by interpreted eval and generated code: one counting pass,
      * then one deterministic (cnt desc, gram asc) selection pass.
      * The declared return type MUST be InternalRow, not Any: the
      * generated projection assigns the call result to an
      * `InternalRow`-typed slot, and janino rejects an Object source —
      * which silently demoted every projection containing this
      * expression to interpreted mode. */
    def build(toks: ArrayData, n: Int): org.apache.spark.sql.catalyst.InternalRow = {
      val ntok = toks.numElements()
      val m = ntok - n + 1
      if (m <= 0)
        return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](EMPTY, 0L, 0L))
      val counts = new java.util.HashMap[UTF8String, Int]()
      var i = 0
      while (i < m) {
        val parts = new Array[UTF8String](n)
        var k = 0
        while (k < n) {
          parts(k) = toks.getUTF8String(i + k)
          k += 1
        }
        counts.merge(UTF8String.concatWs(SPACE, parts: _*), 1, Integer.sum _)
        i += 1
      }
      var bestGram: UTF8String = null
      var bestCnt = 0
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue
        if (c > bestCnt || (c == bestCnt && e.getKey.compareTo(bestGram) < 0)) {
          bestCnt = c
          bestGram = e.getKey
        }
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](bestGram, bestCnt.toLong, m.toLong))
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

  /** Column wrapper: position-ordered n-grams with duplicates kept. */
  def positionalGrams(toks: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      PositionalGrams(org.apache.spark.sql.GraftSqlBridge.expression(toks), n))

  /** Column wrapper: most-frequent n-gram struct(gram, cnt, m). */
  def topGram(toks: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      TopGram(org.apache.spark.sql.GraftSqlBridge.expression(toks), n))
}
