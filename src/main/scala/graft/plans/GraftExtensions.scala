package graft.plans

import graft.functions.{TextExpressions, VectorExpressions}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for graft's custom Catalyst expressions.
  *
  * Two installation paths:
  *  - config: `spark.sql.extensions=graft.plans.GraftExtensions` at
  *    session build (the standard extension mechanism);
  *  - imperative: [[GraftExtensions.install]] on a live session (for
  *    sessions the caller didn't build — notebooks, test harnesses).
  *
  * Registered functions:
  *  - `graft_dot(a, b)` — codegen'd float-array dot product;
  *  - `graft_sub(a, b)` — codegen'd float-array element-wise difference;
  *  - `graft_srp_bucket(vec, numPlanes, dim)` — SRP-LSH bucket code;
  *  - `graft_shingles(tokens, n)` — distinct word n-grams.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other =>
      throw new IllegalArgumentException(s"$fn: argument $pos must be an integer literal, got $other")
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      "graft_dot",
      new ExpressionInfo(VectorExpressions.DotFloat.getClass.getName, "graft_dot"),
      (args: Seq[Expression]) => VectorExpressions.DotFloat(args(0), args(1))
    ),
    (
      "graft_sub",
      new ExpressionInfo(VectorExpressions.SubFloat.getClass.getName, "graft_sub"),
      (args: Seq[Expression]) => VectorExpressions.SubFloat(args(0), args(1))
    ),
    (
      "graft_srp_bucket",
      new ExpressionInfo(VectorExpressions.SrpBucket.getClass.getName, "graft_srp_bucket"),
      (args: Seq[Expression]) =>
        VectorExpressions.SrpBucket(
          args(0),
          intArg(args(1), "graft_srp_bucket", 1),
          intArg(args(2), "graft_srp_bucket", 2))
    ),
    (
      "graft_shingles",
      new ExpressionInfo(TextExpressions.ShingleGrams.getClass.getName, "graft_shingles"),
      (args: Seq[Expression]) => TextExpressions.ShingleGrams(args(0), intArg(args(1), "graft_shingles", 1))
    ),
    (
      "graft_tokenize",
      new ExpressionInfo(TextExpressions.TokenizeWords.getClass.getName, "graft_tokenize"),
      (args: Seq[Expression]) => TextExpressions.TokenizeWords(args(0))
    ),
    // the fused sketch AGGREGATES (the analyzer wraps a bare
    // AggregateFunction from the registry in an AggregateExpression)
    (
      "graft_minhash_sig",
      new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) =>
        graft.functions.MinHashSig(
          args(0),
          graft.operators.Dedup.P,
          (0 until graft.operators.Dedup.numHashes).map(graft.operators.Dedup.hashA),
          (0 until graft.operators.Dedup.numHashes).map(graft.operators.Dedup.hashB))
    ),
    (
      "graft_simhash_sig",
      new ExpressionInfo(classOf[graft.functions.SimHashSig].getName, "graft_simhash_sig"),
      (args: Seq[Expression]) => graft.functions.SimHashSig(args(0), graft.functions.Text.simhashBits)
    ),
    (
      "graft_freq_sketch",
      new ExpressionInfo(classOf[graft.functions.FreqSketch].getName, "graft_freq_sketch"),
      (args: Seq[Expression]) =>
        graft.functions.FreqSketch(args(0), intArg(args(1), "graft_freq_sketch", 1))
    ),
    (
      "graft_kmv_sketch",
      new ExpressionInfo(classOf[graft.functions.KmvSketch].getName, "graft_kmv_sketch"),
      (args: Seq[Expression]) =>
        graft.functions.KmvSketch(args(0), intArg(args(1), "graft_kmv_sketch", 1))
    )
  )

  /** Imperative registration into a live session's function registry. */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, name, builder)
    }

  /** Activate [[RangeJoinRewrite]] on a live session. Deliberately NOT
    * part of [[install]]: install runs inside the v03/v04 query
    * definitions, and an optimizer rule silently switching on mid-run
    * would make every later query's plan depend on execution order. The
    * config-path extensions class injects the rule at session build,
    * where the choice is explicit. */
  def installRangeJoinRewrite(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite
}
