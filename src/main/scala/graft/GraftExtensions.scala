package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions, so the SQL surface (the reference's
  * native plane) can call them directly:
  *
  *   spark.sql("SELECT minhash_sig(shingles(split(text,' '), 3), 6) ...")
  *
  * Activate with .config("spark.sql.extensions", "graft.GraftExtensions")
  * or spark.sql.extensions=graft.GraftExtensions on any cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[ShinglesExpr].getName, "shingles"),
      (args: Seq[Expression]) =>
        ShinglesExpr(args.head, intArg(args(1), "n"))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      (args: Seq[Expression]) =>
        MinHashSigExpr(args.head, intArg(args(1), "k"))))
    ext.injectFunction((
      new FunctionIdentifier("simhash"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "simhash"),
      (args: Seq[Expression]) =>
        SimHashExpr(args.head,
          if (args.length > 1) intArg(args(1), "bits") else 60)))
    ext.injectFunction((
      new FunctionIdentifier("doc_fingerprint"),
      new ExpressionInfo(classOf[FingerprintExpr].getName, "doc_fingerprint"),
      (args: Seq[Expression]) =>
        FingerprintExpr(args.head,
          if (args.length > 1) intArg(args(1), "n") else 5)))
    ext.injectFunction((
      new FunctionIdentifier("dot_long"),
      new ExpressionInfo(classOf[DotLongExpr].getName, "dot_long"),
      (args: Seq[Expression]) => DotLongExpr(args.head, args(1))))
  }
}
