package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** The engine's SQL function surface: shingles, minhash_sig, simhash,
  * doc_fingerprint, dot_long as named SQL functions.
  *
  * Two installation paths:
  *  - cluster/session startup: `spark.sql.extensions=graft.GraftExtensions`
  *    (a STATIC conf — must be set before the SparkContext exists);
  *  - live session (tests, notebooks): `GraftFunctions.install(spark)`.
  */
object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[ShinglesExpr].getName, "shingles"),
      (args: Seq[Expression]) =>
        ShinglesExpr(args.head, intArg(args(1), "n"))),
    (new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      (args: Seq[Expression]) =>
        MinHashSigExpr(args.head, intArg(args(1), "k"))),
    (new FunctionIdentifier("simhash"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "simhash"),
      (args: Seq[Expression]) =>
        SimHashExpr(args.head,
          if (args.length > 1) intArg(args(1), "bits") else 60)),
    (new FunctionIdentifier("doc_fingerprint"),
      new ExpressionInfo(classOf[FingerprintExpr].getName, "doc_fingerprint"),
      (args: Seq[Expression]) =>
        FingerprintExpr(args.head,
          if (args.length > 1) intArg(args(1), "n") else 5)),
    (new FunctionIdentifier("dot_long"),
      new ExpressionInfo(classOf[DotLongExpr].getName, "dot_long"),
      (args: Seq[Expression]) => DotLongExpr(args.head, args(1))))

  /** Register on an already-running session. */
  def install(spark: SparkSession): Unit =
    org.apache.spark.sql.graft.Bridge.registerFunctions(spark, all)
}

/** SparkSessionExtensions entry point (see [[GraftFunctions]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
