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
      (args: Seq[Expression]) => DotLongExpr(args.head, args(1))),
    (FunctionIdentifier("quantize_embedding"),
      new ExpressionInfo(classOf[QuantizeExpr].getName, "quantize_embedding"),
      (args: Seq[Expression]) => QuantizeExpr(args.head)),
    (FunctionIdentifier("json_get"),
      new ExpressionInfo(classOf[JsonGetExpr].getName, "json_get"),
      (args: Seq[Expression]) => JsonGetExpr(args.head, args(1) match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
        case other => throw new IllegalArgumentException(
          s"json_get key must be a string literal, got $other")
      })),
    (FunctionIdentifier("json_top_keys"),
      new ExpressionInfo(classOf[JsonTopKeysExpr].getName, "json_top_keys"),
      (args: Seq[Expression]) => JsonTopKeysExpr(args.head)),
    (FunctionIdentifier("json_to_str_map"),
      new ExpressionInfo(classOf[JsonToStrMapExpr].getName, "json_to_str_map"),
      (args: Seq[Expression]) => JsonToStrMapExpr(args.head)),
    (FunctionIdentifier("str_map_to_json"),
      new ExpressionInfo(classOf[StrMapToJsonExpr].getName, "str_map_to_json"),
      (args: Seq[Expression]) => StrMapToJsonExpr(args.head)),
    (FunctionIdentifier("json_kv_records"),
      new ExpressionInfo(classOf[JsonToKVRecordsExpr].getName, "json_kv_records"),
      (args: Seq[Expression]) => JsonToKVRecordsExpr(args.head)),
    (FunctionIdentifier("subword_est"),
      new ExpressionInfo(classOf[SubwordEstExpr].getName, "subword_est"),
      (args: Seq[Expression]) => SubwordEstExpr(args.head)),
    (FunctionIdentifier("bpe_count"),
      new ExpressionInfo(classOf[BpeCountExpr].getName, "bpe_count"),
      (args: Seq[Expression]) => BpeCountExpr(args.head)),
    (FunctionIdentifier("quality_score"),
      new ExpressionInfo(classOf[QualityScoreExpr].getName, "quality_score"),
      (args: Seq[Expression]) => QualityScoreExpr(args.head)),
    (FunctionIdentifier("predict_lang"),
      new ExpressionInfo(classOf[PredictLangExpr].getName, "predict_lang"),
      (args: Seq[Expression]) =>
        if (args.size < 2) PredictLangExpr(args.head)
        else PredictLangExpr(args.head, args(1) match {
          case Literal(d: Double, _) => d
          case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
          case other => throw new IllegalArgumentException(
            s"predict_lang floor must be a numeric literal, got $other")
        })),
    // aggregates: the registry builder returns the bare AggregateFunction
    // and the analyzer wraps it in AggregateExpression(Complete) — same
    // mechanism Spark's own built-in aggregates use.
    (FunctionIdentifier("topk_pairs"),
      new ExpressionInfo(classOf[TopKAggExpr].getName, "topk_pairs"),
      (args: Seq[Expression]) =>
        TopKAggExpr(args.head, args(1), intArg(args(2), "k"))),
    (FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[CmsAggExpr].getName, "cms_sketch"),
      (args: Seq[Expression]) => CmsAggExpr(args.head,
        if (args.length > 1) intArg(args(1), "depth") else 4,
        if (args.length > 2) intArg(args(2), "width") else 1024)),
    (FunctionIdentifier("gram_agg"),
      new ExpressionInfo(classOf[GramAggExpr].getName, "gram_agg"),
      (args: Seq[Expression]) =>
        GramAggExpr(args.head, intArg(args(1), "dim"))),
    (FunctionIdentifier("bloom_build"),
      new ExpressionInfo(classOf[BloomAggExpr].getName, "bloom_build"),
      (args: Seq[Expression]) => BloomAggExpr(args.head,
        if (args.length > 1) intArg(args(1), "numBits") else 1 << 20,
        if (args.length > 2) intArg(args(2), "numHashes") else 6)),
    (FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[BloomContainsExpr].getName, "bloom_contains"),
      (args: Seq[Expression]) => BloomContainsExpr(args.head, args(1))))

  /** Register on an already-running session. */
  def install(spark: SparkSession): Unit =
    org.apache.spark.sql.graft.Bridge.registerFunctions(spark, all)
}

/** SparkSessionExtensions entry point (see [[GraftFunctions]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
