package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of graft's native expressions so they are callable from SQL
  * text, not just the Scala DSL. Two entry points:
  *
  *  - at session build: `.config("spark.sql.extensions",
  *    "graft.plans.GraftExtensions")`
  *  - on a live session: `GraftFunctions.register(spark)`
  *
  * {{{
  *   spark.sql("SELECT fast_match(text, array('coco','image net')) FROM docs")
  * }}}
  *
  * No custom Rule[LogicalPlan]/SparkStrategy is registered — SURVEY §4.3:
  * parity needs none; Catalyst plans every query in this library with
  * built-in strategies. */
object GraftFunctions {

  val fastMatchIdent = new FunctionIdentifier("fast_match")

  val fastMatchInfo = new ExpressionInfo(
    classOf[FastMatchExpression].getName, null, "fast_match",
    "fast_match(text, candidates) - all word-boundary matches of the literal candidate array in text, as array<struct<matched,start,end>>.",
    "")

  val fastMatchBuilder: Seq[Expression] => Expression = {
    case Seq(t, c) => FastMatchExpression(t, c)
    case other => throw new IllegalArgumentException(
      s"fast_match expects 2 arguments, got ${other.length}")
  }

  val vecDotIdent = new FunctionIdentifier("vec_dot")

  val vecDotInfo = new ExpressionInfo(
    classOf[VecDotExpression].getName, null, "vec_dot",
    "vec_dot(a, b) - dot product of two float/double arrays, folded in index order (codegen).",
    "")

  val vecDotBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => VecDotExpression(a, b)
    case other => throw new IllegalArgumentException(
      s"vec_dot expects 2 arguments, got ${other.length}")
  }

  val vecSqDistIdent = new FunctionIdentifier("vec_sqdist")

  val vecSqDistInfo = new ExpressionInfo(
    classOf[VecSqDistExpression].getName, null, "vec_sqdist",
    "vec_sqdist(a, b) - squared L2 distance of two float/double arrays, folded in index order (codegen).",
    "")

  val vecSqDistBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => VecSqDistExpression(a, b)
    case other => throw new IllegalArgumentException(
      s"vec_sqdist expects 2 arguments, got ${other.length}")
  }

  val detHashIdent = new FunctionIdentifier("det_hash60")

  val detHashInfo = new ExpressionInfo(
    classOf[DetHash60Expression].getName, null, "det_hash60",
    "det_hash60(s) - top 60 bits of md5(s) as a non-negative bigint; identical to conv(substring(md5(s),1,15),16,10) (codegen).",
    "")

  val detHashBuilder: Seq[Expression] => Expression = {
    case Seq(s) => DetHash60Expression(s)
    case other => throw new IllegalArgumentException(
      s"det_hash60 expects 1 argument, got ${other.length}")
  }

  val lcsLenIdent = new FunctionIdentifier("lcs_len")

  val lcsLenInfo = new ExpressionInfo(
    classOf[LcsLenExpression].getName, null, "lcs_len",
    "lcs_len(a, b) - longest-common-subsequence length of two string arrays (codegen).",
    "")

  val lcsLenBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => LcsLenExpression(a, b)
    case other => throw new IllegalArgumentException(
      s"lcs_len expects 2 arguments, got ${other.length}")
  }

  val stripAccentsIdent = new FunctionIdentifier("strip_accents")

  val stripAccentsInfo = new ExpressionInfo(
    classOf[StripAccentsExpression].getName, null, "strip_accents",
    "strip_accents(s) - NFD + drop combining marks, same semantics as the DuckDB builtin (codegen).",
    "")

  val stripAccentsBuilder: Seq[Expression] => Expression = {
    case Seq(s) => StripAccentsExpression(s)
    case other => throw new IllegalArgumentException(
      s"strip_accents expects 1 argument, got ${other.length}")
  }

  val editDistIdent = new FunctionIdentifier("tok_edit_dist")

  val editDistInfo = new ExpressionInfo(
    classOf[EditDistExpression].getName, null, "tok_edit_dist",
    "tok_edit_dist(a, b) - token-level Levenshtein distance of two string arrays (codegen).",
    "")

  val editDistBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => EditDistExpression(a, b)
    case other => throw new IllegalArgumentException(
      s"tok_edit_dist expects 2 arguments, got ${other.length}")
  }

  val nfcIdent = new FunctionIdentifier("nfc_normalize")

  val nfcInfo = new ExpressionInfo(
    classOf[NfcNormalizeExpression].getName, null, "nfc_normalize",
    "nfc_normalize(s) - Unicode NFC canonical composition, same semantics as the DuckDB builtin (codegen).",
    "")

  val nfcBuilder: Seq[Expression] => Expression = {
    case Seq(s) => NfcNormalizeExpression(s)
    case other => throw new IllegalArgumentException(
      s"nfc_normalize expects 1 argument, got ${other.length}")
  }

  val phash64Ident = new FunctionIdentifier("phash64")

  val phash64Info = new ExpressionInfo(
    classOf[Phash64Expression].getName, null, "phash64",
    "phash64(text) - byte-stream perceptual hash (64-block pool, e4 DCT-II, " +
      "sign-vs-median 64-bit), one compact loop instead of the 64-wide unrolled tree (codegen). " +
      "Returns NULL for input under 64 code points.",
    "")

  val phash64Builder: Seq[Expression] => Expression = {
    // SQL surface: NULL on short input — ad-hoc callers must not be able to
    // crash a task with a short string (ADVICE r18); internal query paths
    // construct Phash64Expression directly and keep the loud require.
    case Seq(t) => Phash64Expression(t, nullOnShort = true)
    case other => throw new IllegalArgumentException(
      s"phash64 expects 1 argument, got ${other.length}")
  }

  val topKIdent = new FunctionIdentifier("top_k_smallest")

  val topKInfo = new ExpressionInfo(
    classOf[TopKSmallestAgg].getName, null, "top_k_smallest",
    "top_k_smallest(key, id, k) - aggregate keeping the k smallest (key, id) BIGINT pairs " +
      "(ascending, id tiebreak) as array<struct<k,id>>; k-bounded state, map-side partial - " +
      "the grouped-top-k shape that replaces low-cardinality rank windows.",
    "")

  val topKBuilder: Seq[Expression] => Expression = {
    // only non-null INTEGRAL literals for k (ADVICE r11: Number.intValue()
    // would silently truncate top_k_smallest(key, id, 3.9) to k=3, and a
    // null literal NPE'd with an unhelpful message)
    case Seq(key, id, k) if k.foldable =>
      k.eval() match {
        case i: java.lang.Integer => TopKSmallestAgg(key, id, i.intValue())
        case l: java.lang.Long if l.longValue() == l.intValue() =>
          TopKSmallestAgg(key, id, l.intValue())
        case s: java.lang.Short => TopKSmallestAgg(key, id, s.intValue())
        case b: java.lang.Byte => TopKSmallestAgg(key, id, b.intValue())
        case bad => throw new IllegalArgumentException(
          "top_k_smallest k must be a non-null integral literal, got " +
            (if (bad == null) "NULL" else s"$bad: ${k.dataType.simpleString}"))
      }
    case other => throw new IllegalArgumentException(
      s"top_k_smallest expects (key, id, k-literal), got ${other.length} argument(s)" +
        (if (other.length == 3) " with a non-literal k" else ""))
  }

  /** Register on an already-running session (idempotent — re-registration
    * overwrites with an identical builder). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .registerFunction(fastMatchIdent, fastMatchInfo, fastMatchBuilder)
    spark.sessionState.functionRegistry
      .registerFunction(vecDotIdent, vecDotInfo, vecDotBuilder)
    spark.sessionState.functionRegistry
      .registerFunction(vecSqDistIdent, vecSqDistInfo, vecSqDistBuilder)
    spark.sessionState.functionRegistry
      .registerFunction(detHashIdent, detHashInfo, detHashBuilder)
    spark.sessionState.functionRegistry
      .registerFunction(lcsLenIdent, lcsLenInfo, lcsLenBuilder)
    spark.sessionState.functionRegistry
      .registerFunction(nfcIdent, nfcInfo, nfcBuilder)
    spark.sessionState.functionRegistry
      .registerFunction(editDistIdent, editDistInfo, editDistBuilder)
    spark.sessionState.functionRegistry
      .registerFunction(stripAccentsIdent, stripAccentsInfo, stripAccentsBuilder)
    spark.sessionState.functionRegistry
      .registerFunction(topKIdent, topKInfo, topKBuilder)
    spark.sessionState.functionRegistry
      .registerFunction(phash64Ident, phash64Info, phash64Builder)
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((GraftFunctions.fastMatchIdent, GraftFunctions.fastMatchInfo,
      GraftFunctions.fastMatchBuilder))
    ext.injectFunction((GraftFunctions.vecDotIdent, GraftFunctions.vecDotInfo,
      GraftFunctions.vecDotBuilder))
    ext.injectFunction((GraftFunctions.vecSqDistIdent, GraftFunctions.vecSqDistInfo,
      GraftFunctions.vecSqDistBuilder))
    ext.injectFunction((GraftFunctions.detHashIdent, GraftFunctions.detHashInfo,
      GraftFunctions.detHashBuilder))
    ext.injectFunction((GraftFunctions.lcsLenIdent, GraftFunctions.lcsLenInfo,
      GraftFunctions.lcsLenBuilder))
    ext.injectFunction((GraftFunctions.nfcIdent, GraftFunctions.nfcInfo,
      GraftFunctions.nfcBuilder))
    ext.injectFunction((GraftFunctions.editDistIdent, GraftFunctions.editDistInfo,
      GraftFunctions.editDistBuilder))
    ext.injectFunction((GraftFunctions.stripAccentsIdent, GraftFunctions.stripAccentsInfo,
      GraftFunctions.stripAccentsBuilder))
    ext.injectFunction((GraftFunctions.topKIdent, GraftFunctions.topKInfo,
      GraftFunctions.topKBuilder))
    ext.injectFunction((GraftFunctions.phash64Ident, GraftFunctions.phash64Info,
      GraftFunctions.phash64Builder))
  }
}
