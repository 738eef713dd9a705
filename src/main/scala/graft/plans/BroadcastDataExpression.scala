package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.DataType

/** A constant whose VALUE travels as a Spark broadcast variable instead of
  * being inlined into the expression tree.
  *
  * Why it exists: the ANN index builders ([[graft.operators.Similarity]])
  * inline their centroid/codebook data as literals, which is ideal while the
  * index is small (constant-folds, prints readably, oracle-replayable). But
  * the documented contract allows up to ~2¹⁶ centroids × 128 dims ≈ 8M
  * doubles — as expression literals that blows up plan toString/serialization
  * and Janino constant pools long before the contract bound. Above a size
  * threshold the builders switch to this node: the serialized expression
  * carries only the broadcast HANDLE; executors pull the data once each via
  * torrent broadcast, and codegen reads it through a reference object (no
  * per-element code, no giant constant pool).
  *
  * `foldable = false` on purpose — constant folding would re-inline the data
  * as a literal, undoing the point.
  *
  * The broadcast value must already be in CATALYST form (e.g.
  * `GenericArrayData` of `InternalRow`s) — [[BroadcastDataExpression.column]]
  * does the conversion from external Scala values. */
case class BroadcastDataExpression(bc: Broadcast[Any], dataType: DataType, label: String)
    extends LeafExpression {

  override def nullable: Boolean = false
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = bc.value

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftBcData", bc, classOf[Broadcast[Any]].getName)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"final $javaType ${ev.value} = ($javaType) $bcRef.value();",
      isNull = FalseLiteral)
  }

  override def toString: String = s"broadcast_data($label)"
  override def sql: String = toString
}

object BroadcastDataExpression {

  /** Broadcast `value` (an EXTERNAL Scala value matching `dataType`, e.g.
    * Seq[Row] for array<struct>; must be java.io.Serializable — the memo
    * key below serializes it, a narrower contract than Spark's broadcast
    * itself, which would also take Kryo-only values) and wrap it as a
    * Column.
    *
    * The broadcast is memoized per (session, label, content hash) through
    * [[graft.operators.SessionShare]] — repeated builder invocations over
    * the same index (every query re-plans its centroidIndex/pqCodebook)
    * reuse ONE pinned broadcast instead of stacking a new multi-MB variable
    * per call (ADVICE r5). Entries live for the session, matching
    * SessionShare's no-evict contract: destroying a superseded broadcast
    * under a live plan would fail the plan. */
  def column(spark: SparkSession, value: Any, dataType: DataType, label: String): Column = {
    // key = sha256 over the Java-serialized value: content-based for ANY
    // value shape (Arrays' identity hashCode would defeat the cache) and
    // collision-safe where a 32-bit hashCode is not — a hashCode collision
    // would silently reuse the WRONG broadcast with no oracle signal. One
    // serialization pass per builder call, far cheaper than re-shipping.
    val key = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      // the cached object is the CATALYST conversion, which depends on
      // dataType — two call sites sharing a label and value bytes but
      // differing in type must not collide (ADVICE r6), so the type is
      // part of the digested content
      md.update(dataType.catalogString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      // stream straight into the digest — no full-size transient byte copy
      // of a potentially multi-hundred-MB index per (re-)planning call
      val oos = new java.io.ObjectOutputStream(
        new java.security.DigestOutputStream(
          java.io.OutputStream.nullOutputStream(), md))
      oos.writeObject(value); oos.close()
      s"$label#${md.digest().map(b => f"$b%02x").mkString}"
    }
    val bc = graft.operators.SessionShare.cached(spark, key, "broadcast_data") {
      val catalystValue = CatalystTypeConverters.createToCatalystConverter(dataType)(value)
      spark.sparkContext.broadcast[Any](catalystValue)
    }
    GraftColumnBridge.column(BroadcastDataExpression(bc, dataType, label))
  }
}
