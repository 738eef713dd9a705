package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Native bounded top-k aggregate: keeps the k smallest (key, id) pairs —
  * ascending (key, id), unique-id tiebreak — in a k-bounded buffer.
  *
  * A TypedImperativeAggregate rather than a Scala `Aggregator` for two
  * load-bearing reasons: (1) no encoder round-trip per row — `update` reads
  * two longs straight off the InternalRow and does an O(log k) insert;
  * (2) no runtime ScalaReflection — `Encoders.product` materializes a
  * TypeTag through the context classloader, which under an sbt-console /
  * REPL loader on JDK 17 dies with "Prohibited package name: java.sql"
  * (the loader tries to define java.sql itself). Catalyst-native code has
  * no such dependency, so TopK-based queries work on every session the
  * driver contract can construct.
  *
  * Plans as ObjectHashAggregate with map-side partial aggregation: each
  * map task folds its partition into ≤ #groups buffers of ≤ k entries, the
  * shuffle carries serialized buffers (16·k bytes each), and the final
  * merge is a k-way bounded merge — `TakeOrderedAndProject` generalized
  * per group. Null keys/ids are skipped (they cannot rank). */
case class TopKSmallestAgg(
    key: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Long)]] {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(key, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("k", LongType, nullable = false)
    .add("id", LongType, nullable = false), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (key.dataType == LongType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"top_k_smallest expects (BIGINT, BIGINT), got (${key.dataType}, ${id.dataType})")
  }

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Long)] =
    mutable.ArrayBuffer.empty

  @inline private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: mutable.ArrayBuffer[(Long, Long)], e: (Long, Long)): Unit = {
    // full buffer and e not beating the current worst → no-op, the common
    // case on any data with locality
    if (buf.length >= k && !lt(e, buf(buf.length - 1))) return
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lt(buf(mid), e)) lo = mid + 1 else hi = mid
    }
    buf.insert(lo, e)
    if (buf.length > k) buf.remove(buf.length - 1)
  }

  override def update(buf: mutable.ArrayBuffer[(Long, Long)],
      input: InternalRow): mutable.ArrayBuffer[(Long, Long)] = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    if (kv != null && iv != null)
      insert(buf, (kv.asInstanceOf[Long], iv.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[(Long, Long)],
      other: mutable.ArrayBuffer[(Long, Long)]): mutable.ArrayBuffer[(Long, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[(Long, Long)]): Any =
    new GenericArrayData(buf.map { case (kk, ii) =>
      InternalRow(kk, ii): Any
    }.toArray)

  override def serialize(buf: mutable.ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 16 * buf.length)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (a, b) => out.writeLong(a); out.writeLong(b) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, Long)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new mutable.ArrayBuffer[(Long, Long)](n)
    var i = 0
    while (i < n) { buf += ((in.readLong(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSmallestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSmallestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKSmallestAgg =
    copy(key = newChildren(0), id = newChildren(1))
  override def prettyName: String = "top_k_smallest"
}
