package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/**
 * Bounded top-k aggregate over (sortValue, payload) pairs — the
 * scale-path alternative to `row_number() OVER (PARTITION BY g ORDER
 * BY v) <= k`: a window must SORT every group's full contents, while
 * this aggregate keeps a k-element heap per group with map-side
 * partial merges, so a billion-row group costs O(n log k) and ships
 * only k rows per partition across the shuffle.
 *
 * Ties break on the smaller payload (deterministic, matches the
 * `ORDER BY v DESC, payload` convention of the window formulation).
 * Returns array<struct<v long, payload long>> sorted desc.
 */
case class TopK(
    valueExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Long)]] {

  override def children: Seq[Expression] = Seq(valueExpr, payloadExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", LongType), StructField("payload", LongType))))

  override def checkInputDataTypes(): TypeCheckResult =
    if (valueExpr.dataType == LongType && payloadExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk expects (bigint, bigint), got ${valueExpr.dataType}/${payloadExpr.dataType}")

  // buffer kept small (≤ 2k) and re-pruned; ArrayBuffer beats a heap
  // at these sizes and serializes trivially
  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Long)] =
    mutable.ArrayBuffer.empty

  private def prune(buf: mutable.ArrayBuffer[(Long, Long)]): Unit =
    if (buf.length > k) {
      val kept = buf.sortBy { case (v, p) => (-v, p) }.take(k)
      buf.clear(); buf ++= kept
    }

  override def update(buf: mutable.ArrayBuffer[(Long, Long)], input: InternalRow): mutable.ArrayBuffer[(Long, Long)] = {
    val v = valueExpr.eval(input)
    val p = payloadExpr.eval(input)
    if (v != null && p != null) {
      buf += ((v.asInstanceOf[Long], p.asInstanceOf[Long]))
      if (buf.length >= 2 * k) prune(buf)
    }
    buf
  }

  override def merge(a: mutable.ArrayBuffer[(Long, Long)], b: mutable.ArrayBuffer[(Long, Long)]): mutable.ArrayBuffer[(Long, Long)] = {
    a ++= b; prune(a); a
  }

  override def eval(buf: mutable.ArrayBuffer[(Long, Long)]): Any = {
    val top = buf.sortBy { case (v, p) => (-v, p) }.take(k)
    new GenericArrayData(top.map { case (v, p) => InternalRow(v, p) }.toArray[Any])
  }

  override def serialize(buf: mutable.ArrayBuffer[(Long, Long)]): Array[Byte] = {
    prune(buf)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (v, p) => out.writeLong(v); out.writeLong(p) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(Long, Long)]
    (0 until n).foreach(_ => buf += ((in.readLong(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), payloadExpr = newChildren(1))
}

object TopK {
  def topk(value: Column, payload: Column, k: Int): Column =
    org.apache.spark.sql.functions.call_function("graft_topk", value, payload,
      org.apache.spark.sql.functions.lit(k))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk",
      exprs => TopK(exprs(0), exprs(1), foldableInt(exprs, 2, "graft_topk", "k")),
      "built-in")

  /** Arity/foldability/type guard for literal int parameters of
    * registry-built functions — produces an analysis-time error
    * instead of CCE/IOOBE/NPE. */
  private[functions] def foldableInt(exprs: Seq[Expression], i: Int,
      fn: String, name: String): Int = {
    if (exprs.length <= i) throw new IllegalArgumentException(
      s"$fn: missing argument '$name' (expected ${i + 1} arguments)")
    val e = exprs(i)
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: argument '$name' must be a literal integer")
    e.eval() match {
      case n: java.lang.Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$name' must be an integer, got $other")
    }
  }
}
