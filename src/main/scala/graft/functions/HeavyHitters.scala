package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/**
 * Space-saving heavy-hitters sketch as a TypedImperativeAggregate —
 * the custom-AGGREGATE extension tier (scalar expressions:
 * CosineSimilarity/RollingHash; whole-operator strategies:
 * documented unnecessary, SURVEY.md §4).
 *
 * Metwally et al.'s space-saving: bounded map of `capacity` counters;
 * an unseen item evicts the current minimum and inherits its count +1
 * (over-estimate bounded by min). Merge sums counters then re-prunes
 * to capacity — fixed memory per partition regardless of cardinality,
 * which is what makes token/vocab statistics affordable at 100 TB.
 * When true cardinality ≤ capacity the counts are EXACT (no eviction
 * ever fires), making the result oracle-checkable on the testdata.
 *
 * Returns array<struct<item string, cnt long>> sorted by
 * (cnt desc, item) truncated to `k`.
 */
case class HeavyHitters(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("cnt", LongType))))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("heavy_hitters expects a string column")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  private def add(buf: mutable.HashMap[String, Long], item: String, n: Long): Unit = {
    buf.get(item) match {
      case Some(c) => buf.update(item, c + n)
      case None if buf.size < capacity => buf.update(item, n)
      case None =>
        // evict the minimum counter; newcomer inherits its count
        val (minItem, minCnt) = buf.minBy { case (i, c) => (c, i) }
        buf.remove(minItem)
        buf.update(item, minCnt + n)
    }
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (i, c) => add(a, i, c) }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (i, c) => (-c, i) }.take(k)
    new GenericArrayData(top.map { case (i, c) =>
      InternalRow(UTF8String.fromString(i), c)
    }.toArray[Any])
  }

  // length-prefixed raw UTF-8 (writeUTF caps items at 64KB and would
  // abort the query on a single giant token)
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, c) =>
      val b = i.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HeavyHitters {
  def heavy_hitters(c: Column, k: Int, capacity: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "graft_heavy_hitters", c,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(capacity))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_heavy_hitters",
      { exprs =>
        if (exprs.isEmpty) throw new IllegalArgumentException(
          "graft_heavy_hitters expects (item, k, capacity), got 0 arguments")
        HeavyHitters(exprs(0),
          TopK.foldableInt(exprs, 1, "graft_heavy_hitters", "k"),
          TopK.foldableInt(exprs, 2, "graft_heavy_hitters", "capacity"))
      },
      "built-in")
}
