package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
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
 * an unseen item evicts the current minimum and inherits its count
 * (over-estimate bounded by the evicted minimum). Merge folds one map
 * into the other with the same rule — fixed memory per partition
 * regardless of cardinality, which is what makes token/vocab
 * statistics affordable at 100 TB.
 *
 * Each counter carries its own error term (the classic ε_i): on
 * eviction the newcomer records the inherited minimum as `err`, and
 * merges add error terms — so every emitted count brackets the truth
 * as cnt − err ≤ true ≤ cnt (Metwally et al. 2005 for the stream
 * invariant; Berinde et al. 2010 / Agarwal et al. 2013 for the
 * mergeable form). The sketch also tracks whether ANY eviction fired
 * anywhere in the update/merge tree and emits that as `evicted`:
 * when false, no counter ever inherited mass, every err is 0, and
 * the counts are EXACT — asserted by the sketch itself, not inferred
 * from a cardinality estimate (the round-11 q53 fix sized capacity
 * from an HLL estimate; a pathological >33% underestimate would have
 * reproduced the silent garbage with no runtime detection — this
 * flag closes that hole).
 *
 * Returns struct<top: array<struct<item string, cnt long, err long>>,
 * evicted boolean>; `top` is sorted by (cnt desc, item) truncated to
 * `k`.
 */
case class HeavyHitters(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHitters.Buf] {

  import HeavyHitters.Buf

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("top", ArrayType(StructType(Seq(
      StructField("item", StringType), StructField("cnt", LongType),
      StructField("err", LongType))))),
    StructField("evicted", BooleanType)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("heavy_hitters expects a string column")

  override def createAggregationBuffer(): Buf = new Buf(mutable.HashMap.empty, false)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  private def add(buf: Buf, item: String, n: Long, err: Long): Unit = {
    buf.m.get(item) match {
      case Some((c, e)) => buf.m.update(item, (c + n, e + err))
      case None if buf.m.size < capacity => buf.m.update(item, (n, err))
      case None =>
        // evict the minimum counter; the newcomer inherits its count
        // and records it as error (cnt − err ≤ true ≤ cnt)
        val (minItem, (minCnt, _)) =
          buf.m.minBy { case (i, (c, _)) => (c, i) }
        buf.m.remove(minItem)
        buf.m.update(item, (minCnt + n, minCnt + err))
        buf.evicted = true
    }
  }

  override def merge(a: Buf, b: Buf): Buf = {
    a.evicted = a.evicted || b.evicted
    b.m.foreach { case (i, (c, e)) => add(a, i, c, e) }
    a
  }

  override def eval(buf: Buf): Any = {
    val top = buf.m.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(k)
    InternalRow(
      new GenericArrayData(top.map { case (i, (c, e)) =>
        InternalRow(UTF8String.fromString(i), c, e)
      }.toArray[Any]),
      buf.evicted)
  }

  // length-prefixed raw UTF-8 (writeUTF caps items at 64KB and would
  // abort the query on a single giant token)
  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.evicted)
    out.writeInt(buf.m.size)
    buf.m.foreach { case (i, (c, e)) =>
      val b = i.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val evicted = in.readBoolean()
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, (Long, Long)]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      m.update(new String(b, "UTF-8"), (in.readLong(), in.readLong()))
    }
    new Buf(m, evicted)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HeavyHitters {
  /** Sketch state: capacity-bounded (cnt, err) counters plus the
   *  any-eviction-ever flag that certifies exactness when false. */
  final class Buf(val m: mutable.HashMap[String, (Long, Long)],
      var evicted: Boolean)

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
