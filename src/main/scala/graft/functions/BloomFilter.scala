package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/**
 * Bloom-filter runtime join pruning — the mechanism behind
 * "semi-join reduction" in distributed engines: aggregate the SMALL
 * join side's keys into a compact bit array (`BloomFilterAgg`, a
 * TypedImperativeAggregate whose merge is a word-wise OR), then
 * probe it on the LARGE side with a codegen'd scalar
 * (`BloomMightContain`) BEFORE that side's shuffle. False positives
 * are removed by the real join that follows, so the rewrite is
 * semantically transparent (oracle: q77 ≡ the plain join); false
 * negatives cannot occur. At 100 TB this is the difference between
 * shuffling the whole fact table and shuffling only the ~selectivity
 * fraction that can possibly match — exactly what matters when the
 * dim side is too big to broadcast and the join must sort-merge.
 *
 * Double hashing (Kirsch–Mitzenmacher): bit_i = h1 + i·h2 over a
 * splitmix64-mixed key, so k probes cost two multiplies, not k
 * hashes. Keys are LongType; hash other types upstream with
 * `xxhash64(...)` (a codegen'd builtin).
 */
object BloomFilter {

  /** splitmix64 finalizer — avalanches a long key. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def put(words: Array[Long], numHashes: Int, key: Long): Unit = {
    val numBits = words.length.toLong << 6
    val h1 = mix64(key)
    val h2 = mix64(key ^ 0x5851F42D4C957F2DL) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits)
      words((bit >>> 6).toInt) |= 1L << (bit & 63)
      i += 1
    }
  }

  def contains(words: Array[Long], numHashes: Int, key: Long): Boolean = {
    val numBits = words.length.toLong << 6
    val h1 = mix64(key)
    val h2 = mix64(key ^ 0x5851F42D4C957F2DL) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits)
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Layout: [numHashes: int][numWords: int][words: long...], big-endian. */
  def serialize(words: Array[Long], numHashes: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + words.length * 8)
    bb.putInt(numHashes).putInt(words.length)
    words.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): (Int, Array[Long]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val numHashes = bb.getInt()
    val words = new Array[Long](bb.getInt())
    var i = 0
    while (i < words.length) { words(i) = bb.getLong(); i += 1 }
    (numHashes, words)
  }

  def bloom_agg(key: Column, numBits: Int, numHashes: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "graft_bloom_agg", key,
      org.apache.spark.sql.functions.lit(numBits),
      org.apache.spark.sql.functions.lit(numHashes))

  def bloom_contains(bloom: Column, key: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_bloom_contains", bloom, key)

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg", { exprs =>
        if (exprs.isEmpty) throw new IllegalArgumentException(
          "graft_bloom_agg expects (key, numBits, numHashes), got 0 arguments")
        BloomFilterAgg(exprs(0),
          TopK.foldableInt(exprs, 1, "graft_bloom_agg", "numBits"),
          TopK.foldableInt(exprs, 2, "graft_bloom_agg", "numHashes"))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains", { exprs =>
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"graft_bloom_contains expects (bloom, key), got ${exprs.length}")
        BloomMightContain(exprs(0), exprs(1))
      }, "built-in")
  }
}

/**
 * Builds the serialized filter over a LongType key column. Buffer is
 * the raw word array (fixed size — memory per partition is `numBits/8`
 * regardless of cardinality); partial merge is a word-wise OR, so the
 * aggregate is a true map-side-combining distributed build.
 */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && (numBits & 63) == 0,
    s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16, s"numHashes out of range: $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_agg expects an integral key (hash strings with xxhash64 first), got $t")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits >>> 6)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      BloomFilter.put(buf, numHashes, key)
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = BloomFilter.serialize(buf, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomFilter.serialize(buf, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomFilter.deserialize(bytes)._2

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/**
 * `might_contain(bloom, key)` — the probe side. The filter argument
 * must be foldable (a literal produced by collecting the build-side
 * aggregate, mirroring how Spark's own InjectRuntimeFilter passes the
 * bloom as a scalar subquery result): it is deserialized ONCE on the
 * driver and shipped to executors as a codegen reference object, so
 * the generated per-row code is just the k-probe loop — no
 * per-row deserialization, fully inside whole-stage codegen.
 */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"bloom argument must be binary, got ${left.dataType}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom argument must be foldable (collect the build-side aggregate and pass lit(bytes))")
    else if (right.dataType != LongType && right.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"key must be integral (hash strings with xxhash64 first), got ${right.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  // Deserialized once per plan; referenced by both eval paths.
  @transient private lazy val filter: (Int, Array[Long]) = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) null else BloomFilter.deserialize(bytes)
  }

  override def nullable: Boolean = right.nullable || filter == null

  override def eval(input: InternalRow): Any = {
    if (filter == null) return null
    val k = right.eval(input)
    if (k == null) null
    else {
      val key = k match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      BloomFilter.contains(filter._2, filter._1, key)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (filter == null) {
      val code = code"""
        boolean ${ev.isNull} = true;
        boolean ${ev.value} = false;"""
      return ev.copy(code = code)
    }
    val wordsRef = ctx.addReferenceObj("bloomWords", filter._2, "long[]")
    val k = filter._1
    val keyGen = right.genCode(ctx)
    val code = code"""
      ${keyGen.code}
      boolean ${ev.isNull} = ${keyGen.isNull};
      boolean ${ev.value} = false;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.BloomFilter.contains($wordsRef, $k, (long) ${keyGen.value});
      }"""
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
