package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Growable distinct-long accumulator for [[BloomBuildAggregate]]:
  * appends are O(1), distinctness is established lazily by one
  * sort+dedup pass at serialize/eval time (cheaper than per-insert
  * hashing when the input is explode output with few duplicates). */
final class LongSetBuffer {
  private var arr = new Array[Long](1024)
  private var n = 0
  private var compacted = true

  def add(v: Long): Unit = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, n * 2)
    arr(n) = v
    n += 1
    compacted = false
  }

  def addAll(other: LongSetBuffer): Unit = {
    var i = 0
    while (i < other.n) { add(other.arr(i)); i += 1 }
  }

  /** Sort + in-place dedup; idempotent. */
  def compact(): Unit = {
    if (compacted || n == 0) { compacted = true; return }
    java.util.Arrays.sort(arr, 0, n)
    var d = 0
    var s = 1
    while (s < n) {
      if (arr(s) != arr(d)) { d += 1; arr(d) = arr(s) }
      s += 1
    }
    n = d + 1
    compacted = true
  }

  def size: Int = { compact(); n }

  def foreachDistinct(f: Long => Unit): Unit = {
    compact()
    var i = 0
    while (i < n) { f(arr(i)); i += 1 }
  }

  def serialize(): Array[Byte] = {
    compact()
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(arr(i)); i += 1 }
    bb.array()
  }
}

object LongSetBuffer {
  def deserialize(bytes: Array[Byte]): LongSetBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new LongSetBuffer
    var i = 0
    while (i < n) { b.add(bb.getLong); i += 1 }
    b
  }
}

/** Self-sizing Bloom-filter builder (r18): ONE aggregation job that
  * returns the serialized filter, sized from the input's true distinct
  * count. Spark's own `BloomFilterAggregate` needs `estimatedNumItems`
  * as a literal BEFORE the job runs, which forces a separate sizing
  * pass (the r17 shape paid a distinct+count job for it; a fixed
  * oversized default rides the downstream scan plan into every task —
  * the r15 8 MB-literal lesson). Here partials carry the exact distinct
  * long set — the same bounded build-side-in-memory contract as a
  * broadcast hash join's build side, applied to the SMALL side of the
  * operator (a benchmark/eval set, MBs by definition) — and the final
  * merge sizes the filter at exactly `distinct × bitsPerItem` bits.
  * Output bytes use the standard `spark.util.sketch` wire format, the
  * one [[ShingleHashesBloom]] and `BloomFilterMightContain` read.
  *
  * An EMPTY input yields a valid all-zeroes filter (nothing passes),
  * not null — callers need no empty-relation special case. */
case class BloomBuildAggregate(
    child: Expression,
    bitsPerItem: Long = 16L,
    fixedNumItems: Long = 0L,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongSetBuffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): LongSetBuffer = new LongSetBuffer

  private lazy val arrayInput: Boolean = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, _) => true
    case _ => false
  }

  override def update(buffer: LongSetBuffer, input: InternalRow): LongSetBuffer = {
    val v = child.eval(input)
    if (v != null) {
      if (arrayInput) {
        // array<long> input (r18): one gram-hash array per document —
        // the explode the row form needed just to feed the aggregate
        // was the bloom job's main cost
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        var i = 0
        val n = arr.numElements()
        while (i < n) {
          if (!arr.isNullAt(i)) buffer.add(arr.getLong(i))
          i += 1
        }
      } else buffer.add(v.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: LongSetBuffer, other: LongSetBuffer): LongSetBuffer = {
    buffer.addAll(other)
    buffer
  }

  override def eval(buffer: LongSetBuffer): Any = {
    val n = math.max(1L, if (fixedNumItems > 0) fixedNumItems else buffer.size.toLong)
    val bf = org.apache.spark.util.sketch.BloomFilter.create(
      n, math.max(64L, n * bitsPerItem))
    buffer.foreachDistinct(bf.putLong)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  override def serialize(buffer: LongSetBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): LongSetBuffer =
    LongSetBuffer.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_build"

  override protected def withNewChildInternal(newChild: Expression): BloomBuildAggregate =
    copy(child = newChild)
  override def withNewMutableAggBufferOffset(offset: Int): BloomBuildAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomBuildAggregate =
    copy(inputAggBufferOffset = offset)
}
