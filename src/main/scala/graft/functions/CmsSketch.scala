package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch as a native `TypedImperativeAggregate` — the
  * second native sketch aggregate (after `KmvSketch`): aggregation
  * state is a fixed `depth × width` int64 counter matrix, each input
  * hash increments one counter per row (bucket = low bits of the
  * Kirsch–Mitzenmacher affine transform `h·(2i+1) + i·gold` — the SAME
  * portable family the MinHash signatures use, so the oracle
  * recomputes every bucket), and partial states merge by elementwise
  * addition. Constant mergeable state: a 4×1024 sketch is 32 KB per
  * group regardless of corpus size — point-frequency queries over a
  * 100 TB token stream cost a fixed-size shuffle instead of a
  * vocabulary-wide exchange. Estimates are upper-biased:
  * est(x) = min_i matrix[i][bucket_i(x)] ≥ true(x).
  *
  * DETERMINISTIC, same contract as `KmvSketch`: the input is a hash
  * column the caller computes (`polyhash64`), buckets are pure integer
  * arithmetic, and counter sums are exact — so unlike
  * `df.stat.countMinSketch` (driver-side object, engine-opaque seeds)
  * the whole matrix is oracle-checkable cell by cell.
  *
  * eval returns the matrix row-major as array<long> (depth·width
  * elements); `Sketches.cmsTokenFreq` derives point estimates.
  * `width` must be a power of two (bucket = h & (width−1): an odd
  * multiplier is a bijection mod 2^64, so low bits stay as uniform as
  * the input hash's). */
case class CmsSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 8, "cms_sketch needs 1 <= depth <= 8")
  require(width >= 2 && (width & (width - 1)) == 0,
    "cms_sketch needs a power-of-two width")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < depth) {
        val u = h * (2L * i + 1L) + i * CmsSketch.GOLD // wraps ≡ mod 2⁶⁴
        buf(i * width + (u & (width - 1)).toInt) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val arr = new Array[Any](buf.length)
    var i = 0
    while (i < buf.length) { arr(i) = buf(i); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "cms_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketch =
    copy(child = newChildren.head)
}

object CmsSketch {
  /** 11400714819323198485 as a signed long — the golden-ratio step
    * shared with the MinHash affine family. */
  val GOLD: Long = -7046029254386353131L

  /** Column entry point: `cmsSketch(polyhash64($"tok"), 4, 1024)` →
    * the depth×width counter matrix, row-major. */
  def cmsSketch(c: Column, depth: Int, width: Int): Column =
    Bridge.column(
      CmsSketch(Bridge.expression(c), depth, width).toAggregateExpression())
}
