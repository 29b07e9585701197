package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** HyperLogLog registers as a native `TypedImperativeAggregate` — the
  * third native sketch aggregate (after `KmvSketch` and `CmsSketch`)
  * and the industry-standard distinct-cardinality shape: aggregation
  * state is a fixed array of `m = 2^p` byte registers; each input hash
  * routes on its top `p` bits to one register, which keeps the MAX of
  * `1 + leading-zeros` of the remaining `64−p` bits (Flajolet et al.
  * 2007). Partial states merge by elementwise max — constant
  * mergeable state (1 KB at p=10 regardless of corpus size), so a
  * per-source vocabulary estimate over a 100 TB token stream shuffles
  * kilobytes of registers instead of the vocabulary. Versus KMV at
  * comparable state, HLL's error is ~1.04/√m and its registers union
  * losslessly across ANY partitioning of the data — the property
  * `Sketches.hllUnionSources` exploits to estimate cross-source
  * overlap without ever co-shuffling two sources' tokens.
  *
  * DETERMINISTIC, same contract as the other native sketches: the
  * input is a hash column the caller computes (`polyhash64` plus the
  * Fibonacci finalizer), bucket and rank are pure bit arithmetic, and
  * max is order-independent — so the register array is a pure function
  * of the data and DuckDB reproduces every register with a
  * (bucket → max rank) rollup over the same hashes at test scale.
  *
  * eval returns the m registers as array<int> in bucket order (values
  * 0 .. 64−p+1); `Sketches.hllCardinality` derives the estimate via
  * exact integer harmonic-sum arithmetic (decimal(38)) with ONE double
  * division at the end, linear counting below 2.5·m. */
case class HllSketch(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, "hll_sketch needs 4 <= p <= 16")

  private val m: Int = 1 << p
  private val maxRank: Byte = (64 - p + 1).toByte

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val j = (h >>> (64 - p)).toInt
      val w = h << p
      // nlz(0) = 64 would overshoot the 64−p window — cap at maxRank.
      val r0 = java.lang.Long.numberOfLeadingZeros(w) + 1
      val r = (if (r0 > maxRank) maxRank else r0.toByte).toByte
      if (r > buf(j)) buf(j) = r
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < m) {
      if (other(j) > buf(j)) buf(j) = other(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    val arr = new Array[Any](m)
    var j = 0
    while (j < m) { arr(j) = buf(j).toInt; j += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "hll_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketch =
    copy(child = newChildren.head)
}

object HllSketch {
  /** Column entry point: `hllSketch(mix64(polyhash64($"tok")), 10)` →
    * array<int> of 2^p registers in bucket order. */
  def hllSketch(c: Column, p: Int): Column =
    Bridge.column(HllSketch(Bridge.expression(c), p).toAggregateExpression())

  /** splitmix64 finalizer (Steele et al., JDK SplittableRandom) as a
    * column expression — REQUIRED in front of this sketch: HLL reads a
    * leading-zeros statistic, and the library's multiplicative
    * Kirsch–Mitzenmacher family only guarantees well-mixed HIGH bits
    * (measured: `i·GOLD` inputs estimate +85%, polyhash tokens +35%;
    * splitmix brings both inside the 1.04/√m stderr). xorshift +
    * wrapping multiply only — all codegen'd builtins here, and exactly
    * expressible on HUGEINT in the oracle (xor / `>>` / split 32-bit
    * multiply mod 2⁶⁴). KMV/CMS read order statistics/low bits of the
    * full range and keep their cheaper multiplicative premix. */
  def mix64(c: Column): Column = {
    import org.apache.spark.sql.functions.shiftrightunsigned
    val k1 = 0xBF58476D1CE4E5B9L // -4658895280553007687
    val k2 = 0x94D049BB133111EBL // -7723592293110705685
    val z1 = c.bitwiseXOR(shiftrightunsigned(c, 30))
    val z2 = z1 * k1
    val z3 = z2.bitwiseXOR(shiftrightunsigned(z2, 27))
    val z4 = z3 * k2
    z4.bitwiseXOR(shiftrightunsigned(z4, 31))
  }

  /** Bias-corrected leading constant α_m · m² · 2⁶⁴ of the raw HLL
    * estimator, computed once in a pinned double-op order; the oracle
    * twin interpolates `Double.toString` of this exact value (shortest
    * decimal repr round-trips), so both engines divide the SAME
    * numerator by the same exact integer harmonic sum. Valid for
    * m >= 128 (the α_m regime this library uses). */
  def alphaMm2Pow64(p: Int): Double = {
    val m = (1 << p).toDouble
    0.7213 / (1.0 + 1.079 / m) * m * m * 18446744073709551616.0
  }
}
