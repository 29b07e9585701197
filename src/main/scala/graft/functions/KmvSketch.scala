package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-cardinality sketch as a native
  * `TypedImperativeAggregate`: the aggregation state is the k smallest
  * DISTINCT hash values seen (unsigned 64-bit order), so each task
  * carries at most k longs per group and partial states merge by
  * set-union + trim — the constant-state, map-side-combinable shape
  * that makes per-source vocabulary cardinality a kilobyte-scale
  * shuffle at 100 TB instead of a vocabulary-wide exchange. The
  * estimator (Bar-Yossef et al. 2002, "Counting distinct elements in a
  * data stream") reads (k−1)·2⁶⁴ / kth_min; below k distinct hashes
  * the sketch holds every one and the count is exact.
  *
  * DETERMINISTIC, unlike probabilistic-seeming sketches as usually
  * deployed: the input is a hash column the caller computes (e.g.
  * `polyhash64`), and the k smallest distinct values of a fixed hash
  * are a pure function of the data — which is what makes the operator
  * oracle-checkable (DuckDB reproduces the same k minima with a
  * row_number window over the same hashes at test scale).
  *
  * eval returns the kept minima as a sorted array (unsigned ascending,
  * values re-signed longs); the caller derives n_kept / kth / estimate
  * (see `Sketches.kmvCardinality`). Aggregates never participate in
  * whole-stage codegen in Spark, so an imperative buffer costs nothing
  * relative to built-in sketch aggregates (same route as Spark's own
  * `count_min_sketch`). */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, "kmv_sketch needs k >= 2")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](KmvSketch.UnsignedCmp)

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, buf.last()) < 0 &&
        !buf.contains(h)) {
      buf.pollLast(); buf.add(h); ()
    }
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kmv_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)
}

object KmvSketch {
  /** Serializable unsigned-64 comparator (the expression ships to
    * executors inside the physical plan, so everything it references
    * must serialize). */
  private[functions] object UnsignedCmp
      extends java.util.Comparator[java.lang.Long] with Serializable {
    override def compare(a: java.lang.Long, b: java.lang.Long): Int =
      java.lang.Long.compareUnsigned(a, b)
  }

  /** Column entry point: `kmvSketch(polyhash64($"tok"), 16)` → sorted
    * array of the k smallest distinct hashes (unsigned order). */
  def kmvSketch(c: Column, k: Int): Column =
    Bridge.column(KmvSketch(Bridge.expression(c), k).toAggregateExpression())

  /** Correctly-rounded unsigned-64 → double (BigInteger conversion is
    * round-half-even, matching DuckDB's HUGEINT → DOUBLE cast — the
    * two-step signed-add-2⁶⁴ spelling can be off by an ulp). */
  def unsignedToDouble(h: Long): Double =
    new java.math.BigInteger(java.lang.Long.toUnsignedString(h)).doubleValue()
}

/** Reinterpret a signed long as unsigned 2⁶⁴-space and convert to
  * double with correct rounding — the KMV estimator's denominator.
  * Codegen'd (calls the static helper; no CodegenFallback fence), so
  * the estimate projection stays inside WholeStageCodegen. */
case class UnsignedToDouble(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.DoubleType

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unsigned_to_double"

  protected override def nullSafeEval(input: Any): Any =
    KmvSketch.unsignedToDouble(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.KmvSketch.unsignedToDouble($c)")

  override protected def withNewChildInternal(newChild: Expression): UnsignedToDouble =
    copy(child = newChild)
}

object UnsignedToDouble {
  def unsignedToDouble(c: Column): Column =
    Bridge.column(UnsignedToDouble(Bridge.expression(c)))
}
