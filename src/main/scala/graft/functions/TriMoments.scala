package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Mutable buffer for [[TriMomentsAgg]]: exact upper-triangle second
  * moments of a quantized (integer) vector stream.
  *
  * Two-lane accumulation: per-row multiply-adds land in LONG lanes (a
  * tight JIT-compiled loop — the whole point of this aggregate; a
  * DECIMAL sum per pair costs a BigDecimal allocation per update and an
  * explode-shaped spelling costs a shuffle row per pair), and the long
  * lanes ROLL into BigInteger totals before they can overflow: each
  * update adds at most rowMax² per product cell, so the buffer tracks
  * the accumulated worst-case bound and rolls when the next row could
  * push any cell past the safe line. Exact at ANY corpus size — the
  * roll is a correctness valve, not a sample.
  */
final class TriBuf(val dim: Int) {
  val tri: Int = dim * (dim + 1) / 2
  var n: Long = 0L
  // long fast lanes
  val partX = new Array[Long](dim)
  val partP = new Array[Long](tri)
  var partBound: Long = 0L // running Σ rowMax² over un-rolled rows
  // exact totals
  val totX = new Array[java.math.BigInteger](dim)
  val totP = new Array[java.math.BigInteger](tri)
  java.util.Arrays.fill(totX.asInstanceOf[Array[AnyRef]], java.math.BigInteger.ZERO)
  java.util.Arrays.fill(totP.asInstanceOf[Array[AnyRef]], java.math.BigInteger.ZERO)

  def roll(): Unit = {
    var i = 0
    while (i < dim) {
      if (partX(i) != 0L) {
        totX(i) = totX(i).add(java.math.BigInteger.valueOf(partX(i)))
        partX(i) = 0L
      }
      i += 1
    }
    var p = 0
    while (p < tri) {
      if (partP(p) != 0L) {
        totP(p) = totP(p).add(java.math.BigInteger.valueOf(partP(p)))
        partP(p) = 0L
      }
      p += 1
    }
    partBound = 0L
  }
}

/** `tri_moments(q)`: exact integer covariance sufficient statistics of a
  * quantized long-array column — (n, Σx_i, Σx_i·x_j for i ≤ j) in ONE
  * aggregation buffer of d(d+1)/2 + d cells.
  *
  * Scale shape: per-task state is dimension-sized (never corpus- or
  * cardinality-sized), map-side partials shuffle ONE buffer per
  * (partition, group), and merge is element-wise BigInteger addition
  * (associative, commutative — exact in any order). The declarative
  * spelling (posexplode the pair triangle, decimal-sum per (i, j))
  * computes the same integers but pays an interpreted higher-order
  * lambda plus a hash-aggregate probe and a BigDecimal add per PAIR per
  * ROW — ~2,000× more per-row machinery than this loop's long
  * multiply-add.
  *
  * Inputs must be pre-quantized longs with |x| ≤ 1e9 (so a per-row
  * product fits a long with headroom) — [[graft.ops.Similarity
  * .embeddingMoments]] enforces the quantization; rows that are null or
  * not `dim` long are skipped (moments are undefined for them).
  *
  * Returns struct(n, moments: array<struct<i, j, s_i, s_j, s_ij>>) with
  * DECIMAL(38,0) sums — exact to ~1e38, i.e. past any physical corpus.
  */
case class TriMomentsAgg(child: Expression, dim: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TriBuf]
    with UnaryLike[Expression] {
  require(dim > 0 && dim <= 4096, s"need 0 < dim <= 4096 (got $dim)")

  private val MaxAbs = 1000000000L // 1e9: rowMax² <= 1e18 fits a long
  private val SafeBound = Long.MaxValue - MaxAbs * MaxAbs

  override def createAggregationBuffer(): TriBuf = new TriBuf(dim)

  override def update(buf: TriBuf, input: InternalRow): TriBuf = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return buf
    val q = arr.toLongArray()
    var rowMax = 0L
    var i = 0
    while (i < dim) {
      val a = math.abs(q(i))
      if (a > rowMax) rowMax = a
      i += 1
    }
    require(rowMax <= MaxAbs,
      s"tri_moments: |quantized value| $rowMax exceeds 1e9 — lower quantScale")
    val rm2 = rowMax * rowMax
    if (buf.partBound > SafeBound - rm2) buf.roll()
    buf.partBound += rm2
    buf.n += 1
    var p = 0
    i = 0
    while (i < dim) {
      val xi = q(i)
      buf.partX(i) += xi
      var j = i
      while (j < dim) {
        buf.partP(p) += xi * q(j)
        p += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(buf: TriBuf, other: TriBuf): TriBuf = {
    buf.roll(); other.roll()
    buf.n += other.n
    var i = 0
    while (i < dim) { buf.totX(i) = buf.totX(i).add(other.totX(i)); i += 1 }
    var p = 0
    while (p < buf.tri) { buf.totP(p) = buf.totP(p).add(other.totP(p)); p += 1 }
    buf
  }

  private val sumType = DecimalType(38, 0)
  private val entryType = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("s_i", sumType, nullable = false),
    StructField("s_j", sumType, nullable = false),
    StructField("s_ij", sumType, nullable = false)))

  override def eval(buf: TriBuf): Any = {
    buf.roll()
    def dec(b: java.math.BigInteger): Decimal =
      Decimal(new java.math.BigDecimal(b), 38, 0)
    val entries = new Array[Any](buf.tri)
    var p = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        entries(p) = InternalRow(i, j, dec(buf.totX(i)), dec(buf.totX(j)),
          dec(buf.totP(p)))
        p += 1
        j += 1
      }
      i += 1
    }
    InternalRow(buf.n, new GenericArrayData(entries))
  }

  override def serialize(buf: TriBuf): Array[Byte] = {
    buf.roll()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(dim)
    out.writeLong(buf.n)
    def writeBig(b: java.math.BigInteger): Unit = {
      val bytes = b.toByteArray
      out.writeInt(bytes.length); out.write(bytes)
    }
    buf.totX.foreach(writeBig)
    buf.totP.foreach(writeBig)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TriBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = in.readInt()
    require(d == dim, s"tri_moments buffer dim $d != $dim")
    val buf = new TriBuf(dim)
    buf.n = in.readLong()
    def readBig(): java.math.BigInteger = {
      val l = in.readInt(); val b = new Array[Byte](l); in.readFully(b)
      new java.math.BigInteger(b)
    }
    var i = 0
    while (i < dim) { buf.totX(i) = readBig(); i += 1 }
    var p = 0
    while (p < buf.tri) { buf.totP(p) = readBig(); p += 1 }
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("moments", ArrayType(entryType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"tri_moments needs an array<bigint> child, got ${other.catalogString}")
    }

  override def withNewMutableAggBufferOffset(offset: Int): TriMomentsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TriMomentsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): TriMomentsAgg =
    copy(child = c)
  override def prettyName: String = "tri_moments"
}

object TriMoments {
  /** `tri_moments(q, dim)`: struct(n, moments array<struct<i, j, s_i,
    * s_j, s_ij>>) — exact integer second moments of a quantized vector
    * column in one dimension-sized aggregation buffer.
    */
  def tri_moments(c: Column, dim: Int): Column =
    Bridge.column(TriMomentsAgg(Bridge.expression(c), dim)
      .toAggregateExpression())
}
