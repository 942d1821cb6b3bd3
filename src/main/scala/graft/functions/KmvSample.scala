package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic k-minimum-values (KMV) sample: the k DISTINCT values of
  * the group with the smallest md5 priority — a uniform random sample
  * under the hash's uniformity, yet a pure function of the data (no RNG,
  * no partition-order dependence), so incremental corpus refreshes keep
  * their sample stable and the whole thing is oracle-checkable in SQL
  * (`ORDER BY md5(key) LIMIT k`).
  *
  * This is THE scale shape for group-wise sampling: each aggregation
  * buffer holds at most k entries, map-side partials shuffle k rows per
  * (partition, group) instead of the group's full row set, and merge is a
  * union-and-trim (associative, commutative — order-insensitive by
  * construction since the content is a set of (priority, value) pairs
  * with a total order). A `row_number() OVER (ORDER BY md5(...))` window
  * computes the same thing but sorts EVERY row of every group through one
  * window; this keeps k per buffer.
  *
  * The same summary doubles as the classic KMV distinct-count sketch
  * (est ≈ (k-1)/max_kept_fraction); the estimator lives in SQL on the
  * returned priorities, the aggregate just guarantees the k minima.
  */
case class KmvBottomK(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[(String, String)]]
    with UnaryLike[Expression] {
  require(k > 0, "need k > 0")

  @transient private lazy val digest =
    java.security.MessageDigest.getInstance("MD5")

  private def md5Hex(s: String): String = {
    val d = digest
    d.reset()
    val out = d.digest(s.getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < out.length) {
      sb.append(Character.forDigit((out(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(out(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  override def createAggregationBuffer(): mutable.TreeSet[(String, String)] =
    mutable.TreeSet.empty[(String, String)]

  override def update(buf: mutable.TreeSet[(String, String)],
                      input: InternalRow): mutable.TreeSet[(String, String)] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.add((md5Hex(s), s)) // set semantics dedupe repeated values
      if (buf.size > k) buf.remove(buf.last)
    }
    buf
  }

  override def merge(buf: mutable.TreeSet[(String, String)],
                     other: mutable.TreeSet[(String, String)]): mutable.TreeSet[(String, String)] = {
    other.foreach(buf.add)
    while (buf.size > k) buf.remove(buf.last)
    buf
  }

  override def eval(buf: mutable.TreeSet[(String, String)]): Any = {
    val rows = buf.toSeq.map { case (prio, v) =>
      InternalRow(UTF8String.fromString(v), UTF8String.fromString(prio))
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.TreeSet[(String, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (prio, v) =>
      val pb = prio.getBytes("UTF-8"); out.writeInt(pb.length); out.write(pb)
      val vb = v.getBytes("UTF-8"); out.writeInt(vb.length); out.write(vb)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[(String, String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[(String, String)]
    var i = 0
    while (i < n) {
      val pl = in.readInt(); val pb = new Array[Byte](pl); in.readFully(pb)
      val vl = in.readInt(); val vb = new Array[Byte](vl); in.readFully(vb)
      buf.add((new String(pb, "UTF-8"), new String(vb, "UTF-8")))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("priority", StringType))), containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kmv_sample needs a string child, got ${child.dataType.catalogString}")

  override def withNewMutableAggBufferOffset(offset: Int): KmvBottomK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvBottomK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): KmvBottomK =
    copy(child = c)
  override def prettyName: String = "kmv_sample"
}

object KmvSample {
  /** `kmv_sample(col, k)`: array<struct<item, priority>> of the k distinct
    * values with the smallest md5 — a deterministic uniform sample, sorted
    * by priority (ascending).
    */
  def kmv_sample(c: Column, k: Int): Column =
    Bridge.column(KmvBottomK(Bridge.expression(c), k).toAggregateExpression())
}
