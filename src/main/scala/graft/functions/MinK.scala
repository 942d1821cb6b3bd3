package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `min_k(col, k)`: the k smallest DISTINCT values of the group, ascending.
  *
  * The scale shape for capped per-group id lists: each aggregation buffer
  * holds at most k entries, map-side partials shuffle ≤ k values per
  * (partition, group), and merge is union-and-trim (associative,
  * commutative). The declarative spelling —
  * `slice(sort_array(collect_list(id)), 1, k)` — produces the same answer
  * but `collect_list` buffers the ENTIRE group first, so a 10⁸-dup group
  * still materializes one multi-GB aggregation buffer; this keeps k.
  *
  * Supports long, int, and string children (the id shapes the corpus
  * operators use). Strings order by UTF8String's BINARY (UTF-8 byte)
  * comparison — the same ordering Spark's `min`/`sort_array` use — so
  * `min_k(s, k)(0)` always equals `min(s)` even for non-BMP code points
  * (a JVM String ordering would compare UTF-16 code units and disagree
  * above U+FFFF). Set semantics, nulls skipped.
  */
case class MinKAgg(child: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Any]]
    with UnaryLike[Expression] {
  require(k > 0, "need k > 0")

  private def ord: Ordering[Any] = child.dataType match {
    case LongType    => Ordering.by[Any, Long](_.asInstanceOf[Long])
    case IntegerType => Ordering.by[Any, Int](_.asInstanceOf[Int])
    case _ => new Ordering[Any] {
      override def compare(a: Any, b: Any): Int =
        a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    }
  }

  override def createAggregationBuffer(): mutable.TreeSet[Any] =
    mutable.TreeSet.empty[Any](ord)

  override def update(buf: mutable.TreeSet[Any], input: InternalRow): mutable.TreeSet[Any] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String from an unsafe row may alias a reused buffer — clone
      // before retaining across rows
      val jv: Any = v match {
        case u: UTF8String => u.clone()
        case other => other
      }
      buf.add(jv)
      if (buf.size > k) buf.remove(buf.last)
    }
    buf
  }

  override def merge(buf: mutable.TreeSet[Any], other: mutable.TreeSet[Any]): mutable.TreeSet[Any] = {
    other.foreach(buf.add)
    while (buf.size > k) buf.remove(buf.last)
    buf
  }

  override def eval(buf: mutable.TreeSet[Any]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    child.dataType match {
      case LongType    => buf.foreach(v => out.writeLong(v.asInstanceOf[Long]))
      case IntegerType => buf.foreach(v => out.writeInt(v.asInstanceOf[Int]))
      case _ => buf.foreach { v =>
        val b = v.asInstanceOf[UTF8String].getBytes
        out.writeInt(b.length); out.write(b)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Any] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      child.dataType match {
        case LongType    => buf.add(in.readLong())
        case IntegerType => buf.add(in.readInt())
        case _ =>
          val l = in.readInt(); val b = new Array[Byte](l); in.readFully(b)
          buf.add(UTF8String.fromBytes(b))
      }
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"min_k needs a bigint, int, or string child, got ${other.catalogString}")
    }

  override def withNewMutableAggBufferOffset(offset: Int): MinKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): MinKAgg =
    copy(child = c)
  override def prettyName: String = "min_k"
}

object MinK {
  /** `min_k(col, k)`: array of the k smallest distinct values, ascending. */
  def min_k(c: Column, k: Int): Column =
    Bridge.column(MinKAgg(Bridge.expression(c), k).toAggregateExpression())
}
