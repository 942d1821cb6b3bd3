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

/** Misra–Gries / SpaceSaving frequent-items summary ("MG sketch") as a
  * Catalyst `TypedImperativeAggregate` — the one summary in the sketch
  * layer Spark has no built-in for: a MERGEABLE approximate top-k.
  * (`count_min_sketch` answers point queries but cannot enumerate the
  * heavy items; the exact two-stage top-k sorts |distinct| rows per
  * group.) MG keeps at most `capacity` counters per aggregation buffer:
  * every reported count is an UNDER-estimate within N/capacity of truth
  * (N = group row count), and any item with true frequency > N/capacity
  * is guaranteed to be present — so with capacity ≥ |distinct| the
  * summary degrades to exact counts (the regime the DuckDB oracle
  * checks; the approximate regime's error bound is property-tested).
  *
  * Merge is the Agarwal et al. (PODS'12) mergeable-summaries rule: sum
  * counters pairwise, then subtract the (capacity+1)-th largest count
  * from all and drop non-positives — associative up to the error bound,
  * which is what makes the map-side partial aggregation safe.
  *
  * Buffer serialization is a plain (size, [len, utf8, count]*) byte
  * stream — no kryo, stable across JVMs.
  *
  * Buffer keys are UTF8String (copied on first insert so no buffer
  * aliases Spark's transient row memory): the per-row update path skips
  * the UTF-8 → UTF-16 decode a String key would pay on every input row.
  * `eval` converts the ≤ capacity survivors to String before the final
  * (-count, item) sort, so the reported tie-break order is EXACTLY the
  * String-lexicographic order of the original implementation (UTF-16
  * order differs from UTF-8 byte order for supplementary code points).
  */
case class MisraGriesTopK(child: Expression, capacity: Int, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
    with UnaryLike[Expression] {
  require(capacity > 0 && k > 0 && k <= capacity,
    "need 0 < k <= capacity")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty[UTF8String, Long]

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1)
        // copy on FIRST insert only: the evaluated key may alias Spark's
        // reused row buffer; a retained key must own its bytes
        case None if buf.size < capacity => buf.update(s.copy(), 1L)
        case None =>
          // classic MG decrement-all step; drop exhausted counters
          val dead = List.newBuilder[UTF8String]
          buf.foreach { case (key, c) =>
            if (c == 1L) dead += key else buf.update(key, c - 1)
          }
          dead.result().foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
                     other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (key, c) =>
      buf.update(key, buf.getOrElse(key, 0L) + c)
    }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest count, keep positives
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = List.newBuilder[UTF8String]
      buf.foreach { case (key, c) =>
        if (c - cut <= 0L) dead += key else buf.update(key, c - cut)
      }
      dead.result().foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val top = buf.toSeq
      .map { case (item, c) => (item.toString, c) } // ≤ capacity decodes
      .sortBy { case (item, c) => (-c, item) }      // String order, as ever
      .take(k)
      .map { case (item, c) =>
        InternalRow(UTF8String.fromString(item), c)
      }
    new GenericArrayData(top.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val b = key.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("est_count", LongType))), containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"approx_top_k needs a string child, got ${child.dataType.catalogString}")

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): MisraGriesTopK =
    copy(child = c)
  override def prettyName: String = "approx_top_k"
}

object FreqSketch {
  /** `approx_top_k(col, capacity, k)`: array<struct<item, est_count>> of
    * the ≤ k heaviest string values, counts within N/capacity of truth
    * (exact when capacity ≥ |distinct values| in the group).
    */
  def approx_top_k(c: Column, capacity: Int, k: Int): Column =
    Bridge.column(MisraGriesTopK(Bridge.expression(c), capacity, k)
      .toAggregateExpression())
}
