package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 table over a `--write-metadata` payload directory (the
  * reference's raw-JSON cache layout, get_metadata.py:29-38: one
  * `{doi-with-slashes-stripped}.json` file per DOI).
  *
  * `spark.read.format("graft-payload").load(dir)` →
  * `(file_key string, payload string)`.
  *
  * Why a V2 source instead of `text(wholetext)`: the planner gets honest
  * SPLITS — files are size-balanced into `defaultParallelism` input
  * partitions at planning time (wholetext gives one task per file: a
  * million tiny JSON files = a million tasks), and the table is usable
  * from pure SQL (`CREATE TABLE ... USING `graft-payload``). The
  * filename→DOI join stays in [[graft.ingest.Ingest.readPayloadDir]],
  * which works on any (file_key, payload) relation.
  */
class PayloadSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-payload"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PayloadSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-payload requires a path"))
    new PayloadTable(path)
  }
}

object PayloadSource {
  val schema: StructType = StructType(Seq(
    StructField("file_key", StringType, nullable = false),
    StructField("payload", StringType, nullable = false)))
}

private[sources] class PayloadTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft-payload(`$dir`)"
  override def schema(): StructType = PayloadSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = PayloadSource.schema
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        val spark = SparkSession.active
        val hconf = spark.sessionState.newHadoopConf()
        val p = new Path(dir)
        val fs = p.getFileSystem(hconf)
        val files = fs.listStatus(p).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".json"))
          .map(s => (s.getPath.toString, s.getLen))
        // size-balanced grouping: greedy into defaultParallelism buckets
        val n = math.max(1, math.min(files.size,
          spark.sparkContext.defaultParallelism))
        val buckets = Array.fill(n)(Vector.empty[String] -> 0L)
        files.sortBy(-_._2).foreach { case (f, len) =>
          val i = buckets.indices.minBy(buckets(_)._2)
          buckets(i) = (buckets(i)._1 :+ f, buckets(i)._2 + len)
        }
        buckets.filter(_._1.nonEmpty)
          .map(b => PayloadPartition(b._1): InputPartition)
      }

      // Configuration itself is not serializable, so the hadoop conf rides
      // along as a string map — on the FACTORY, which Spark serializes once
      // into the task binary, not on every InputPartition. Note
      // Configuration.iterator() returns ALL entries including loaded
      // defaults (several hundred), which is exactly why it must not be
      // duplicated per partition.
      override def createReaderFactory(): PartitionReaderFactory = {
        val hconf = SparkSession.active.sessionState.newHadoopConf()
        PayloadReaderFactory(
          hconf.iterator().asScala.map(e => e.getKey -> e.getValue).toMap)
      }
    }
}

private[sources] case class PayloadPartition(files: Seq[String])
  extends InputPartition

private[sources] case class PayloadReaderFactory(conf: Map[String, String])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PayloadReader(partition.asInstanceOf[PayloadPartition], conf)
}

private[sources] class PayloadReader(part: PayloadPartition,
                                     conf: Map[String, String])
  extends PartitionReader[InternalRow] {
  private val hconf = {
    val c = new Configuration(false)
    conf.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private val it = part.files.iterator
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (!it.hasNext) return false
    val p = new Path(it.next())
    val fs = p.getFileSystem(hconf)
    val in = fs.open(p)
    val bytes =
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64 * 1024)
        var r = in.read(buf)
        while (r >= 0) { out.write(buf, 0, r); r = in.read(buf) }
        out.toByteArray
      } finally in.close()
    val key = p.getName.stripSuffix(".json")
    row = new GenericInternalRow(Array[Any](
      UTF8String.fromString(key), UTF8String.fromBytes(bytes)))
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
