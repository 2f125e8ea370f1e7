package graft.io

import java.util.{Map => JMap}

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** In-memory document-store connector — a REAL DataSource V2
  * implementation standing in for the reference's MongoDB collections
  * (R/export.R:401-413, R/validation.R:1298-1318). The point of the
  * exercise: [[DocumentSink]]'s S6/S7 seam is "swap the format string
  * for the connector", and that swap is only credible if a second
  * format actually drives it — this one does, through the same V2
  * surface (TableProvider → Scan/Write, truncate-on-overwrite) a
  * production connector implements.
  *
  * Documents live in a JVM-local registry keyed by the `collection`
  * option — correct in local mode and tests; a cluster deployment uses
  * a real connector through the identical caller code.
  */
class MemDocStore extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  private def collection(options: JMap[String, String]): String = {
    val c = options.get("collection")
    require(c != null, "MemDocStore requires a 'collection' option")
    c
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MemDocStore.registry.get(collection(options))
      .map(_._1)
      .getOrElse(throw new IllegalArgumentException(
        s"MemDocStore collection '${collection(options)}' does not exist"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new MemDocTable(collection(properties), schema)
}

object MemDocStore {
  /** collection → (schema, committed rows). */
  private[io] val registry = TrieMap.empty[String, (StructType, ArrayBuffer[InternalRow])]

  val Format: String = classOf[MemDocStore].getName

  def drop(collection: String): Unit = registry.remove(collection)
  def collections: Set[String] = registry.keySet.toSet
}

private class MemDocTable(collection: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  import scala.jdk.CollectionConverters._

  override def name(): String = s"memdoc.$collection"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = {
        // ACCEPT_ANY_SCHEMA bypasses Spark's read-schema check and the
        // stored InternalRows were encoded under the committed schema —
        // reading them under a different explicit schema would
        // reinterpret the row layout as garbage
        MemDocStore.registry.get(collection).foreach { case (stored, _) =>
          require(stored == tableSchema,
            s"read of '$collection' with schema $tableSchema != stored $stored")
        }
        this
      }
      override def readSchema(): StructType = tableSchema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        Array(MemDocPartition(collection))
      override def createReaderFactory(): PartitionReaderFactory = new MemDocReaderFactory
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemDocWriteBuilder(collection, info.schema(), truncate = false)
}

private case class MemDocPartition(collection: String) extends InputPartition

private class MemDocReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val coll = partition.asInstanceOf[MemDocPartition].collection
    val rows = MemDocStore.registry.get(coll).map(_._2.toArray).getOrElse(Array.empty)
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = rows(i)
      override def close(): Unit = ()
    }
  }
}

private class MemDocWriteBuilder(collection: String, schema: StructType,
                                 truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new MemDocWriteBuilder(collection, schema, truncate = true)

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
        new MemDocWriterFactory(collection)
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        // commit is atomic-at-the-driver: tasks buffered their rows into
        // the messages; nothing lands in the registry until here
        val rows = messages.iterator.flatMap(_.asInstanceOf[MemDocCommit].rows).to(ArrayBuffer)
        MemDocStore.registry.updateWith(collection) {
          case Some((s, existing)) if !truncate =>
            // ACCEPT_ANY_SCHEMA bypasses Spark's write-compatibility
            // check, so guard here: appending rows encoded under a
            // different schema would make later reads decode garbage
            require(s == schema,
              s"append to '$collection' with schema $schema != stored $s")
            Some((s, existing ++ rows))
          case _ => Some((schema, rows))
        }
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit = ()
    }
  }
}

private case class MemDocCommit(rows: Seq[InternalRow]) extends WriterCommitMessage

private class MemDocWriterFactory(collection: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = ArrayBuffer.empty[InternalRow]
      override def write(record: InternalRow): Unit = buf += record.copy()
      override def commit(): WriterCommitMessage = MemDocCommit(buf.toSeq)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
