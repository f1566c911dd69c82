package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for the reference's adjacency-matrix text format
  * (`Assignment2/primary_server.c:132-140` write,
  * `secondary_server.c:544-559` read): a directory of `G*.txt` files, each
  * `N` followed by N rows of N 0/1 ints; `a(i)(j) = 1` ⇒ edge i→j.
  *
  * Where [[AdjacencyCodec.read]] is the honest driver-side parser for ONE
  * ≤100-vertex fixture, this source is the scale path for a graph STORE:
  * schema `(graph string, src long, dst long)`, one InputPartition per
  * file — a directory of a million small graphs reads with full cluster
  * parallelism, each task parsing its own files, no driver collect
  * anywhere. Column pruning is pushed into the reader
  * ([[SupportsPushDownRequiredColumns]]): a `count(*)`-style scan emits
  * zero-width rows without materializing vertex ids.
  *
  * Usage: `spark.read.format("graft.sources.AdjacencyV2").load(dir)`.
  */
class AdjacencyV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AdjacencyV2.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AdjacencyTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object AdjacencyV2 {
  val fullSchema: StructType = StructType(Seq(
    StructField("graph", StringType, nullable = false),
    StructField("src", LongType, nullable = false),
    StructField("dst", LongType, nullable = false)))

  /** Parse one file's text into (src, dst) pairs — shared by every reader
    * task; single-sourced so the DSv2 path can never drift from the
    * driver-side codec's grammar. */
  def parseEdges(text: String): Iterator[(Long, Long)] = {
    val lines = text.split("\n", -1).iterator.filter(_.trim.nonEmpty).toSeq
    val n = lines.headOption.map(_.trim.toInt).getOrElse(0)
    for {
      (line, i) <- lines.iterator.drop(1).take(n).zipWithIndex
      (cell, j) <- line.trim.split("\\s+").iterator.zipWithIndex
      if cell == "1"
    } yield (i.toLong, j.toLong)
  }
}

class AdjacencyTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"adjacency($path)"
  override def schema(): StructType = AdjacencyV2.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AdjacencyScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AdjacencyWriteBuilder(path, info.schema())
}

/** The write half — A4 graph-sink (`primary_server.c:122-143`) as a true
  * DSv2 BatchWrite: input rows (graph, src, dst), each writer task
  * buffers its partition's edges per graph and serializes ONE adjacency
  * file per graph on commit (matrix size = max vertex id + 1, capped at
  * the reference's MAX_VERTICES=100 — this sink exists to emit
  * reference-compatible fixtures, the parquet GraphStore is the scale
  * sink). Tasks write to tmp names tagged by (task, attempt); the driver
  * commit renames them into place — the standard two-phase pattern, so a
  * retried task never half-overwrites a committed graph. Callers must
  * `repartition($"graph")` so each graph lands in one task: a graph
  * split across tasks is REJECTED at commit (two fragments would race
  * for one final file — last-writer-wins silent edge loss is worse than
  * a loud failure). `mode("overwrite")` truncates: commit first deletes
  * every pre-existing visible file.
  */
class AdjacencyWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = {
    val t = doTruncate
    new Write {
      override def toBatch: BatchWrite = new AdjacencyBatchWrite(path, schema, t)
    }
  }
}

class AdjacencyBatchWrite(path: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AdjacencyWriterFactory(path, schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    val all = messages.collect { case AdjacencyCommit(files) => files }.flatten
    // a graph split across tasks = two tmp fragments racing for one final
    // name; fail loudly (the caller forgot the repartition contract)
    val dup = all.groupBy(_._2).collect { case (fin, fs2) if fs2.size > 1 => fin }
    require(dup.isEmpty,
      s"graph(s) ${dup.mkString(", ")} split across writer tasks — " +
        "repartition the input by the graph column before writing")
    if (truncate && fs.exists(dir))
      fs.listStatus(dir).filter(_.isFile)
        .map(_.getPath.getName)
        .filterNot(n => n.startsWith(".") || n.startsWith("_"))
        .foreach(n => fs.delete(new org.apache.hadoop.fs.Path(dir, n), false))
    all.foreach { case (tmp, fin) =>
      val t = new org.apache.hadoop.fs.Path(tmp)
      val f = new org.apache.hadoop.fs.Path(fin)
      if (fs.exists(f)) fs.delete(f, false)
      require(fs.rename(t, f), s"commit rename failed: $tmp -> $fin")
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new org.apache.hadoop.conf.Configuration()
    messages.collect { case AdjacencyCommit(files) => files }.flatten
      .foreach { case (tmp, _) =>
        val t = new org.apache.hadoop.fs.Path(tmp)
        val fs = t.getFileSystem(conf)
        if (fs.exists(t)) fs.delete(t, false)
      }
  }
}

case class AdjacencyCommit(files: Seq[(String, String)]) extends WriterCommitMessage

class AdjacencyWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AdjacencyDataWriter(path, schema, partitionId, taskId)
}

class AdjacencyDataWriter(path: String, schema: StructType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  private val gi = schema.fieldIndex("graph")
  private val si = schema.fieldIndex("src")
  private val di = schema.fieldIndex("dst")
  private val buf = scala.collection.mutable.Map
    .empty[String, scala.collection.mutable.ArrayBuffer[(Long, Long)]]
  // tmp paths written so far — abort() must remove them, because a task
  // that fails MID-commit (e.g. the MAX_VERTICES require fires after
  // earlier graphs' tmp files were written) or a losing speculative
  // attempt otherwise strands _tmp_* litter forever (invisible to scans,
  // but it accumulates — r6 ADVICE).
  private val written = scala.collection.mutable.ArrayBuffer.empty[String]

  override def write(row: InternalRow): Unit = {
    val g = row.getUTF8String(gi).toString
    buf.getOrElseUpdate(g, scala.collection.mutable.ArrayBuffer.empty) +=
      ((row.getLong(si), row.getLong(di)))
  }

  override def commit(): WriterCommitMessage = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val files = buf.toSeq.sortBy(_._1).map { case (g, edges) =>
      val n = (edges.iterator.flatMap(e => Iterator(e._1, e._2)).max + 1).toInt
      require(n <= 100, s"graph $g exceeds the reference MAX_VERTICES cap")
      val body = AdjacencyCodec.format(edges.toSeq, n)
      val tmp = new org.apache.hadoop.fs.Path(dir,
        s"_tmp_${g}_${partitionId}_$taskId")
      val out = fs.create(tmp, true)
      written += tmp.toString
      try out.write(body.getBytes("UTF-8")) finally out.close()
      (tmp.toString, new org.apache.hadoop.fs.Path(dir, g).toString)
    }
    AdjacencyCommit(files)
  }

  override def abort(): Unit = {
    val conf = new org.apache.hadoop.conf.Configuration()
    written.foreach { tmp =>
      val t = new org.apache.hadoop.fs.Path(tmp)
      val fs = t.getFileSystem(conf)
      if (fs.exists(t)) fs.delete(t, false)
    }
    written.clear()
  }
  override def close(): Unit = ()
}

class AdjacencyScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = AdjacencyV2.fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new AdjacencyScan(path, required)
}

class AdjacencyScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // Listing happens on the driver (like every file source's planning
  // step); PARSING happens in the reader tasks. One partition per file:
  // the format is header-dependent, so a file is the natural split unit.
  override def planInputPartitions(): Array[InputPartition] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    // standard source convention: skip hidden/metadata files (.crc
    // sidecars, _SUCCESS, in-flight _tmp_* writer fragments)
    def visible(n: String) = !n.startsWith(".") && !n.startsWith("_")
    val files: Array[org.apache.hadoop.fs.FileStatus] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(f => f.isFile && visible(f.getPath.getName))
          .sortBy(_.getPath.getName)
      else Array(fs.getFileStatus(p))
    files.map(f => AdjacencyInputPartition(f.getPath.toString): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new AdjacencyReaderFactory(required)
}

case class AdjacencyInputPartition(file: String) extends InputPartition

class AdjacencyReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new AdjacencyPartitionReader(
      partition.asInstanceOf[AdjacencyInputPartition].file, required)
}

class AdjacencyPartitionReader(file: String, required: StructType)
    extends PartitionReader[InternalRow] {
  private lazy val edges: Iterator[(Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(p)
    val text = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 64 * 1024, false)
      out.toString("UTF-8")
    } finally in.close()
    AdjacencyV2.parseEdges(text)
  }
  private val graphName = UTF8String.fromString(
    new org.apache.hadoop.fs.Path(file).getName)
  // pruned projection: emit only the requested columns, in their order
  private val fields: Array[String] = required.fields.map(_.name)
  private var current: (Long, Long) = _

  override def next(): Boolean =
    if (edges.hasNext) { current = edges.next(); true } else false

  override def get(): InternalRow =
    InternalRow.fromSeq(fields.toSeq.map {
      case "graph" => graphName
      case "src"   => current._1
      case "dst"   => current._2
    })

  override def close(): Unit = ()
}
