package graft.log

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming for the `log` source: `spark.readStream
  * .format("log")` tails a directory, each batch reading the files that
  * appeared since the last committed offset.
  *
  * Semantics follow Spark's own file stream source: files are immutable
  * once seen (appends to an already-processed file are ignored), discovery
  * is by listing, an offset is the set of seen files. The offset is
  * serialized as a sorted path list — simple and correct; for very
  * long-running queries over millions of files Spark's compact file-log
  * approach would be the follow-up.
  */
final class LogMicroBatchStream(
    opts: LogOptions,
    required: StructType,
    paths: Seq[String],
    checkpointLocation: String)
    extends MicroBatchStream {

  private val spark = SparkSession.active
  private val hadoopConf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)

  override def initialOffset(): Offset = LogStreamOffset(Nil)

  override def latestOffset(): Offset =
    LogStreamOffset(listFiles().map(_.getPath.toString).sorted)

  override def deserializeOffset(json: String): Offset = LogStreamOffset.fromJson(json)

  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[LogStreamOffset].files.toSet
    val target = end.asInstanceOf[LogStreamOffset].files.toSet
    val fresh = listFiles().filter(f => {
      val p = f.getPath.toString
      target.contains(p) && !seen.contains(p)
    })
    val conf = org.apache.spark.sql.GraftSql.sqlConf(spark)
    LogScan.pack(
      fresh.map(f => LogChunk(f.getPath.toString, 0, f.getLen)),
      conf.filesMaxPartitionBytes, conf.filesOpenCostInBytes)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LogPartitionReaderFactory(opts, required, hadoopConf)

  override def stop(): Unit = ()

  private def listFiles(): Seq[FileStatus] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val out = ArrayBuffer.empty[FileStatus]
    paths.foreach { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      Option(fs.globStatus(hp)).getOrElse(Array.empty).foreach { st =>
        if (st.isFile) out += st
        else
          fs.listStatus(st.getPath).foreach { f =>
            if (f.isFile && LogScan.matchesExtension(f.getPath.getName, opts.extensions)) out += f
          }
      }
    }
    out.toSeq
  }
}

/** Offset = sorted set of already-ingested file paths. */
final case class LogStreamOffset(files: Seq[String]) extends Offset {
  override def json(): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.writeValueAsString(files.toArray)
  }
}

object LogStreamOffset {
  def fromJson(json: String): LogStreamOffset = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    LogStreamOffset(m.readValue(json, classOf[Array[String]]).toSeq)
  }
}
