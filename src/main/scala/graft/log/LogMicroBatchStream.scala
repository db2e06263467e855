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
    // Replay-safe: the batch is defined by the OFFSETS (end \ start), not by
    // a fresh directory listing — a checkpointed batch must replay the same
    // files after restart; a file named in `end` that has since vanished is
    // a hard error, not silent data loss.
    val seen = start.asInstanceOf[LogStreamOffset].files.toSet
    val fresh = end.asInstanceOf[LogStreamOffset].files.filterNot(seen)
    val conf = spark.sparkContext.hadoopConfiguration
    val chunks = fresh.map { p =>
      val hp = new Path(p)
      val st = try hp.getFileSystem(conf).getFileStatus(hp)
      catch {
        case e: java.io.FileNotFoundException =>
          throw new org.apache.spark.SparkException(
            s"[log] committed stream offset references missing file $p " +
              "(deleted before its batch completed?)", e)
      }
      LogChunk(p, 0, st.getLen)
    }
    val sqlConf = org.apache.spark.sql.GraftSql.sqlConf(spark)
    LogScan.pack(chunks, sqlConf.filesMaxPartitionBytes, sqlConf.filesOpenCostInBytes)
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
      def walk(st: FileStatus): Unit =
        if (st.isFile) {
          if (LogScan.matchesExtension(st.getPath.getName, opts.extensions)) out += st
        } else fs.listStatus(st.getPath).foreach(walk) // recursive, matching the batch scan
      Option(fs.globStatus(hp)).getOrElse(Array.empty).foreach { st =>
        if (st.isFile) out += st // explicit file: read regardless of extension
        else walk(st)
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
