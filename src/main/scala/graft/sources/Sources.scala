package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.encode
import org.apache.spark.sql.types.StructType

/** Batch source/sink formats with explicit schemas. The reference's only
  * I/O is Kafka in / JDBC out (SURVEY.md §2.1); a complete engine also
  * reads and writes the lake formats. Schemas are always declared — never
  * inferred — matching the reference's consumer-side posture and avoiding
  * an extra inference scan at 100 TB. */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Partitioned layout: the scan prunes entire directories for filters on
    * the partition columns — the first lever at 100 TB (SCALE.md). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC: the columnar alternative when the lake standardizes on it —
    * same pushdown/pruning machinery as parquet (Spark bundles the ORC
    * reader natively). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** JDBC sink parity with the reference (streaming_job.py:26-34) —
    * exercised against embedded Derby in StreamingSpec; the streaming
    * upsert path is graft.streaming.JdbcUpsertSink. */
  def writeJdbc(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.format("jdbc").option("url", url).option("dbtable", table)
      .mode(mode).save()

  /** Materialize one opaque binary file per row — the fixture half of the
    * `binaryFile` source round-trip (the standard multimodal ingestion
    * path: images/audio land as files, Spark reads them as (path,
    * length, content) rows). Files are written EXECUTOR-side per
    * partition (no driver loop) through the Hadoop `FileSystem` API
    * resolved from the task-side configuration, so `dir` may be any
    * supported URI (hdfs://, s3a://, file:/) and on a multi-node
    * cluster every executor writes to the SAME shared filesystem — a
    * java.nio local-path write would scatter files across executor
    * local disks and the read-back would silently see only the driver
    * host's. The directory is deleted and recreated first (SaveMode
    * .Overwrite posture, like writeCsv), so rows removed from the
    * input can't leave stale files behind. Files are named `<id>.bin`;
    * bytes = the payload verbatim for a `binary` column, UTF-8 for a
    * string column. Idempotent: deterministic names + contents. */
  def writeBinaryFiles(df: DataFrame, idCol: String, payloadCol: String,
      dir: String): Unit = {
    import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
    val sc = df.sparkSession.sparkContext
    // Configuration implements Writable; SerializableWritable is the
    // public DeveloperApi wrapper that ships it into tasks.
    val confBc = sc.broadcast(
      new org.apache.spark.SerializableWritable(sc.hadoopConfiguration))
    val root = new Path(dir)
    val driverFs = root.getFileSystem(sc.hadoopConfiguration)
    driverFs.delete(root, true)
    driverFs.mkdirs(root)
    // Local-FS fast path: when `dir` resolves to the LOCAL filesystem
    // (single node, or an NFS/shared mount — the only configurations
    // where a file: target is cluster-correct at all, with or without
    // the Hadoop API), bytes go through java.nio directly. Hadoop's
    // local FS is a ChecksumFileSystem (a .crc sidecar per tiny file)
    // and, without native libs, forks a `chmod` PROCESS per created
    // file — measured 70× on 5000 files (0.5 → 38 s at sf0.1). Every
    // non-local scheme (hdfs://, s3a://, …) takes the FileSystem
    // stream path, which is where the multi-node portability lives.
    val nioDir =
      if (driverFs.isInstanceOf[LocalFileSystem] ||
        driverFs.isInstanceOf[RawLocalFileSystem]) Some(root.toUri.getPath)
      else None
    val isBinary = df.schema(payloadCol).dataType ==
      org.apache.spark.sql.types.BinaryType
    val payload =
      if (isBinary) df.col(payloadCol)
      else encode(df.col(payloadCol), "UTF-8")
    df.select(df.col(idCol).cast("string"), payload)
      .foreachPartition { rows: java.util.Iterator[org.apache.spark.sql.Row] =>
        nioDir match {
          case Some(local) =>
            while (rows.hasNext) {
              val r = rows.next()
              java.nio.file.Files.write(
                java.nio.file.Paths.get(local, r.getString(0) + ".bin"),
                r.getAs[Array[Byte]](1))
            }
          case None =>
            val p = new Path(dir)
            val fs = p.getFileSystem(confBc.value.value)
            while (rows.hasNext) {
              val r = rows.next()
              val out = fs.create(new Path(p, r.getString(0) + ".bin"), true)
              try out.write(r.getAs[Array[Byte]](1))
              finally out.close()
            }
        }
      }
  }

  /** `binaryFile` source: one row per file with (path, modificationTime,
    * length, content) — content capped by
    * spark.sql.sources.binaryFile.maxLength (2 GB default). */
  def readBinaryFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
}
