package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink surface beyond the primary parquet corpus (SURVEY §2.1).
  *
  * Policy: the engine standardizes on EXPLICIT schemas for text formats
  * (csv/json) — schema inference is a convenience for exploration, not a
  * pipeline contract; at 100 TB an inference pass is a full extra scan and
  * a type-drift hazard. Parquet/ORC carry footer schemas.
  *
  * Scale notes: `writePartitioned`/`readParquet` + a partition-column
  * filter give partition PRUNING — the scan touches only matching
  * directories, which is the difference between reading 100 TB and reading
  * one partition. Verified by OperatorGoldenSpec, which asserts the pruned
  * plan's PartitionFilters.
  */
object Sources {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** XML round-trip via Spark 4's BUILT-IN xml data source (the spark-xml
    * package was folded into core in 4.0 — no extra dependency). Schema is
    * supplied on read: XML carries no type metadata, so inference would
    * widen int columns to long and break lossless round-trips. */
  def writeXml(df: DataFrame, path: String, rowTag: String = "row"): Unit =
    df.write.mode("overwrite").option("rowTag", rowTag).format("xml").save(path)

  def readXml(spark: SparkSession, path: String, schema: StructType,
              rowTag: String = "row"): DataFrame =
    spark.read.option("rowTag", rowTag).schema(schema).format("xml").load(path)

  /** Malformed-record-tolerant JSON ingestion (real feeds are never clean):
    * PERMISSIVE mode parses what it can and routes each unparseable line
    * into `_corrupt_record` instead of failing the job — the caller splits
    * good rows from a quarantine stream and neither a single bad line nor
    * a bad FILE kills a 100 TB ingest. Row-local, no extra pass. */
  def readJsonTolerant(spark: SparkSession, path: String,
                       schema: StructType): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", "string"))
      .json(path)

  /** Range-clustered parquet sink: `repartitionByRange` + an in-partition
    * sort on `keys` before writing. Every output file then covers a
    * DISJOINT key range, so parquet's per-file/row-group min-max statistics
    * let a key-range scan skip everything else — the zone-map/clustering
    * complement to [[writePartitioned]] (coarse directory pruning) and
    * [[writeBucketed]] (join co-location): use THIS when the hot predicate
    * is a range, not equality. OperatorGoldenSpec asserts the written
    * files' key ranges are pairwise disjoint. */
  def writeRangeClustered(df: DataFrame, path: String, files: Int,
                          keys: Seq[String]): Unit =
    df.repartitionByRange(files, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode("overwrite").parquet(path)

  /** Bit-interleaved Z-order key over two non-negative integer columns
    * (each using the low `bits` bits): bit i of `a` lands at position 2i,
    * bit i of `b` at 2i+1. Locality in the key ⇒ locality in BOTH
    * dimensions, which is what makes multi-column clustering skip files on
    * EITHER predicate — a single-column sort gives perfect skipping on one
    * dimension and none on the other. Row-local arithmetic, no shuffle. */
  def zOrderKey(a: Column, b: Column, bits: Int = 16): Column =
    zOrderKeyN(Seq(a, b), bits)

  /** N-dimensional Z-order key: bit i of dimension d lands at position
    * i·N + d (round-robin interleave). All dimensions must be non-negative
    * integers fitting `bits` bits, and N·bits must fit a long. */
  def zOrderKeyN(dims: Seq[Column], bits: Int): Column = {
    val n = dims.size
    require(n >= 2, s"need at least 2 dimensions, got $n")
    require(bits >= 1 && n * bits <= 62,
      s"$n dims × $bits bits must fit a long's 62 usable bits")
    val terms = for {
      i <- 0 until bits
      (c, d) <- dims.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + d)
    terms.reduce(_ bitwiseOR _)
  }

  /** Z-order-clustered parquet sink (the OPTIMIZE ZORDER technique):
    * range-partition and sort by the interleaved key so each output file
    * covers a small bounding BOX in (c1, c2) — per-file min-max statistics
    * then skip whole files for range predicates on EITHER column. The
    * range partitioning samples the key (one pass) and the sort is
    * per-file; nothing is driver-side. */
  def writeZOrdered(df: DataFrame, path: String, files: Int,
                    c1: String, c2: String, bits: Int = 16): Unit =
    writeZOrderedN(df, path, files, Seq(c1, c2), bits)

  def writeZOrderedN(df: DataFrame, path: String, files: Int,
                     cols: Seq[String], bits: Int): Unit = {
    val z = zOrderKeyN(cols.map(col), bits)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Hive-style partitioned parquet sink: one directory per value of
    * `partitionCols`. Readers filtering on those columns scan only the
    * matching directories (partition pruning). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Raw-file ingestion for the multimodal pipeline: each file becomes one
    * row of (path, modificationTime, length, content binary) — the entry
    * point that turns a directory of images/audio/video into the binary
    * column the q06/q09/q75/q95 kernels consume. `pathGlobFilter` prunes
    * by extension at LISTING time (no content read for filtered files);
    * at 100 TB pair it with `spark.sql.files.maxPartitionBytes` so many
    * small payloads pack into one task. */
  def readBinaryFiles(spark: SparkSession, path: String,
                      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)

  /** Bucketed table sink: persist with `bucketBy(n, cols)` so future joins
    * and aggregations on the bucket columns need NO shuffle — both sides
    * arrive pre-partitioned on disk. At 100 TB this is the difference
    * between re-shuffling the fact table on every join and shuffling it
    * exactly once at write time. Requires `saveAsTable` (bucket metadata
    * lives in the catalog, not the parquet footer); PlanRegressionSpec
    * asserts a bucketed-bucketed equi join plans with zero Exchange. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Small-files compaction: rewrite a parquet directory into
    * ceil(bytes / targetBytes) files. Streaming sinks, frequent small
    * appends and over-parallel writers all accrete thousands of tiny files;
    * at 100 TB that means task-scheduling overhead and NameNode/listing
    * pressure dominating scans, so periodic compaction is a standing
    * pipeline chore. Sizing reads the file system's own byte count (never
    * a data scan); the rewrite goes through a temp directory, the original
    * is renamed ASIDE (not deleted) before the swap, and only a fully
    * completed swap drops it — so a crash at any step leaves a complete
    * copy of the data on disk (under `path`, `path__compact_old`, or
    * `path__compact_tmp`; rename is atomic per step on HDFS-like stores,
    * though the full sequence is not one atomic operation). `coalesce`
    * (not `repartition`) — merging partitions needs no shuffle. */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): Unit = {
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hadoopPath).getLength
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    val old = new org.apache.hadoop.fs.Path(path + "__compact_old")
    spark.read.parquet(path).coalesce(n)
      .write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true) // leftover from a prior crash
    if (!fs.rename(hadoopPath, old))
      throw new java.io.IOException(s"compaction: cannot set aside $path")
    if (!fs.rename(tmp, hadoopPath)) {
      // roll back — original untouched; if even the rollback rename fails,
      // say WHERE the data actually is instead of implying it's back in place
      val rolledBack = fs.rename(old, hadoopPath)
      val dataAt = if (rolledBack) path else old.toString
      throw new java.io.IOException(
        s"compaction swap failed for $path; original data is at $dataAt")
    }
    fs.delete(old, true)
  }

  /** Skew-safe aggregation pattern: two-phase groupBy with an explicit salt.
    * Phase 1 aggregates on (key, salt) — spreading one hot key over
    * `saltBuckets` reducers — phase 2 merges the partials on the key alone.
    * Semantically identical to a direct groupBy-sum (addition is
    * associative); PropertySpec asserts the equivalence. AQE's skew-join
    * handling covers JOINS automatically, but aggregation-side hot keys
    * still need this pattern (or partial-agg push-down, which salting
    * generalizes to deliberately-placed reducers). */
  def saltedSum(df: DataFrame, key: Column, value: Column, saltBuckets: Int): DataFrame =
    df.select(key.as("k"), value.as("v"))
      .withColumn("salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(col("k"), col("salt")).agg(sum("v").as("partial"))
      .groupBy(col("k")).agg(sum("partial").as("total"))
}
