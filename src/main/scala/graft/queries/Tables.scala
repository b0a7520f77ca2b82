package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Testdata table loaders + cross-engine determinism helpers.
  *
  * Every judged query must hash-match a DuckDB oracle on the same parquet
  * (TESTDATA.md). Two engine-difference hazards are handled centrally:
  *
  *  1. `events.ts` has drifted across driver fixture generations:
  *     originally parquet TIMESTAMP(NANOS) (which Spark's reader rejects,
  *     so we read it as epoch-nanos long via
  *     `spark.sql.legacy.parquet.nanosAsLong` and truncate to micros),
  *     currently TIMESTAMP(MICROS) (read natively as TIMESTAMP_NTZ).
  *     [[events]] dispatches on the schema it actually finds and
  *     normalizes either form to microsecond `TimestampType` in the UTC
  *     session zone — the exact value DuckDB produces with
  *     `CAST(ts AS TIMESTAMP)`. `EventsFixtureSpec` is the drift canary:
  *     it fails loudly if the fixture changes to a third encoding.
  *  2. Double aggregation order differs between engines (and between runs
  *     of a parallel engine), so judged sums go through exact,
  *     order-independent decimal arithmetic: cast each term to a decimal
  *     whose scale matches the data's true decimal structure (money/qty
  *     columns are 2-decimal; two-factor products 4; three-factor 6), sum
  *     exactly, cast the total back to double. Identical in any engine at
  *     any parallelism — this is also the right 100 TB answer, since it
  *     makes results independent of partitioning and retries.
  */
object Tables {

  /** One parquet table from the sf dir. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** A table about to feed a CPU-heavy narrow derivation (per-shingle
    * md5, tokenization, signature folds), rebalanced to cluster
    * parallelism IF the source is under-split. A small-sf parquet is
    * one input split, so without this the whole hashing pass runs on
    * one core of 32; a 100 TB table has thousands of splits, takes the
    * `else` branch, and never pays the shuffle. The round-robin
    * exchange moves only the raw rows — cheap relative to the per-row
    * hashing it parallelizes.
    */
  def tBalanced(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = t(spark, dir, name)
    val parallelism = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < parallelism) df.repartition(parallelism)
    else df
  }

  /** `events` with ts normalized to microsecond TimestampType (see above).
    * Schema-dispatched so both known fixture encodings work: epoch-nanos
    * long (legacy TIMESTAMP(NANOS) fixture) and native TIMESTAMP(MICROS).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case TimestampNTZType =>
        // NTZ wall-clock reinterpreted in the UTC session zone — identical
        // micros value to the legacy path and to DuckDB's TIMESTAMP read.
        df.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.ts fixture drifted to unsupported type $other; " +
            "update Tables.events dispatch")
    }
  }

  /** Exact decimal image of a double column at the data's decimal scale. */
  def dec(c: Column, scale: Int): Column = c.cast(DecimalType(38, scale))

  /** Order-independent sum of a double column: exact decimal sum → double. */
  def dsum(c: Column, scale: Int): Column = sum(dec(c, scale)).cast(DoubleType)

  /** Decimal-typed sum (for ratios computed in double afterwards). */
  def dsumDec(c: Column, scale: Int): Column = sum(dec(c, scale))

  /** Exact row count of a parquet table from file FOOTER metadata only —
    * a driver-side open of each footer (KBs each), no Spark job, no data
    * pages read. This is how capacity bounds (bloom filter sizing, hash
    * table pre-allocation) should be derived at 100 TB: the count is
    * already materialized in the layout, so never pay a scan for it.
    */
  def parquetRowCount(spark: SparkSession, dir: String, name: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = root.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }.toSeq
      else Seq(fs.getFileStatus(root))
    files.map { st =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromStatus(st, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
  }
}
