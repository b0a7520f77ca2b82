package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's ETL main loop re-expressed (reference:
  * etl.py:189-240): poll payloads in, one transform per endpoint,
  * append to the per-table sink with the `id SERIAL` and
  * `timestamp DEFAULT CURRENT_TIMESTAMP` columns the DDL injects
  * (reference: init-db.sql:4,7 etc.).
  */
object Ingest {

  /** `SERIAL` analog. Spark has no engine-native serial; two honest
    * options (SURVEY.md §1.2):
    *  - contiguous: `row_number()` over an explicit total order — one
    *    global sort; only for per-micro-batch-sized data (as here: a
    *    poll cycle is ≤ ~160 rows);
    *  - scale path: `monotonically_increasing_id()` — unique,
    *    partition-parallel, NOT contiguous.
    */
  def withSerialId(df: DataFrame, order: Seq[Column], startAt: Long = 1L): DataFrame =
    df.withColumn("id",
      (row_number().over(Window.orderBy(order: _*)) + (startAt - 1))
        .cast("int"))

  def withSerialIdAtScale(df: DataFrame): DataFrame =
    df.withColumn("id", monotonically_increasing_id())

  /** `DEFAULT CURRENT_TIMESTAMP` analog, injected at write time
    * (reference: init-db.sql:7). Parameterize the clock for tests.
    */
  def withIngestTimestamp(df: DataFrame, clock: Column = current_timestamp()): DataFrame =
    df.withColumn("timestamp", clock)

  /** One poll cycle for one endpoint: transform, stamp id + timestamp,
    * append — the body of the reference's per-endpoint branch
    * (reference: etl.py:210-237).
    */
  def ingestBatch(transformed: DataFrame, idOrder: Seq[Column],
                  sinkPath: String, clock: Column = current_timestamp()): Unit =
    graft.sinks.Sinks.appendParquet(
      withIngestTimestamp(withSerialId(transformed, idOrder), clock),
      sinkPath)
}
