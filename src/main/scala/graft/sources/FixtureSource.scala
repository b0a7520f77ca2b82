package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1 — HTTP REST poll source, offline form (SURVEY.md §2.1).
  *
  * The reference polls five REST endpoints every 60 s and parses the JSON
  * body (reference: etl.py:102-112,207-240). There is no built-in HTTP
  * source in Spark; the idiomatic shape is a thin driver-side fetch that
  * lands each poll result as one micro-batch, with the *parsing* done by
  * the engine (`from_json` with an explicit schema — never inference on a
  * 100 TB feed). In this zero-egress harness the fetch step replays
  * captured fixtures; the parse/normalize path is the real engine code.
  *
  * Server-side `limit=N` query params (reference: etl.py:216,222,228) are
  * limit pushdown to the source; [[replay]] models them with `limit(n)`
  * which Catalyst pushes into the scan (`GlobalLimit` over a pruned read).
  */
object FixtureSource {

  /** Parse one captured JSON payload (an array of records) into rows of
    * `schema`. P8 normalization: a bare JSON object is accepted wherever an
    * array is expected — Spark's `from_json` wraps a single object into a
    * 1-element array, exactly the reference's list-vs-dict branch
    * (reference: etl.py:116-119,162-165).
    */
  def parse(spark: SparkSession, payload: String, schema: StructType): DataFrame = {
    import spark.implicits._
    Seq(payload).toDF("body")
      .select(explode(from_json(col("body"), ArrayType(schema))).as("rec"))
      .select(col("rec.*"))
  }

  /** Positional-array payloads (klines): each record is itself a JSON array;
    * expose it as column `k` of ArrayType(StringType) — heterogeneous JSON
    * scalars all read back as their text form (reference: etl.py:146-152).
    */
  def parsePositional(spark: SparkSession, payload: String): DataFrame = {
    import spark.implicits._
    Seq(payload).toDF("body")
      .select(explode(from_json(col("body"),
        ArrayType(ArrayType(StringType)))).as("k"))
  }

  /** Replay a sequence of captured poll payloads as one batch, tagged with
    * the poll index — the batch analog of N trigger firings. `limitPerPoll`
    * models the reference's server-side `limit` param.
    */
  def replay(spark: SparkSession, payloads: Seq[String], schema: StructType,
             limitPerPoll: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val polls = payloads.zipWithIndex.toDF("body", "poll")
    val parsed = polls
      .select(col("poll"), explode(from_json(col("body"), ArrayType(schema))).as("rec"))
      .select(col("poll") +: schema.fieldNames.map(f => col(s"rec.$f")).toIndexedSeq: _*)
    limitPerPoll.fold(parsed)(n => parsed.limit(n))
  }
}
