package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming lineage/metrics sink (SURVEY §2.8 P5: "lineage/metrics may
  * optionally stream via foreachBatch").
  *
  * The crawl engine appends fetchlog rows per wave under
  * `<store>/fetchlog/data/wave=*` — a Structured Streaming file source can
  * tail that directory and maintain live per-host metrics while the crawl
  * runs, exactly the shape of a production metrics pipeline (readStream →
  * windowless running agg → complete-mode sink; event-time windowed variants
  * in EventStream).
  */
object LineageStream {

  val fetchlogSchema: StructType = StructType(Seq(
    StructField("url", StringType), StructField("url_hash", LongType),
    StructField("host", StringType), StructField("host_rank", IntegerType),
    StructField("status", StringType), StructField("depth", IntegerType),
    StructField("seed_subject", StringType), StructField("seed_year", IntegerType),
    StructField("partition_id", IntegerType),
    StructField("candidates_in_wave", LongType),
    StructField("deduped_in_wave", LongType),
    StructField("blocked_in_wave", LongType),
    StructField("deferred_in_wave", LongType)))

  /** Live per-host fetch metrics over a crawl store's fetchlog directory.
    * Returns the running query; read results from the `graft_lineage_live`
    * in-memory table.
    */
  def start(spark: SparkSession, storeRoot: String): StreamingQuery = {
    val src = spark.readStream
      .schema(fetchlogSchema)
      .option("maxFilesPerTrigger", "32")
      .parquet(s"$storeRoot/fetchlog/data/wave=*")
    val agg = src.filter(col("status") =!= "summary")
      .groupBy(col("host"))
      .agg(count(lit(1)).as("attempted"),
        sum(when(col("status") === "ok", 1L).otherwise(0L)).as("fetched"),
        sum(when(col("status") === "error", 1L).otherwise(0L)).as("errors"),
        max(col("host_rank")).as("max_rank"))
    agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("graft_lineage_live")
      .start()
  }

  def snapshot(spark: SparkSession): DataFrame = spark.table("graft_lineage_live")
}
