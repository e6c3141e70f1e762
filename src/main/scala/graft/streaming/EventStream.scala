package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

/** Structured Streaming operators over the events table (builder brief:
  * readStream → transforms → writeStream; watermarks + windowed aggs;
  * mapGroupsWithState for custom state).
  *
  * At production scale the source is Kafka/queue; here the driver-generated
  * events parquet (staged into a directory) stands in via the file source — the plan (watermark,
  * window, state store) is identical.
  */
object EventStream {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Event-time windowed aggregation with a watermark (late data dropped
    * after 1 hour): 15-minute tumbling counts per event type.
    */
  def windowedCounts(spark: SparkSession, eventsDir: String,
                     queryName: String = "graft_event_windows"): StreamingQuery = {
    val src = spark.readStream.schema(eventsSchema).parquet(eventsDir)
    src.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
  }

  final case class SessionState(nEvents: Long, total: Double)
  final case class UserSession(user_id: Long, n_events: Long, total_value: Double)

  /** Custom stateful aggregation: running per-user session state via
    * mapGroupsWithState (the KeyValueGroupedDataset state-store path).
    */
  def userSessions(spark: SparkSession, eventsDir: String,
                   queryName: String = "graft_user_sessions"): StreamingQuery = {
    import spark.implicits._
    val src = spark.readStream.schema(eventsSchema).parquet(eventsDir)
      .select(col("user_id").as[Long], col("value").as[Double])
      .as[(Long, Double)]
    val out = src.groupByKey(_._1)
      .mapGroupsWithState[SessionState, UserSession](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(0L, 0.0))
          var n = prev.nEvents
          var tot = prev.total
          rows.foreach { case (_, v) => n += 1; tot += v }
          state.update(SessionState(n, tot))
          UserSession(uid, n, tot)
      }
    out.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .start()
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
