package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** Streaming correctness = batch equivalence: the streamed windowed
  * aggregations must equal the same aggregation computed in batch mode.
  */
class StreamingSpec extends SparkSpec {

  test("streaming tumbling window == batch window aggregation") {
    val streamed = StreamingOps.queries("q_stream_tumbling")(spark, sfDir)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = Tables(spark, sfDir, "events")
      .groupBy(window(col("ts"), "300 seconds").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("val_sum"))
      .select(col("w.start"), col("event_type"), col("n"), col("val_sum"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup == batch distinct") {
    val streamed = StreamingOps.queries("q_stream_dedup")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val batch = Tables(spark, sfDir, "events")
      .select("event_id", "event_type").distinct()
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(streamed == batch)
  }

  test("session windows: gap property holds (no intra-session gap >= 30 min)") {
    val sessions = StreamingOps.queries("q_session_window")(spark, sfDir).collect()
    val events = Tables(spark, sfDir, "events")
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // total session events == total events
    assert(sessions.map(_.getLong(2)).sum == events.values.map(_.length).sum)
    // session count per user == number of >= 30min gaps + 1
    val gapMs = 30L * 60 * 1000
    val expectedCounts = events.map { case (u, ts) =>
      u -> (1 + ts.sliding(2).count(p => p.length == 2 && p(1) - p(0) >= gapMs))
    }
    val gotCounts = sessions.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(gotCounts == expectedCounts)
  }
}
