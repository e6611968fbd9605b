package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream

/** Streaming/batch agreement on the sf0.001 events table. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stream hourly agg (AvailableNow) == batch date_trunc plan (q08)") {
    val stream = EventStream.hourlyAvailableNow(spark, TestSpark.Sf0001)
    val batch = Queries.byName("q08_events_hourly").fn(spark, TestSpark.Sf0001)
    assert(stream.count() > 0)
    assert(stream.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(stream).count() === 0)
  }

  test("stateful sessionization (flatMapGroupsWithState) == batch window sessionization (q09)") {
    val streamed = EventStream.sessionCounts(Tables.events(spark, TestSpark.Sf0001))
      .select(col("user_id"), col("n_sessions"), col("n_events"))
    val batch = Queries.byName("q09_sessionize").fn(spark, TestSpark.Sf0001)
      .select(col("user_id"), col("n_sessions"), col("n_events"))
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
  }

  test("watermarked variant builds a valid streaming plan") {
    val plan = EventStream.hourlyWatermarked(EventStream.read(spark, TestSpark.Sf0001))
    assert(plan.isStreaming)
  }
}
