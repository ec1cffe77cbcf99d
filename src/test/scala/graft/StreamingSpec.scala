package graft

import graft.streaming.EventsStream

/** Structured Streaming ingestion: the streaming windowed aggregation must
  * agree with its batch twin on the static events fixture. */
class StreamingSpec extends SparkSpec {

  test("streaming windowed agg matches batch result") {
    val streamed = EventsStream.runOnce(spark, sf001, "ev_agg_test")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    val batch = EventsStream.batch(spark, sf001)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
