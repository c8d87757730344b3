package graft.streaming

import graft.streaming.Streams.RateEvent
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST7 marker-triggered accumulation (spark_kafka.py:71–96,127): the
  * reference buffers every consumed rating in a driver-side Python list
  * and, when a message with song tag 'm3' arrives, runs the
  * retrain+recommend pipeline over the buffer and clears it.
  *
  * Re-expressed as the one genuinely stateful streaming operator in
  * the system: `flatMapGroupsWithState` keyed by userid. Each user's
  * pending ratings live in the state store (checkpointed, partitioned
  * by key — not on the driver), and the arrival of that user's marker
  * event flushes the buffer downstream as one emission. At scale this
  * is exactly Spark's streaming sessionization shape: state volume is
  * bounded by in-flight (unflushed) events per user, and the shuffle
  * key is the user id.
  */
object MarkerBuffer {

  /** A flushed rating with its flush ordinal: flushSeq = how many
    * flushes this user has seen (1-based), so downstream can group one
    * flush's batch back together.
    */
  case class Flushed(userid: Int, tag: String, songid: Int, rating: Int,
      flushSeq: Int)

  /** Per-user state: buffered (unflushed) events + flush count. Public
    * because Spark's state-store encoder codegen needs the accessors.
    */
  case class Pending(events: Seq[RateEvent], flushes: Int)

  /** Buffer per-user events until `marker` tag arrives; emit the whole
    * buffer (marker event included, input order preserved) tagged with
    * the flush ordinal. Non-marker events emit nothing.
    */
  def markerFlush(events: Dataset[RateEvent], marker: String = "m3")
      : Dataset[Flushed] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userid)
      .flatMapGroupsWithState[Pending, Flushed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, it: Iterator[RateEvent], state: GroupState[Pending]) =>
          val prior = state.getOption.getOrElse(Pending(Vector.empty, 0))
          var buf = prior.events.toVector
          var flushes = prior.flushes
          val out = List.newBuilder[Flushed]
          it.foreach { e =>
            buf = buf :+ e
            if (e.tag == marker) {
              flushes += 1
              out ++= buf.map(b =>
                Flushed(b.userid, b.tag, b.songid, b.rating, flushes))
              buf = Vector.empty
            }
          }
          state.update(Pending(buf, flushes))
          out.result().iterator
      }
  }
}
