package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S9/S10 key-value recommendation sinks (spark_kafka.py:124–126: the
  * reference does `r.hset('music', user_id, str(top_musics))` and
  * `music.insert_one({'user': …, 'music': top_musics})` from its
  * consume loop).
  *
  * The engine-side contract is: per micro-batch, fold each user's
  * top-K rows into ONE (key, value) upsert. [[KvSink]] is the client
  * seam — Redis/Mongo clients (not in this container) implement `put`
  * with hset/insert_one; executors call it per key from
  * `foreachPartition`, so the fan-out is partition-parallel and no
  * recommendation list ever routes through the driver.
  */
trait KvSink extends Serializable {
  def put(key: String, value: String): Unit
}

/** Test/local double: a JVM-static concurrent map keyed by instance
  * id — the sink object is closure-serialized into tasks, so instance
  * state would be written on a deserialized COPY; the static registry
  * makes writes visible to the test under local[*]. A cluster
  * deployment implements KvSink with a real Redis/Mongo client whose
  * connection is opened per partition.
  */
class InMemoryKvSink extends KvSink {
  private val id = java.util.UUID.randomUUID().toString
  InMemoryKvSink.stores.putIfAbsent(id,
    new java.util.concurrent.ConcurrentHashMap[String, String]())
  def store: java.util.concurrent.ConcurrentHashMap[String, String] = {
    InMemoryKvSink.stores.putIfAbsent(id,
      new java.util.concurrent.ConcurrentHashMap[String, String]())
    InMemoryKvSink.stores.get(id)
  }
  override def put(key: String, value: String): Unit = store.put(key, value)

  /** Drop this sink's map from the JVM-static registry (the registry
    * otherwise outlives the instance — fine for short-lived tests,
    * a leak for anything else).
    */
  def close(): Unit = InMemoryKvSink.stores.remove(id)
}

object InMemoryKvSink {
  private[streaming] val stores = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentHashMap[String, String]]()
}

object KvSink {

  /** Fold (userId, songId, prediction) recommendation rows into one
    * JSON array value per user — the typed analog of the reference's
    * `str(top_musics)` payload.
    */
  def recsPerUser(recs: DataFrame): DataFrame = {
    val s = recs.sparkSession
    import s.implicits._
    recs
      // the groupBy shuffle loses input order, so the ranked-list
      // contract is re-established inside the aggregation. Sorting
      // ascending on (-prediction, songId) matches recommendLoop's rank
      // window (prediction DESC, songId ASC) exactly — a descending
      // struct sort would flip songId on tied predictions
      .select($"userId", struct((-$"prediction").as("np"), $"songId").as("rec"))
      .groupBy($"userId")
      .agg(sort_array(collect_list($"rec")).as("recs"))
      .select($"userId".cast("string").as("key"),
        to_json(transform($"recs", r =>
          struct((-r("np")).as("prediction"), r("songId").as("songId")))).as("value"))
  }

  /** Write a micro-batch of recommendations: one upsert per user,
    * executed on the executors (foreachPartition), mirroring ST3's
    * per-batch output without the reference's driver-side collect.
    */
  def writeBatch(recs: DataFrame, sink: KvSink): Unit =
    recsPerUser(recs).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.foreach(r => sink.put(r.getString(0), r.getString(1)))
    }
}
