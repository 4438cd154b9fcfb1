package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Arbitrary-state streaming on the Spark 4 `transformWithState` API
  * (state v2): typed per-key state variables (`ValueState` / `MapState`)
  * managed by the RocksDB state store — the successor to
  * `flatMapGroupsWithState` used by the stateful-dedup path, with
  * per-variable schemas, TTL support, and no monolithic state case class.
  *
  * The operator keeps PER-USER LIFETIME stats over an event stream:
  * event count, per-event-type counts (a MapState — bounded by the type
  * vocabulary, not the stream), and the running value sum. Every input
  * batch emits the updated totals for the touched keys (Update mode), so
  * downstream sees a change-log of user aggregates — the serving shape of
  * a live per-entity profile at 100 TB/day: state is O(users · types),
  * shuffles carry only the incoming batch, and the RocksDB store spills
  * past memory.
  */
object StatefulLifetime {

  case class UserEvent(user_id: Long, event_type: String, value: Double)
  case class Totals(n: Long, sum: Double)
  case class UserLifetime(user_id: Long, n_events: Long, n_types: Long,
      total_value: Double)

  /** Per-user lifetime aggregator: ValueState for (count, sum), MapState
    * for per-type counts. Emits one updated row per touched key per
    * batch. */
  class LifetimeProcessor
      extends StatefulProcessor[Long, UserEvent, UserLifetime] {
    @transient private var totals: ValueState[Totals] = _
    @transient private var typeCounts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      totals = getHandle.getValueState[Totals]("totals",
        Encoders.product[Totals], TTLConfig.NONE)
      typeCounts = getHandle.getMapState[String, Long]("typeCounts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[UserLifetime] = {
      var t = if (totals.exists()) totals.get() else Totals(0L, 0.0)
      rows.foreach { e =>
        t = Totals(t.n + 1, t.sum + e.value)
        val et = if (e.event_type == null) "" else e.event_type
        val prev = if (typeCounts.containsKey(et)) typeCounts.getValue(et)
          else 0L
        typeCounts.updateValue(et, prev + 1L)
      }
      totals.update(t)
      Iterator.single(
        UserLifetime(key, t.n, typeCounts.keys().size.toLong, t.sum))
    }
  }

  /** Drain `stream` (AvailableNow) through the processor into a memory
    * table named `queryName`; returns the change-log of per-user totals.
    * transformWithState requires the RocksDB state store — the provider
    * is set for the query's lifetime and restored after. */
  def runLifetime(stream: Dataset[UserEvent],
      queryName: String): DataFrame = {
    val spark = stream.sparkSession
    withRocksDb(spark) {
      val q = startLifetime(stream, queryName, availableNow = true)
      q.awaitTermination()
    }
    spark.table(queryName)
  }

  /** Start the lifetime query without waiting — callers drive the
    * micro-batches (`processAllAvailable`) and stop it themselves.
    * transformWithState requires the RocksDB state store provider; use
    * [[withRocksDb]] around the whole drive. */
  def startLifetime(stream: Dataset[UserEvent], queryName: String,
      availableNow: Boolean): StreamingQuery = {
    implicit val ulEnc: org.apache.spark.sql.Encoder[UserLifetime] =
      Encoders.product[UserLifetime]
    val out = stream
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new LifetimeProcessor, TimeMode.None(),
        OutputMode.Update())
    val ckpt = java.nio.file.Files
      .createTempDirectory(s"graft_tws_$queryName").toString
    val w = out.writeStream.outputMode("update")
      .format("memory").queryName(queryName)
      .option("checkpointLocation", ckpt)
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** Run `body` with the RocksDB state store provider set, restoring the
    * previous provider after. */
  def withRocksDb[A](spark: org.apache.spark.sql.SparkSession)(body: => A): A = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally {
      oldProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  /** Final per-user totals from the Update-mode change-log: n_events is
    * strictly increasing per emitted row, so the struct-max keyed on it
    * selects the LAST state row regardless of the other columns' signs. */
  def finalTotals(changeLog: DataFrame): DataFrame =
    changeLog.groupBy("user_id")
      .agg(max(struct(col("n_events"), col("n_types"), col("total_value")))
        .as("s"))
      .select(col("user_id"), col("s.n_events").as("n_events"),
        col("s.n_types").as("n_types"),
        round(col("s.total_value"), 2).as("total_value"))
}
