package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming EWMA control chart — the always-on anomaly monitor for
  * per-series metric streams (ingestion-rate spikes, quality-score
  * collapses): each series keeps an exponentially-weighted mean AND
  * variance (the Welford-EW recurrence) in `transformWithState` state,
  * flagging any observation whose deviation from the pre-update mean
  * exceeds `k·σ_ew` once `minObs` observations have seeded the chart.
  *
  * The recurrence (per series, in (ts, event_id) order):
  *   dev     = x − ewma
  *   alert   ⇔ n ≥ minObs ∧ dev² > k²·ewvar
  *   ewma   += α·dev
  *   ewvar   = (1−α)·(ewvar + α·dev²)
  *
  * Determinism: within a micro-batch the rows of one key are sorted by
  * (ts, event_id) before folding — streaming iterators carry no order.
  * PRECONDITION: micro-batches must PARTITION each series' stream in
  * (ts, event_id) order — no batch may deliver an event older than one
  * a previous batch already folded into the state (the EW recurrence is
  * order-defined and cannot retract). Under that precondition the
  * stream emits exactly the alerts the single-pass batch recurrence
  * does, wherever the batch boundaries fall (the spec proves the
  * stream ≡ batch identity; q249 mtime-stamps its source files to
  * satisfy the precondition). State is 3 doubles + a long per series;
  * shuffles carry only each batch.
  */
object ControlChart {

  case class Obs(series: Long, ts: Long, event_id: Long, x: Double)
  case class ChartState(n: Long, ewma: Double, ewvar: Double)
  case class Alert(series: Long, event_id: Long, x: Double,
      ewma_before: Double, sigma_before: Double)

  class ChartProcessor(alpha: Double, k: Double, minObs: Int)
      extends StatefulProcessor[Long, Obs, Alert] {
    @transient private var st: ValueState[ChartState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[ChartState]("chart",
        Encoders.product[ChartState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Obs],
        timerValues: TimerValues): Iterator[Alert] = {
      var s = if (st.exists()) st.get() else ChartState(0L, 0.0, 0.0)
      val out = Vector.newBuilder[Alert]
      // batch iterators are unordered; the chart is order-defined
      rows.toVector.sortBy(o => (o.ts, o.event_id)).foreach { o =>
        val dev = o.x - s.ewma
        if (s.n >= minObs && dev * dev > k * k * s.ewvar)
          out += Alert(key, o.event_id, o.x, s.ewma, math.sqrt(s.ewvar))
        s =
          if (s.n == 0L) ChartState(1L, o.x, 0.0)
          else ChartState(s.n + 1, s.ewma + alpha * dev,
            (1 - alpha) * (s.ewvar + alpha * dev * dev))
      }
      st.update(s)
      out.result().iterator
    }
  }

  /** The same recurrence as a driver-free single-pass reference over a
    * BATCH DataFrame (per-series sorted fold via flatMapGroups) — the
    * identity the stream is held to. */
  def batchAlerts(df: Dataset[Obs], alpha: Double, k: Double,
      minObs: Int): Dataset[Alert] = {
    implicit val aEnc: org.apache.spark.sql.Encoder[Alert] =
      Encoders.product[Alert]
    df.groupByKey(_.series)(Encoders.scalaLong)
      .flatMapGroups { (key: Long, rows: Iterator[Obs]) =>
        var s = ChartState(0L, 0.0, 0.0)
        val out = Vector.newBuilder[Alert]
        rows.toVector.sortBy(o => (o.ts, o.event_id)).foreach { o =>
          val dev = o.x - s.ewma
          if (s.n >= minObs && dev * dev > k * k * s.ewvar)
            out += Alert(key, o.event_id, o.x, s.ewma, math.sqrt(s.ewvar))
          s =
            if (s.n == 0L) ChartState(1L, o.x, 0.0)
            else ChartState(s.n + 1, s.ewma + alpha * dev,
              (1 - alpha) * (s.ewvar + alpha * dev * dev))
        }
        out.result().iterator
      }
  }

  /** Drain an observation stream (AvailableNow) through the chart into a
    * memory table; requires the RocksDB provider (set for the run). */
  def runChart(stream: Dataset[Obs], alpha: Double, k: Double, minObs: Int,
      queryName: String): DataFrame = {
    val spark = stream.sparkSession
    implicit val aEnc: org.apache.spark.sql.Encoder[Alert] =
      Encoders.product[Alert]
    StatefulLifetime.withRocksDb(spark) {
      val out = stream.groupByKey(_.series)(Encoders.scalaLong)
        .transformWithState(new ChartProcessor(alpha, k, minObs),
          TimeMode.None(), OutputMode.Append())
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft_chart_$queryName").toString
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(queryName)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    spark.table(queryName)
  }
}
