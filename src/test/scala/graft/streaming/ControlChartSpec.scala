package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ControlChartSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import ControlChart._

  /** Hand recurrence (the definition). */
  private def reference(obs: Seq[Obs], alpha: Double, k: Double,
      minObs: Int): Seq[Alert] = {
    obs.groupBy(_.series).toSeq.flatMap { case (series, rows) =>
      var n = 0L; var ewma = 0.0; var ewvar = 0.0
      rows.sortBy(o => (o.ts, o.event_id)).flatMap { o =>
        val dev = o.x - ewma
        val alert = if (n >= minObs && dev * dev > k * k * ewvar)
          Some(Alert(series, o.event_id, o.x, ewma, math.sqrt(ewvar)))
        else None
        if (n == 0L) { ewma = o.x; ewvar = 0.0 }
        else { ewma += alpha * dev; ewvar = (1 - alpha) * (ewvar + alpha * dev * dev) }
        n += 1
        alert
      }
    }
  }

  private def mkObs(): Seq[Obs] = {
    val rnd = new scala.util.Random(19)
    (0 until 120).map { i =>
      val series = (i % 3).toLong
      // baseline noise with occasional 10x spikes
      val x = if (i % 17 == 0) 50.0 + rnd.nextDouble()
        else 5.0 + rnd.nextDouble()
      Obs(series, ts = i.toLong * 1000, event_id = i.toLong, x = x)
    }
  }

  test("batchAlerts equals the hand recurrence and actually fires on spikes") {
    val obs = mkObs()
    val want = reference(obs, 0.3, 3.0, 5).toSet
    val got = batchAlerts(obs.toDS(), 0.3, 3.0, 5).collect().toSet
    assert(got == want)
    assert(want.nonEmpty, "spiked data must raise alerts")
    assert(want.forall(_.x > 40.0), "only the spikes should alert")
  }

  test("stream across arbitrary time-ordered batch splits ≡ batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val obs = mkObs().sortBy(o => (o.ts, o.event_id))
    val want = reference(obs, 0.3, 3.0, 5).toSet
    for (splits <- Seq(Seq(40, 80), Seq(7, 30, 77, 119))) {
      val name = s"t_chart_${splits.mkString("_")}"
      val chunks = (Seq(0) ++ splits ++ Seq(obs.length))
        .sliding(2).map { case Seq(a, b) => obs.slice(a, b) }.toSeq
      val in = MemoryStream[Obs]
      val got = StatefulLifetime.withRocksDb(spark) {
        implicit val aEnc: org.apache.spark.sql.Encoder[Alert] =
          org.apache.spark.sql.Encoders.product[Alert]
        val out = in.toDS()
          .groupByKey(_.series)(org.apache.spark.sql.Encoders.scalaLong)
          .transformWithState(
            new ChartProcessor(0.3, 3.0, 5),
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Append())
        val ckpt = java.nio.file.Files
          .createTempDirectory(s"graft_chart_spec").toString
        val q = out.writeStream.outputMode("append")
          .format("memory").queryName(name)
          .option("checkpointLocation", ckpt).start()
        chunks.foreach { c => in.addData(c); q.processAllAvailable() }
        q.stop()
        spark.table(name).as[Alert].collect().toSet
      }
      assert(got == want, s"splits=$splits: ${got.size} vs ${want.size}")
    }
  }
}
