package graft.cdc

import graft.SparkSpec
import graft.filters.FilterParser
import graft.model.Subscription
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** End-to-end CDC stream: MemoryStream → WALRUS → shaped frames on the bus,
  * including the load-shedding gate (O10). */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._
  import CdcStreamSpec.Change

  private def f(dsl: String) = FilterParser.parse(dsl).toOption.get

  lazy val subs = Seq(
    Subscription("sA", "public", "t", f("value=gt.50"), actionFilter = "INSERT"),
    Subscription("sB", "public", "t", Nil))

  lazy val dataSchema = Seq.empty[Change].toDS().toDF()
    .drop("change_type", "commit_timestamp").schema

  test("streamed changes arrive as encoded frames per subscriber") {
    val input = MemoryStream[Change](spark)
    val bus = new CdcStream.MemoryBus
    val q = CdcStream.start(input.toDF(), subs, dataSchema, "t",
      pk = Seq("id"), bus = bus, triggerMs = 10L)
    try {
      input.addData(
        Change(1, "INSERT", 60.0, "2024-01-01T00:00:00.000Z"),
        Change(2, "INSERT", 10.0, "2024-01-01T00:00:01.000Z"),
        Change(3, "UPDATE", 99.0, "2024-01-01T00:00:02.000Z"))
      q.processAllAvailable()
      val byId = bus.deliveries.groupBy(_.subscriptionId)
      // sA: INSERT and value>50 → change 1 only; sB: everything
      assert(byId("sA").size == 1 && byId("sB").size == 3)
      val frame = byId("sA").head.frame
      assert(frame.contains("\"type\":\"INSERT\"") && frame.contains("\"id\":1"))
      assert(bus.batches.exists(b => b.nDeliveries == 4 && !b.shed))
    } finally q.stop()
  }

  test("rate-limit gate sheds oversized batches with telemetry") {
    val input = MemoryStream[Change](spark)
    val bus = new CdcStream.MemoryBus
    val q = CdcStream.start(input.toDF(), subs, dataSchema, "t",
      pk = Seq("id"), bus = bus, maxEventsPerBatch = 2, triggerMs = 10L)
    try {
      input.addData((1 to 5).map(i =>
        Change(i, "INSERT", 60.0, s"2024-01-01T00:00:0$i.000Z")): _*)
      q.processAllAvailable()
      val shed = bus.batches.filter(_.shed)
      assert(shed.nonEmpty && shed.head.nChanges == 5 && shed.head.nDeliveries == 0)
      assert(bus.deliveries.isEmpty)
    } finally q.stop()
  }
}

object CdcStreamSpec {
  case class Change(id: Int, change_type: String, value: Double,
      commit_timestamp: String)
}
