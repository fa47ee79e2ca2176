package graft.sources

import graft.cdc.CdcStream
import java.nio.charset.StandardCharsets.UTF_8

/** Outbound transport seam: a [[CdcStream.DeliverySink]] that appends
  * delivery frames to a [[ReplayLog]] topic — the produce-side twin of
  * the inbound DSv2 adapter. The reference's dispatch fastlane hands
  * encoded frames to the socket transport per subscriber
  * (/root/reference/lib/realtime/tenants/message_dispatcher.ex:134-161);
  * externalized, that hand-off is a produce to a partitioned,
  * offset-tracked log, which makes the outbound path replayable and
  * recovery-provable exactly like the inbound one (a crashed epoch's
  * frames are re-produced on replay — at-least-once — and any downstream
  * consumer dedups on (subscription, change identity)).
  *
  * Partitioning: frames are keyed by `subscriptionId` (hash-modded over
  * `numPartitions`), the Kafka keyed-produce convention — every
  * subscriber's frames land in ONE partition in produce order, so
  * per-subscriber delivery order is preserved end to end while the
  * topic itself scales by partition count. `offer` runs on the Spark
  * partition that produced the frame (executor-side; frames never
  * transit the driver); the append itself is the in-JVM test-double of
  * a broker client `send` — swapping a real producer in changes nothing
  * upstream, which is the point of the seam. */
final class ReplayLogSink(val topic: String, val numPartitions: Int = 4)
    extends CdcStream.DeliverySink {
  require(numPartitions > 0, "numPartitions must be positive")

  def offer(d: CdcStream.Delivery): Unit = {
    val p = (d.subscriptionId.hashCode & 0x7fffffff) % numPartitions
    ReplayLog.append(topic, p, d.subscriptionId, d.frame.getBytes(UTF_8),
      System.currentTimeMillis())
  }
}
