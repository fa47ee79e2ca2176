package graft.api

import graft.SparkSpec
import java.sql.Timestamp

/** Pins check_read_permissions_revoked (realtime_channel.ex:1048-1060):
  * only true→false READ transitions disconnect, at the first such
  * refresh, and later refreshes cannot resurrect or re-flag. */
class PolicyRefreshSpec extends SparkSpec {

  private def t(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

  test("first true->false read transition disconnects; grants never do; " +
      "post-disconnect refreshes are moot; both legs can revoke at once") {
    val rows = Seq(
      // A: broadcast revoked at tie 2; the later re-grant + second
      // revocation (tie 4) must NOT move the verdict
      ("A", t(1), 1L, true, true), ("A", t(2), 2L, false, true),
      ("A", t(3), 3L, true, true), ("A", t(4), 4L, false, true),
      // B: grant-only direction → never revoked
      ("B", t(1), 5L, false, false), ("B", t(2), 6L, true, true),
      // C: presence leg revokes
      ("C", t(1), 7L, true, true), ("C", t(2), 8L, true, false),
      // D: single refresh → never
      ("D", t(1), 9L, true, true),
      // E: both legs at the same refresh
      ("E", t(1), 10L, true, true), ("E", t(2), 11L, false, false))
    val df = spark.createDataFrame(rows)
      .toDF("socket_id", "ts", "tie", "broadcast_read", "presence_read")
    val got = PolicyRefresh.readRevocations(df, "socket_id", "ts", "tie",
        "broadcast_read", "presence_read")
      .collect().map(r => r.getString(0) -> ((
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) null else Boolean.box(r.getBoolean(2)),
        if (r.isNullAt(3)) null else Boolean.box(r.getBoolean(3)))))
      .toMap
    assert(got("A") == ((2L, Boolean.box(true), Boolean.box(false))))
    assert(got("B") == ((-1L, null, null)))
    assert(got("C") == ((8L, Boolean.box(false), Boolean.box(true))))
    assert(got("D") == ((-1L, null, null)))
    assert(got("E") == ((11L, Boolean.box(true), Boolean.box(true))))
  }
}
