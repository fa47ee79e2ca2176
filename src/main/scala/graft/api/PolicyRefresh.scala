package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-refresh policy lifecycle —
  * `check_read_permissions_revoked` (realtime_channel.ex:1048-1060):
  * every `access_token` push re-evaluates the socket's policies, and a
  * READ permission that was true under the previous token and false
  * under the new one disconnects the channel
  * (`read_permissions_revoked`). Only the two read legs participate —
  * `broadcast.read` and `presence.read`; write revocation does NOT
  * disconnect (the next write just gets denied), and a false→true
  * GRANT never triggers (`read_revoked?(true, false)` is the only
  * truthy arm).
  */
object PolicyRefresh {

  /** Replay the refresh stream and find each socket's disconnect.
    *
    * `refreshes`: one row per policy evaluation
    * `(socket_id, ts, tie, broadcast_read, presence_read)` — the join's
    * initial evaluation plus one row per access_token push. Output: one
    * row per socket with `revoked_at_tie` = the tie of the FIRST
    * refresh whose re-evaluation revoked a read leg (null = the socket
    * was never disconnected), plus which legs were revoked AT that
    * refresh. Refreshes after the disconnect are ignored — the socket
    * is gone (a later re-grant can't resurrect it), which is why this
    * is first-match, not exists.
    *
    * Shape: one socket-keyed shuffle, one window pass (lag + running
    * min over the same sort), one filtered projection. */
  def readRevocations(refreshes: DataFrame, socketCol: String,
      tsCol: String, tieCol: String, broadcastReadCol: String,
      presenceReadCol: String): DataFrame = {
    val w = Window.partitionBy(socketCol).orderBy(col(tsCol), col(tieCol))
    val bPrev = lag(col(broadcastReadCol), 1).over(w)
    val pPrev = lag(col(presenceReadCol), 1).over(w)
    val bRevoked = (bPrev <=> true) && (col(broadcastReadCol) <=> false)
    val pRevoked = (pPrev <=> true) && (col(presenceReadCol) <=> false)
    val flagged = refreshes.select(col(socketCol).as("socket_id"),
      col(tsCol).as("ts"), col(tieCol).as("tie"),
      bRevoked.as("_b"), pRevoked.as("_p"),
      (bRevoked || pRevoked).as("_revoked"))
    // first revoking refresh per socket in (ts, tie) event order:
    // min_by over a null-gated struct key ignores non-revoking rows and
    // returns null when the socket was never revoked
    flagged.groupBy("socket_id").agg(
      min_by(struct(col("tie").as("tie"), col("_b").as("b"),
          col("_p").as("p")),
        when(col("_revoked"), struct(col("ts"), col("tie")))).as("_first"))
      .select(col("socket_id"),
        col("_first.tie").as("revoked_at_tie"),
        col("_first.b").as("broadcast_revoked"),
        col("_first.p").as("presence_revoked"))
  }
}
