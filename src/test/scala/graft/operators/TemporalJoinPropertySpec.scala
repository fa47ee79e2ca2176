package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Deterministic-seed randomized differential: the distributed as-of /
  * range join plans versus brute-force reference implementations over
  * the collected rows. Catches frame-boundary and tie-ordering bugs a
  * hand-picked fixture can miss. */
class TemporalJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private def ts(epochSec: Long): Timestamp = new Timestamp(epochSec * 1000L)

  // small key space + coarse time grid force heavy collisions: equal
  // timestamps across and within sides, empty keys, dense overlaps
  private def genRows(seed: Long, n: Int, keys: Int, tMax: Int)
      : Seq[(Long, String, Timestamp)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, s"k${rnd.nextInt(keys)}", ts(1700000000L + rnd.nextInt(tMax))))
  }

  test("asOfBackward ≡ brute force over random collisions (5 seeds)") {
    for (seed <- 1L to 5L) {
      val left = genRows(seed, 80, 4, 50)
      val right = genRows(seed + 100, 60, 4, 50)
        .map { case (id, k, t) => (id + 1000, k, t) }
      val got = TemporalJoin.asOfBackward(
          left.toDF("id", "k", "t"), right.toDF("rid", "k", "rt"),
          Seq("k"), "t", "rt", Seq("rid"))
        .select("id", "rid").as[(Long, Option[Long])].collect().toMap
      // brute force: per left row, right rows on the key with rt <= t;
      // among those take max rt, then (to mirror the operator's greatest-
      // payload-struct dedup) max rid at that rt
      val byKey = right.groupBy(_._2)
      val want = left.map { case (id, k, t) =>
        val cands = byKey.getOrElse(k, Seq.empty)
          .filter(!_._3.after(t))
        id -> (if (cands.isEmpty) None
               else {
                 val best = cands.map(_._3.getTime).max
                 Some(cands.filter(_._3.getTime == best).map(_._1).max)
               })
      }.toMap
      assert(got == want, s"seed $seed")
    }
  }

  test("asOfForward ≡ brute force over random collisions (5 seeds)") {
    for (seed <- 21L to 25L) {
      val left = genRows(seed, 80, 4, 50)
      val right = genRows(seed + 100, 60, 4, 50)
        .map { case (id, k, t) => (id + 1000, k, t) }
      val got = TemporalJoin.asOfForward(
          left.toDF("id", "k", "t"), right.toDF("rid", "k", "rt"),
          Seq("k"), "t", "rt", Seq("rid"))
        .select("id", "rid").as[(Long, Option[Long])].collect().toMap
      // per left row: right rows on the key with rt >= t; min rt, then
      // (mirroring the operator's MIN-payload-struct dedup) min rid
      val byKey = right.groupBy(_._2)
      val want = left.map { case (id, k, t) =>
        val cands = byKey.getOrElse(k, Seq.empty)
          .filter(!_._3.before(t))
        id -> (if (cands.isEmpty) None
               else {
                 val best = cands.map(_._3.getTime).min
                 Some(cands.filter(_._3.getTime == best).map(_._1).min)
               })
      }.toMap
      assert(got == want, s"seed $seed")
    }
  }

  test("rangeJoinBinned ≡ brute force over random intervals (5 seeds)") {
    for (seed <- 11L to 15L) {
      val rnd = new scala.util.Random(seed)
      val points = genRows(seed, 80, 3, 100)
      val intervals = (0 until 40).map { i =>
        val s = 1700000000L + rnd.nextInt(100)
        // include empty (len 0) and long (multi-bin) intervals
        (i.toLong + 5000, s"k${rnd.nextInt(3)}", ts(s), ts(s + rnd.nextInt(30)))
      }
      val got = TemporalJoin.rangeJoinBinned(
          points.toDF("pid", "k", "t"),
          intervals.toDF("iid", "k", "s", "e"),
          Seq("k"), "t", "s", "e", binUs = 7L * 1000000L) // deliberately odd bin
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"seed $seed: duplicate pairs")
      val want = (for {
        (pid, pk, t) <- points
        (iid, ik, s, e) <- intervals
        if pk == ik && !t.before(s) && t.before(e)
      } yield (pid, iid)).toSet
      assert(got.toSet == want, s"seed $seed")
    }
  }
}
