package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {
  import spark.implicits._

  test("features: counts per PII kind, flag only when any hit") {
    val df = Seq(
      (1L, "mail me at a.b+c@ex-ample.co.uk now"),
      (2L, "server 192.168.0.1 and 10.0.0.255 up"),
      (3L, "call +1 555-123-4567 or 555 987 6543"),
      (4L, "nothing sensitive here")).toDF("doc_id", "text")
    val got = Pii.features(df, "text", "doc_id")
      .as[(Long, Int, Int, Int, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((1, 0, 0, true)))
    assert(got(2L) == ((0, 2, 0, true)))
    assert(got(3L) == ((0, 0, 2, true)), "dash and space phone forms")
    assert(got(4L) == ((0, 0, 0, false)))
  }

  test("redact replaces every span with its typed token") {
    val got = Seq(1).toDF("x")
      .select(Pii.redact(
        lit("a@b.co c@d.io 1.2.3.4 call 555-000-1111 end")).as("r"))
      .as[String].head()
    assert(got == "<EMAIL> <EMAIL> <IP> call <PHONE> end")
  }

  test("redaction order: email whose domain embeds a dotted quad stays whole") {
    // redacting IPs first would tear "admin@10.0.0.1.net" in half;
    // the fixed email→ip→phone order consumes it as one email span
    val got = Seq(1).toDF("x")
      .select(Pii.redact(lit("ping admin@10.0.0.1.net now")).as("r"))
      .as[String].head()
    assert(got == "ping <EMAIL> now")
  }

  test("word boundaries: long digit runs are not IPs") {
    val got = Pii.features(
      Seq((1L, "version 1.2.3.4567 build 1234.5.6.7")).toDF("doc_id", "text"),
      "text", "doc_id").select("n_ips").as[Int].head()
    assert(got == 0, "\\b must reject quads embedded in longer runs")
  }

  test("staged counts: overlapping span attributed to the consuming kind") {
    // the phone-shaped run sits inside the email local part; the email
    // pass consumes it, so n_phones must be 0 — counts always equal the
    // placeholders present in `redacted`
    val got = Pii.scrub(
        Seq((1L, "reach 555-123-4567@x.co today")).toDF("doc_id", "text"),
        "text", "doc_id")
      .select("n_emails", "n_ips", "n_phones", "redacted")
      .as[(Int, Int, Int, String)].head()
    assert(got == ((1, 0, 0, "reach <EMAIL> today")))
  }

  test("scrub emits counts and redacted text from one projection") {
    val got = Pii.scrub(
        Seq((9L, "x@y.de at 8.8.8.8")).toDF("doc_id", "text"),
        "text", "doc_id")
      .select("doc_id", "n_emails", "n_ips", "n_phones", "redacted", "has_pii")
      .as[(Long, Int, Int, Int, String, Boolean)].head()
    assert(got == ((9L, 1, 1, 0, "<EMAIL> at <IP>", true)))
  }
}
