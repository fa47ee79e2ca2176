package graft

import graft.cdc.ChangeFeed
import graft.filters.{FilterCompiler, FilterParser}
import graft.model.Subscription
import graft.walrus.Walrus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registry of driver-checkable queries: each entry pairs a Spark DataFrame
  * build with (where expressible) an equivalent DuckDB SQL oracle over the
  * same parquet tables. Naming follows SURVEY.md §2 operator ids. */
object Queries {

  final case class Q(
      name: String,
      build: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private def ev(spark: SparkSession, sfDir: String): DataFrame =
    ChangeFeed.table(spark, sfDir, "events")

  /** Apply a filter-DSL string to the events table (P1 parse + P2 compile). */
  private def dsl(filterDsl: String)(spark: SparkSession, sfDir: String): DataFrame = {
    val df = ev(spark, sfDir)
    val filters = FilterParser.parse(filterDsl)
      .fold(e => throw new IllegalArgumentException(e), identity)
    df.where(FilterCompiler.compileAll(filters, df.schema))
  }

  private val evCols = "event_id, ts, user_id, event_type, value, props"

  /** One query per filter operator (P2's 13 ops), DSL-parsed and compiled,
    * each with a plain-SQL oracle. */
  private val filterOps: Seq[Q] = Seq(
    Q("p2_filter_eq", dsl("event_type=eq.click"),
      Some(s"SELECT $evCols FROM events WHERE event_type = 'click'")),
    Q("p2_filter_neq", dsl("event_type=neq.view"),
      Some(s"SELECT $evCols FROM events WHERE event_type != 'view'")),
    Q("p2_filter_lt", dsl("value=lt.5.5"),
      Some(s"SELECT $evCols FROM events WHERE value < 5.5")),
    Q("p2_filter_lte", dsl("value=lte.10"),
      Some(s"SELECT $evCols FROM events WHERE value <= 10")),
    Q("p2_filter_gt", dsl("user_id=gt.40"),
      Some(s"SELECT $evCols FROM events WHERE user_id > 40")),
    Q("p2_filter_gte", dsl("value=gte.99"),
      Some(s"SELECT $evCols FROM events WHERE value >= 99")),
    Q("p2_filter_in", dsl("event_type=in.(click,view)"),
      Some(s"SELECT $evCols FROM events WHERE event_type IN ('click','view')")),
    Q("p2_filter_like", dsl("event_type=like.c%"),
      Some(s"SELECT $evCols FROM events WHERE event_type LIKE 'c%'")),
    Q("p2_filter_ilike", dsl("event_type=ilike.C%"),
      Some(s"SELECT $evCols FROM events WHERE event_type ILIKE 'C%'")),
    Q("p2_filter_match", dsl("event_type=match.^(click|error)$"),
      Some(s"SELECT $evCols FROM events WHERE regexp_matches(event_type, '^(click|error)$$')")),
    Q("p2_filter_imatch", dsl("event_type=imatch.^CLICK$"),
      Some(s"SELECT $evCols FROM events WHERE regexp_matches(event_type, '(?i)^CLICK$$')")),
    Q("p2_filter_isdistinct", dsl("event_type=isdistinct.click"),
      Some(s"SELECT $evCols FROM events WHERE event_type IS DISTINCT FROM 'click'")),
    // `is` needs a boolean column; derive a nullable flag from value.
    Q("p2_filter_is",
      (s, d) => {
        val df = ev(s, d).withColumn("flag",
          when(col("value") > 50, lit(true))
            .when(col("value") < 10, lit(false)))
        val fs = FilterParser.parse("flag=is.false").toOption.get
        df.where(FilterCompiler.compileAll(fs, df.schema)).drop("flag")
      },
      Some(s"""SELECT $evCols FROM events
               WHERE (CASE WHEN value > 50 THEN true WHEN value < 10 THEN false END)
                     IS NOT DISTINCT FROM false""")),
    // `not.` negation across op families (P2 negate wrap).
    Q("p2_filter_negate",
      dsl("user_id=not.in.(1,2,3),event_type=not.like.c%,value=not.lt.50"),
      Some(s"""SELECT $evCols FROM events
               WHERE user_id NOT IN (1,2,3)
                 AND event_type NOT LIKE 'c%'
                 AND NOT (value < 50)"""))
  )

  /** The flagship subscription set for the J1 match (mix of actions + ops). */
  val flagshipSubs: Seq[Subscription] = Seq(
    Subscription("sub01", "public", "events",
      FilterParser.parse("value=gt.50,event_type=eq.click").toOption.get,
      actionFilter = "INSERT"),
    Subscription("sub02", "public", "events",
      FilterParser.parse("user_id=in.(1,2,3)").toOption.get),
    Subscription("sub03", "public", "events",
      FilterParser.parse("event_type=not.like.c%").toOption.get),
    Subscription("sub04", "public", "events",
      FilterParser.parse("value=lte.10").toOption.get,
      actionFilter = "UPDATE"),
    Subscription("sub05", "public", "events", Nil, actionFilter = "DELETE"),
    Subscription("sub06", "public", "events",
      FilterParser.parse("user_id=gte.45,value=lt.20").toOption.get)
  )

  /** Shared oracle CTE deriving the deterministic change feed from events. */
  private val changesCte =
    """WITH changes AS (
      |  SELECT *, CASE WHEN event_id % 10 < 6 THEN 'INSERT'
      |                 WHEN event_id % 10 < 9 THEN 'UPDATE'
      |                 ELSE 'DELETE' END AS change_type
      |  FROM events)""".stripMargin

  /** J1: change ⨝ subscriptions via the compiled predicate battery; exploded
    * to one row per (change, matching subscription). */
  def walrusMatch(spark: SparkSession, sfDir: String): DataFrame = {
    val changes = ChangeFeed.fromTable(ev(spark, sfDir), "event_id", "ts", "events")
    val dataSchema = ev(spark, sfDir).schema
    Walrus.matchedOnly(changes, flagshipSubs, dataSchema, "events")
      .select(col("event_id"),
        explode(col("subscription_ids")).as("subscription_id"))
  }

  private val walrusOracle =
    s"""$changesCte,
       |m AS (
       |  SELECT event_id, 'sub01' AS subscription_id FROM changes
       |    WHERE change_type = 'INSERT' AND value > 50 AND event_type = 'click'
       |  UNION ALL SELECT event_id, 'sub02' FROM changes WHERE user_id IN (1,2,3)
       |  UNION ALL SELECT event_id, 'sub03' FROM changes WHERE event_type NOT LIKE 'c%'
       |  UNION ALL SELECT event_id, 'sub04' FROM changes
       |    WHERE change_type = 'UPDATE' AND value <= 10
       |  UNION ALL SELECT event_id, 'sub05' FROM changes WHERE change_type = 'DELETE'
       |  UNION ALL SELECT event_id, 'sub06' FROM changes
       |    WHERE user_id >= 45 AND value < 20)
       |SELECT event_id, subscription_id FROM m""".stripMargin

  /** P5: action filter routing — count matched changes per subscription. */
  def actionFilterCounts(spark: SparkSession, sfDir: String): DataFrame =
    walrusMatch(spark, sfDir)
      .groupBy("subscription_id").agg(count("*").as("n_changes"))

  private val coreQueries: Seq[Q] = Seq(
    Q("j1_walrus_match", walrusMatch, Some(walrusOracle)),
    Q("p5_action_filter", actionFilterCounts,
      Some(s"SELECT subscription_id, count(*) AS n_changes FROM ($walrusOracle) GROUP BY 1"))
  )

  val all: Seq[Q] = filterOps ++ coreQueries

  def queryMap: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  def oracleMap: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
