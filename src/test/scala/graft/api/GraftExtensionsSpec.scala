package graft.api

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.lit

/** The SQL registration surface: the same native expressions the
  * DataFrame API uses, reachable from `spark.sql` — imperatively via
  * [[GraftFunctions.register]] and declaratively via
  * `spark.sql.extensions=graft.api.GraftExtensions`. */
class GraftExtensionsSpec extends SparkSpec {

  test("registered functions evaluate via SQL, matching the column API") {
    GraftFunctions.register(spark)
    // quote_wal2json: SQL path ≡ column path (live 20260528 semantics:
    // only \ , . whitespace escaped; quotes untouched)
    val sqlQ = spark.sql("""SELECT quote_wal2json('"We,i rd"', 'Or.de\\rs')""")
      .head.getString(0)
    val colQ = spark.range(1).select(graft.cdc.Wal2Json.quoteWal2json(
        lit("\"We,i rd\""), lit("Or.de\\rs")))
      .head.getString(0)
    assert(sqlQ == colQ)
    assert(sqlQ == "\"We\\,i\\ rd\".Or\\.de\\\\rs")

    // json_map_project: key subset keeps map order, renders SQL NULL
    val sub = spark.sql(
        "SELECT json_map_project(map('a','1','b',cast(null as string),'c','x'), 'a', 'b')")
      .head.getString(0)
    assert(sub == """{"a":"1","b":null}""")
    val all = spark.sql("SELECT json_map_project(map('a','1','b','2'))")
      .head.getString(0)
    assert(all == """{"a":"1","b":"2"}""")

    // json_struct_project: byte parity with to_json(named_struct(…))
    val row = spark.sql(
        """SELECT json_struct_project('id', 7, 'name', 'a"b'),
                  to_json(named_struct('id', 7, 'name', 'a"b'))""")
      .head
    assert(row.getString(0) == row.getString(1))

    // misra_gries: an aggregate registered bare — the analyzer wraps it;
    // k=2 over {a×3, b×2, c×1} keeps the two true heavies
    val mg = spark.sql(
        """SELECT misra_gries(k, 2) AS sk FROM VALUES
           ('a'),('a'),('a'),('b'),('b'),('c') AS t(k)""")
      .selectExpr("transform(sk, e -> e.key) AS keys").head.getSeq[String](0)
    assert(mg.contains("a"), s"sketch lost the heaviest key: $mg")
    assert(mg.size <= 2)
    intercept[Exception] { // k must be a plan-time integer literal
      spark.sql("SELECT misra_gries(k, k) FROM VALUES (1) AS t(k)").head
    }

    // realtime_cast: typed jsonb rendering — numbers/bools bare, text
    // JSON-quoted with escapes, jsonb verbatim, and the bytea 20260218
    // arm: the raw \x text renders as a plain (escaped) JSON string
    // instead of being re-cast
    val rc = spark.sql(
        """SELECT realtime_cast('42', 'int8'),
                  realtime_cast('true', 'bool'),
                  realtime_cast('a"b', 'text'),
                  realtime_cast('{"k": 1}', 'jsonb'),
                  realtime_cast('\\x0af3', 'bytea')""").head
    assert(rc.getString(0) == "42")
    assert(rc.getString(1) == "true")
    assert(rc.getString(2) == "\"a\\\"b\"")
    assert(rc.getString(3) == """{"k": 1}""")
    assert(rc.getString(4) == "\"\\\\x0af3\"")
    intercept[Exception] { // unsupported regtype is a plan-time error
      spark.sql("SELECT realtime_cast('x', 'regclass')").head
    }

    // malformed calls fail analysis, not execution
    intercept[Exception] {
      spark.sql("SELECT json_struct_project('only_a_name')").head
    }
    intercept[Exception] {
      // non-literal key: the keep set is plan-time constant by design
      spark.sql("SELECT json_map_project(map('a','1'), cast(rand() as string))")
        .head
    }
  }

  test("spark.sql.extensions wiring: a fresh session gets the functions") {
    val suiteSession = spark // force-build the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // reuses the suite's SparkContext; applies the extensions to the
      // new session — exactly what --conf spark.sql.extensions does
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val v = ext.sql("SELECT quote_wal2json('public', 'orders')")
        .head.getString(0)
      assert(v == "public.orders") // plain names are a no-op now
      // a genuinely new session, not the suite's, received the injection
      assert(suiteSession ne ext)
    } finally {
      SparkSession.setDefaultSession(suiteSession)
      SparkSession.setActiveSession(suiteSession)
    }
  }
}
