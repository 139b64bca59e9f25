package graft

/** The bench gate must not be able to pass vacuously (r7 lesson: 19
  * analysis-broken queries were recorded as fast wall-time rows because
  * the rep loop swallowed the exception). Pins:
  *   - a throwing query measures as the -1.0 sentinel with an error line;
  *   - a working query measures as a positive time with no error;
  *   - the JSON artifact carries the sentinel in `queries`, the message
  *     in `errors`, and totals only the queries that ran.
  */
class BenchFailureSpec extends SparkSpec {

  private val boom: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
    (s, _) => s.range(1).select(org.apache.spark.sql.functions.col("nope")) // analysis error

  private val ok: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
    (s, _) => s.range(10).selectExpr("sum(id) as total")

  test("a throwing query records the -1 sentinel and an error, never a wall-time row") {
    val (v, err) = Bench.measure(spark, boom, sf(), reps = 2)
    assert(v == -1.0, s"failed query must record the sentinel, got $v")
    assert(err.isDefined && err.get.nonEmpty)
  }

  test("a working query records a positive min time and no error") {
    val (v, err) = Bench.measure(spark, ok, sf(), reps = 2)
    assert(v > 0.0 && err.isEmpty)
  }

  test("the JSON artifact is visibly red for a failed query") {
    val results = Seq(
      ("q_ok", 1.25, Option.empty[String]),
      ("q_bad", -1.0, Some("AnalysisException: \"quoted\"\nsecond line")))
    val json = Bench.renderJson(results, "/tmp/sfX")
    assert(json.contains("\"q_bad\":-1.0"), json)
    assert(json.contains("\"errors\":{\"q_bad\":"), json)
    // total counts only the query that ran
    assert(json.contains("\"value\":1.25"), json)
    // the error string is JSON-escaped (quote + newline must not break the line)
    assert(!json.contains("second line\n}"), json)
    assert(json.linesIterator.size == 1, "artifact must stay one line")
  }

  test("an all-green run renders an empty errors object") {
    val json = Bench.renderJson(Seq(("q_ok", 0.5, None)), "/tmp/sfX")
    assert(json.contains("\"errors\":{}"), json)
  }

  test("vs_baseline: ratio over the shared set, >2x offenders named, failures excluded") {
    val baseline = Map("q_a" -> 1.0, "q_b" -> 0.5, "q_bad" -> 1.0)
    val results = Seq(
      ("q_a", 2.5, Option.empty[String]),   // 2.5x: must be named
      ("q_b", 0.5, Option.empty[String]),   // 1.0x: aggregate only
      ("q_new", 1.0, Option.empty[String]), // not in baseline: excluded
      ("q_bad", -1.0, Some("boom")))        // failed: excluded
    val json = Bench.renderJson(results, "/tmp/sfX", baseline)
    assert(json.contains("\"vs_baseline\":{\"shared\":2"), json)
    assert(json.contains("\"total_ratio\":2.0000"), json) // 3.0 / 1.5
    assert(json.contains("\"gt2x\":{\"q_a\":2.50}"), json)
    assert(json.linesIterator.size == 1, "artifact must stay one line")
    // no baseline artifact: the key is absent, the line is unchanged
    assert(!Bench.renderJson(results, "/tmp/sfX").contains("vs_baseline"))
  }

  test("compact line: no per-query map, same totals/errors/vs_baseline, tail-sized") {
    val baseline = Map("q_a" -> 1.0, "q_b" -> 0.5)
    val results = Seq(
      ("q_a", 2.5, Option.empty[String]),
      ("q_b", 0.5, Option.empty[String]),
      ("q_bad", -1.0, Some("boom")))
    val json = Bench.renderCompactJson(results, "/tmp/sfX", baseline,
      "bench_result.json")
    assert(!json.contains("\"queries\":"), json)       // the map stays out
    assert(json.contains("\"value\":3.0"), json)       // same total
    assert(json.contains("\"n_queries\":3"), json)
    assert(json.contains("\"errors\":{\"q_bad\":"), json)
    assert(json.contains("\"full\":\"bench_result.json\""), json)
    assert(json.contains("\"vs_baseline\":{\"shared\":2"), json)
    assert(json.linesIterator.size == 1, "artifact must stay one line")
    // the whole point: a full-suite compact line fits a 2000-char tail
    val wide = (1 to 350).map(i => (f"q$i%03d_name", 0.5, Option.empty[String]))
    assert(Bench.renderCompactJson(wide, "/tmp/sfX", Map.empty, "x.json")
      .length < 500)
  }
}
