package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Type-hygiene lint over every oracle SQL string (VERDICT r6 item 2).
  *
  * The driver's correctness gate hashes TYPED values: DuckDB types
  * `SUM(BIGINT)` as HUGEINT while Spark emits BIGINT, so a bare `SUM(...)`
  * in an oracle's OUTPUT column list hash-mismatches even when every
  * printed value is identical (this is exactly how qd36/qd37 went RED in
  * round 6 while the builder's stringly local check stayed green).
  *
  * Rule enforced here: in every depth-0 SELECT's output list (the final
  * query, including every UNION branch — CTEs and subqueries sit at paren
  * depth >= 1 and are free to use raw SUM internally), each `SUM(` must be
  * immediately wrapped in `CAST(`. AVG yields DOUBLE, COUNT yields BIGINT,
  * MIN/MAX preserve their input type — SUM is the one aggregate whose
  * DuckDB result type diverges from Spark's.
  *
  * A HUGEINT CTE column projected raw into the output would evade this
  * lint; `tools/check.py` closes that hole end-to-end by comparing actual
  * DuckDB column types of the Spark parquet vs the oracle relation.
  */
class OracleLintSpec extends AnyFunSuite {

  /** Spans (start, end) of every depth-0 `SELECT ... FROM` output list. */
  private def topLevelOutputLists(sql: String): Seq[String] = {
    val upper = sql.toUpperCase
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var depth = 0
    var selStart = -1 // start of current depth-0 output list, -1 if none
    var i = 0
    def wordAt(kw: String): Boolean =
      upper.startsWith(kw, i) &&
        (i == 0 || !upper(i - 1).isLetterOrDigit) &&
        (i + kw.length >= upper.length || !upper(i + kw.length).isLetterOrDigit)
    while (i < upper.length) {
      upper(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case '\'' => // skip string literal
          i += 1
          while (i < upper.length && upper(i) != '\'') i += 1
          i += 1
        case _ =>
          if (depth == 0 && wordAt("SELECT")) { selStart = i + 6; i += 6 }
          else if (depth == 0 && selStart >= 0 && wordAt("FROM")) {
            spans += ((selStart, i)); selStart = -1; i += 4
          } else i += 1
      }
    }
    if (selStart >= 0) spans += ((selStart, upper.length)) // FROM-less tail
    spans.toSeq.map { case (a, b) => sql.substring(a, b) }
  }

  private val sumRe = "(?i)\\bSUM\\s*\\(".r
  private val castBeforeRe = "(?i)CAST\\s*\\(\\s*$".r

  test("every SUM in an oracle's output column list is wrapped in CAST") {
    val violations = graft.SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        topLevelOutputLists(sql).flatMap { outList =>
          sumRe.findAllMatchIn(outList).collect {
            case m if castBeforeRe.findFirstIn(outList.take(m.start)).isEmpty =>
              s"$name: uncast SUM in output list near ...${
                outList.slice(math.max(0, m.start - 20), m.end + 20).trim}..."
          }
        }
    }
    assert(violations.isEmpty,
      s"\nOracle output SUMs must be CAST (DuckDB HUGEINT != Spark BIGINT " +
        s"under the driver's type-strict hash):\n${violations.mkString("\n")}")
  }
}
