package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  test("withExtensions installs dot_long session-wide") {
    // getOrCreate reuses the suite-shared session (and would skip the
    // extensions), so clear the default/active slots, build a fresh
    // session over the same SparkContext, and restore afterwards. Never
    // stop() here - the SparkContext is shared with the other suites.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = spark.sql("SELECT dot_long(array(2L, 3L), array(10L, 100L)) AS d").collect()
      assert(r(0).getLong(0) == 320L)
      val g = spark.sql(
        "SELECT size(bigram_hashes(array('a', 'b', 'a', 'b'))) AS n").collect()
      assert(g(0).getInt(0) == 2) // 'a b' and 'b a'
      val p = spark.sql("SELECT packed_pairs(array(3L, 1L)) AS p").collect()
      assert(p(0).getSeq[Long](0) == Seq((1L << 32) | 3L))
      val sh = spark.sql(
        "SELECT simhash16_long(array('a', 'b')) = simhash16_long(array('b', 'a')) AS eq").collect()
      assert(sh(0).getBoolean(0)) // order-insensitive multiset hash
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
