package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions deployment path: a session built with
  * GraftExtensions resolves graft_dot in plain SQL.
  *
  * Needs its OWN SparkSession (extensions apply at session build), but
  * must not disturb the suite-shared one: clear the default/active
  * session so getOrCreate builds fresh over the same SparkContext,
  * restore afterwards, and never call stop() (that would kill the
  * shared context for every later spec).
  */
class ExtensionsSpec extends AnyFunSuite {
  test("graft_dot resolves via spark.sql.extensions") {
    SparkSpec.session  // ensure the shared context exists first
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions: the conf-string form (spark.sql.extensions=…) only
    // applies when the SparkContext itself is born, which a shared-JVM
    // suite can't do; the programmatic form applies to any new session
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions())
      .getOrCreate()
    try {
      val out = spark.sql(
        "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
        .collect().head.getDouble(0)
      assert(out == 11.0)
      // every native function resolves in plain SQL via the one hook
      val sigs = spark.sql(
        "SELECT graft_shingle_perm_minhash(array('a','b','c','d'), 3, 8) AS s")
        .collect().head.getSeq[String](0)
      assert(sigs.length == 8 && sigs.forall(_.matches("[0-9]{20}")))
      val shRow = spark.sql(
        "SELECT graft_simhash64(array('a','b')) AS h, graft_simhash64(array('b','a')) AS h2")
        .collect().head
      assert(shRow.getLong(0) == shRow.getLong(1), "simhash is order-independent")
      val mh = spark.sql("SELECT graft_shingle_minhash(array('a','b','c','d'), 3, 2) AS m")
        .collect().head.getSeq[String](0)
      assert(mh.length == 2)
      val fp = spark.sql("SELECT graft_rolling_winnow(array('a','b','c','d','e'), 3, 2) AS f")
        .collect().head.getSeq[Long](0)
      assert(fp.nonEmpty && fp.forall(v => v >= 0L))
      val tg = spark.sql("SELECT graft_char_trigrams('abcd') AS g")
        .collect().head.getSeq[String](0)
      assert(tg == Seq("abc", "bcd"))
      val tj = spark.sql("SELECT graft_trigram_jaccard('abcd', 'abcd') AS j")
        .collect().head.getDouble(0)
      assert(tj == 1.0)
      val sg = spark.sql("SELECT graft_shingles(array('a','b','c'), 2) AS g")
        .collect().head.getSeq[String](0)
      assert(sg == Seq("a b", "b c"))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
