package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Cross-engine deterministic numeric conventions shared by the
  * operators layer and the query packs (kept here, below both, so
  * neither layer has to import the other for them).
  */
object Det {

  /** Bit-deterministic 4-decimal rounding: pure IEEE double ops (mul,
    * add, floor, div) evaluate identically in Spark and DuckDB, unlike
    * each engine's `round`, which disagrees on exact halves (Spark
    * rounds the shortest decimal representation, DuckDB the binary
    * value).
    */
  def detRound4(c: Column): Column =
    floor(c * 10000.0 + 0.5) / 10000.0

  /** DuckDB twin of [[detRound4]]; splice into oracle SQL. */
  def detRound4Sql(e: String): String =
    s"floor(($e) * 10000.0 + 0.5) / 10000.0"
}
