package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE portable hash family: the first 15 hex chars of md5 parsed as a
  * 60-bit integer — computable bit-identically by any engine with md5
  * (fits a signed 64-bit int everywhere). Single-sourced here because the
  * Spark spelling and the DuckDB oracle spelling must never drift apart:
  * simhash signatures, winnowing fingerprints, and hash-sampling residues
  * are only exchangeable across systems if every site uses the same family.
  */
object PortableHash {
  /** Spark side: hash60 of a string column. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB oracle side: the same value for the SQL expression `e`
    * (strpos-based hex parse via list comprehension). */
  def sql(e: String): String =
    s"""list_sum([(strpos('0123456789abcdef', md5($e)[i]) - 1)::BIGINT
       * (1::BIGINT << (4 * (15 - i))) for i in range(1, 16)])"""
}
