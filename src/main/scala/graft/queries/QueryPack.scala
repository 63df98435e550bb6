package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One named engine query plus (optionally) its ANSI-SQL oracle form for the
  * driver's DuckDB compare (SURVEY.md §5.2#1). Queries without SQL get the
  * weaker rows-only check and must carry a ScalaTest spec instead.
  */
final case class OracleQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String])

trait QueryPack {
  def all: Seq[OracleQuery]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap
  final def oracle: Map[String, String] =
    all.flatMap(q => q.sql.map(q.name -> _)).toMap
}

/** Cross-engine bit-exactness conventions shared by all oracle queries.
  *
  * Float/double aggregation order differs between Spark and DuckDB, so a raw
  * `SUM(double)` is not hash-stable (SURVEY.md §7.3). Convention: evaluate the
  * per-row expression in DOUBLE (IEEE ops are order-free and identical in both
  * engines), cast each term to an exact DECIMAL at the aggregation boundary
  * (same rounding of the same double in both engines), SUM exactly, and cast
  * the exact result back to DOUBLE (single deterministic rounding). Divisions
  * and sqrt happen after, in double, and are IEEE-identical.
  */
object Exact {
  /** Order-insensitive, cross-engine-exact sum of a double expression. */
  def dsum(c: Column, p: Int = 27, s: Int = 6): Column =
    sum(c.cast(DecimalType(p, s))).cast(DoubleType)

  /** Exact average = exact sum / count, divided in double. */
  def davg(c: Column, p: Int = 27, s: Int = 6): Column =
    dsum(c, p, s) / count(lit(1))

  /** SQL text of dsum for the DuckDB oracle side. */
  def DSUM(e: String, p: Int = 27, s: Int = 6): String =
    s"CAST(SUM(CAST($e AS DECIMAL($p,$s))) AS DOUBLE)"

  def DAVG(e: String, p: Int = 27, s: Int = 6): String =
    s"${DSUM(e, p, s)} / COUNT(*)"

  /** SQL twin of [[graft.operators.Dedup.knuth32]] for the DuckDB oracle:
    * (e * 2654435761) mod 2^32 via 16-bit limb split, so no intermediate
    * exceeds 2^49 — DuckDB errors on BIGINT overflow where Spark wraps, so
    * the naive product form diverges (or dies) past ids ~3.47e9. Assumes a
    * nonnegative id (true of every oracle table's keys).
    */
  def KNUTH32(e: String): String = {
    val id32 = s"(($e) % 4294967296)"
    s"(((($id32 >> 16) * 2654435761) % 4294967296) * 65536" +
      s" + (($id32 & 65535) * 2654435761)) % 4294967296"
  }
}
