package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic float aggregation (SURVEY §7.4).
  *
  * Two portability hazards are eliminated here:
  *  1. Double sums are order-dependent (partial aggregation over shuffled
  *     partitions) — fixed by summing as exact DECIMAL-scaled BIGINT.
  *  2. `round(x, 4)` half-boundary semantics differ between engines (Spark
  *     rounds the shortest-decimal rendering half-up; DuckDB rounds the
  *     binary `x*1e4` product) — fixed by half-up rounding in exact integer
  *     arithmetic: halfup(p/q) = (2p + q) // (2q), then one exact
  *     `bigint / 10000.0` division that is bit-identical IEEE in any engine.
  *
  * Preconditions (hold for all testdata measures): values non-negative with
  * ≤ `inScale` (default 4 — verified for every testdata measure) decimal digits, and |sum| * 10^inScale < 2^62 (at true 100 TB
  * scale use inScale=4 or a two-level agg; the floor-of-double-division
  * below is exact while numerator/denominator < 2^53).
  *
  * Keep the SQL emitters in lockstep with the Column emitters — the oracle
  * text is generated from the same formulas.
  */
object Det {

  /** Exact sum(x) * 10^scale as a BIGINT column (per-row decimal cast, so
    * the only inexact step — binary double → decimal — is identical in both
    * engines; after that everything is integer arithmetic). */
  private def sumScaled(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale).toLong
    sum((c.cast(s"decimal(18,$scale)") * lit(f)).cast("long"))
  }

  /** Exact half-up round(avg(x), 4) for x with ≤ inScale decimals. */
  def avg4(c: Column, inScale: Int = 4): Column = {
    val s = sumScaled(c, inScale)
    val d = count(lit(1)) * lit(math.pow(10, inScale - 4).toLong)
    floor((s * lit(2L) + d) / (d * lit(2L))) / lit(10000.0)
  }

  /** Exact half-up round(sum(x), 4) for x with ≤ inScale decimals. */
  def sum4(c: Column, inScale: Int = 4): Column = {
    val s = sumScaled(c, inScale)
    val d = lit(math.pow(10, inScale - 4).toLong)
    floor((s * lit(2L) + d) / (d * lit(2L))) / lit(10000.0)
  }

  /** DuckDB text for [[avg4]] — same exact integer formula. */
  def avg4Sql(x: String, inScale: Int = 4): String = {
    val f = math.pow(10, inScale).toLong
    val g = math.pow(10, inScale - 4).toLong
    s"(((2*CAST(sum(CAST($x AS DECIMAL(18,$inScale)) * $f) AS BIGINT) + $g*count(*))" +
      s" // (2 * $g * count(*))) / 10000.0)"
  }

  /** Spark-SQL text for [[avg4]] — the same exact integer formula for
    * `spark.sql` surfaces. Literal dialect notes: `NL` long suffix and a
    * `D` double suffix (bare `10000.0` parses as DECIMAL in Spark SQL
    * TEXT — a known cross-engine dtype hazard); BIGINT `/` BIGINT is double
    * division in Spark, matching DuckDB's `x // y / 10000.0` exactly
    * while numerator < 2^53 (the [[Det]] precondition). */
  def avg4SparkSql(x: String, inScale: Int = 4): String = {
    val f = math.pow(10, inScale).toLong
    val g = math.pow(10, inScale - 4).toLong
    s"(FLOOR((2 * sum(CAST(CAST($x AS DECIMAL(18,$inScale)) * ${f}L AS BIGINT)) + ${g}L * count(*))" +
      s" / (2 * ${g}L * count(*))) / 10000.0D)"
  }

  /** DuckDB text for [[sum4]]. */
  def sum4Sql(x: String, inScale: Int = 4): String = {
    val f = math.pow(10, inScale).toLong
    val g = math.pow(10, inScale - 4).toLong
    s"(((2*CAST(sum(CAST($x AS DECIMAL(18,$inScale)) * $f) AS BIGINT) + $g)" +
      s" // (2 * $g)) / 10000.0)"
  }

  // ---- Decimal-sum family (relational measures; money columns hold exact
  // ≤4-decimal values, |sum|·10^4 < 2^53 at every sf — both verified) ----
  //
  // Strategy: make every aggregate ACCUMULATION exact (DECIMAL(18,4) sums,
  // BIGINT counts — associative, partition-order-independent), then perform
  // any remaining float math as the SAME sequence of IEEE double ops in both
  // engines. Identical exact inputs + identical op sequence = bit-identical
  // doubles, with no dependence on either engine's round() dialect.

  /** Exact sum as DOUBLE: per-row DECIMAL(18,4) cast, decimal sum, cast out.
    * Every step is exact for testdata magnitudes in both engines. */
  // NOT `sum(decimal).cast("double")`: past 2^53 the engines' one-shot
  // decimal→double casts disagree by an ulp (caught by the sf1 sweep on
  // q_tpch_pricing's sum_charge ≈ 5e16 scaled). Summing the exact scaled
  // BIGINT and dividing in double is the same value below 2^53 and
  // deterministic above it (scaled-sum bound |Σ|·10⁴ < 2^63; past that,
  // two-level decimal agg).
  def dsum4(c: Column): Column =
    sumScaled(c, 4).cast("double") / lit(10000.0)
  def dsum4Sql(x: String): String =
    s"(CAST(sum(CAST($x AS DECIMAL(18,4)) * 10000) AS BIGINT) / 10000.0)"

  /** [[dsum4]] at 6 decimals — for true-6-decimal products like TPC-H
    * charge = price·(1−disc)·(1+tax); same scaled-BIGINT discipline. */
  def dsum6(c: Column): Column =
    sum((c.cast("decimal(18,6)") * lit(1000000L)).cast("long"))
      .cast("double") / lit(1000000.0)
  def dsum6Sql(x: String): String =
    s"(CAST(sum(CAST($x AS DECIMAL(18,6)) * 1000000) AS BIGINT) / 1000000.0)"

  /** Cross-engine-deterministic half-up round to 4 places for DOUBLE input:
    * floor(x·10⁴ + 0.5)/10⁴ — plain IEEE ops, identical text both sides. */
  def r4(c: Column): Column = floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)
  def r4Sql(x: String): String = s"(floor(($x) * 10000.0 + 0.5) / 10000.0)"

  /** Exact-accumulation average, rounded with [[r4]]. */
  def davg4(c: Column): Column = r4(dsum4(c) / count(lit(1)))
  def davg4Sql(x: String): String = r4Sql(s"${dsum4Sql(x)} / count(*)")
}
