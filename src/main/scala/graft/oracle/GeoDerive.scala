package graft.oracle

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Deterministic derivation of spatial columns from the driver's TPC-H-ish
 * integer keys — pure 64-bit integer arithmetic, so Spark and the DuckDB
 * oracle produce bit-identical values (no transcendentals, no FP).
 *
 * Each derivation exists twice: as a Spark Column and as ANSI SQL text;
 * both sides of the driver's correctness gate use the same formulas.
 */
object GeoDerive {
  final val M32 = 4294967296L // 2^32

  /** world x in [0,2^32) from two integer keys. */
  def x32(k1: Column, k2: Column): Column =
    (k1 * lit(2654435761L) + k2 * lit(40503L) + lit(12345L)) % lit(M32)

  def x32Sql(k1: String, k2: String): String =
    s"(($k1 * 2654435761 + $k2 * 40503 + 12345) % 4294967296)"

  /** world y in [0,2^32) from two integer keys. */
  def y32(k1: Column, k2: Column): Column =
    (k1 * lit(1103515245L) + k2 * lit(69069L) + lit(54321L)) % lit(M32)

  def y32Sql(k1: String, k2: String): String =
    s"(($k1 * 1103515245 + $k2 * 69069 + 54321) % 4294967296)"

  /** 8-bit metadata value from one key. */
  def meta8(k1: Column, k2: Column): Column =
    (k1 * lit(7L) + k2 * lit(13L)) % lit(256L)

  def meta8Sql(k1: String, k2: String): String =
    s"(($k1 * 7 + $k2 * 13) % 256)"

  /**
   * DuckDB SQL computing the engine's order-comparable cell id (the
   * sign-flipped Morton interleave of Cell.encode) from world coords.
   * Expanded bit-by-bit: x bit i -> 2i, y bit i -> 2i+1; the top bit
   * (y bit 31) is sign-flipped, i.e. adds -2^63 when y31 = 0.
   */
  def cellSql(x: String, y: String): String = {
    val terms = new scala.collection.mutable.ArrayBuffer[String]
    for (i <- 0 to 31)
      terms += s"((($x >> $i) & 1) << ${2 * i})"
    for (i <- 0 to 30)
      terms += s"((($y >> $i) & 1) << ${2 * i + 1})"
    val lower = terms.mkString(" + ")
    s"(CASE WHEN (($y >> 31) & 1) = 0 THEN (-9223372036854775807 - 1) ELSE 0 END + $lower)"
  }
}
