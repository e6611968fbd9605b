package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-portable deterministic hashing.
  *
  * `hash60` is the engine's portable content hash: the first 15 hex digits
  * of md5 parsed base-16 (60 bits, non-negative, < 2^60). The identical
  * value is computable in DuckDB (`hash60Sql`), which is what makes the
  * MinHash / SimHash / fingerprint / dedup queries oracle-checkable.
  *
  * For pure-Spark scale paths prefer `fastHash` (xxhash64): one codegen'd
  * pass, no hex round-trip. Library operators in [[Dedup]] take the hash as
  * a parameter so production runs use xxhash64 and oracle runs use hash60
  * without touching operator logic.
  */
object Hashing {
  /** 2^31 - 1, a Mersenne prime; keeps affine MinHash permutations inside
    * 64-bit arithmetic (a,b,h < 2^31 so a*h+b < 2^62). */
  val P31: Long = 2147483647L

  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def hash60Sql(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"

  /** Reduced to [0, 2^31-1). */
  def hash31(c: Column): Column = hash60(c) % lit(P31)
  def hash31Sql(expr: String): String = s"(${hash60Sql(expr)} % ${P31}::BIGINT)"

  /** Array-at-a-time [[hash31]] of every element of a string array —
    * identical values to `transform(arr, hash31)` but ONE native
    * expression call per row instead of an interpreted HOF walk per
    * element ([[graft.plans.ArrayHash31]]). Use for hashing token/shingle
    * arrays on hot paths. */
  def hash31Array(arr: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.plans.ArrayHash31(
      org.apache.spark.sql.GraftSqlBridge.expression(arr)))

  /** Stable reference for the [[hash31Array]] default in
    * [[Dedup.shingleBandIndex]] — lets the operator detect "caller kept
    * the oracle-portable default" (eq check) and take the fused
    * single-expression shingle path. */
  val DefaultTokHash: Column => Column = hash31Array

  /** Production-scale hash (NOT oracle-portable). */
  def fastHash(cols: Column*): Column = xxhash64(cols: _*)

  /** Positional 64-bit n-token window hashes — element i hashes the
    * window starting at i ([[graft.plans.TokenWindowHash64]]: xxhash64
    * per token once, polynomial fold per window, ONE native call per
    * row). NOT oracle-portable: for internal grouping keys only, where
    * the gram text never surfaces and 64-bit equality is the contract. */
  def windowHash64(arr: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.plans.TokenWindowHash64(
      org.apache.spark.sql.GraftSqlBridge.expression(arr), n))

  /** Per-token xxhash64 longs ([[graft.plans.TokenHash64]]) — hash once,
    * then fold any number of widths with [[windowFold64]]. */
  def tokenHash64(arr: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.plans.TokenHash64(
      org.apache.spark.sql.GraftSqlBridge.expression(arr)))

  /** `windowFold64(tokenHash64(toks), n)` ≡ `windowHash64(toks, n)`
    * ([[graft.plans.WindowFold64]]). */
  def windowFold64(hashes: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.plans.WindowFold64(
      org.apache.spark.sql.GraftSqlBridge.expression(hashes), n))

  /** Multiplier for [[mix31]]; any odd constant < 2^31 works. */
  val MixA: Long = 1099087573L

  /** Order-dependent integer mix of non-negative 31-bit values into
    * [0, P31): fold `(acc * MixA + h) mod P31`. Pure integer arithmetic —
    * acc,h < 2^31 keeps every product under 2^62, so it is overflow-free
    * AND bit-identical in Spark and DuckDB ([[mix31Sql]]). Used to derive
    * LSH band keys from already-materialized hash longs without another
    * md5 pass (VERDICT r3 next-round #3). */
  def mix31(parts: Seq[Column]): Column =
    parts.foldLeft(lit(0L): Column)((acc, h) => (acc * lit(MixA) + h) % lit(P31))

  def mix31Sql(parts: Seq[String]): String =
    parts.foldLeft(s"0::BIGINT")((acc, h) =>
      s"(($acc * ${MixA}::BIGINT + $h) % ${P31}::BIGINT)")

  /** Deterministic affine permutation coefficients (a_j, b_j) for MinHash:
    * minhash_j = min over shingles s of (a_j * h31(s) + b_j) mod P31. */
  def permCoeffs(k: Int): Seq[(Long, Long)] =
    (1 to k).map { j =>
      val a = (2654435761L * j) % P31
      val b = (40503L * j * j + 17L) % P31
      (if (a == 0L) 1L else a, b)
    }
}
