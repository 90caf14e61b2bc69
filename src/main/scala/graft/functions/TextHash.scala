package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing primitives used by the dedup /
  * fingerprint operators. A 31-ary polynomial rolling hash over character
  * codes mod the prime 1e9+7 — chosen over `xxhash64` because the exact same
  * fold is expressible in ANSI SQL (the DuckDB oracle computes it with
  * `list_reduce`), so hash-based operators get full value-level verification
  * rather than rows-only checks.
  *
  * All arithmetic stays in non-negative BIGINT range: acc < 1e9+7, so
  * acc*31 + code < 2^63. The fold is a native Catalyst higher-order
  * `aggregate` expression — no Scala UDF, no serialization boundary.
  */
object TextHash {

  val Prime = 1000000007L

  /** Polynomial rolling hash of a string column: fold(chars)(acc*31+code
    * mod P). Backed by the codegen'd [[GraftExprs.polyHash]] loop;
    * [[polyHashHof]] is the pure-built-in formulation kept for
    * cross-checking the two produce identical values. */
  def polyHash(s: Column): Column = GraftColumns.polyHash(s)

  /** Same fold expressed with higher-order functions only (interpreted —
    * one lambda eval per character; the expression version replaces it in
    * hot paths). */
  def polyHashHof(s: Column): Column =
    aggregate(
      transform(
        sequence(lit(1), length(s)),
        i => ascii(substring(s, i, lit(1))).cast("long")),
      lit(0L),
      (acc, c) => (acc * lit(31L) + c) % lit(Prime))

  /** Uniform sampling key in [0, P) for a string column: the polynomial
    * hash finished with a NONLINEAR mix, (h² + h) mod P. The raw fold is
    * linear in the input digits, so over sequential ids ("samp:100",
    * "samp:101", …) its residues form a tight base-31 lattice — a
    * threshold test against `polyHash(..) % m` then keeps documents in
    * contiguous all-or-nothing blocks (measured: a 10% target rate kept
    * 0/400 sequential ids; per-language sample rates off by 40–100%).
    * Squaring before the mod breaks the lattice (same lesson as the LSH
    * hyperplane mix). h < P ⇒ h² < ~1e18 < 2^63; portable to the oracle
    * verbatim. Use THIS, never raw polyHash, for any keep/route decision
    * (samples, splits, shards); raw polyHash remains for fingerprints,
    * where values are compared for equality, not thresholded. */
  def sampleKey(s: Column): Column = {
    val h = polyHash(s)
    (h * h + h) % lit(Prime)
  }

  /** The i-th MinHash permutation of an already-poly-hashed value:
    * (a_i * h + b_i) mod P with a_i, b_i derived deterministically from i.
    * a_i < P and h < P so a_i*h < ~1e18 < 2^63.
    */
  def minhashPerm(h: Column, i: Column): Column = {
    val a = (i.cast("long") * lit(2654435761L)) % lit(Prime) + lit(1L)
    val b = (i.cast("long") * lit(40503L) + lit(7L)) % lit(Prime)
    (a * h + b) % lit(Prime)
  }

  private def substring(s: Column, pos: Column, len: Column): Column =
    org.apache.spark.sql.functions.substring(s, pos, len)
}
