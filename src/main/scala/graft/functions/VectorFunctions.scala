package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-vector column functions (SURVEY.md §2.3 #39-41) over
  * `array<float>` columns, built from codegen'd higher-order functions
  * (`zip_with`/`aggregate`) — no UDFs.
  *
  * Oracle-parity design (SURVEY.md §5): elements are quantized to
  * integers (floor(x * 1e6)) and dot products accumulate in LONG —
  * exact, order-independent, and `floor` has identical semantics in
  * Spark and DuckDB (no round-half ambiguity). Only the final cosine
  * division/sqrt run in double, on bit-identical inputs in both engines.
  *
  * OVERFLOW BOUND: a dot of dim-d quantized vectors is exact only when
  * d * (maxAbs * 1e6)^2 <= Long.MaxValue, i.e. maxAbs <= ~379 for d=64
  * (`maxSafeAbs`). Long arithmetic wraps silently under non-ANSI mode,
  * so callers with untrusted magnitudes must gate the dataset through
  * `VectorOps.requireMagnitude` first. Unit-scale embeddings (the
  * normal case) sit ~5 orders of magnitude inside the bound.
  */
object VectorFunctions {

  /** Largest element magnitude for which a dim-d quantized dot product
    * cannot overflow Long: sqrt(Long.Max / d) / 1e6. */
  def maxSafeAbs(dim: Int): Double =
    math.sqrt(Long.MaxValue.toDouble / dim) / 1000000d

  /** Element quantization: float → double → floor(x*1e6) as long. */
  def qlong(x: Column): Column =
    floor(x.cast(DoubleType) * 1000000d).cast(LongType)

  /** Whole-vector quantization — do this ONCE per row before any join,
    * so the per-pair dot is pure long multiply-adds. */
  def quantize(a: Column): Column = transform(a, x => qlong(x))

  /** Dot product of two pre-quantized (array<long>) vectors — a
    * codegen'd kernel (graft.plans.ArrayDotLong): the equivalent
    * `aggregate(zip_with(...))` formulation evaluates its lambdas
    * interpreted and dominated every vector query's profile. Identical
    * semantics incl. null/length-mismatch → null (spec-pinned). */
  def dotQuantized(qa: Column, qb: Column): Column =
    graft.plans.VectorKernels.dot_long(qa, qb)

  /** Exact quantized dot product of two float-array columns. */
  def dotDec(a: Column, b: Column): Column =
    dotQuantized(quantize(a), quantize(b))

  /** Exact quantized squared norm. */
  def normSqDec(a: Column): Column = dotDec(a, a)

  /** Cosine from a precomputed dot and squared norms (all double).
    * greatest(denom, 1e-9): a zero vector (or one that quantizes to
    * zero) must yield cosine 0, not a divide-by-zero — the oracles
    * guard identically. */
  def cosineFrom(dot: Column, nsqA: Column, nsqB: Column): Column =
    dot / greatest(sqrt(nsqA) * sqrt(nsqB), lit(1e-9))

  /** Direct cosine of two vectors (prefer precomputing norms per row
    * before a join — see VectorOps). */
  def cosine(a: Column, b: Column): Column =
    cosineFrom(dotDec(a, b).cast(DoubleType),
      normSqDec(a).cast(DoubleType), normSqDec(b).cast(DoubleType))
}
