package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.OuterProductAgg
import graft.sources.Tables

/** Embedding covariance / principal components via one-pass moment
  * statistics (SURVEY.md §2 row 168) — the whitening step embedding
  * pipelines run before similarity search: the top principal
  * directions of a sentence-embedding corpus carry corpus-wide (not
  * semantic) variance, and removing them ("all-but-the-top", Mu &
  * Viswanath, ICLR'18) sharpens cosine geometry for the row-36/98
  * near-dup and row-39 ANN families.
  *
  * Split of labor (the k-means / row-167 contract): the CORPUS-scale
  * work — Σ x xᵀ upper triangle, Σ x, N over quantized embeddings —
  * is ONE [[OuterProductAgg]] pass: constant O(dim²) buffer per map
  * task, elementwise-additive merges, pure long arithmetic, DuckDB-
  * replayable exactly. The dim×dim eigendecomposition (power
  * iteration + deflation on the centered covariance) is a bounded
  * DRIVER model — doubles, deterministic (fixed init, fixed iteration
  * count), spec-pinned rather than oracle-hashed.
  *
  * Quantization: floor(x·scale) per coordinate (the dotSql kernel's
  * floor — both engines floor identically). Scale defaults to 1e3,
  * holding the overflow contract s²·rows < 2^63 past 1e12 rows.
  */
object PcaOps {

  /** floor-quantized long vector. */
  private def quantize(vecCol: Column, scale: Long): Column =
    transform(vecCol, x => floor(x.cast(DoubleType) * scale).cast(LongType))

  /** The packed one-row statistics array (see [[OuterProductAgg]]). */
  def momentStats(df: DataFrame, vecCol: String, dim: Int,
                  scale: Long = 1000L): DataFrame =
    df.agg(OuterProductAgg.outer_product(
      quantize(col(vecCol), scale), dim).as("stats"))

  /** The statistics unpacked to (i, j, s) rows: products at i ≤ j <
    * dim, first moments at j = dim, the count at (dim, dim) — the
    * oracle-comparable surface. The unpack is a posexplode of the
    * single O(dim²) array joined to a dim²-bounded literal index map
    * (broadcast), not a corpus-side explode. */
  def momentRows(df: DataFrame, vecCol: String, dim: Int,
                 scale: Long = 1000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idx = ((for { i <- 0 until dim; j <- i until dim }
        yield (OuterProductAgg.entryIndex(i, j, dim), i.toLong, j.toLong)) ++
      (0 until dim).map(i =>
        (OuterProductAgg.entryIndex(i, dim, dim), i.toLong, dim.toLong)) :+
      (OuterProductAgg.entryIndex(dim, dim, dim), dim.toLong, dim.toLong))
      .toDF("pos", "i", "j")
    momentStats(df, vecCol, dim, scale)
      .select(posexplode(col("stats")).as(Seq("pos", "s")))
      .join(broadcast(idx), "pos")
      .select(col("i"), col("j"), col("s"))
  }

  /** Driver-side eigendecomposition of the centered covariance from
    * collected statistics: `n` power-iteration components with
    * deflation, deterministic init (basis vector of the largest
    * diagonal). Returns (eigenvalue, unit eigenvector) pairs, leading
    * first; each vector's sign is fixed (largest-|coordinate| entry
    * positive) so results are reproducible across runs. */
  def principalComponents(stats: Array[Long], dim: Int, n: Int,
                          iters: Int = 100): Seq[(Double, Array[Double])] = {
    require(n >= 1 && n <= dim, s"need 1 <= n <= dim, got $n")
    val cnt = stats(OuterProductAgg.entryIndex(dim, dim, dim)).toDouble
    require(cnt > 0, "no rows contributed to the statistics")
    val mu = Array.tabulate(dim)(i =>
      stats(OuterProductAgg.entryIndex(i, dim, dim)) / cnt)
    val c = Array.tabulate(dim, dim) { (i, j) =>
      val (lo, hi) = (math.min(i, j), math.max(i, j))
      stats(OuterProductAgg.entryIndex(lo, hi, dim)) / cnt - mu(i) * mu(j)
    }
    (0 until n).map { _ =>
      var v = Array.tabulate(dim)(i =>
        if (i == (0 until dim).maxBy(d => c(d)(d))) 1.0 else 0.0)
      var lambda = 0.0
      for (_ <- 0 until iters) {
        val w = Array.tabulate(dim)(i =>
          (0 until dim).map(j => c(i)(j) * v(j)).sum)
        val nrm = math.sqrt(w.map(x => x * x).sum)
        if (nrm > 1e-300) {
          v = w.map(_ / nrm)
          lambda = nrm
        }
      }
      // sign convention: largest-|coordinate| entry positive
      val m = (0 until dim).maxBy(i => math.abs(v(i)))
      if (v(m) < 0) v = v.map(-_)
      // deflate: C <- C - lambda v vt
      for (i <- 0 until dim; j <- 0 until dim) c(i)(j) -= lambda * v(i) * v(j)
      (lambda, v)
    }
  }

  /** One-call fit: one distributed pass, bounded driver solve. */
  def fitPrincipalComponents(df: DataFrame, vecCol: String, dim: Int, n: Int,
                             scale: Long = 1000L): Seq[(Double, Array[Double])] = {
    val stats = momentStats(df, vecCol, dim, scale)
      .head().getSeq[Long](0).toArray
    principalComponents(stats, dim, n)
  }

  /** The whitening APPLICATION ("all-but-the-top"): subtract each
    * vector's projection onto the given components — v ← v − Σ_c
    * (v·c) c. The components are a bounded driver model shipped as
    * LITERAL arrays into one codegen-friendly column expression
    * (zip_with/aggregate over the vector), so application is a pure
    * per-row projection: zero exchanges, corpus never funnels.
    * Double-valued (the post-statistics side of the row-168 contract)
    * — spec-verified, not oracle-hashed. */
  def removeComponents(df: DataFrame, vecCol: String,
                       components: Seq[Array[Double]]): DataFrame = {
    val out = components.foldLeft(col(vecCol).cast(ArrayType(DoubleType))) { (v, c) =>
      val lc = array(c.map(lit): _*)
      val proj = aggregate(zip_with(v, lc, (a, b) => a * b),
        lit(0.0d), (acc, x) => acc + x)
      zip_with(v, lc, (a, b) => a - proj * b)
    }
    df.withColumn(vecCol, out)
  }

  /** §2 row 168 — the moment statistics of the embeddings table. */
  def embedMomentsQ(s: SparkSession, d: String): DataFrame =
    momentRows(Tables.embeddings(s, d), "embedding", dim = 64)
      .orderBy(col("i"), col("j"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_moments" -> (embedMomentsQ _),
  )

  val oracles: Map[String, String] = Map(
    // the same floor-quantized products, summed in HUGEINT over an
    // unnested (i <= j) pair grid; first moments at j = 64, count at
    // (64, 64)
    "q_embed_moments" ->
      """WITH q AS (
        |  SELECT list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |grid AS (
        |  SELECT a.i, b.j
        |  FROM (SELECT unnest(range(0, 64)) AS i) a,
        |       (SELECT unnest(range(0, 64)) AS j) b
        |  WHERE a.i <= b.j),
        |prods AS (
        |  SELECT g.i, g.j, CAST(SUM(qv[g.i + 1] * qv[g.j + 1]) AS BIGINT) AS s
        |  FROM q, grid g GROUP BY g.i, g.j),
        |moments AS (
        |  SELECT g.i, CAST(64 AS BIGINT) AS j, CAST(SUM(qv[g.i + 1]) AS BIGINT) AS s
        |  FROM q, (SELECT unnest(range(0, 64)) AS i) g GROUP BY g.i),
        |cnt AS (SELECT CAST(64 AS BIGINT) AS i, CAST(64 AS BIGINT) AS j,
        |        CAST(COUNT(*) AS BIGINT) AS s FROM q)
        |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, s
        |FROM (SELECT * FROM prods UNION ALL SELECT * FROM moments UNION ALL SELECT * FROM cnt) t
        |ORDER BY i, j""".stripMargin,
  )
}
