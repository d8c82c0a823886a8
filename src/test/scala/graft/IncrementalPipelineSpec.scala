package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusOps, Dedup, TrainingOps, TrainingPipeline}
import graft.sources.Tables

/** Incremental corpus→shards ingest (§2.5): full-run equivalence under
  * a monotone-id cut, plus constructed coverage of both tombstone paths
  * (near-dup supersession via a bridging batch doc; retroactive
  * decontamination via a new test doc).
  */
class IncrementalPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- full-run equivalence ----------------------------------------------

  test("incremental ingest over an id cut equals the full run's live membership") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val maxId = docs.agg(max($"doc_id")).first().getLong(0)
    val cut = (maxId * 3) / 4
    val corpus = docs.filter($"doc_id" <= cut)
    val batch = docs.filter($"doc_id" > cut)

    val full = TrainingPipeline.run(docs)
      .select($"doc_id", $"split", $"lang", $"n_tokens")
    val delta = TrainingPipeline.runIncremental(
      TrainingPipeline.bootstrapState(corpus), batch)
    val live = delta.state.manifest
      .select($"doc_id", $"split", $"lang", $"n_tokens")

    assert(live.count() > 0)
    val onlyFull = full.exceptAll(live).count()
    val onlyInc = live.exceptAll(full).count()
    assert(onlyFull == 0 && onlyInc == 0,
      s"membership diverges: $onlyFull docs only in full run, $onlyInc only incremental")
  }

  // ---- constructed tombstone scenarios -----------------------------------

  /** 30-word shared core; distinct 15-word suffixes put 3-gram Jaccard
    * at 28/43 ≈ 0.65 vs the core doc (near-dup at 0.5) while the two
    * extended docs share only 28/58 ≈ 0.48 (NOT near-dups of each
    * other) — the bridge shape that merges two shipped canonicals. */
  private val core = (1 to 30).map(i => s"core$i").mkString(" ")
  private def suffixed(tag: String) =
    core + " " + (1 to 15).map(i => s"$tag$i").mkString(" ")

  /** 45 distinct words, no 8-gram shared with anything else. */
  private def filler(tag: String) =
    (1 to 45).map(i => s"$tag$i").mkString(" ")

  /** First id in `from` whose deterministic split is `want`. */
  private def idWithSplit(want: String, from: Range): Long = {
    val hit = from.find { i =>
      val b = spark.range(1).select(TrainingOps.splitBucket(lit(i.toLong)))
        .first().getLong(0)
      val s = if (b < 80) "train" else if (b < 90) "val" else "test"
      s == want
    }
    assert(hit.isDefined, s"no id in $from maps to split $want")
    hit.get.toLong
  }

  test("a bridging batch doc supersedes the larger shipped canonical") {
    val corpus = Seq(
      (1L, "en", suffixed("alpha")),
      (2L, "en", suffixed("beta")),
      (3L, "en", filler("pad"))
    ).toDF("doc_id", "lang", "text")
    val batch = Seq(
      (10L, "en", core) // the bare core: J = 28/43 ≈ 0.65 to each side
    ).toDF("doc_id", "lang", "text")

    // precondition: LSH actually surfaces both bridge pairs and not the
    // direct pair (content-deterministic; fails loudly if the banding
    // or shingling ever changes)
    val pairs = Dedup.minhashNearDups(corpus.unionByName(batch), "doc_id", "text")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 10L)) && pairs.contains((2L, 10L)),
      s"bridge pairs not surfaced by LSH: $pairs")
    assert(!pairs.contains((1L, 2L)), s"docs 1 and 2 must not pair directly: $pairs")

    val st0 = TrainingPipeline.bootstrapState(corpus)
    assert(st0.manifest.select($"doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L),
      "both canonicals (and the filler) ship in the bootstrap")

    val delta = TrainingPipeline.runIncremental(st0, batch)
    val tombs = delta.tombstones.as[(Long, String)].collect().toMap
    assert(tombs == Map(2L -> "superseded"),
      s"doc 2 (merged component, min = 1) must be superseded: $tombs")
    assert(delta.accepted.filter($"doc_id" === 10L).count() == 0,
      "the bridging doc is not canonical (component min is 1) and must not ship")
    val live = delta.state.manifest.select($"doc_id").as[Long].collect().toSet
    assert(live == Set(1L, 3L), s"live manifest after supersession: $live")
  }

  test("a new test doc retroactively decontaminates a shipped train doc") {
    // ids chosen by their deterministic split assignment
    val trainId = idWithSplit("train", 100 to 199)
    val testId = idWithSplit("test", 200 to 299)
    val otherId = idWithSplit("train", (trainId.toInt + 1) to 199)

    val leakRun = (1 to 8).map(i => s"leak$i").mkString(" ")
    val trainText = leakRun + " " + (1 to 37).map(i => s"tr$i").mkString(" ")
    val testText = (1 to 37).map(i => s"te$i").mkString(" ") + " " + leakRun

    val corpus = Seq(
      (trainId, "en", trainText),
      (otherId, "en", filler("oc"))
    ).toDF("doc_id", "lang", "text")
    val batch = Seq(
      (testId, "en", testText)
    ).toDF("doc_id", "lang", "text")

    val st0 = TrainingPipeline.bootstrapState(corpus)
    assert(st0.manifest.filter($"doc_id" === trainId && $"split" === "train").count() == 1,
      "the train doc ships in the bootstrap")

    val delta = TrainingPipeline.runIncremental(st0, batch)
    val tombs = delta.tombstones.as[(Long, String)].collect().toMap
    assert(tombs == Map(trainId -> "decontaminated"),
      s"the shipped train doc must be tombstoned by the new test doc: $tombs")
    assert(delta.accepted.filter($"doc_id" === testId && $"split" === "test").count() == 1,
      "the new test doc itself ships (test docs are never decon-dropped)")
    assert(delta.state.manifest.filter($"doc_id" === trainId).count() == 0)
    // dead docs must not witness leaks: the decontaminated doc's
    // shingles leave the state too (kept, they would re-emit a
    // tombstone for an already-dead doc on every later test overlap)
    assert(delta.state.shingles.filter($"doc_id" === trainId).count() == 0,
      "decontaminated doc's shingles must leave the witness state")
  }

  test("exact batch dups of shipped docs drop silently; bins never collide") {
    val corpus = Seq(
      (1L, "en", filler("one")),
      (2L, "en", filler("two"))
    ).toDF("doc_id", "lang", "text")
    val batch = Seq(
      (10L, "en", filler("one")), // exact dup of shipped doc 1
      (11L, "en", filler("new"))
    ).toDF("doc_id", "lang", "text")

    val st0 = TrainingPipeline.bootstrapState(corpus)
    val delta = TrainingPipeline.runIncremental(st0, batch)
    assert(delta.tombstones.count() == 0)
    val acc = delta.accepted.select($"doc_id").as[Long].collect().toSet
    assert(acc == Set(11L), s"only the genuinely new doc ships: $acc")
    // shipped bins are immutable: new bins open after each group's max
    val collisions = delta.accepted.select($"split", $"lang", $"bin")
      .intersect(st0.manifest.select($"split", $"lang", $"bin")).count()
    assert(collisions == 0)
  }

  test("state survives a parquet round-trip (the deployment form)") {
    val corpus = Seq(
      (1L, "en", suffixed("alpha")),
      (2L, "en", suffixed("beta")),
      (3L, "en", filler("pad"))
    ).toDF("doc_id", "lang", "text")
    val batch = Seq((10L, "en", core)).toDF("doc_id", "lang", "text")

    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString
    TrainingPipeline.saveState(TrainingPipeline.bootstrapState(corpus), dir)
    val delta = TrainingPipeline.runIncremental(
      TrainingPipeline.loadState(spark, dir), batch)

    // identical outcome to the in-memory bridge scenario
    val tombs = delta.tombstones.as[(Long, String)].collect().toMap
    assert(tombs == Map(2L -> "superseded"), s"$tombs")
    assert(delta.state.manifest.select($"doc_id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("an empty batch is a no-op") {
    val corpus = Seq((1L, "en", filler("solo"))).toDF("doc_id", "lang", "text")
    val batch = corpus.filter($"doc_id" < 0)
    val delta = TrainingPipeline.runIncremental(
      TrainingPipeline.bootstrapState(corpus), batch)
    assert(delta.accepted.count() == 0 && delta.tombstones.count() == 0)
    assert(delta.state.manifest.select($"doc_id").as[Long].collect().toSet == Set(1L))
  }
}
