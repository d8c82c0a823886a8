package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.StateStore

/** A REAL object-store round-trip (SURVEY.md §2 row 306): every byte
  * crosses a loopback socket as an HTTP request against a flat blob
  * namespace with S3-like semantics — immutable whole-object PUTs,
  * prefix listings, dir markers, client-side copy-then-delete renames,
  * and server-side fault injection (real 500s, not thrown exceptions).
  * The round-13 "what's missing" item was: no real object-store
  * round-trip has ever run; this is the sandbox-complete version. */
class HttpObjectStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withStore[T](body: (HttpObjectStore.Server, String) => T): T = {
    val srv = new HttpObjectStore.Server
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.grafths.impl", classOf[HttpObjectStoreFs].getName)
    conf.set("fs.grafths.endpoint", srv.endpoint)
    // a fresh FS instance per endpoint: the cached one would keep the
    // previous test's (stopped) server address
    org.apache.hadoop.fs.FileSystem.closeAll()
    try body(srv, s"grafths:///t${System.nanoTime()}")
    finally srv.stop()
  }

  private def docs(n: Int) =
    (1 to n).map(i => (i.toLong, s"lang${i % 3}", s"text $i body")).toDF("doc_id", "lang", "text")

  test("parquet write -> read round trip runs entirely over HTTP") {
    withStore { (srv, root) =>
      docs(50).write.mode("overwrite").parquet(s"$root/tbl")
      val back = spark.read.parquet(s"$root/tbl")
      assert(back.count() == 50)
      assert(back.orderBy($"doc_id").collect().toSeq ==
        docs(50).orderBy($"doc_id").collect().toSeq)
      assert(srv.puts.get() > 0) // the bytes actually crossed the wire
    }
  }

  test("StateStore bootstrap/delta/load/compact lifecycle over the wire") {
    withStore { (_, root) =>
      import graft.operators.TrainingPipeline
      val store = s"$root/state"
      def filler(tag: String) = (1 to 45).map(i => s"$tag$i").mkString(" ")
      val corpus = (1 to 12).map(i => (i.toLong, "en", filler(s"c${i}w")))
        .toDF("doc_id", "lang", "text")
      val batch = (1 to 3).map(i => (100L + i, "en", filler(s"hw$i")))
        .toDF("doc_id", "lang", "text")
      val v0 = StateStore.commitBootstrap(
        spark, TrainingPipeline.bootstrapState(corpus), store)
      val st = StateStore.load(spark, store)
      assert(st.nonEmpty && st.get.manifest.count() == 12)
      val v1 = StateStore.commitDelta(spark,
        TrainingPipeline.runIncremental(st.get, batch), store)
      assert(v1 == v0 + 1)
      assert(StateStore.compact(spark, store) == v1) // DirSwap over HTTP
      val live = StateStore.load(spark, store).get.manifest
        .select($"doc_id").as[Long].collect().toSet
      assert(live == ((1 to 12).map(_.toLong) ++ (1 to 3).map(100L + _)).toSet)
    }
  }

  test("CDX manifest commit stays atomic under real failed PUTs") {
    withStore { (srv, root) =>
      val dir = s"$root/cdx"
      val cols = Seq("surt", "warc_date", "file", "rec_offset",
        "content_length", "digest", "url_canon")
      def sample(n: Int) = (1 to n).map { i =>
        (f"com,s$i%03d)/p", s"2024-01-0${i % 9 + 1}T00:00:00Z",
          s"a$i.warc", i.toLong * 10, i.toLong, i.toLong * 3, s"https://s$i/p")
      }.toDF(cols: _*)
      def write(df: org.apache.spark.sql.DataFrame, mode: String) =
        df.repartitionByRange(3, $"surt").sortWithinPartitions($"surt")
          .write.format("graft.sources.v2.CdxSource")
          .option("path", dir).mode(mode).save()
      def count() = spark.read.format("graft.sources.v2.CdxSource")
        .option("path", dir).load().count()

      write(sample(9), "overwrite")
      assert(count() == 9)
      // every subsequent PUT fails with a real HTTP 500: promotes are
      // GET+PUT copies, so the commit dies mid-promote over the wire
      srv.armPutFailures(1000)
      try intercept[Exception] { write(sample(9), "append") }
      finally srv.disarm()
      assert(count() == 9) // prior table intact, nothing partial
      write(sample(9), "append") // the retry lands exactly once
      assert(count() == 18)
    }
  }

  test("rename is copy-then-delete per object; empty dirs live via markers") {
    withStore { (_, root) =>
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val a = new org.apache.hadoop.fs.Path(s"$root/a")
      fs.mkdirs(a)
      assert(fs.getFileStatus(a).isDirectory) // marker keeps it alive
      val f1 = new org.apache.hadoop.fs.Path(s"$root/a/x.txt")
      val out = fs.create(f1, true)
      out.write("hello".getBytes("UTF-8")); out.close()
      val b = new org.apache.hadoop.fs.Path(s"$root/b")
      assert(fs.rename(a, b))
      assert(!fs.exists(f1))
      val in = fs.open(new org.apache.hadoop.fs.Path(s"$root/b/x.txt"))
      val got = new String(in.readAllBytes(), "UTF-8"); in.close()
      assert(got == "hello")
      // rename refuses an existing destination (the no-clobber contract
      // the optimistic-commit protocols rely on)
      fs.mkdirs(a)
      assert(!fs.rename(a, b))
    }
  }

  test("interleaved-writer race over the wire: loser recomputes, 500-killed commit retries clean") {
    // round-14 verdict item 8: StateRaceSpec's lost-update interleaving
    // replayed over real HTTP sockets — then a commit killed mid-flight
    // by injected 500s must leave the store readable at the prior
    // version and a clean retry must land.
    withStore { (srv, root) =>
      import graft.operators.TrainingPipeline
      import graft.sources.StateStore
      def filler(tag: String) = (1 to 45).map(i => s"$tag$i").mkString(" ")
      def batchOf(base: Long, tag: String) =
        (1 to 3).map(i => (base + i, "en", filler(s"$tag${i}w")))
          .toDF("doc_id", "lang", "text")
      val corpus = (1 to 3).map(i => (i.toLong, "en", filler(s"c${i}w")))
        .toDF("doc_id", "lang", "text")
      val store = s"$root/state"
      StateStore.commitBootstrap(spark,
        TrainingPipeline.bootstrapState(corpus), store)

      // the classic lost-update interleaving, every byte over a socket
      var aCalls = 0
      val vA = StateStore.commitDeltaOptimistic(spark, store) { st =>
        aCalls += 1
        if (aCalls == 1)
          StateStore.commitDeltaOptimistic(spark, store) { stB =>
            TrainingPipeline.runIncremental(stB.get, batchOf(3000L, "bb"))
          }
        TrainingPipeline.runIncremental(st.get, batchOf(2000L, "aa"))
      }
      assert(vA == 2L && aCalls == 2)
      def ids() = StateStore.load(spark, store).get.manifest
        .select($"doc_id").as[Long].collect().toSet
      assert(Set(2001L, 3001L).subsetOf(ids()))

      // a commit dying to real 500s mid-write must not corrupt the
      // store: prior state stays fully readable, the retry lands once
      srv.armPutFailures(1000)
      try intercept[Exception] {
        StateStore.commitDeltaOptimistic(spark, store) { st =>
          TrainingPipeline.runIncremental(st.get, batchOf(4000L, "cc"))
        }
      } finally srv.disarm()
      assert(StateStore.latestVersion(spark, store).contains(2L))
      val before = ids()
      assert(!before.exists(_ >= 4000L), s"partial commit visible: $before")
      StateStore.commitDeltaOptimistic(spark, store) { st =>
        TrainingPipeline.runIncremental(st.get, batchOf(4000L, "cc"))
      }
      assert(Set(4001L, 4002L, 4003L).subsetOf(ids()))
      assert(StateStore.latestVersion(spark, store).contains(3L))
    }
  }
}
