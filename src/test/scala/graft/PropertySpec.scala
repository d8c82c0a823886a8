package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RollingMinHash
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{OpenSession, SessionEvent}

/** Property tests for the driver-side algorithmic kernels (no Spark
  * session needed — these must hold for ANY input, not just the
  * corpus). */
class PropertySpec extends AnyFunSuite {

  /** Minimal deterministic forAll (the scalatest-scalacheck bridge is
    * not in the offline cache): 200 samples from a fixed seed. */
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    (0 until 200).foreach { _ =>
      for (a <- ga.apply(Gen.Parameters.default, seed);
           b <- gb.apply(Gen.Parameters.default, seed.next)) f(a, b)
      seed = seed.next.next
    }
  }
  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(7L)
    (0 until 200).foreach { _ =>
      for (a <- ga.apply(Gen.Parameters.default, seed);
           b <- gb.apply(Gen.Parameters.default, seed.next);
           c <- gc.apply(Gen.Parameters.default, seed.next.next)) f(a, b, c)
      seed = seed.next.next.next
    }
  }

  // ---- RollingMinHash ---------------------------------------------------

  private def naive(s: String, k: Int): Long = {
    val b = s.getBytes("UTF-8")
    if (b.length < k) return Long.MaxValue
    def mix(x0: Long): Long = {
      var z = x0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d4ecda9226d4e9L
      z ^ (z >>> 31)
    }
    (0 to b.length - k).map { i =>
      var h = 0L; var j = 0
      while (j < k) { h = h * RollingMinHash.Base + (b(i + j) & 0xff); j += 1 }
      mix(h)
    }.min
  }

  test("rolling hash equals the naive O(n*k) computation on arbitrary strings") {
    forAll(Gen.asciiPrintableStr, Gen.choose(1, 12)) { (s: String, k: Int) =>
      assert(RollingMinHash.compute(UTF8String.fromString(s), k) == naive(s, k))
    }
  }

  test("rolling hash on unicode input agrees with the byte-level reference") {
    forAll(Gen.listOf(Gen.oneOf(Gen.alphaChar, Gen.oneOf('é', 'ß', '中'))),
      Gen.choose(1, 8)) { (cs: List[Char], k: Int) =>
      val s = cs.mkString
      assert(RollingMinHash.compute(UTF8String.fromString(s), k) == naive(s, k))
    }
  }

  // ---- Session folding --------------------------------------------------

  private val eventGen = for {
    t <- Gen.choose(0L, 10000L)
    v <- Gen.choose(-100, 100)
  } yield SessionEvent(1L, t * 1000000, v.toDouble)

  test("session fold: counts and sums are conserved, intervals are ordered") {
    forAll(Gen.listOf(eventGen), Gen.choose(1, 60)) {
      (evs: List[SessionEvent], gapMin: Int) =>
        val gapUs = StatefulSessions.gapMicros(gapMin)
        val (closed, open) = StatefulSessions.step(None, evs, gapUs)
        val total = closed.map(_._1.n).sum + open.map(_.n).getOrElse(0L)
        assert(total == evs.size)
        val sum = closed.map(_._1.sum).sum + open.map(_.sum).getOrElse(0.0)
        assert(math.abs(sum - evs.map(_.value).sum) < 1e-6)
        // every closed session: start <= end, and the NEXT session
        // starts more than gap after it ends
        val all = closed.map(_._1) ++ open.toList
        all.foreach(s => assert(s.start_us <= s.last_us))
        all.sliding(2).foreach {
          case Seq(a, b) => assert(b.start_us - a.last_us > gapUs)
          case _ => ()
        }
    }
  }

  test("session fold is batch-split invariant (ordered input)") {
    forAll(Gen.listOf(eventGen), Gen.choose(1, 60), Gen.choose(0, 100)) {
      (evsRaw: List[SessionEvent], gapMin: Int, splitRaw: Int) =>
        val evs = evsRaw.sortBy(_.ts_us)
        val gapUs = StatefulSessions.gapMicros(gapMin)
        val split = if (evs.isEmpty) 0 else splitRaw % (evs.size + 1)
        val (c1, o1) = StatefulSessions.step(None, evs, gapUs)
        val (a, b) = evs.splitAt(split)
        val (c2a, o2a) = StatefulSessions.step(None, a, gapUs)
        val (c2b, o2b) = StatefulSessions.step(o2a, b, gapUs)
        assert(c2a ++ c2b == c1)
        assert(o2b == o1)
    }
  }

  // ---- SpaceSaving never-undercount -------------------------------------

  test("SpaceSaving counts never undercount the true frequency") {
    import scala.collection.mutable
    forAll(Gen.listOf(Gen.choose(0, 30).map(i => s"w$i")), Gen.choose(2, 8)) {
      (items: List[String], capacity: Int) =>
        // simulate update() exactly as the aggregate does
        val buf = mutable.HashMap.empty[String, Long]
        items.foreach { item =>
          buf.get(item) match {
            case Some(c) => buf.update(item, c + 1)
            case None if buf.size < capacity => buf.update(item, 1L)
            case None =>
              val (mi, mc) = buf.minBy { case (i, c) => (c, i) }
              buf.remove(mi); buf.update(item, mc + 1)
          }
        }
        val truth = items.groupBy(identity).view.mapValues(_.size.toLong)
        buf.foreach { case (item, est) =>
          assert(est >= truth.getOrElse(item, 0L),
            s"undercounted $item: est=$est true=${truth.getOrElse(item, 0L)}")
        }
    }
  }

  // ---- Greedy packing kernel (TrainingOps.packScan) ---------------------

  test("packScan: every doc binned once, no multi-doc bin overflows, bins contiguous") {
    val genRows = Gen.listOf(Gen.zip(
      Gen.oneOf("a", "b", "c"), Gen.choose(1L, 400L)))
    val genCap = Gen.choose(1L, 600L)
    forAll(genRows, genCap) { (rows, cap) =>
      // the kernel's contract: input sorted by (grp, id), ids unique
      val sorted = rows.zipWithIndex
        .map { case ((g, t), i) => (g, i.toLong, t) }
        .sortBy { case (g, id, _) => (g, id) }
      val out = graft.operators.TrainingOps.packScan(sorted.iterator, cap).toList

      assert(out.map(r => (r._1, r._2, r._3)) == sorted, "rows pass through unchanged")
      out.groupBy(r => (r._1, r._4)).foreach { case ((g, bin), docs) =>
        assert(bin >= 0)
        if (docs.size > 1)
          assert(docs.map(_._3).sum <= cap,
            s"multi-doc bin ($g,$bin) holds ${docs.map(_._3).sum} > $cap")
      }
      out.groupBy(_._1).foreach { case (g, docs) =>
        val bins = docs.map(_._4)
        assert(bins.head == 0L, s"group $g must start at bin 0")
        bins.sliding(2).foreach {
          case Seq(x, y) => assert(y == x || y == x + 1,
            s"group $g bins must be contiguous and non-decreasing, saw $x -> $y")
          case _ => ()
        }
      }
    }
  }
}
