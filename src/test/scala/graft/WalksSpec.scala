package graft

import graft.learn.{DetRandom, Walks}
import org.apache.spark.sql.functions._

class WalksSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("src", "dst")

  /** Driver-side replay of the walk recurrence over a collected
    * adjacency — the naive reference the distributed operator must
    * reproduce row-for-row. */
  private def naive(
      pairs: Seq[(Long, Long)], nWalks: Int, steps: Int,
      seed: Long): Set[(Long, Long, Long)] = {
    val sym = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
    val adj = sym.groupBy(_._1).map { case (u, vs) =>
      u -> vs.map(_._2).sorted.toIndexedSeq
    }
    adj.keys.flatMap { id =>
      (0 until nWalks).flatMap { g =>
        val wid = id * nWalks + g
        var cur = id
        Seq((wid, 0L, id)) ++ (1 to steps).map { t =>
          val nbrs = adj(cur)
          val choice =
            (DetRandom.mixLong(cur, wid * 31L + t, seed) % nbrs.size).toInt
          cur = nbrs(choice)
          (wid, t.toLong, cur)
        }
      }
    }.toSet
  }

  test("walks match the driver-side naive replay on a random graph") {
    val rng = new scala.util.Random(7)
    val pairs = (0 until 120).map { _ =>
      val a = rng.nextInt(25).toLong; val b = rng.nextInt(25).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val got = Walks.randomWalks(edges(pairs: _*), nWalks = 2, steps = 4,
        seed = 42L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === naive(pairs, nWalks = 2, steps = 4, seed = 42L))
  }

  test("every consecutive step is an edge and walk shape is exact") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (2L, 4L))
    val w = Walks.randomWalks(edges(pairs: _*), nWalks = 3, steps = 5,
      seed = 9L).cache()
    val rows = w.as[(Long, Long, Long)].collect()
    // 4 nodes × 3 walks × 6 rows
    assert(rows.length === 4 * 3 * 6)
    val byWalk = rows.groupBy(_._1).view.mapValues(
      _.sortBy(_._2).map(_._3).toSeq).toMap
    assert(byWalk.size === 12)
    val sym = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }.toSet
    byWalk.foreach { case (wid, path) =>
      assert(path.head === wid / 3) // walk starts at its owner node
      path.sliding(2).foreach { s =>
        assert(sym.contains(s.head -> s(1)),
          s"walk $wid hops a non-edge ${s.head}->${s(1)}")
      }
    }
    w.unpersist()
  }

  test("partition independence and canonicalization") {
    val rng = new scala.util.Random(11)
    val pairs = (0 until 80).map { _ =>
      (rng.nextInt(20).toLong, rng.nextInt(20).toLong)
    }.filter(p => p._1 != p._2)
    // raw (uncanonicalized, duplicated, both orientations) input
    val raw = edges(pairs: _*)
    val a = Walks.randomWalks(raw.repartition(1), steps = 3)
      .as[(Long, Long, Long)].collect().toSet
    val b = Walks.randomWalks(raw.repartition(7), steps = 3)
      .as[(Long, Long, Long)].collect().toSet
    val c = Walks.randomWalks(
        edges(pairs.map(p => (math.max(p._1, p._2), math.min(p._1, p._2))): _*),
        steps = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(a === b)
    assert(a === c)
  }

  /** Driver-side replay of the node2vec recurrence. */
  private def naiveN2v(
      pairs: Seq[(Long, Long)], nWalks: Int, steps: Int,
      wRet: Long, wIn: Long, wOut: Long,
      seed: Long): Set[(Long, Long, Long)] = {
    val sym = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
    val adj = sym.groupBy(_._1).map { case (u, vs) =>
      u -> vs.map(_._2).sorted.toIndexedSeq
    }
    val nbr = sym.toSet
    adj.keys.flatMap { id =>
      (0 until nWalks).flatMap { g =>
        val wid = id * nWalks + g
        var prev = id
        var cur = {
          val nbrs = adj(id)
          nbrs((DetRandom.mixLong(id, wid * 31L + 1, seed) % nbrs.size).toInt)
        }
        Seq((wid, 0L, id), (wid, 1L, cur)) ++ (2 to steps).map { t =>
          val cands = adj(cur)
          val wts = cands.map { v =>
            if (v == prev) wRet
            else if (nbr.contains(prev -> v)) wIn
            else wOut
          }
          val r = DetRandom.mixLong(cur, wid * 31L + t, seed) % wts.sum
          var acc = 0L; var pick = -1
          wts.indices.foreach { i =>
            if (pick < 0) { acc += wts(i); if (r < acc) pick = i }
          }
          prev = cur; cur = cands(pick)
          (wid, t.toLong, cur)
        }
      }
    }.toSet
  }

  test("node2vecWalks match the driver-side replay; edges only; partition-independent") {
    val rng = new scala.util.Random(31)
    val pairs = (0 until 120).map { _ =>
      val a = rng.nextInt(25).toLong; val b = rng.nextInt(25).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val e = edges(pairs: _*)
    val got = Walks.node2vecWalks(e, nWalks = 2, steps = 4,
        wRet = 1L, wIn = 4L, wOut = 2L, seed = 42L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === naiveN2v(pairs, 2, 4, 1L, 4L, 2L, 42L))
    val sym = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }.toSet
    got.groupBy(_._1).foreach { case (wid, rows) =>
      val path = rows.toSeq.sortBy(_._2).map(_._3)
      assert(path.length === 5, s"walk $wid truncated")
      path.sliding(2).foreach(s =>
        assert(sym.contains(s.head -> s(1)), s"walk $wid hops a non-edge"))
    }
    val got7 = Walks.node2vecWalks(e.repartition(7), nWalks = 2, steps = 4,
        wRet = 1L, wIn = 4L, wOut = 2L, seed = 42L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got7 === got)
  }

  test("node2vec return bias: huge wRet makes step 2 revisit the start") {
    val pairs = {
      val rng = new scala.util.Random(37)
      (0 until 150).map { _ =>
        val a = rng.nextInt(30).toLong; val b = rng.nextInt(30).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
    }
    val rows = Walks.node2vecWalks(edges(pairs: _*), nWalks = 2, steps = 2,
        wRet = 1000000L, wIn = 1L, wOut = 1L, seed = 42L)
      .as[(Long, Long, Long)].collect()
    val byWalk = rows.groupBy(_._1)
    val returned = byWalk.values.count { rs =>
      val p = rs.sortBy(_._2).map(_._3); p(2) == p(0)
    }
    assert(returned.toDouble / byWalk.size > 0.9,
      s"only $returned/${byWalk.size} walks returned under a 1e6 return weight")
  }

  test("skipGramPairs: matches the naive window expansion of the naive walks") {
    val rng = new scala.util.Random(23)
    val pairs = (0 until 100).map { _ =>
      val a = rng.nextInt(20).toLong; val b = rng.nextInt(20).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val walks = Walks.randomWalks(edges(pairs: _*), nWalks = 2, steps = 4,
      seed = 42L)
    val got = Walks.skipGramPairs(walks, window = 2)
      .as[(Long, Long, Long)].collect().toSet
    val nWalks = naive(pairs, nWalks = 2, steps = 4, seed = 42L)
      .groupBy(_._1).view.mapValues(_.toSeq.sortBy(_._2).map(_._3)).toMap
    val expected = nWalks.values.flatMap { path =>
      for {
        i <- path.indices; j <- path.indices
        if i != j && math.abs(i - j) <= 2
      } yield (path(i), path(j))
    }.groupBy(identity).map { case ((s, c), xs) => (s, c, xs.size.toLong) }
      .toSet
    assert(got === expected)
    // symmetric by construction: (a,b,n) present iff (b,a,n) present
    got.foreach { case (s, c, n) => assert(got.contains((c, s, n))) }
  }

  test("pairLift: exact integer lift over the naive pair table") {
    val rng = new scala.util.Random(41)
    val pairs = (0 until 100).map { _ =>
      val a = rng.nextInt(15).toLong; val b = rng.nextInt(15).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val walks = Walks.randomWalks(edges(pairs: _*), nWalks = 2, steps = 4,
      seed = 42L)
    val got = Walks.pairLift(Walks.skipGramPairs(walks, 2),
        minCount = 2L, topK = 20)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // naive: counts → marginals → cnt·N·1e6 / (n_src·n_ctx), floor
    val nw = naive(pairs, 2, 4, 42L).groupBy(_._1).view
      .mapValues(_.toSeq.sortBy(_._2).map(_._3)).toMap
    val cnts = nw.values.flatMap { p =>
      for (i <- p.indices; j <- p.indices if i != j && math.abs(i - j) <= 2)
        yield (p(i), p(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nSrc = cnts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nCtx = cnts.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = cnts.values.sum
    val expected = cnts.toSeq.collect {
      case ((s, c), k) if k >= 2 =>
        (s, c, k, k * n * 1000000L / (nSrc(s) * nCtx(c)))
    }.sortBy { case (s, c, _, l) => (-l, s, c) }.take(20)
    assert(got === expected)
  }

  /** Driver-side replay of the time-respecting (CTDNE) recurrence:
    * candidates are incident edges with time >= the walk's clock,
    * slot-ordered by (day, neighbour); a walk with no candidate drops
    * out (truncation is semantics, not error). */
  private def naiveTemporal(
      triples: Seq[(Long, Long, Long)], nWalks: Int, steps: Int,
      seed: Long): Set[(Long, Long, Long, Long)] = {
    val e0 = triples.map { case (a, b, d) =>
      (math.min(a, b), math.max(a, b), d)
    }.filter(p => p._1 != p._2).distinct
    val sym = e0.flatMap { case (a, b, d) => Seq((a, b, d), (b, a, d)) }
    val adj = sym.groupBy(_._1).map { case (u, es) =>
      u -> es.map(e => (e._3, e._2)).sorted.toIndexedSeq // (day, nbr)
    }
    adj.keys.flatMap { id =>
      (0 until nWalks).flatMap { g =>
        val wid = id * nWalks + g
        var cur = id; var curd = 0L
        val rows = scala.collection.mutable.ArrayBuffer(
          (wid, 0L, id, 0L))
        var t = 1; var alive = true
        while (t <= steps && alive) {
          val cands = adj(cur).filter(_._1 >= curd)
          if (cands.isEmpty) alive = false
          else {
            val pick = (DetRandom.mixLong(cur, wid * 31L + t, seed)
              % cands.size).toInt
            curd = cands(pick)._1; cur = cands(pick)._2
            rows += ((wid, t.toLong, cur, curd))
          }
          t += 1
        }
        rows
      }
    }.toSet
  }

  test("temporalWalks match the driver-side replay; hops never go back in time") {
    val rng = new scala.util.Random(53)
    val triples = (0 until 150).map { _ =>
      val a = rng.nextInt(25).toLong; val b = rng.nextInt(25).toLong
      (math.min(a, b), math.max(a, b), rng.nextInt(30).toLong)
    }.filter(p => p._1 != p._2).distinct
    val e = triples.toDF("src", "dst", "t")
    val got = Walks.temporalWalks(e, nWalks = 2, steps = 4, seed = 42L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === naiveTemporal(triples, nWalks = 2, steps = 4, seed = 42L))
    // every hop rides a real edge at its recorded day, clock monotone
    val sym = triples.flatMap { case (a, b, d) =>
      Seq((a, b, d), (b, a, d)) }.toSet
    got.groupBy(_._1).foreach { case (wid, rows) =>
      val path = rows.toSeq.sortBy(_._2)
      path.sliding(2).foreach {
        case Seq((_, _, u, du), (_, _, v, dv)) =>
          assert(sym.contains((u, v, dv)),
            s"walk $wid hops a non-edge $u->$v at day $dv")
          assert(dv >= du, s"walk $wid goes back in time: $du -> $dv")
        case _ => ()
      }
    }
  }

  test("temporalWalks truncate when the future runs out") {
    // node 4's only edge predates the epoch-0 start clock: both its
    // walks emit the start row and nothing else; 1<->2<->3 at
    // ascending days walk normally (the arrival edge's reverse always
    // keeps post-step-1 walks alive — truncation is a step-1 affair)
    val e = Seq((1L, 2L, 3L), (2L, 3L, 7L), (4L, 5L, -2L))
      .toDF("src", "dst", "t")
    val got = Walks.temporalWalks(e, nWalks = 2, steps = 3, seed = 42L)
      .as[(Long, Long, Long, Long)].collect().toSet
    val byWalk = got.groupBy(_._1).view.mapValues(_.toSeq.sortBy(_._2)).toMap
    // 5 start nodes × 2 walks, all present at step 0
    assert(byWalk.size === 10)
    Seq(4L, 5L).foreach { n =>
      (0 until 2).foreach { g =>
        val w = byWalk(n * 2 + g)
        assert(w === Seq((n * 2 + g, 0L, n, 0L)),
          s"walk of $n should truncate at step 0, got $w")
      }
    }
    // the live component's walks run the full length
    Seq(1L, 2L, 3L).foreach { n =>
      (0 until 2).foreach { g =>
        assert(byWalk(n * 2 + g).length === 4,
          s"walk of $n truncated unexpectedly")
      }
    }
    assert(got === naiveTemporal(
      Seq((1L, 2L, 3L), (2L, 3L, 7L), (4L, 5L, -2L)), 2, 3, 42L))
  }

  test("temporalWalks: partition independence and canonicalization") {
    val rng = new scala.util.Random(59)
    val triples = (0 until 100).map { _ =>
      (rng.nextInt(20).toLong, rng.nextInt(20).toLong,
        rng.nextInt(20).toLong)
    }.filter(p => p._1 != p._2)
    val raw = triples.toDF("src", "dst", "t")
    val a = Walks.temporalWalks(raw.repartition(1), steps = 3, seed = 5L)
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = Walks.temporalWalks(raw.repartition(7), steps = 3, seed = 5L)
      .as[(Long, Long, Long, Long)].collect().toSet
    val c = Walks.temporalWalks(
        triples.map(p => (p._2, p._1, p._3)).toDF("src", "dst", "t"),
        steps = 3, seed = 5L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a === b)
    assert(a === c)
  }

  test("seed changes the corpus, same seed reproduces it") {
    val pairs = (0L until 15L).map(i => (i, (i + 1) % 15)).map {
      case (a, b) => (math.min(a, b), math.max(a, b))
    }
    val e = edges(pairs: _*)
    val s1 = Walks.randomWalks(e, seed = 1L).as[(Long, Long, Long)]
      .collect().toSet
    val s1b = Walks.randomWalks(e, seed = 1L).as[(Long, Long, Long)]
      .collect().toSet
    val s2 = Walks.randomWalks(e, seed = 2L).as[(Long, Long, Long)]
      .collect().toSet
    assert(s1 === s1b)
    assert(s1 !== s2)
  }
}
