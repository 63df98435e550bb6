package graft

import graft.functions.VecOps
import graft.ml.Tsne
import graft.operators.{Dedup, VecAgg}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property-based invariants (SURVEY.md §5.2#3). Spark-side properties run
  * on small generated DataFrames; pure-JVM math (CKA finish, fingerprints)
  * is exercised directly.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Seeded generator-driven check (scalatestplus bridge not available in
    * the offline cache; seeds 0..n-1 keep runs reproducible).
    */
  private def forSamples[A](gen: Gen[A], n: Int = 15)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .foreach(a => f(a))
    }
  private def forSamples2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 15)(
      f: (A, B) => Unit): Unit =
    (0 until n).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- gb.apply(Gen.Parameters.default, Seed(i.toLong + 1000))
      } f(a, b)
    }

  private val vecGen: Gen[List[Float]] =
    Gen.listOfN(8, Gen.choose(-1.0f, 1.0f))
  private val matGen: Gen[List[List[Float]]] =
    Gen.choose(3, 12).flatMap(n => Gen.listOfN(n, vecGen))

  test("withGroupRank equals the per-group window for arbitrary data/groupings") {
    import graft.operators.GlobalRank
    import org.apache.spark.sql.expressions.Window
    val rowsGen = for {
      n <- Gen.choose(4, 120)
      nGroups <- Gen.choose(1, 5)
      gs <- Gen.listOfN(n, Gen.choose(0, nGroups - 1).map(g => s"g$g"))
      // few distinct values: ties must straddle bucket boundaries
      vs <- Gen.listOfN(n, Gen.choose(0, 8).map(_.toDouble))
      parts <- Gen.choose(1, 6)
    } yield (gs.zip(vs).zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }, parts)
    forSamples(rowsGen, n = 10) { case (rows, parts) =>
      val df = rows.toDF("id", "g", "v").repartition(parts)
      val got = GlobalRank.withGroupRank(df, col("g"), "r", "cnt",
          col("v"), col("id"))
        .select(col("id"), col("r"), col("cnt"))
        .as[(Long, Long, Long)].collect()
        .map(t => (t._1, (t._2, t._3))).toMap
      val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
      val want = df.select(col("id"),
          row_number().over(w).cast("long"),
          count(lit(1)).over(Window.partitionBy(col("g"))))
        .as[(Long, Long, Long)].collect()
        .map(t => (t._1, (t._2, t._3))).toMap
      assert(got == want, s"n=${rows.length} parts=$parts")
    }
  }

  test("GlobalRank is a permutation of 1..n agreeing with the sort order") {
    val rowsGen = Gen.choose(5, 120).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-100.0, 100.0)))
    forSamples(rowsGen, n = 8) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v").repartition(3)
      val (ranked, n) = graft.operators.GlobalRank.withGlobalRank(
        df, "r", col("v"), col("id"))
      val got = ranked.select($"id", $"v", $"r")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      assert(n == vs.length)
      assert(got.map(_._3).sorted.toSeq == (1L to n).toSeq, "ranks not 1..n")
      val bySort = got.sortBy(t => (t._2, t._1)).map(_._3)
      assert(bySort.toSeq == (1L to n).toSeq, "ranks disagree with sort order")
    }
  }

  test("greedy packing never overflows and chunked packing never skips tokens") {
    val tokGen = Gen.choose(5, 60).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1L, 40L)))
    forSamples(tokGen, n = 6) { toks =>
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "n_tokens")
      val greedy = graft.operators.SeqPack.packGreedy(df, "n_tokens", 64, shards = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      greedy.groupBy(_._3).foreach { case (bin, rows) =>
        assert(rows.map(_._2).sum <= 64 || rows.length == 1, s"bin $bin overflow")
      }
      assert(greedy.map(_._1).sorted.toSeq == toks.indices.map(_.toLong), "doc lost")
      val chunked = graft.operators.SeqPack.packChunked(df, "n_tokens", 64, shards = 3)
        .collect().map(r => (r.getLong(2), r.getLong(1), r.getLong(3)))
      chunked.groupBy(_._1).foreach { case (_, rows) =>
        val total = rows.map(_._2).sum
        val offs = rows.sortBy(_._3)
        // offsets tile [0, total) with no gaps
        assert(offs.head._3 == 0L)
        assert(offs.map(_._2).sum == total)
      }
    }
  }

  test("canonicalize: distributed large/small-star ≡ driver union-find on random graphs") {
    // the two paths are independent implementations of connected
    // components; generated edge lists (with self-loops and duplicates
    // allowed) must produce identical labelings — and a reference
    // transitive-closure check pins both to the true components
    val edgesGen = for {
      n <- Gen.choose(1, 40)
      nodes <- Gen.choose(2, 30)
      es <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, nodes.toLong),
        Gen.choose(0L, nodes.toLong)))
    } yield es
    forSamples(edgesGen, n = 8) { es =>
      val pairs = es.toDF("id_a", "id_b")
      val driver = Dedup.canonicalize(pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      val dist = Dedup.canonicalize(pairs, driverThreshold = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(driver == dist, s"paths disagree on $es")
      // reference components via fixpoint closure over the edge list
      val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      def component(start: Long): Set[Long] = {
        var seen = Set(start); var frontier = Set(start)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
          seen ++= frontier
        }
        seen
      }
      driver.foreach { case (id, rep, keep) =>
        assert(rep == component(id).min, s"node $id labeled $rep")
        assert(keep == (id == rep))
      }
    }
  }

  test("cosine ∈ [-1,1] and cosine(v,v) ≈ 1 for any nonzero vectors") {
    forSamples2(vecGen, vecGen) { (a, b) =>
      if (a.exists(_ != 0f) && b.exists(_ != 0f)) {
        val df = Seq((a, b)).toDF("a", "b")
        val r = df.select(
          VecOps.cosine($"a", $"b").as("ab"),
          VecOps.cosine($"a", $"a").as("aa")).head()
        assert(r.getDouble(0) >= -1.0 - 1e-9 && r.getDouble(0) <= 1.0 + 1e-9)
        assert(math.abs(r.getDouble(1) - 1.0) < 1e-3) // eps guard skews tiny norms
      }
    }
  }

  test("int8 quantization: per-element error ≤ scale/2, cosine to self ≈ 1") {
    forSamples(vecGen) { v =>
      if (v.exists(_ != 0f)) {
        val df = Seq((1L, v)).toDF("vec_id", "embedding")
        val q = graft.operators.SimilaritySearch.quantizeInt8(df).head()
        val scale = q.getFloat(1)
        val bytes = q.getAs[Array[Byte]]("qv")
        assert(bytes.length == v.length)
        v.indices.foreach { i =>
          val dq = bytes(i).toDouble * scale
          assert(math.abs(dq - v(i)) <= scale / 2 + 1e-6,
            s"elem $i: |$dq - ${v(i)}| > ${scale / 2}")
        }
        // self-similarity through the asymmetric kernel stays ≈ 1
        val self = graft.operators.SimilaritySearch.int8BruteForceTopK(
          graft.operators.SimilaritySearch.quantizeInt8(
            Seq((1L, v), (2L, v)).toDF("vec_id", "embedding")),
          Seq((1L, v)).toDF("vec_id", "embedding"), k = 1)
          .head().getDouble(3)
        assert(self > 0.98, s"self-cosine through int8: $self")
      }
    }
  }

  test("CKA(X,X) = 1, symmetry, [0,1] for generated matrices") {
    forSamples(matGen) { rows =>
      if (rows.size >= 3) {
        val df = rows.zipWithIndex
          .map { case (v, i) => (i.toLong, v, v.map(x => x * 2 + 1)) }
          .toDF("id", "x", "y")
        val r = df.agg(
          VecAgg.cka($"x", $"x").as("xx"),
          VecAgg.cka($"x", $"y").as("xy"),
          VecAgg.cka($"y", $"x").as("yx")).head()
        // degenerate (zero-variance) matrices give 0 by the guard
        if (r.getDouble(0) != 0.0) assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
        assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-9)
        assert(r.getDouble(1) >= -1e-9 && r.getDouble(1) <= 1.0 + 1e-9)
        // affine map y = 2x+1 preserves centered structure → CKA(x,y) = 1
        if (r.getDouble(0) != 0.0) assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
      }
    }
  }

  test("deterministic sampler: subset of input, size = min(k, n), stable") {
    forSamples2(Gen.choose(1, 20), Gen.choose(1, 50), n = 8) { (k, n) =>
      val df = (1 to n).map(i => (i.toLong, i % 3)).toDF("id", "g")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"g").orderBy(xxhash64($"id", lit(42L)), $"id")
      def sample() = df.withColumn("rn", row_number().over(w))
        .filter($"rn" <= k).select("id", "g")
      val s1 = sample().collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val s2 = sample().collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(s1 == s2, "sampler not stable")
      val all = df.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(s1.subsetOf(all))
      val perGroup = s1.groupBy(_._2).view.mapValues(_.size)
      val inGroup = all.groupBy(_._2).view.mapValues(_.size)
      perGroup.foreach { case (g, c) => assert(c == math.min(k, inGroup(g))) }
    }
  }

  test("minhash est_jaccard = 1 for identical docs, monotone-ish under edits") {
    forSamples(Gen.choose(10, 40), n = 5) { n =>
      val base = (1 to n).map(i => s"w$i").mkString(" ")
      val df = Seq((1L, base), (2L, base)).toDF("doc_id", "text")
      val pairs = Dedup.minhashNearDups(df, threshold = 0.0).collect()
      assert(pairs.length == 1 && pairs.head.getDouble(2) == 1.0)
    }
  }

  test("knuth32 equals the BigInt formula for arbitrary longs (Spark column path)") {
    val idGen = Gen.oneOf(
      Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.choose(-10L, 10L),                      // small ids
      Gen.choose(3000000000L, 4000000000L))       // the naive-wrap regime
    forSamples(Gen.listOfN(20, idGen), n = 6) { ids =>
      val got = ids.toDF("id").select(Dedup.knuth32($"id").as("h"))
        .collect().map(_.getLong(0))
      val want = ids.map(id =>
        ((BigInt(id) * BigInt(2654435761L)) mod BigInt(4294967296L)).toLong)
      assert(got.toSeq == want, s"diverged on ${ids.zip(got).zip(want).find {
        case ((_, g), w) => g != w }}")
    }
  }

  test("SpaceSaving bounds hold for any stream split into any partials") {
    import graft.operators.TopKSketch
    val streamGen = for {
      n <- Gen.choose(20, 200)
      items <- Gen.listOfN(n, Gen.choose(0, 30).map(i => s"w$i"))
      cuts <- Gen.listOfN(3, Gen.choose(0, n))
    } yield (items, cuts.sorted)
    forSamples(streamGen, n = 10) { case (items, cuts) =>
      val cap = 8
      // split the stream at arbitrary points, build partials via ssInsert,
      // merge via ssMerge in sequence — the Aggregator's exact code paths
      val parts = ((0 +: cuts) :+ items.length).sliding(2).map {
        case Seq(a, b) => items.slice(a, b)
      }.toList
      val partials = parts.map(_.foldLeft(Map.empty: TopKSketch.Buf)(
        TopKSketch.ssInsert(_, _, cap)))
      val merged = partials.reduce(TopKSketch.ssMerge(_, _, cap))
      val trueCounts = items.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      merged.foreach { case (item, (est, err)) =>
        val t = trueCounts(item)
        assert(est >= t, s"$item est $est < true $t (cuts $cuts)")
        assert(est - err <= t, s"$item lower ${est - err} > true $t (cuts $cuts)")
      }
      // the guaranteed-survivor property: anything with true count above
      // the merged buffer's max possible noise floor must be reported
      val n = items.length.toLong
      trueCounts.filter(_._2 > 2 * n / cap).keys.foreach { heavy =>
        assert(merged.contains(heavy), s"heavy $heavy lost (cuts $cuts)")
      }
    }
  }

  test("bottom-k sample equals brute force for any stream split into any partials") {
    import graft.operators.Sampling
    val streamGen = for {
      n <- Gen.choose(5, 150)
      ids <- Gen.listOfN(n, Gen.choose(-500L, 500L))
      cuts <- Gen.listOfN(3, Gen.choose(0, n))
      k <- Gen.choose(1, 12)
    } yield (ids, cuts.sorted, k)
    forSamples(streamGen, n = 12) { case (ids, cuts, k) =>
      val parts = ((0 +: cuts) :+ ids.length).sliding(2).map {
        case Seq(a, b) => ids.slice(a, b)
      }.toList
      val partials = parts.map(_.foldLeft(Vector.empty: Sampling.Buf)(
        Sampling.insert(_, _, k)))
      val merged = partials.reduce(Sampling.mergeBufs(_, _, k))
      val expected = ids.distinct
        .map(id => (Sampling.knuth32(id), id)).sorted.take(k).toVector
      assert(merged == expected, s"cuts $cuts k $k")
    }
  }

  test("weighted bottom-k equals brute force for any stream split into any partials") {
    import graft.operators.Sampling
    val streamGen = for {
      n <- Gen.choose(5, 120)
      ids <- Gen.listOfN(n, Gen.choose(-300L, 300L))
      ws <- Gen.listOfN(n, Gen.oneOf(0.5, 1.0, 2.0, 10.0, 0.0, -1.0))
      cuts <- Gen.listOfN(3, Gen.choose(0, n))
      k <- Gen.choose(1, 10)
    } yield (ids.zip(ws), cuts.sorted, k)
    forSamples(streamGen, n = 12) { case (rows, cuts, k) =>
      val parts = ((0 +: cuts) :+ rows.length).sliding(2).map {
        case Seq(a, b) => rows.slice(a, b)
      }.toList
      val partials = parts.map(_.foldLeft(Vector.empty: Sampling.WBuf) {
        case (b, (id, w)) => Sampling.winsert(b, id, w, k)
      })
      val merged = partials.reduce(Sampling.wmerge(_, _, k))
      // brute force: positive-weight ids, SET semantics — an id arriving
      // with conflicting weights resolves to its minimum A-ES key (= max
      // weight), never to two buffer entries (double-sampling)
      val expected = rows.filter(_._2 > 0.0)
        .groupBy(_._1)
        .map { case (id, occ) => (occ.map(o => Sampling.esKey(id, o._2)).min, id) }
        .toVector.sorted.take(k)
      assert(merged == expected, s"cuts $cuts k $k")
    }
  }

  test("weighted bottom-k: conflicting-weight duplicates never double-sample an id") {
    import graft.operators.Sampling
    // adversarial: every id appears twice with different weights, split so
    // the duplicates land in different partials (merge path) and in the
    // same partial (insert path); result must be split-invariant and hold
    // each id at most once
    val streamGen = for {
      m <- Gen.choose(3, 40)
      ids <- Gen.listOfN(m, Gen.choose(0L, 60L))
      w1 <- Gen.listOfN(m, Gen.oneOf(0.5, 1.0, 4.0))
      w2 <- Gen.listOfN(m, Gen.oneOf(2.0, 8.0, 16.0))
      shuffleSeed <- Gen.choose(0L, 1000L)
      cuts <- Gen.listOfN(2, Gen.choose(0, 2 * m))
      k <- Gen.choose(1, 8)
    } yield {
      val rows = new scala.util.Random(shuffleSeed)
        .shuffle(ids.zip(w1) ++ ids.zip(w2))
      (rows, cuts.sorted, k)
    }
    forSamples(streamGen, n = 15) { case (rows, cuts, k) =>
      val parts = ((0 +: cuts) :+ rows.length).sliding(2).map {
        case Seq(a, b) => rows.slice(a, b)
      }.toList
      val merged = parts.map(_.foldLeft(Vector.empty: Sampling.WBuf) {
          case (b, (id, w)) => Sampling.winsert(b, id, w, k)
        }).reduce(Sampling.wmerge(_, _, k))
      assert(merged.map(_._2).distinct.length == merged.length,
        s"id sampled twice: $merged")
      val expected = rows.groupBy(_._1)
        .map { case (id, occ) => (occ.map(o => Sampling.esKey(id, o._2)).min, id) }
        .toVector.sorted.take(k)
      assert(merged == expected, s"cuts $cuts k $k")
    }
  }

  test("CDC spans exactly partition any token stream within length bounds") {
    import graft.operators.Cdc
    val streamGen = for {
      n <- Gen.choose(0, 300)
      vocab <- Gen.choose(2, 40)
      toks <- Gen.listOfN(n, Gen.choose(0, vocab).map(i => s"tok$i"))
      mod <- Gen.oneOf(2, 4, 16)
      min <- Gen.choose(1, 6)
      extra <- Gen.choose(1, 40)
    } yield (toks.toArray, mod, min, min + extra)
    forSamples(streamGen, n = 15) { case (toks, mod, min, max) =>
      val spans = Cdc.spansOf(toks, window = 4, modulus = mod,
        minLen = min, maxLen = max)
      // exact cover, in order, no gaps or overlaps
      assert(spans.map(_._2).sum == toks.length)
      assert(spans.map(_._1) == spans.scanLeft(0)((a, s) => a + s._2).init)
      // bounds: every chunk but the last within [min, max]
      spans.dropRight(1).foreach { case (_, n2) =>
        assert(n2 >= min && n2 <= max, s"span $n2 outside [$min,$max]")
      }
      spans.lastOption.foreach { case (_, n2) => assert(n2 <= max) }
    }
  }

  test("chunker geometry holds for arbitrary (n, size, overlap)") {
    import graft.operators.Chunker
    val genCase = for {
      n <- Gen.choose(1, 200)
      size <- Gen.choose(1, 40)
      overlap <- Gen.choose(0, math.max(0, size - 1))
    } yield (n, size, overlap)
    forSamples(genCase, n = 12) { case (n, size, overlap) =>
      val stride = size - overlap
      val toks = (0 until n).map(i => s"t$i")
      val docs = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val ch = Chunker.chunk(docs, size, overlap)
        .orderBy("chunk_idx").collect()
      val expect = if (n <= size) 1
        else 1 + math.ceil((n - size).toDouble / stride).toInt
      assert(ch.length == expect, s"n=$n size=$size overlap=$overlap")
      // window c covers [c*stride, min(c*stride+size, n)); the union of
      // covered positions is exactly 0..n-1 with no gap
      val covered = ch.flatMap { r =>
        val s0 = r.getAs[Long]("token_start").toInt
        s0 until (s0 + r.getAs[Long]("n_tokens").toInt)
      }.toSet
      assert(covered == (0 until n).toSet)
      // every chunk's text is the exact token slice
      ch.foreach { r =>
        val s0 = r.getAs[Long]("token_start").toInt
        val len = r.getAs[Long]("n_tokens").toInt
        assert(r.getAs[String]("chunk_text") ==
          toks.slice(s0, s0 + len).mkString(" "))
      }
    }
  }

  test("AVI container round-trip: arbitrary frames (odd lengths included) survive") {
    import graft.queries.MultimodalQueries.aviBytes
    import graft.sources.Multimodal
    val genCase = for {
      n <- Gen.choose(1, 12)
      uspf <- Gen.oneOf(40000L, 100000L, 333333L)
      frames <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 97) // odd lengths exercise RIFF word padding
        b <- Gen.choose(0, 255)
      } yield Array.tabulate[Byte](len)(i => ((b + i * 7) & 0xFF).toByte))
    } yield (uspf, frames)
    forSamples(genCase, n = 12) { case (uspf, frames) =>
      val parsed = Multimodal.parseAvi(aviBytes(uspf, frames))
      assert(parsed.isDefined, "writer output did not parse")
      val (u, fs) = parsed.get
      assert(u == uspf)
      assert(fs.length == frames.length)
      fs.zip(frames).foreach { case (a, e) =>
        assert(java.util.Arrays.equals(a, e), "frame bytes corrupted")
      }
      // truncation ANYWHERE must reject to the stub path — the declared
      // RIFF extent no longer fits the payload, so even a cut landing
      // exactly on a chunk boundary (a clean walk) returns None, and an
      // undercounting RIFF size field (walk ends early, ok stays true)
      // is caught by the avih dwTotalFrames count
      val whole = aviBytes(uspf, frames)
      (1 to 3).foreach { back =>
        val cut = whole.take(whole.length - back)
        assert(Multimodal.parseAvi(cut).isEmpty,
          s"payload truncated by $back bytes parsed as complete")
      }
      if (frames.length > 1) {
        // forge RIFF + movi sizes so the container ends CLEANLY after the
        // first frame chunk (ok stays true, no truncation tripwire) —
        // only the avih dwTotalFrames disagreement can reject it
        val firstLen = frames.head.length
        val hdrl = 4 + 8 + 56
        val moviShort = 4 + 8 + firstLen + (firstLen & 1)
        val riffShort = 4 + 8 + hdrl + 8 + moviShort
        def w32(a: Array[Byte], off: Int, v: Int): Unit = (0 to 3).foreach {
          i => a(off + i) = ((v >> (8 * i)) & 0xFF).toByte
        }
        val forged = whole.clone()
        w32(forged, 4, riffShort)
        w32(forged, 92, moviShort) // movi LIST size field
        assert(Multimodal.parseAvi(forged).isEmpty,
          "undercounting RIFF size returned a partial frame list")
      }
    }
  }

  test("compaction bijection keys cover every partition exactly once") {
    forSamples(Gen.choose(1, 3000), n = 10) { n =>
      val keys = graft.sources.Compaction.bijectionKeys(n)
      assert(keys.length == n && keys.distinct.length == n)
      val parts = keys.map { k =>
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(k, 42)
        ((h % n) + n) % n
      }
      assert(parts.toSeq == (0 until n), "keys not a bijection onto partitions")
    }
  }

  test("gapfill LOCF equals the in-memory reference on arbitrary event sets") {
    import graft.operators.GapFill
    val genCase = for {
      nEv <- Gen.choose(1, 60)
      nKeys <- Gen.choose(1, 4)
      stepS <- Gen.oneOf(60L, 300L, 3600L)
      evs <- Gen.listOfN(nEv, for {
        k <- Gen.choose(0, nKeys - 1)
        sec <- Gen.choose(1700000000L, 1700050000L)
        v <- Gen.choose(-100.0, 100.0)
      } yield (k.toLong, sec, v))
    } yield (evs, stepS)
    forSamples(genCase, n = 10) { case (evs, stepS) =>
      val withIds = evs.zipWithIndex.map { case ((k, sec, v), i) =>
        (k, sec, v, i.toLong)
      }
      val df = withIds.toDF("user_id", "sec", "value", "event_id")
        .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      val got = GapFill.locfGrid(df, "user_id", "ts", "value", stepS,
          "event_id")
        .select(col("user_id"), unix_micros(col("slot_ts")),
          col("locf_value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      // in-memory reference: same-instant max-id wins, inclusive ticks
      val want = withIds.groupBy(_._1).flatMap { case (k, rows) =>
        val obs = rows.groupBy(_._2).map { case (sec, rs) =>
          sec -> rs.maxBy(_._4)._3
        }.toSeq.sortBy(_._1)
        val lo = obs.head._1; val hi = obs.last._1
        val k0 = (lo + stepS - 1) / stepS; val k1 = hi / stepS
        (k0 to k1).map { slot =>
          val tickSec = slot * stepS
          val v = obs.takeWhile(_._1 <= tickSec).last._2
          (k, tickSec * 1000000L, v)
        }
      }.toSet
      assert(got == want)
    }
  }

  test("tsne output is finite and centered for any small input") {
    forSamples(Gen.choose(5, 15), n = 5) { n =>
      val rng = new scala.util.Random(n)
      val x = Array.fill(n)(Array.fill(4)(rng.nextDouble()))
      val y = Tsne.fitTransform(x, perplexity = 5, iterations = 60)
      assert(y.length == n)
      assert(y.forall(p => p.forall(v => !v.isNaN && !v.isInfinite)))
      val scale = y.flatten.map(math.abs).max.max(1.0)
      assert(math.abs(y.map(_(0)).sum / n) < 1e-9 * scale)
    }
  }
}
