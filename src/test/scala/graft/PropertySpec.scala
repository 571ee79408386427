package graft

import graft.ops.{Dedup, Metrics, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property-based invariants (SURVEY.md §5.2.3) over generated event
  * streams and documents. ScalaCheck generators with fixed seeds drive a
  * handful of Spark jobs; invariants must hold on every sample. */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private val cities = Seq("nyc", "sf", "la", "chi", "mia")
  private val eventGen: Gen[(String, Double, Double)] = for {
    city <- Gen.oneOf(cities)
    // event times across ~3 hours from 2024-01-01 00:00 UTC
    offset <- Gen.choose(0.0, 3 * 3600.0)
    fare <- Gen.choose(5.0, 150.0)
  } yield (city, 1704067200.0 + offset, fare)

  private def samples[A](g: Gen[List[A]], n: Int): Seq[List[A]] =
    (1 to n).map { i =>
      g.apply(Gen.Parameters.default, rng.Seed(i.toLong))
        .getOrElse(sys.error("gen failed"))
    }

  test("windowed metrics: totals partition the input; avg within [min,max]; minute-aligned ends") {
    samples(Gen.listOfN(300, eventGen), 3).foreach { events =>
      val df = events.toDF("city", "epoch", "fare")
        .select($"city", $"epoch".cast("timestamp").as("event_timestamp"),
          $"fare".as("fare_amount"),
          monotonically_increasing_id().cast("string").as("trip_id"))
      val out = Metrics.windowedMetrics(Metrics.WindowSpec(), streaming = false)(df)
        .collect()
      // counts partition the input exactly
      assert(out.map(_.getAs[Long]("total_trips")).sum == events.size)
      // per-group avg bounded by global fare range
      val fares = events.map(_._3)
      out.foreach { r =>
        val avg = r.getAs[Double]("average_fare")
        assert(avg >= fares.min - 1e-9 && avg <= fares.max + 1e-9)
      }
      // window ends are minute-aligned and strictly after some event
      out.foreach { r =>
        val endS = r.getAs[java.sql.Timestamp]("last_updated").toInstant.getEpochSecond
        assert(endS % 60 == 0, s"window end not minute-aligned: $endS")
      }
      // weighted mean of group avgs == global mean
      val weighted = out.map(r =>
        r.getAs[Double]("average_fare") * r.getAs[Long]("total_trips")).sum
      assert(math.abs(weighted - fares.sum) < 1e-6 * math.max(1.0, fares.sum.abs))
    }
  }

  private val wordGen = Gen.oneOf("spark", "query", "table", "join", "scan",
    "merge", "the", "a", "fast", "slow", "row", "batch")
  private val docGen: Gen[String] = Gen.chooseNum(3, 40)
    .flatMap(n => Gen.listOfN(n, wordGen).map(_.mkString(" ")))

  test("minhash: identical docs agree fully; signature values in [0, p)") {
    samples(Gen.listOfN(20, docGen), 2).foreach { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val p = (1L << 31) - 1
      val sigs = df.select($"doc_id",
        graft.functions.textnative.text_minhash($"text", 3, Dedup.hashFamily(64), p).as("sig"))
        .as[(Long, Seq[Long])].collect().toMap
      sigs.values.foreach(sig => assert(sig.forall(v => v >= 0 && v <= p)))
      // same text ⇒ same signature (pure function of content)
      val byText = docs.zipWithIndex.groupBy(_._1)
      byText.values.filter(_.size > 1).foreach { grp =>
        val sigSet = grp.map { case (_, i) => sigs(i.toLong) }.toSet
        assert(sigSet.size == 1)
      }
    }
  }

  test("as-of join equals the naive per-row maximum-prior-match on random data") {
    val rowGen: Gen[(String, Int, Double)] = for {
      key <- Gen.oneOf("a", "b", "c")
      t <- Gen.choose(0, 500)
      v <- Gen.choose(0.0, 100.0)
    } yield (key, t, v)
    samples(Gen.listOfN(60, rowGen), 3).foreach { rows =>
      val (lRows, rRows0) = rows.splitAt(30)
      // right side unique per (key, time) — the operator's contract
      val rRows = rRows0.groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toSeq
      def ts(t: Int) = new java.sql.Timestamp(1704067200000L + t * 1000L)
      val left = lRows.zipWithIndex
        .map { case ((k, t, _), i) => (i.toLong, k, ts(t)) }.toDF("lid", "key", "ts")
      val right = rRows.map { case (k, t, v) => (k, ts(t), v) }.toDF("key", "ts", "px")
      val got = graft.ops.AsOfJoin.asOfBackward(left, right, "key", "ts", Seq("px"))
        .select($"lid", $"asof_px").as[(Long, Option[Double])].collect().toMap
      // oracle: per left row, the right row with max time <= left time
      lRows.zipWithIndex.foreach { case ((k, t, _), i) =>
        val expect = rRows.filter(r => r._1 == k && r._2 <= t)
          .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
        assert(got(i.toLong) == expect, s"left=($k,$t): got ${got(i.toLong)}, want $expect")
      }
    }
  }

  test("forward as-of equals the naive per-row minimum-following-match on random data") {
    val rowGen: Gen[(String, Int, Double)] = for {
      key <- Gen.oneOf("a", "b", "c")
      t <- Gen.choose(0, 500)
      v <- Gen.choose(0.0, 100.0)
    } yield (key, t, v)
    samples(Gen.listOfN(60, rowGen), 3).foreach { rows =>
      val (lRows, rRows0) = rows.splitAt(30)
      val rRows = rRows0.groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toSeq
      def ts(t: Int) = new java.sql.Timestamp(1704067200000L + t * 1000L)
      val left = lRows.zipWithIndex
        .map { case ((k, t, _), i) => (i.toLong, k, ts(t)) }.toDF("lid", "key", "ts")
      val right = rRows.map { case (k, t, v) => (k, ts(t), v) }.toDF("key", "ts", "px")
      val got = graft.ops.AsOfJoin.asOfForward(left, right, "key", "ts", Seq("px"))
        .select($"lid", $"asof_px").as[(Long, Option[Double])].collect().toMap
      // oracle: per left row, the right row with MIN time >= left time
      lRows.zipWithIndex.foreach { case ((k, t, _), i) =>
        val expect = rRows.filter(r => r._1 == k && r._2 >= t)
          .sortBy(r => (r._2, r._3)).headOption.map(_._3)
        assert(got(i.toLong) == expect, s"left=($k,$t): got ${got(i.toLong)}, want $expect")
      }
    }
  }

  test("k-core peel converges to a subgraph where every degree >= k") {
    val edgeGen: Gen[(Long, Long)] = for {
      a <- Gen.choose(0L, 30L); b <- Gen.choose(0L, 30L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    samples(Gen.listOfN(50, edgeGen), 3).foreach { es =>
      val edges = es.distinct.toDF("a", "b")
      val out = graft.ops.Graph.kCorePeel(edges, k = 2, rounds = 8)
        .as[(Long, Long)].collect()
      assert(out.forall(_._2 >= 2), s"degree < k survived: ${out.mkString(",")}")
      // fewer rounds can only keep MORE nodes (peeling is monotone)
      val early = graft.ops.Graph.kCorePeel(edges, k = 2, rounds = 1)
        .as[(Long, Long)].collect().map(_._1).toSet
      assert(out.map(_._1).toSet.subsetOf(early), "peel not monotone")
    }
  }

  test("linear interpolation: gaps lie between their neighbors; observations exact") {
    val obsGen: Gen[(Int, Double)] = for {
      b <- Gen.choose(0, 40); v <- Gen.choose(-50.0, 50.0)
    } yield (b, v)
    samples(Gen.listOfN(12, obsGen), 3).foreach { obs0 =>
      val obs = obs0.groupBy(_._1).view.mapValues(_.map(_._2).max).toSeq
      def ts(b: Int) = new java.sql.Timestamp(1704067200000L + b * 3600000L)
      val df = obs.map { case (b, v) => (1L, ts(b), v) }.toDF("k", "ts", "v")
      val out = graft.ops.GapFill.interpolateLinear(df, "k", "ts", "v", 3600L)
        .select($"bucket", $"value_interp", $"is_gap")
        .as[(Long, Double, Boolean)].collect()
      val byBucket = obs.map { case (b, v) =>
        (1704067200000L / 3600000L + b, v) }.toMap
      out.foreach { case (b, v, gap) =>
        if (!gap) assert(v == byBucket(b), s"observation bucket $b altered")
        else {
          val lo = byBucket.keys.filter(_ < b).max
          val hi = byBucket.keys.filter(_ > b).min
          val (vl, vh) = (byBucket(lo), byBucket(hi))
          assert(v >= math.min(vl, vh) - 1e-9 && v <= math.max(vl, vh) + 1e-9,
            s"bucket $b interp $v outside [$vl, $vh]")
        }
      }
    }
  }

  test("interval join equals the filtered cross product on random data") {
    val rowGen: Gen[(String, Int)] = for {
      key <- Gen.oneOf("a", "b")
      t <- Gen.choose(0, 300)
    } yield (key, t)
    samples(Gen.listOfN(40, rowGen), 3).foreach { rows =>
      val (lRows, rRows) = rows.splitAt(20)
      def ts(t: Int) = new java.sql.Timestamp(1704067200000L + t * 1000L)
      val left = lRows.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, ts(t)) }.toDF("lid", "key", "lts")
      val right = rRows.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, ts(t)) }.toDF("rid", "key", "rts")
      val got = graft.streaming.StreamOps.intervalJoin(left, right, "key", "lts", "rts",
          maxDelaySec = 60, lateness = "10 minutes", streaming = false)
        .select($"lid", $"rid").as[(Long, Long)].collect().toSet
      val expect = (for {
        ((lk, lt), li) <- lRows.zipWithIndex
        ((rk, rt), ri) <- rRows.zipWithIndex
        if lk == rk && rt <= lt && rt >= lt - 60
      } yield (li.toLong, ri.toLong)).toSet
      assert(got == expect, s"diff: ${(got diff expect) ++ (expect diff got)}")
    }
  }

  test("top-k aggregator equals global sort-take for any k") {
    val vGen: Gen[(Long, Double)] = for {
      id <- Gen.choose(0L, 1000L)
      s <- Gen.choose(-1.0, 1.0)
    } yield (id, s)
    samples(Gen.listOfN(80, vGen), 3).foreach { scored0 =>
      val scored = scored0.distinctBy(_._1)
      for (k <- Seq(1, 5, 17)) {
        val topk = udaf(new graft.ops.TopKAggregator(k))
        val got = scored.toDF("id", "score").repartition(7)
          .select(lit(0L).as("q"), struct($"id", $"score").as("s"))
          .groupBy($"q").agg(topk($"s.id", $"s.score").as("top"))
          .select(explode($"top")).select($"col.id").as[Long].collect().toSeq
        val expect = scored.sortBy(p => (-p._2, p._1)).take(k).map(_._1)
        assert(got == expect, s"k=$k: $got vs $expect")
      }
    }
  }

  test("fused TextStats equals the HOF formulation on adversarial strings") {
    // mixed pool: stopwords, case, unicode (incl. non-BMP 𝄞 = U+1D11E),
    // punctuation runs, empties — the quirks the fused code-point walk
    // must reproduce (Java split semantics, regex \s, codepoint length)
    val pool = Seq("the", "a", "of", "Spark!", "ÜBER", "中文字", "𝄞clef",
      "...", "x1", "", "MiXeD", "\trun,run")
    val advGen: Gen[String] = Gen.chooseNum(0, 12)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(pool)).map(_.mkString(" ")))
    samples(Gen.listOfN(25, advGen), 2).foreach { docs0 =>
      val docs = docs0 ++ Seq("", "   ", "\t\n", "𝄞")
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val toks = split(trim($"text"), "\\s+")
      val sw = TextAnalysis.stopwords("en")
      val rows = df.select(
        graft.functions.textnative.text_stats($"text", sw).as("st"),
        size(toks).cast("long").as("e_tokens"),
        size(regexp_extract_all($"text", lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
          .cast("long").as("e_rtokens"),
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("e_sumlen"),
        length($"text").cast("long").as("e_chars"),
        (length($"text") - length(regexp_replace($"text", "[^A-Za-z0-9\\s]", "")))
          .cast("long").as("e_punct"),
        (length($"text") - length(regexp_replace($"text", "[A-Z]", "")))
          .cast("long").as("e_upper"),
        size(filter(toks, t => t.isin(sw.map(lit): _*))).cast("long").as("e_stop"),
        $"text").collect()
      rows.foreach { r =>
        val st = r.getStruct(0)
        // struct order: n_tokens, n_regex_tokens, sum_token_len, n_chars,
        // n_punct, n_upper, n_stop — e_* columns follow in the same order
        val got = (0 to 6).map(st.getLong)
        val expect = (1 to 7).map(r.getLong)
        assert(got == expect, s"text=${r.getString(8)}: fused=$got hof=$expect")
      }
    }
  }

  test("fused TextRepetition equals the HOF formulation on adversarial strings") {
    val pool = Seq("the", "the", "a", "Spark!", "ÜBER", "中文字", "𝄞clef",
      "...", "x1", "", "MiXeD", "\trun,run")
    val advGen: Gen[String] = Gen.chooseNum(0, 12)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(pool)).map(_.mkString(" ")))
    samples(Gen.listOfN(25, advGen), 2).foreach { docs0 =>
      val docs = docs0 ++ Seq("", "   ", "\t\n", "𝄞", "a a a b")
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val toks = split(trim($"text"), "\\s+")
      val grams = when(size(toks) < 2, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(toks) - 2),
          i => concat_ws(" ", slice(toks, i + 1, lit(2)))))
      val rows = df.select(
        graft.functions.textnative.text_repetition($"text").as("st"),
        size(toks).cast("long").as("e_tokens"),
        size(array_distinct(toks)).cast("long").as("e_distinct"),
        // max token multiplicity via HOFs: for each distinct token count
        // its occurrences, then take the array max
        array_max(transform(array_distinct(toks),
          d => size(filter(toks, t => t === d)))).cast("long").as("e_max"),
        greatest(size(toks) - 1, lit(0)).cast("long").as("e_2grams"),
        size(array_distinct(grams)).cast("long").as("e_d2"),
        $"text").collect()
      rows.foreach { r =>
        val st = r.getStruct(0)
        // struct order: n_tokens, n_distinct, max_count, n_2grams,
        // n_distinct_2grams — e_* columns follow in the same order
        val got = (0 to 4).map(st.getLong)
        val expect = (1 to 5).map(r.getLong)
        assert(got == expect, s"text=${r.getString(6)}: fused=$got hof=$expect")
      }
    }
  }

  test("fused ShingleMd5Keys equals the HOF md5 formulation on adversarial strings") {
    val pool = Seq("the", "a", "of", "Spark!", "中文", "", "x1", "\tz")
    val advGen: Gen[String] = Gen.chooseNum(0, 10)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(pool)).map(_.mkString(" ")))
    samples(Gen.listOfN(20, advGen), 2).foreach { docs0 =>
      val docs = docs0 ++ Seq("", "a b", "a b c", "a b c a b c")
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val toks = split(trim($"text"), "\\s+")
      val grams = when(size(toks) < 3, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ", slice(toks, i + 1, lit(3)))))
      val rows = df.select(
        graft.functions.textnative.shingle_md5_keys($"text", 3).as("fused"),
        transform(array_distinct(grams), g => md5(g)).as("hof"),
        $"text").collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"text=${r.getString(2)}")
      }
    }
  }

  test("QuantizeInt8 equals the SQL round formulation and bounds to [-127, 127]") {
    val vGen: Gen[List[Double]] = Gen.chooseNum(1, 16)
      .flatMap(n => Gen.listOfN(n, Gen.choose(-10.0, 10.0)))
    samples(Gen.listOfN(15, vGen), 2).foreach { vecs0 =>
      val vecs = vecs0 ++ Seq(List(0.0, 0.0), List(2.5, -2.5, 127.0))
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "v")
      val sc = array_max(transform($"v", x => abs(x))) / 127.0
      val rows = df.select(
        graft.functions.vectornative.quantize_int8($"v").as("fused"),
        when(sc === 0.0, transform($"v", _ => lit(0.0)))
          .otherwise(transform($"v", x => round(x / sc).cast("double"))).as("hof"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Double](0) == r.getSeq[Double](1),
          s"fused=${r.getSeq[Double](0)} hof=${r.getSeq[Double](1)}")
        r.getSeq[Double](0).foreach(q => assert(q >= -127 && q <= 127))
      }
    }
  }

  test("fingerprint: stable under repetition, in [0, p), order-sensitive") {
    samples(Gen.listOfN(15, docGen), 2).foreach { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val fps = TextAnalysis.fingerprint(df)
        .select($"doc_id", $"fingerprint").as[(Long, Long)].collect().toMap
      fps.values.foreach(v => assert(v >= 0 && v < 1000000007L))
      val again = TextAnalysis.fingerprint(df)
        .select($"doc_id", $"fingerprint").as[(Long, Long)].collect().toMap
      assert(fps == again)
    }
  }

  test("shelf packing: total conservation, capacity, shelf purity on random lengths") {
    samples(Gen.listOfN(150, Gen.chooseNum(1, 24)), 2).foreach { lens =>
      val docs = lens.zipWithIndex
        .map { case (l, i) => (i.toLong, Seq.fill(l)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val out = graft.ops.Training.packShelves(docs, "doc_id", "text",
          capacity = 16, bucketSize = 8L)
        .select($"doc_id", $"n_tokens", $"seq_id", $"seq_offset")
        .as[(Long, Long, Long, Long)].collect()
      // every doc appears once with its true length — nothing dropped
      assert(out.length == lens.size)
      out.foreach { case (id, n, _, _) => assert(n == lens(id.toInt)) }
      out.groupBy(_._3).foreach { case (seq, ds) =>
        assert(ds.map(_._2).distinct.length == 1, s"seq $seq mixes lengths")
        val l = ds.head._2
        // over-capacity docs get dedicated sequences; others fill shelves
        if (l > 16) assert(ds.length == 1)
        else assert(ds.length * l <= 16, s"seq $seq overflows")
        assert(ds.map(_._4).sorted.toSeq == ds.indices.map(_ * l))
      }
      val seqIds = out.map(_._3).distinct.sorted
      assert(seqIds.toSeq == (0L until seqIds.length), "seq ids not dense")
    }
  }

  test("mixture plan: targets proportional and budget-conserving on random weights") {
    val mixGen = for {
      wA <- Gen.chooseNum(1, 9); wB <- Gen.chooseNum(1, 9)
      nA <- Gen.chooseNum(3, 20); nB <- Gen.chooseNum(3, 20)
      budget <- Gen.chooseNum(50L, 5000L)
    } yield (wA, wB, nA, nB, budget)
    samples(Gen.listOfN(4, mixGen), 2).flatten.foreach {
      case (wA, wB, nA, nB, budget) =>
        val docs = (Seq.tabulate(nA)(i => (i.toLong, "a", "t t t t t")) ++
          Seq.tabulate(nB)(i => ((100 + i).toLong, "b", "t t")))
          .toDF("doc_id", "lang", "text")
        val out = graft.ops.Sampling.mixturePlan(docs, "lang", "text",
            Seq("a" -> wA, "b" -> wB), budget)
          .select($"lang", $"n_tokens", $"target_tokens", $"n_epochs",
            $"last_epoch_ppm")
          .as[(String, Long, Long, Long, Long)].collect()
          .map(r => r._1 -> r).toMap
        val sumW = wA.toLong + wB
        // exact proportional integer targets; sum never exceeds budget
        assert(out("a")._3 == budget * wA / sumW)
        assert(out("b")._3 == budget * wB / sumW)
        assert(out.values.map(_._3).sum <= budget)
        out.values.foreach { case (_, n, target, epochs, ppm) =>
          // epochs cover the target exactly: (epochs-1)·n < target ≤ epochs·n
          if (target == 0) assert(epochs == 0 && ppm == 0)
          else {
            assert(epochs * n >= target && (epochs - 1) * n < target)
            assert(ppm >= 0 && ppm <= 1000000)
            // reconstructed sampled mass equals the target exactly
            assert((epochs - 1) * n + ppm * n / 1000000 <= target)
          }
        }
    }
  }

  test("maximal repeats equal the all-lengths brute force on random small-vocab corpora") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def brute(docs: Seq[(Long, String)], minLen: Int): Set[(Long, Long, Long, String)] = {
      val tks = docs.map { case (id, t) => (id, t.trim.split("\\s+")) }
      val byId = tks.toMap
      val occ = scala.collection.mutable.Map.empty[(Int, String), List[(Long, Int)]]
      for ((id, w) <- tks; l <- minLen to w.length; p <- 0 to w.length - l) {
        val str = w.slice(p, p + l).mkString(" ")
        occ((l, str)) = (id, p) :: occ.getOrElse((l, str), Nil)
      }
      occ.iterator.filter(_._2.size >= 2).flatMap { case ((l, str), os) =>
        val nxt = os.map { case (d, p) =>
          val w = byId(d); if (p + l < w.length) Some(w(p + l)) else None }
        val prv = os.map { case (d, p) =>
          val w = byId(d); if (p > 0) Some(w(p - 1)) else None }
        val rMax = nxt.contains(None) || nxt.flatten.distinct.size >= 2
        val lMax = prv.contains(None) || prv.flatten.distinct.size >= 2
        if (rMax && lMax)
          Some((l.toLong, os.size.toLong, os.map(_._1).distinct.size.toLong,
            md5hex(str)))
        else None
      }.toSet
    }
    // 3-symbol vocabulary forces dense repeat structure (nesting,
    // overlaps, periodicity) the planted spec cases cannot anticipate
    val docGen = Gen.listOfN(8, Gen.choose(4, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("x", "y", "z")).map(_.mkString(" "))))
    samples(docGen, 3).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup.maxRepeats(docs.toDF("doc_id", "text"), "doc_id",
          "text", minLen = 3, cap = 16, maxLevels = 24)
        .as[(Long, Long, Long, String)].collect().toSet
      val want = brute(docs, minLen = 3)
      assert(got == want, s"docs=$docs missing=${want -- got} extra=${got -- want}")
    }
  }

  test("grid DBSCAN equals the all-pairs brute force on random integer points") {
    val ptGen = for {
      n <- Gen.choose(20, 60)
      pts <- Gen.listOfN(n, for {
        x <- Gen.choose(-40L, 40L); y <- Gen.choose(-40L, 40L)
      } yield (x, y))
    } yield pts.distinct
    samples(Gen.listOfN(1, ptGen).map(_.head), 4).zipWithIndex.foreach {
      case (pts0, si) =>
        val eps = 3L + 2 * (si % 2)   // 3 or 5
        val minPts = 2 + (si % 3)     // 2..4
        val pts = pts0.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
        val byId = pts.map(p => p._1 -> ((p._2, p._3))).toMap
        val ids = pts.map(_._1)
        def d2(a: Long, b: Long) = {
          val (xa, ya) = byId(a); val (xb, yb) = byId(b)
          (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
        }
        val neigh = ids.map(a => a -> ids.filter(b => d2(a, b) <= eps * eps)).toMap
        val core = ids.filter(a => neigh(a).size >= minPts).toSet
        var lbl = core.map(c => c -> c).toMap
        var changed = true
        while (changed) {
          changed = false
          for (a <- core; b <- neigh(a) if core(b) && lbl(b) < lbl(a)) {
            lbl += a -> lbl(b); changed = true
          }
        }
        val want = ids.map { a =>
          if (core(a)) (a, "core", lbl(a))
          else {
            val adj = neigh(a).filter(b => b != a && core(b))
            if (adj.nonEmpty) (a, "border", adj.map(lbl).min)
            else (a, "noise", -1L)
          }
        }.toSet
        val got = graft.ops.Similarity.dbscanGrid(
            pts.toDF("id", "x", "y"), eps, minPts)
          .select($"id", $"kind", $"cluster")
          .as[(Long, String, Long)].collect().toSet
        assert(got == want,
          s"eps=$eps minPts=$minPts missing=${want -- got} extra=${got -- want}")
    }
  }

  test("quantile sketch: estimate within width of exact at EVERY percentile; random 3-way merges associative") {
    val valGen = Gen.listOfN(120, Gen.choose(-5000L, 5000L))
    samples(valGen, 3).zipWithIndex.foreach { case (vs, si) =>
      val w = Seq(7L, 32L, 100L)(si % 3)
      val sorted = vs.sorted
      val df = vs.toDF("v")
      val est = graft.ops.Profile.quantilesFromSketch(
          graft.ops.Profile.quantileSketch(df, $"v", w), w, (1 to 100))
        .select($"q_pct", $"estimate").as[(Long, Long)].collect().toMap
      for (q <- 1 to 100) {
        val exact = sorted(((vs.size.toLong * q + 99) / 100 - 1).toInt)
        val e = est(q.toLong)
        assert(exact >= e && exact < e + w, s"w=$w q=$q est=$e exact=$exact")
      }
      // random 3-way split: any merge grouping yields the identical state
      val (a, rest) = vs.splitAt(vs.size / 3)
      val (b, c) = rest.splitAt(rest.size / 2)
      def sk(xs: Seq[Long]) =
        graft.ops.Profile.quantileSketch(xs.toDF("v"), $"v", w)
      def st(d: org.apache.spark.sql.DataFrame) =
        d.as[(Long, Long)].collect().toMap
      val g1 = st(graft.ops.Profile.mergeQuantileSketches(Seq(
        graft.ops.Profile.mergeQuantileSketches(Seq(sk(a), sk(b))), sk(c))))
      val g2 = st(graft.ops.Profile.mergeQuantileSketches(Seq(
        sk(a), graft.ops.Profile.mergeQuantileSketches(Seq(sk(b), sk(c))))))
      assert(g1 == g2 && g1 == st(sk(vs)), s"w=$w")
    }
  }

  test("log quantile sketch: bucket containment + relative width at EVERY percentile over signed heavy-tailed values; merges associative; bucket monotone") {
    // heavy-tailed: exponent drawn uniformly, then a value below 2^e,
    // with sign and zeros mixed in — ten+ decades in one list
    val valGen = Gen.listOfN(150, for {
      ex <- Gen.choose(0, 40)
      m <- Gen.choose(0L, math.max((1L << ex) - 1, 0L))
      s <- Gen.oneOf(-1L, 1L)
    } yield s * m)
    samples(valGen, 3).zipWithIndex.foreach { case (vs, si) =>
      val p = Seq(4, 8, 12)(si % 3)
      val sorted = vs.sorted
      val df = vs.toDF("v")
      // monotone: bucket order never disagrees with value order
      val bks = df.select($"v",
          graft.ops.Profile.logBucket($"v", p).as("b"))
        .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
      assert(bks.zip(bks.tail).forall { case (x, y) => x <= y }, s"p=$p")
      val est = graft.ops.Profile.quantilesFromLogSketch(
          graft.ops.Profile.quantileLogSketch(df, $"v", p), p, (1 to 100))
        .select($"q_pct", $"estimate", $"est_upper")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      for (q <- 1 to 100) {
        val exact = sorted(((vs.size.toLong * q + 99) / 100 - 1).toInt)
        val (lo, up) = est(q.toLong)
        assert(exact >= lo && exact < up, s"p=$p q=$q [$lo,$up) exact=$exact")
        // width <= max(1, |edge closest to zero| >> (p-1)): the
        // within-width-in-log-space guarantee, mirror-symmetric
        val inner = math.min(math.abs(lo), math.abs(up - 1))
        assert(up - lo <= math.max(1L, inner >> (p - 1)),
          s"p=$p q=$q [$lo,$up) width=${up - lo}")
      }
      // any merge grouping yields the identical state
      val (a, rest) = vs.splitAt(vs.size / 3)
      val (b, c) = rest.splitAt(rest.size / 2)
      def sk(xs: Seq[Long]) =
        graft.ops.Profile.quantileLogSketch(xs.toDF("v"), $"v", p)
      def st(d: org.apache.spark.sql.DataFrame) =
        d.as[(Long, Long)].collect().toMap
      val g1 = st(graft.ops.Profile.mergeQuantileSketches(Seq(
        graft.ops.Profile.mergeQuantileSketches(Seq(sk(a), sk(b))), sk(c))))
      val g2 = st(graft.ops.Profile.mergeQuantileSketches(Seq(
        sk(a), graft.ops.Profile.mergeQuantileSketches(Seq(sk(b), sk(c))))))
      assert(g1 == g2 && g1 == st(sk(vs)), s"p=$p")
    }
  }

  test("signed sketch: retraction is the exact inverse; maintained state equals from-scratch; merge grouping-free") {
    val valGen = Gen.listOfN(120, for {
      ex <- Gen.choose(0, 30)
      m <- Gen.choose(0L, math.max((1L << ex) - 1, 0L))
      s <- Gen.oneOf(-1L, 1L)
    } yield s * m)
    samples(valGen, 3).zipWithIndex.foreach { case (vs, si) =>
      val p = Seq(4, 8, 12)(si % 3)
      // random delta: base = 2/3 of rows, inserts = the rest,
      // deletes = every 5th base row (a valid retraction by construction)
      val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val base = rows.filter(_._1 % 3 != 0)
      val inserts = rows.filter(_._1 % 3 == 0)
      val deletes = base.filter(_._1 % 5 == 0)
      val post = (base.toSet -- deletes.toSet) ++ inserts.toSet
      def sk(xs: Seq[(Long, Long)], sign: Int) =
        graft.ops.Profile.quantileLogSketchSigned(
          xs.toDF("id", "v"), $"v", p, sign)
      def st(d: org.apache.spark.sql.DataFrame) =
        d.as[(Long, Long)].collect().toMap
      val scratch = st(graft.ops.Profile.quantileLogSketch(
        post.toSeq.toDF("id", "v"), $"v", p))
      val maintained = st(graft.ops.Profile.mergeSignedSketches(Seq(
        sk(base, 1), sk(inserts, 1), sk(deletes, -1))))
      assert(maintained == scratch, s"p=$p maintained != from-scratch: " +
        s"missing=${scratch.toSet -- maintained.toSet} extra=${maintained.toSet -- scratch.toSet}")
      // grouping-free: retract-then-insert == insert-then-retract
      val other = st(graft.ops.Profile.mergeSignedSketches(Seq(
        graft.ops.Profile.mergeSignedSketches(Seq(sk(base, 1), sk(deletes, -1))),
        sk(inserts, 1))))
      assert(other == scratch, s"p=$p merge grouping changed the state")
      // retracting EVERYTHING empties the state exactly
      val empty = graft.ops.Profile.mergeSignedSketches(Seq(
        sk(base, 1), sk(base, -1))).count()
      assert(empty == 0L, s"p=$p full retraction left $empty buckets")
    }
  }

  test("keep-first span dedup equals the replayed first-occurrence rule on random corpora") {
    val n = 3
    val docGen = Gen.listOfN(6, Gen.choose(3, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("p", "q", "r")).map(_.mkString(" "))))
    samples(docGen, 3).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      // test-side replay: window keys -> first occurrence -> coverage
      val tks = docs.map { case (id, t) => (id, t.trim.split("\\s+")) }
      val occ = scala.collection.mutable.Map.empty[String, List[(Long, Int)]]
      for ((id, w) <- tks; p <- 0 to w.length - n)
        occ(w.slice(p, p + n).mkString(" ")) =
          occ.getOrElse(w.slice(p, p + n).mkString(" "), Nil) :+ ((id, p))
      val covered = occ.values.filter(_.size >= 2).flatMap { os =>
        val first = os.min
        os.filterNot(_ == first).flatMap { case (d, p) =>
          (p until p + n).map(d -> _) }
      }.toSet
      val want = tks.map { case (id, w) =>
        val kept = w.indices.filterNot(i => covered((id, i))).map(w)
        (id, kept.mkString(" "), (w.length - kept.size).toLong)
      }.toSet
      val got = Dedup.keepFirstSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", n)
        .select($"doc_id", $"text_clean", $"n_removed")
        .as[(Long, String, Long)].collect().toSet
      assert(got == want, s"docs=$docs missing=${want -- got} extra=${got -- want}")
    }
  }

  test("holt scan equals the sequential recurrence on random ragged series") {
    // Random key set with ragged lengths (1..40 buckets, random gaps) and
    // random counts: the doubling scan must agree with a plain sequential
    // fold to ~ulps (assert at 1e-9 pre-round tolerance via the rounded
    // outputs' exactness on dyadic α,β being unavailable here — counts
    // are random so values aren't dyadic; the 6-decimal round must agree
    // with the rounded reference within one ulp-induced boundary flip,
    // i.e. exactly, because drift ~1e-12 only flips a round at a
    // half-way point, which random doubles avoid a.s.).
    val seriesGen: Gen[List[(String, Int, Int)]] = Gen.listOfN(60, for {
      key <- Gen.oneOf("a", "b", "c", "d")
      hr <- Gen.choose(0, 39)
      cnt <- Gen.choose(1, 9)
    } yield (key, hr, cnt))
    samples(seriesGen, 3).foreach { triples =>
      val byBucket = triples.groupBy(t => (t._1, t._2))
        .view.mapValues(_.map(_._3).sum).toMap
      val rows = byBucket.toSeq.flatMap { case ((k, hr), cnt) =>
        Seq.fill(cnt)((k, java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-01T00:15:00Z")
            .plusSeconds(3600L * hr))))
      }
      val (alpha, beta) = (0.5, 0.25)
      val got = graft.ops.TimeSeries.holt(rows.toDF("event_type", "ts"),
          "event_type", "ts", 3600L, alpha, beta)
        .select($"event_type", $"bucket", $"level", $"trend")
        .as[(String, Long, Double, Double)].collect()
        .sortBy(r => (r._1, r._2))
      def r6(d: Double): Double =
        BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val want = byBucket.keys.map(_._1).toSeq.distinct.sorted.flatMap { k =>
        val xs = byBucket.collect { case ((`k`, hr), cnt) => (hr, cnt) }
          .toSeq.sortBy(_._1).map(_._2.toDouble)
        xs.tail.scanLeft((xs.head, 0.0)) { case ((l, b), x) =>
          val ln = alpha * x + (1 - alpha) * (l + b)
          (ln, beta * (ln - l) + (1 - beta) * b)
        }.map { case (l, b) => (k, r6(l), r6(b)) }
      }
      assert(got.length == want.length)
      got.zip(want).foreach { case ((k, _, l, b), (wk, wl, wb)) =>
        assert(k == wk && l == wl && b == wb,
          s"key $k: got ($l,$b) want ($wl,$wb)")
      }
    }
  }

  test("ar2 equals the rounded-input Yule-Walker replay on random ragged series") {
    // Replays the op's EXACT contract arithmetic: mu, r1, r2 round at 6
    // decimals (absorbing engine-vs-fold accumulation ulps, the holt
    // argument), then phi and every forecast are fixed IEEE trees over
    // those identical doubles — so the rounded outputs must agree
    // EXACTLY, including the degenerate guard (constant keys planted
    // alongside the random ones: Sigma d^2 == 0.0 exactly because
    // d = x - round(avg) == 0.0 when all x equal).
    val seriesGen: Gen[List[(String, Int, Int)]] = Gen.listOfN(60, for {
      key <- Gen.oneOf("a", "b", "c")
      hr <- Gen.choose(0, 39)
      cnt <- Gen.choose(1, 9)
    } yield (key, hr, cnt))
    samples(seriesGen, 3).foreach { triples =>
      val withConst = triples ++ (0 until 6).map(hr => ("k", hr, 4)) ++
        List(("one", 7, 3)) // single-bucket key: forecast stays null
      val byBucket = withConst.groupBy(t => (t._1, t._2))
        .view.mapValues(_.map(_._3).sum).toMap
      val rows = byBucket.toSeq.flatMap { case ((k, hr), cnt) =>
        Seq.fill(cnt)((k, java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-01T00:15:00Z")
            .plusSeconds(3600L * hr))))
      }
      val got = graft.ops.TimeSeries.ar2(rows.toDF("event_type", "ts"),
          "event_type", "ts", 3600L)
        .select($"event_type", $"bucket", $"phi1", $"phi2", $"mu",
          $"forecast_next")
        .as[(String, Long, Double, Double, Double, Option[Double])]
        .collect().sortBy(r => (r._1, r._2))
      def r6(d: Double): Double =
        BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val want = byBucket.keys.map(_._1).toSeq.distinct.sorted.flatMap { k =>
        val xs = byBucket.collect { case ((`k`, hr), cnt) => (hr, cnt) }
          .toSeq.sortBy(_._1).map(_._2.toDouble)
        val mu = r6(xs.sum / xs.length)
        val d = xs.map(_ - mu)
        val den = d.map(x => x * x).sum
        val n1 = d.zip(d.drop(1)).map { case (a, b) => b * a }.sum
        val n2 = d.zip(d.drop(2)).map { case (a, b) => b * a }.sum
        val (r1, r2) =
          if (den > 0 && xs.length >= 2)
            (Some(r6(n1 / den)),
              if (xs.length >= 3) Some(r6(n2 / den)) else None)
          else (None, None)
        val (p1, p2) = (r1, r2) match {
          case (Some(a), Some(b)) if math.abs(1.0 - a * a) >= 1e-9 =>
            (a * (1.0 - b) / (1.0 - a * a), (b - a * a) / (1.0 - a * a))
          case _ => (0.0, 0.0)
        }
        d.indices.map { i =>
          val f = if (i >= 1) Some(r6(mu + p1 * d(i) + p2 * d(i - 1)) + 0.0)
            else None
          (k, r6(p1) + 0.0, r6(p2) + 0.0, mu, f)
        }
      }
      assert(got.length == want.length, s"${got.length} vs ${want.length}")
      got.zip(want).foreach { case ((k, b, g1, g2, gm, gf), (wk, w1, w2, wm, wf)) =>
        assert(k == wk && g1 == w1 && g2 == w2 && gm == wm && gf == wf,
          s"key $k bucket $b: got ($g1,$g2,$gm,$gf) want ($w1,$w2,$wm,$wf)")
      }
    }
  }

  test("kalman scan and RTS smoother equal the sequential recurrences on random ragged series") {
    // The general per-row affine scan (time-varying coefficients — the
    // machinery holt's constant matrix never exercises) must agree with
    // the plain sequential Kalman recurrence, and the backward scan with
    // the sequential RTS recursion over the rounded levels.
    val seriesGen: Gen[List[(String, Int, Int)]] = Gen.listOfN(60, for {
      key <- Gen.oneOf("a", "b", "c", "d")
      hr <- Gen.choose(0, 39)
      cnt <- Gen.choose(1, 9)
    } yield (key, hr, cnt))
    samples(seriesGen, 3).foreach { triples =>
      val byBucket = triples.groupBy(t => (t._1, t._2))
        .view.mapValues(_.map(_._3).sum).toMap
      val rows = byBucket.toSeq.flatMap { case ((k, hr), cnt) =>
        Seq.fill(cnt)((k, java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-01T00:15:00Z")
            .plusSeconds(3600L * hr))))
      }
      val (q, r) = (2.0, 8.0)
      val (ks, cs) = graft.ops.TimeSeries.kalmanCoeffs(q, r)
      val got = graft.ops.TimeSeries.kalmanSmooth(
          rows.toDF("event_type", "ts"), "event_type", "ts", 3600L, q, r)
        .select($"event_type", $"bucket", $"level", $"smooth")
        .as[(String, Long, Double, Double)].collect()
        .sortBy(x => (x._1, x._2))
      def r6(d: Double): Double =
        BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val want = byBucket.keys.map(_._1).toSeq.distinct.sorted.flatMap { k =>
        val xs = byBucket.collect { case ((`k`, hr), cnt) => (hr, cnt) }
          .toSeq.sortBy(_._1).map(_._2.toDouble)
        val lv = new Array[Double](xs.length)
        lv(0) = xs(0)
        for (t <- 1 until xs.length) {
          val kt = ks(math.min(t + 1, ks.length) - 1)
          lv(t) = (1 - kt) * lv(t - 1) + kt * xs(t)
        }
        val lr = lv.map(r6)
        val sm = new Array[Double](xs.length)
        sm(xs.length - 1) = lr(xs.length - 1)
        for (t <- xs.length - 2 to 0 by -1) {
          val ct = cs(math.min(t + 1, cs.length) - 1)
          sm(t) = ct * sm(t + 1) + (1 - ct) * lr(t)
        }
        lr.zip(sm.map(r6)).map { case (l, s) => (k, l, s) }
      }
      assert(got.length == want.length)
      got.zip(want).foreach { case ((k, _, l, s), (wk, wl, ws)) =>
        assert(k == wk && l == wl && s == ws,
          s"key $k: got ($l,$s) want ($wl,$ws)")
      }
      // the MATRIX scan (local-linear-trend model) against its own
      // sequential 2-state replay on the same ragged series
      val (qL, qS) = (2.0, 0.125)
      val (k1s, k2s) = graft.ops.TimeSeries.kalmanTrendCoeffs(qL, qS, r)
      val gotT = graft.ops.TimeSeries.kalmanTrend(
          rows.toDF("event_type", "ts"), "event_type", "ts", 3600L,
          qL, qS, r)
        .select($"event_type", $"bucket", $"level", $"slope")
        .as[(String, Long, Double, Double)].collect()
        .sortBy(x => (x._1, x._2))
      val wantT = byBucket.keys.map(_._1).toSeq.distinct.sorted.flatMap { k =>
        val xs = byBucket.collect { case ((`k`, hr), cnt) => (hr, cnt) }
          .toSeq.sortBy(_._1).map(_._2.toDouble)
        var (l, b) = (xs(0), 0.0)
        (k, r6(l), r6(b)) +: (1 until xs.length).map { t =>
          val i = math.min(t + 1, k1s.length) - 1
          val (k1, k2) = (k1s(i), k2s(i))
          val nl = (1 - k1) * l + (1 - k1) * b + k1 * xs(t)
          val nb = -k2 * l + (1 - k2) * b + k2 * xs(t)
          l = nl; b = nb
          (k, r6(l), r6(b))
        }
      }
      assert(gotT.length == wantT.length)
      gotT.zip(wantT).foreach { case ((k, _, l, s), (wk, wl, ws)) =>
        assert(k == wk && l == wl && s == ws,
          s"trend key $k: got ($l,$s) want ($wl,$ws)")
      }
    }
  }

  test("bitext margin equals a bit-exact brute-force replay; output is a partial matching") {
    // The replay reproduces the engine's IEEE trees operation-for-
    // operation (sequential-fold cosine, rank-order 0.0-seeded
    // averages, the add/halve/divide margin), so doubles compare
    // EXACTLY — no tolerance anywhere.
    val rnd = new scala.util.Random(21)
    (1 to 3).foreach { _ =>
      val vecs = (0L until 12L).map(i =>
        (i, Array.fill(4)((rnd.nextInt(19) - 9) / 10.0f)))
        .filter(_._2.exists(_ != 0f))
      val src = vecs.filter(_._1 % 2 == 0)
      val tgt = vecs.filter(_._1 % 2 == 1)
      val k = 2
      def cos(a: Array[Float], b: Array[Float]): Double = {
        def dot(x: Array[Float], y: Array[Float]) = {
          var s = 0.0; var i = 0
          while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }
          s
        }
        dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      }
      val sims = for { (si, sv) <- src; (ti, tv) <- tgt }
        yield (si, ti, cos(tv, sv))
      def topk(by: Long => Seq[(Long, Long, Double)]) = by
      val fwd = src.map(_._1).flatMap { s =>
        sims.filter(_._1 == s).sortBy(p => (-p._3, p._2)).take(k)
          .zipWithIndex.map { case ((a, b, x), i) => (a, b, x, i + 1) } }
      val bwd = tgt.map(_._1).flatMap { t =>
        sims.filter(_._2 == t).sortBy(p => (-p._3, p._1)).take(k)
          .zipWithIndex.map { case ((a, b, x), i) => (a, b, x, i + 1) } }
      def avg(rows: Seq[(Long, Long, Double, Int)], of: ((Long, Long, Double, Int)) => Long) =
        rows.groupBy(of).view.mapValues { g =>
          g.sortBy(_._4).map(_._3).foldLeft(0.0)(_ + _) / g.size }.toMap
      val af = avg(fwd, _._1); val ab = avg(bwd, _._2)
      val cands = (fwd.map(r => (r._1, r._2, r._3)) ++
        bwd.map(r => (r._1, r._2, r._3))).distinct
      val margins = cands.map { case (s, t, x) =>
        (s, t, x, x / ((af(s) + ab(t)) / 2.0)) }
      val bestS = margins.groupBy(_._1).view.mapValues(
        _.minBy(p => (-p._4, p._2))).toMap
      val bestT = margins.groupBy(_._2).view.mapValues(
        _.minBy(p => (-p._4, p._1))).toMap
      val want = margins.filter(p =>
        bestS(p._1) == p && bestT(p._2) == p)
        .map(p => (p._1, p._2, p._3, p._4)).toSet
      val got = graft.ops.Similarity.bitextMargin(
          src.toDF("vec_id", "embedding"), tgt.toDF("vec_id", "embedding"),
          k = k)
        .as[(Long, Long, Double, Double)].collect().toSet
      assert(got == want, s"got=$got want=$want")
      // partial matching: no src or tgt appears twice
      assert(got.map(_._1).size == got.size && got.map(_._2).size == got.size)
    }
  }

  test("bipartite double cover agrees with brute-force BFS parity on random graphs") {
    val edgeGen: Gen[List[(Long, Long)]] = Gen.listOfN(45, for {
      a <- Gen.choose(0L, 25L); b <- Gen.choose(0L, 25L) if a != b
    } yield (a, b))
    samples(edgeGen, 3).foreach { es =>
      val edges = es.distinct
      val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      // brute force: BFS 2-coloring per component from its min node;
      // a conflict edge anywhere makes the whole component non-bipartite
      val nodes = adj.keySet
      var comp = Map.empty[Long, Long]; var color = Map.empty[Long, Int]
      var bip = Map.empty[Long, Boolean]
      nodes.toSeq.sorted.foreach { seed =>
        if (!comp.contains(seed)) {
          var frontier = Set(seed); var seen = Map(seed -> 0)
          while (frontier.nonEmpty) {
            frontier = frontier.flatMap(v => adj(v).filterNot(seen.contains)
              .map(_ -> (1 - seen(v)))).toMap match {
              case m => m.foreach { case (v, c) => seen += v -> c }; m.keySet
            }
          }
          val ok = seen.keys.forall(v => adj(v).forall(u => seen(u) != seen(v)))
          seen.keys.foreach { v =>
            comp += v -> seed; bip += v -> ok
            if (ok) color += v -> seen(v)
          }
        }
      }
      val got = graft.ops.Graph.bipartiteColor(edges.toDF("a", "b"))
        .as[(Long, Long, Option[Int], Boolean)].collect()
      assert(got.map(_._1).toSet == nodes)
      got.foreach { case (v, c, col_, isB) =>
        assert(c == comp(v), s"node $v comp $c vs ${comp(v)}")
        assert(isB == bip(v), s"node $v bip $isB vs ${bip(v)}")
        assert(col_ == (if (bip(v)) Some(color(v)) else None),
          s"node $v color $col_ vs ${if (bip(v)) Some(color(v)) else None}")
      }
    }
  }

  test("matrix profile replays an in-test brute force on random ragged multi-key series") {
    // Random counts over ragged per-key grids; the banded profile must
    // match a direct replay of the rule (exact integer stats, same
    // single-sqrt correlation) for every emitted window.
    val (w, excl, band) = (4, 2, 10)
    val cellGen: Gen[List[(String, Int, Int)]] = Gen.listOfN(70, for {
      key <- Gen.oneOf("a", "b")
      hr <- Gen.choose(0, 29)
      cnt <- Gen.choose(1, 7)
    } yield (key, hr, cnt))
    samples(cellGen, 3).foreach { cells =>
      val byBucket = cells.groupBy(t => (t._1, t._2))
        .view.mapValues(_.map(_._3).sum).toMap
      val rows = byBucket.toSeq.flatMap { case ((k, hr), cnt) =>
        Seq.fill(cnt)((k, java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-01T00:20:00Z")
            .plusSeconds(3600L * hr))))
      }
      val got = graft.ops.TimeSeries.matrixProfileBanded(
          rows.toDF("event_type", "ts"), "event_type", "ts", 3600L,
          w = w, excl = excl, band = band)
        .select($"event_type", $"bucket", $"nn_bucket", $"best_corr")
        .as[(String, Long, Long, Double)].collect()
      val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
        .getEpochSecond / 3600
      val series = byBucket.keys.map(_._1).toSeq.distinct.sorted.map { k =>
        k -> byBucket.collect { case ((`k`, hr), cnt) => (hr, cnt.toLong) }
          .toSeq.sortBy(_._1)
      }.toMap
      def windows(k: String) = {
        val xs = series(k).map(_._2)
        (0 to xs.length - w).flatMap { p =>
          val win = xs.slice(p, p + w)
          val s = win.sum; val q = win.map(x => x * x).sum
          val den = w * q - s * s
          if (den > 0) Some((p, series(k)(p)._1.toLong + base, win, s, den))
          else None
        }
      }
      val want = series.keys.flatMap { k =>
        val ws = windows(k)
        ws.flatMap { case (p, bkt, win, s, den) =>
          val cands = ws.filter { case (p2, _, _, _, _) =>
            math.abs(p2 - p) >= excl && math.abs(p2 - p) <= band }
            .map { case (p2, bkt2, win2, s2, den2) =>
              val dot = win.zip(win2).map { case (x, y) => x * y }.sum
              val r = (w * dot - s * s2).toDouble /
                math.sqrt((den * den2).toDouble)
              (p2, bkt2, r)
            }
          if (cands.isEmpty) None
          else {
            val best = cands.minBy { case (p2, _, r) => (-r, p2) }
            Some((k, bkt) -> ((best._2, best._3)))
          }
        }
      }.toMap
      assert(got.length == want.size, s"${got.length} vs ${want.size}")
      got.foreach { case (k, bkt, nb, r) =>
        val (wb, wr) = want((k, bkt))
        assert(nb == wb && math.abs(r - wr) < 1e-12,
          s"($k,$bkt): got ($nb,$r) want ($wb,$wr)")
      }
    }
  }

  test("phash is invariant under edits the stride grid never samples") {
    // For random lengths n > 64 the 64 sampled positions {1 + (i·n)÷64}
    // leave unsampled bytes; editing ONLY those must keep the hash (and
    // dc) bit-identical — the property that makes the stub decode an
    // honest stand-in for pixel-space perceptual hashing.
    val docGen: Gen[(Int, List[Int])] = for {
      n <- Gen.choose(80, 260)
      chars <- Gen.listOfN(n, Gen.choose(0, 25))
    } yield (n, chars)
    samples(Gen.listOfN(4, docGen), 2).foreach { docs =>
      val originals = docs.zipWithIndex.map { case ((n, cs), i) =>
        (i.toLong, cs.map(c => ('a' + c).toChar).mkString) }
      val mutated = originals.map { case (id, text) =>
        val n = text.length
        val sampled = (0 until 64).map(i => (i.toLong * n) / 64).toSet
        val free = (0 until n).filterNot(p => sampled(p.toLong))
        assert(free.nonEmpty)
        val sb = new StringBuilder(text)
        free.foreach(p => sb.setCharAt(p, if (text(p) == 'Z') 'Y' else 'Z'))
        (id + 1000L, sb.toString)
      }
      val all = (originals ++ mutated).toDF("doc_id", "text")
      val got = graft.ops.Multimodal.phashGroups(
          graft.ops.Multimodal.asMedia(all, "doc_id", "text"))
        .select($"media_id", $"phash", $"dc")
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      originals.foreach { case (id, _) =>
        assert(got(id) == got(id + 1000L),
          s"doc $id: ${got(id)} vs mutated ${got(id + 1000L)}")
      }
    }
  }

  test("phash near grouping equals brute-force union-find over all-pairs Hamming") {
    // Random 15-bit hashes, d ∈ {1,2,3}: the pigeonhole-banded,
    // CC-closed grouping must produce EXACTLY the partition of the
    // transitive closure of {hamming(a,b) ≤ d}, with group_id = the
    // component's min hash and keeper_id = the group's min media id.
    val gen: Gen[(Int, List[Int])] = for {
      d <- Gen.choose(1, 3)
      hs <- Gen.listOfN(24, Gen.choose(0, 127)) // small range → collisions + near pairs
    } yield (d, hs)
    samples(Gen.listOfN(1, gen), 4).foreach { case List((d, hs)) =>
      val rows = hs.zipWithIndex.map { case (h, i) => (i.toLong, h.toLong) }
      val got = graft.ops.Multimodal
        .phashNearFromHashes(rows.toDF("media_id", "phash"), hammingD = d)
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
      // brute force: union-find over all pairs
      val parent = scala.collection.mutable.Map(hs.map(h => h -> h).distinct: _*)
      def find(x: Int): Int =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      for (a <- parent.keys.toSeq; b <- parent.keys.toSeq
           if a < b && java.lang.Long.bitCount((a ^ b).toLong) <= d) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val comp = parent.keys.map(h => h -> find(h)).toMap
      val byComp = rows.groupBy { case (_, h) => comp(h.toInt) }
      rows.foreach { case (id, h) =>
        val members = byComp(comp(h.toInt))
        val wantGid = members.map(_._2).min // min member hash == component root
        assert(got(id) == ((wantGid, members.size.toLong, members.map(_._1).min)),
          s"d=$d id=$id h=$h: got ${got(id)} want ($wantGid, ${members.size}, ${members.map(_._1).min})")
      }
    }
  }

  test("MMR greedy invariant: every pick maximizes the penalized score over the remaining pool") {
    // Random small corpora; replay the greedy rule from the emitted
    // (sim, redundancy) columns plus an independently computed pair-sim
    // matrix — each step's pick must beat every other remaining
    // candidate's λ·sim − (1−λ)·maxRedundancy (ties to lower id), and
    // redundancy must equal the true max pair-sim to the selected set.
    val dim = 4
    val vecGen: Gen[List[List[Double]]] = Gen.listOfN(12,
      Gen.listOfN(dim, Gen.choose(-1.0, 1.0)))
    samples(vecGen, 3).foreach { vs =>
      val vecs = vs.zipWithIndex.map { case (v, i) =>
        (i.toLong + 1, v.map(_.toFloat).toArray) }
      val all = ((0L, Array(1.0f, 0.5f, -0.25f, 0.125f)) +: vecs)
        .toDF("vec_id", "embedding")
      val (lambda, mu, candK, k) = (0.7, 0.3, 8, 5)
      val got = graft.ops.Similarity.mmrRerank(all,
          all.filter($"vec_id" === 0), candK, k)
        .select($"step", $"neighbor_id", $"sim", $"redundancy", $"mmr")
        .as[(Int, Long, Double, Double, Double)].collect().sortBy(_._1)
      val emb = ((0L, Array(1.0, 0.5, -0.25, 0.125)) +:
        vecs.map { case (i, v) => (i, v.map(_.toDouble)) }).toMap
      def cos(a: Array[Double], b: Array[Double]): Double = {
        val dot = a.indices.map(i => a(i) * b(i)).sum
        dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      val sims = vecs.map { case (i, _) => i -> cos(emb(i), emb(0L)) }
        .filterNot(_._2.isNaN).sortBy(p => (-p._2, p._1)).take(candK).toMap
      var selected = List.empty[Long]
      got.foreach { case (step, nid, sim, red, mmr) =>
        assert(step == selected.size + 1)
        assert(sims.contains(nid), s"pick $nid not in candidate pool")
        assert(math.abs(sim - sims(nid)) < 1e-9)
        val trueRed = if (selected.isEmpty) 0.0
          else selected.map(s => cos(emb(nid), emb(s))).max
        assert(math.abs(red - trueRed) < 1e-9, s"step $step red $red vs $trueRed")
        assert(math.abs(mmr - (lambda * sim - mu * red)) < 1e-9)
        // no remaining candidate strictly beats the pick
        (sims.keySet -- selected - nid).foreach { o =>
          val oRed = if (selected.isEmpty) 0.0
            else selected.map(s => cos(emb(o), emb(s))).max
          val oMmr = lambda * sims(o) - mu * oRed
          assert(oMmr < mmr + 1e-9 && (oMmr < mmr - 1e-9 || nid < o),
            s"step $step: candidate $o (mmr $oMmr) should not beat pick $nid ($mmr)")
        }
        selected = selected :+ nid
      }
      assert(got.length == math.min(k, sims.size))
    }
  }

  test("funnel and transition matrix replay brute force on random tied streams") {
    val gen = for {
      u <- Gen.choose(1, 12)
      t <- Gen.choose(0, 50) // coarse clock → deliberate ties
      ty <- Gen.oneOf("signup", "view", "click", "purchase", "noise")
    } yield (u.toLong, t.toLong, ty)
    val steps = Seq("signup", "view", "click", "purchase")
    samples(Gen.listOfN(400, gen), 3).foreach { evs =>
      val rows = evs.zipWithIndex.map { case ((u, t, ty), i) =>
        (u, t, i.toLong, ty)
      }
      val df = rows.toDF("user_id", "sec", "event_id", "event_type")
        .withColumn("ts", timestamp_seconds($"sec"))
      // funnel: earliest-greedy strict-> replay
      val reach = Array.fill(steps.size)(0L)
      rows.groupBy(_._1).foreach { case (_, es) =>
        var prev = Long.MinValue
        var ok = true
        steps.zipWithIndex.foreach { case (st, si) =>
          if (ok) {
            val cand = es.filter(e =>
              e._4 == st && (si == 0 || e._2 > prev)).map(_._2)
            if (cand.nonEmpty) { prev = cand.min; reach(si) += 1 }
            else ok = false
          }
        }
      }
      val gotF = graft.ops.Behavior
        .funnelSteps(df, "user_id", "ts", "event_type", steps)
        .select($"step_idx", $"n_users").as[(Int, Long)].collect().toMap
      steps.indices.foreach(i =>
        assert(gotF(i + 1) == reach(i), s"step ${i + 1}: $gotF vs ${reach.toSeq}"))
      // transitions: (sec, event_id) total-order lag replay, p = n/total
      val want = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
        es.sortBy(e => (e._2, e._3)).map(_._4)
          .sliding(2).filter(_.size == 2).map(w => (w(0), w(1))).toSeq
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val gotT = graft.ops.Behavior
        .transitionMatrix(df, "user_id", "ts", "event_id", "event_type")
        .select($"prev_type", $"next_type", $"n", $"p")
        .as[(String, String, Long, Double)].collect()
      assert(gotT.map(r => (r._1, r._2) -> r._3).toMap == want, "counts")
      val rowSums = want.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
      gotT.foreach { case (p, _, n, prob) =>
        assert(prob == n.toDouble / rowSums(p).toDouble, s"p($p) $prob") }
    }
  }

  test("decile lift replays a driver-side sort + ntile on duplicate-heavy values") {
    val gen = Gen.choose(1, 40) // heavy duplicates → ntile ties matter
    samples(Gen.listOfN(137, gen), 3).foreach { vs =>
      val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toDouble) }
      val got = graft.ops.Profile
        .decileLift(rows.toDF("key", "v"), "key", col("v"), n = 10)
        .select($"decile", $"n_rows", $"cum_rows", $"gain", $"lift")
        .as[(Int, Long, Long, Double, Double)].collect().sortBy(_._1)
      val cents = rows.map { case (k, v) => (k, math.round(v * 100)) }
      val sorted = cents.sortBy { case (k, c) => (-c, k) }
      val bigN = sorted.size
      val q = bigN / 10; val m = bigN % 10
      def bucket(r0: Int): Int =
        if (r0 < m * (q + 1)) r0 / (q + 1) + 1
        else m + (r0 - m * (q + 1)) / math.max(q, 1) + 1
      val byB = sorted.zipWithIndex
        .groupBy { case (_, r0) => bucket(r0) }
      val total = cents.map(_._2).sum
      var cumR = 0L; var cumC = 0L
      (1 to 10).foreach { d =>
        val rowsB = byB.getOrElse(d, Seq.empty)
        cumR += rowsB.size; cumC += rowsB.map(_._1._2).sum
        val (gd, nr, cr, gain, lift) = (got(d - 1)._1, got(d - 1)._2,
          got(d - 1)._3, got(d - 1)._4, got(d - 1)._5)
        assert(gd == d && nr == rowsB.size && cr == cumR, got(d - 1).toString)
        assert(gain == cumC.toDouble / total.toDouble, s"gain d=$d")
        assert(lift == (cumC.toDouble / total.toDouble)
          / (cumR.toDouble / bigN.toDouble), s"lift d=$d")
      }
    }
  }

  test("theta equals a sequential OLS+SES replay on random ragged series") {
    val gen = for {
      k <- Gen.oneOf("a", "b", "c")
      b <- Gen.choose(0, 40)
    } yield (k, b)
    samples(Gen.listOfN(300, gen), 3).foreach { pts =>
      val df = pts.map { case (k, b) => (k, b.toLong * 3600L) }
        .toDF("k", "sec").withColumn("ts", timestamp_seconds($"sec"))
      val got = graft.ops.TimeSeries.theta(df, "k", "ts", 3600L)
        .select($"k", $"bucket", $"n", $"trend", $"ses", $"forecast_next")
        .as[(String, Long, Long, Double, Double, Double)].collect()
        .groupBy(_._1)
      pts.groupBy(_._1).foreach { case (key, ps) =>
        val series = ps.groupBy(_._2).toSeq.sortBy(_._1)
          .map { case (b, g) => (b.toLong, g.size.toLong) }
        val mN = series.size
        val st = BigInt((0 until mN).sum)
        val sy = BigInt(series.map(_._2).sum)
        val sty = (0 until mN).map(t => BigInt(t) * series(t)._2).sum
        val stt = (0 until mN).map(t => BigInt(t) * t).sum
        val num = mN * sty - st * sy
        val den = mN * stt - st * st
        val ib = if (den == 0) 0.0 else num.toDouble / den.toDouble
        val ia = (sy.toDouble - ib * st.toDouble) / mN.toDouble
        var s = 0.0
        val rows = got(key).sortBy(_._2)
        assert(rows.map(_._2).toSeq == series.map(_._1).toSeq, "bucket set")
        rows.zipWithIndex.foreach { case ((_, _, n, trend, ses, fc), t) =>
          assert(n == series(t)._2)
          val line = ia + ib * t.toDouble
          assert(trend == math.rint(line * 1e6) / 1e6 + 0.0, s"trend t=$t")
          val z = 2.0 * n - line
          s = if (t == 0) z else 0.5 * z + 0.5 * s
          assert(math.abs(ses - s) < 2e-6, s"ses t=$t: $ses vs $s")
          val sesR = math.rint(ses * 1e6) / 1e6 // engine's own rounded ses
          val want = math.rint((0.5 * (ia + ib * (t.toDouble + 1.0))
            + 0.5 * sesR) * 1e6) / 1e6 + 0.0
          assert(math.abs(fc - want) < 2e-6, s"fc t=$t: $fc vs $want")
        }
      }
    }
  }

  test("pps sample equals an independent JVM-md5 replay") {
    val rows = (1L to 300L).map(k => (k, (k % 17 + 1) * 3.0))
    val got = graft.ops.Sampling
      .ppsSample(rows.toDF("key", "v"), "key", "v", totalN = 40L)
      .as[(Long, Long)].collect().toMap
    val cents = rows.map { case (k, v) => (k, math.round(v * 100)) }
    val tot = cents.map(_._2).sum.toDouble
    def draw(k: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(k.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 1000000L
    }
    val want = cents.flatMap { case (k, c) =>
      val ppm = math.round(math.min(1.0, 40.0 * c / tot) * 1000000.0)
      if (draw(k) < ppm) Some(k -> ppm) else None
    }.toMap
    assert(got == want, s"selected ${got.size} vs ${want.size}")
    assert(want.nonEmpty && want.size < 300, "fixture should partially select")
  }

  test("audio fingerprint equals a sequential constellation replay on random ASCII payloads") {
    // Guards the r15 one-window peak restructure: the op now derives all
    // four neighbors of the 4-neighborhood from ONE ordered pass over the
    // complete (t, b) grid (band neighbors at lag/lead 1 guarded by the
    // row's own b, time neighbors at stride `bands`), so the boundary
    // classes — first/last frame, band 0, band bands-1, single-frame
    // payloads — are exactly where a stride or guard bug would bite.
    // The replay below recomputes the WHOLE pipeline sequentially
    // (energies, strict 4-neighborhood peaks, landmark packing, pair
    // offset vote) and must agree row-for-row.
    import spark.implicits._
    val (win, hop, bands, maxDt, minHits) = (64, 32, 8, 5, 3)
    val rnd = new scala.util.Random(20260819)
    // lengths hit the frame-count edge cases: exactly one frame, one
    // frame + a dangling sub-hop tail, two frames, and longer bodies;
    // doc 7 is doc 6 shifted one hop so cross-media matches exist
    val base = (1L to 6L).zip(Seq(64, 65, 96, 200, 333, 512)).map {
      case (id, n) => (id, Seq.fill(n)((33 + rnd.nextInt(94)).toChar).mkString)
    }
    val all = base :+ ((7L, ("#" * hop) + base.last._2))
    val got = graft.ops.Multimodal.audioFingerprint(
        graft.ops.Multimodal.asMedia(all.toDF("doc_id", "text"),
          "doc_id", "text"))
      .as[(Long, Long, Long, Long)].collect().toSet
    def peaks(s: String): Seq[(Long, Long, Long)] = {
      val nT = (s.length - win) / hop + 1
      val e = Array.tabulate(nT, bands) { (t, b) =>
        (0 until win / bands).map(j => s.charAt(t * hop + b + bands * j).toLong).sum
      }
      for {
        t <- 0 until nT; b <- 0 until bands
        if e(t)(b) > (if (t > 0) e(t - 1)(b) else -1L)
        if e(t)(b) > (if (t < nT - 1) e(t + 1)(b) else -1L)
        if e(t)(b) > (if (b > 0) e(t)(b - 1) else -1L)
        if e(t)(b) > (if (b < bands - 1) e(t)(b + 1) else -1L)
      } yield (t.toLong, b.toLong, e(t)(b))
    }
    val lms = all.flatMap { case (id, s) =>
      val pk = peaks(s)
      for {
        (t1, b1, e1) <- pk; (t2, b2, e2) <- pk
        dt = t2 - t1; if dt >= 1 && dt <= maxDt
      } yield (id, t1,
        ((((b1 * 8 + b2) * 8) + dt) * 8 + e1 % 8) * 8 + e2 % 8)
    }
    // 7 docs < maxMediaPerHash=64: the stop-hash guard never fires here
    // (its fan-out bound has its own scoping in the op doc)
    val want = (for {
      (ma, ta, h) <- lms; (mb, tb, h2) <- lms
      if h2 == h && ma < mb
    } yield (ma, mb, ta - tb))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .collect { case ((a, b, o), c) if c >= minHits => (a, b, o, c) }
      .toSet
    assert(got == want,
      s"got=${got.toSeq.sorted} want=${want.toSeq.sorted}")
    assert(want.exists(p => p._1 == 6L && p._2 == 7L),
      "the shifted copy must match its source")
  }
}
