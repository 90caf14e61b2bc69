package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{AsOfJoin, HourlyRollup, RangeJoin}

/** Property-based invariants (SURVEY.md §5.3): ScalaCheck generators with
  * deterministic seeds, algebraic oracles. Iteration counts are kept
  * small — each property spins Spark jobs, so the value is in the random
  * SHAPES, not in thousands of cases. (Raw Gen + fixed seeds rather than
  * the scalatestplus bridge: reproducible, and the bridge isn't in the
  * offline dependency cache.) */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](gen: Gen[A], cases: Int = 5)(f: A => Unit): Unit =
    (0 until cases).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default.withSize(40), Seed(42L + i)))
    }

  private val asciiText: Gen[String] =
    Gen.chooseNum(0, 200).flatMap(n => Gen.stringOfN(n, Gen.choose(' ', '~')))

  test("property: polyHash expression equals the reference fold for arbitrary ASCII") {
    forAll(Gen.listOfN(8, asciiText)) { texts =>
      {
        def ref(s: String): Long = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
        val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("id", "s")
          .select($"id", graft.functions.TextHash.polyHash($"s").as("h"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        texts.zipWithIndex.foreach { case (t, i) => assert(got(i.toLong) === ref(t)) }
      }
    }
  }

  test("property: rollup emits one row per distinct (hour, id); constant series keeps its value") {
    val gen = for {
      n <- Gen.chooseNum(1, 60)
      rows <- Gen.listOfN(n, for {
        b <- Gen.chooseNum(1L, 4L)
        minute <- Gen.chooseNum(0, 240)
      } yield (new Timestamp(1700000000000L + minute * 60000L), b, 7.25))
    } yield rows
    forAll(gen) { rows =>
      {
        val df = rows.toDF("timestamp", "bldg_id", "v")
        val out = HourlyRollup(df)
        val expectedGroups = rows.map { case (ts, b, _) =>
          (ts.getTime / 3600000L, b)
        }.distinct.size
        assert(out.count() === expectedGroups)
        assert(out.select("v_mean").distinct().collect().map(_.getDouble(0)).toSeq === Seq(7.25))
        // min-agg of the group key is the key itself
        assert(out.filter($"bldg_id" =!= $"bldg_id_min").count() === 0)
      }
    }
  }

  test("property: bucketed range join equals brute force on random timestamps") {
    val gen = for {
      na <- Gen.chooseNum(1, 25)
      nb <- Gen.chooseNum(1, 25)
      as <- Gen.listOfN(na, Gen.chooseNum(0L, 500000L))
      bs <- Gen.listOfN(nb, Gen.chooseNum(0L, 500000L))
    } yield (as, bs)
    forAll(gen) { case (as, bs) =>
      val a = as.zipWithIndex.map { case (t, i) => (i.toLong, new Timestamp(t)) }.toDF("id_a", "ts_a")
      val b = bs.zipWithIndex.map { case (t, i) => (i.toLong, new Timestamp(t)) }.toDF("id_b", "ts_b")
      val tol = 30000L
      val bucketed = RangeJoin(a, b, "ts_a", "ts_b", tol)
        .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = (for {
        (ta, ia) <- as.zipWithIndex
        (tb, ib) <- bs.zipWithIndex
        if math.abs(tb - ta) <= tol
      } yield (ia.toLong, ib.toLong)).toSet
      assert(bucketed === brute)
    }
  }

  test("property: as-of join (both forms) equals the naive per-row maximum") {
    val gen = for {
      nl <- Gen.chooseNum(1, 20)
      nr <- Gen.chooseNum(0, 20)
      ls <- Gen.listOfN(nl, for { k <- Gen.chooseNum(1L, 3L); t <- Gen.chooseNum(0L, 100000L) } yield (k, t))
      rs <- Gen.listOfN(nr, for { k <- Gen.chooseNum(1L, 3L); t <- Gen.chooseNum(0L, 100000L) } yield (k, t))
    } yield (ls, rs)
    forAll(gen) { case (ls, rs) =>
      // unique right timestamps per key so the naive oracle is unambiguous
      val rsd = rs.distinct
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, new Timestamp(t)) }
        .toDF("event_id", "user_id", "ts")
      val right = rsd.zipWithIndex.map { case ((k, t), i) => (i + 1000L, k, new Timestamp(t), t.toDouble) }
        .toDF("event_id", "user_id", "ts", "value")
      val naive: Map[Long, Option[Double]] = ls.zipWithIndex.map { case ((k, t), i) =>
        i.toLong -> rsd.filter(r => r._1 == k && r._2 <= t).sortBy(_._2).lastOption.map(_._2.toDouble)
      }.toMap
      val composed = AsOfJoin(left, right, "user_id", "ts", "ts", Seq("value"), "event_id")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(r.fieldIndex("value_asof"))) None
           else Some(r.getDouble(r.fieldIndex("value_asof"))))).toMap
      val native = AsOfJoin.native(left, right.drop("event_id"), "user_id", "ts", "ts", Seq("value"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(r.fieldIndex("value_asof"))) None
           else Some(r.getDouble(r.fieldIndex("value_asof"))))).toMap
      assert(composed === naive)
      assert(native === naive)
    }
  }

  test("property: cluster labels equal a driver-side union-find on random graphs") {
    val gen = for {
      nNodes <- Gen.chooseNum(2, 30)
      nEdges <- Gen.chooseNum(0, 25)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.chooseNum(0L, nNodes - 2L)
        b <- Gen.chooseNum(a + 1, nNodes - 1L)
      } yield (a, b))
    } yield (nNodes, edges.distinct)
    forAll(gen) { case (nNodes, edges) =>
      val parent = Array.tabulate(nNodes.toInt)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until nNodes.toInt).map(i => i.toLong -> find(i).toLong).toMap
      val docs = (0L until nNodes).map((_, "t")).toDF("doc_id", "text")
      val pairs = edges.toDF("doc_a", "doc_b")
      val got = graft.operators.Dedup.clusters(docs, pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected)
    }
  }

  test("property: trimSpaces + split matches SQL split(trim(s), ' +') on whitespace-laced text") {
    // Text containing spaces, tabs, newlines, CRs — the class of inputs
    // where Java String.trim diverges from SQL TRIM.
    val wsText: Gen[String] = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.stringOfN(n, Gen.frequency(
        5 -> Gen.alphaNumChar, 2 -> Gen.const(' '),
        1 -> Gen.const('\t'), 1 -> Gen.const('\n'), 1 -> Gen.const('\r'))))
    forAll(Gen.listOfN(12, wsText)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "s")
      val sql = df.select($"id", split(trim($"s"), " +").as("t"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val jvm = graft.functions.GraftExprs.trimSpaces(t).split(" +", -1).toList
        assert(jvm === sql(i.toLong), s"text ${t.map(_.toInt).mkString(",")}")
      }
    }
  }

  test("property: sampleKey spreads sequential id blocks; raw polyHash provably doesn't") {
    import graft.functions.TextHash
    // Any contiguous id block, any prefix: mixed-key keep counts at a 10%
    // threshold must land within a loose binomial band — the raw hash
    // fails this exact test (r3: kept 0/400; its residues are a base-31
    // lattice). Deterministic: the "random" inputs are the hash itself.
    forAll(Gen.zip(Gen.chooseNum(0L, 1000000L), Gen.oneOf("dom:", "samp:", "x:")), cases = 3) {
      case (base, prefix) =>
        val n = 400
        val df = spark.range(base, base + n).select(col("id").cast("string").as("s"))
        val kept = df.filter(
          TextHash.sampleKey(concat(lit(prefix), col("s"))) < lit(100000000L)).count()
        assert(kept > n / 25 && kept < n / 4, s"base=$base prefix=$prefix kept=$kept/400")
    }
  }

  test("property: sign random projection preserves cosine ordering on random vectors") {
    import graft.operators.Similarity
    // Sign-JL: for vectors with a strongly-aligned pair and an antipodal
    // pair, projected cosine must rank the aligned pair above the
    // antipodal one (ordering, not magnitude — the honest JL claim at
    // kOut=16). Base vector, a small perturbation, and its negation.
    forAll(Gen.listOfN(16, Gen.chooseNum(-100, 100).map(_ / 100.0f)), cases = 3) { base0 =>
      val base = base0.toArray
      if (base.map(v => v * v).sum > 0.1f) {
        val near = base.zipWithIndex.map { case (v, i) => v + (if (i % 3 == 0) 0.05f else -0.05f) }
        val anti = base.map(-_)
        val df = Seq((0L, base), (1L, near), (2L, anti)).toDF("vec_id", "embedding")
        val proj = Similarity.randomProjection(df, kOut = 16).collect()
          .groupBy(_.getLong(0)).view
          .mapValues(_.sortBy(_.getLong(1)).map(_.getLong(2).toDouble).toArray).toMap
        def cos(a: Array[Double], b: Array[Double]): Double = {
          val d = a.zip(b).map { case (x, y) => x * y }.sum
          d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
        }
        assert(cos(proj(0L), proj(1L)) > cos(proj(0L), proj(2L)))
        assert(cos(proj(0L), proj(2L)) < 0) // antipodal stays antipodal
      }
    }
  }

  test("property: hot-bucket salt split is invisible for random vectors") {
    val vecGen: Gen[List[Array[Float]]] = Gen.chooseNum(20, 40).flatMap(n =>
      Gen.listOfN(n, Gen.listOfN(4, Gen.chooseNum(-100, 100)).map(_.map(_.toFloat / 10f).toArray)))
    forAll(vecGen, cases = 3) { vecs =>
      val nonZero = vecs.filter(_.exists(_ != 0f))
      val df = nonZero.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
      def pairSet(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val base = pairSet(graft.operators.Similarity.lshNeighbors(df, nBits = 4, threshold = 0.2))
      val salted = pairSet(graft.operators.Similarity.lshNeighbors(df, nBits = 4, threshold = 0.2, hotBucketCap = 3))
      assert(salted === base)
    }
  }

  test("property: TopKAgg equals the window formulation, ties and all") {
    import org.apache.spark.sql.expressions.Window
    val gen: Gen[List[(Long, Long, Double)]] = Gen.chooseNum(10, 60).flatMap(n =>
      Gen.listOfN(n, for {
        key <- Gen.chooseNum(0, 3)
        id <- Gen.chooseNum(0, 10000)
        s <- Gen.chooseNum(0, 5) // few distinct scores → tie-breaks exercised
      } yield (key.toLong, id.toLong, s.toDouble / 2.0)))
    forAll(gen, cases = 4) { rows =>
      val df = rows.distinct.toDF("key", "id", "score")
      val viaAgg = df.groupBy(col("key"))
        .agg(graft.functions.TopKAgg.topK(col("score"), col("id"), 3).as("top"))
        .select(col("key"), posexplode(col("top")))
        .select(col("key"), col("col.id").as("id"), col("col.score").as("score"),
          (col("pos") + 1).cast("long").as("rank"))
      val w = Window.partitionBy(col("key")).orderBy(col("score").desc, col("id"))
      val viaWindow = df
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("key"), col("id"), col("score"), col("rank"))
      assert(viaAgg.except(viaWindow).isEmpty && viaWindow.except(viaAgg).isEmpty)
    }
  }

  test("property: pagerank mass bounds and no-in-edge base rank on random graphs") {
    val gen: Gen[(Int, List[(Long, Long)])] = for {
      n <- Gen.chooseNum(5, 15)
      m <- Gen.chooseNum(5, 30)
      es <- Gen.listOfN(m, for {
        s <- Gen.chooseNum(0, n - 1); d <- Gen.chooseNum(0, n - 1)
      } yield (s.toLong, d.toLong))
    } yield (n, es)
    forAll(gen, cases = 3) { case (n, es) =>
      val nodes = (0L until n.toLong).toDF("node_id")
      val edges = es.toDF("src", "dst")
      val ranks = graft.operators.Graph.pagerank(nodes, edges, iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val scale = graft.operators.Graph.RankScale
      assert(ranks.size === n)
      // Truncating integer division only loses mass; base is the floor.
      assert(ranks.values.sum <= n * scale)
      assert(ranks.values.forall(_ >= 15L * scale / 100L))
      // A node nothing links to sits exactly at the base rank.
      val dsts = es.map(_._2).toSet
      (0L until n.toLong).filterNot(dsts).foreach(v => assert(ranks(v) === 15L * scale / 100L))
    }
  }

  test("property: bpePairs total count equals the sum of per-token pair counts") {
    val tokGen: Gen[List[String]] = Gen.chooseNum(3, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 6).flatMap(l => Gen.stringOfN(l, Gen.alphaLowerChar))))
    forAll(tokGen, cases = 3) { toks =>
      val docs = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val out = graft.operators.TextAnalysis.bpePairs(docs, k = 10000).collect()
      val expected = toks.filter(_.length >= 2).map(_.length - 1).sum
      assert(out.map(_.getLong(1)).sum === expected)
      // Reference count for one specific pair.
      val ref = toks.flatMap(t => t.sliding(2).filter(_.length == 2)).groupBy(identity)
      out.foreach(r => assert(ref(r.getString(0)).size.toLong === r.getLong(1)))
    }
  }

  test("property: lmScore sums and bounds — p_scaled never exceeds 2^20") {
    val tokGen: Gen[List[List[String]]] = Gen.chooseNum(2, 5).flatMap(d =>
      Gen.listOfN(d, Gen.chooseNum(2, 8).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")))))
    forAll(tokGen, cases = 3) { docToks =>
      val docs = docToks.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val out = graft.operators.TextAnalysis.lmScore(docs).collect()
      val totalBigrams = docToks.map(ts => math.max(ts.size - 1, 0)).sum
      assert(out.map(_.getLong(1)).sum === totalBigrams)
      // Per-doc mean conditional probability can't exceed 1.0 in fixed point.
      out.foreach { r =>
        assert(r.getLong(2) <= r.getLong(1) * (1L << 20))
        assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
      }
    }
  }

  test("property: Misra-Gries candidates always cover every true heavy hitter (pure buffer, no Spark)") {
    import graft.functions.MisraGriesAgg
    val tokenGen: Gen[String] = Gen.frequency(
      (4, Gen.oneOf("h1", "h2", "h3")),                       // skewed head
      (6, Gen.chooseNum(0, 200).map(i => s"t$i")))            // long light tail
    forAll(Gen.listOfN(400, tokenGen), cases = 8) { stream =>
      val cap = 5
      val freq = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val heavy = freq.filter { case (_, c) => c * (cap + 1) > stream.size }.keySet
      // streamed in generated order
      val b = new MisraGriesAgg.Buf(cap)
      stream.foreach(t => b.add(t, 1L))
      assert(heavy.subsetOf(b.counts.keySet), s"stream order lost $heavy vs ${b.counts}")
      assert(b.counts.size <= cap)
      // and under arbitrary partition/merge topology (3-way, uneven)
      val parts = Seq(stream.take(50), stream.slice(50, 280), stream.drop(280))
      val merged = parts.map { p =>
        val pb = new MisraGriesAgg.Buf(cap); p.foreach(t => pb.add(t, 1L)); pb
      }.reduce { (x, y) =>
        y.counts.foreach { case (t, c) => x.addNoDecrement(t, c) }
        x.shrinkToCapacity(); x
      }
      assert(heavy.subsetOf(merged.counts.keySet), s"merge lost $heavy vs ${merged.counts}")
      assert(merged.counts.size <= cap)
    }
  }

  test("property: containmentPairs ≡ brute force on random small-vocab corpora") {
    // Small vocabulary forces heavy shingle sharing — the dense-candidate
    // regime where a broken prefix/positional/size bound would actually
    // show up as lost recall.
    val word: Gen[String] = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val doc: Gen[String] = Gen.chooseNum(3, 12)
      .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    forAll(Gen.listOfN(12, doc), cases = 3) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val pruned = graft.operators.Dedup.containmentPairs(docs)
      val sh = graft.operators.Dedup.shingleHashes(docs)
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n_a"))
      val brute = sh.select(col("doc_id").as("doc_a"), col("h"))
        .join(sh.select(col("doc_id").as("doc_b"), col("h")), Seq("h"))
        .filter(col("doc_a") =!= col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
        .join(cnt.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
        .filter(col("n_inter") * 5 >= col("n_a") * 4)
        .withColumn("containment",
          round(col("n_inter").cast("double") / col("n_a").cast("double"), 7))
        .select("doc_a", "doc_b", "n_inter", "n_a", "containment")
      assert(pruned.except(brute).isEmpty && brute.except(pruned).isEmpty)
    }
  }

  test("property: groupedQuantileCont equals the local weighted reference on random data") {
    // Reference: sort ascending, pos = q*(n-1), v_lo*(1-f) + v_hi*f — the
    // DuckDB form the operator promises bit-for-bit.
    def ref(vs: Seq[Double], q: Double): Double = {
      val sorted = vs.sorted.toIndexedSeq
      val pos = q * (sorted.size - 1).toDouble
      val frn = math.floor(pos)
      val f = pos - frn
      if (f == 0.0) sorted(frn.toInt)
      else sorted(frn.toInt) * (1 - f) + sorted(frn.toInt + 1) * f
    }
    val gen = for {
      nGroups <- Gen.chooseNum(1, 4)
      rows <- Gen.listOfN(120, for {
        g <- Gen.chooseNum(0, nGroups - 1)
        v <- Gen.chooseNum(-1e6, 1e6)
      } yield (s"g$g", v))
      qs <- Gen.listOfN(3, Gen.chooseNum(0.0, 1.0))
    } yield (rows, qs.distinct)
    forAll(gen, cases = 4) { case (rows, qs) =>
      val df = rows.toDF("g", "v").repartition(7)
      val out = graft.operators.Quantiles
        .groupedQuantileCont(df, "g", "v", qs.zipWithIndex.map { case (q, i) => q -> s"o$i" },
          numPartitions = 5)
        .collect().map(r => r.getString(0) -> r).toMap
      val byG = rows.groupBy(_._1)
      assert(out.keySet === byG.keySet)
      byG.foreach { case (g, grp) =>
        qs.zipWithIndex.foreach { case (q, i) =>
          val want = ref(grp.map(_._2), q)
          val got = out(g).getDouble(i + 1)
          assert(java.lang.Double.doubleToLongBits(got) ===
            java.lang.Double.doubleToLongBits(want),
            s"group $g q=$q: got $got want $want")
        }
      }
    }
  }

  test("rrf fusion equals the closed-form score on random rank lists") {
    // Two random injective rank lists over a doc universe; fused scores
    // must equal the per-doc formula and rank improvements must never
    // hurt: compare against a direct recomputation.
    val gen = for {
      nDocs <- Gen.chooseNum(3, 12)
      ka <- Gen.chooseNum(1, nDocs)
      kb <- Gen.chooseNum(1, nDocs)
      permA <- Gen.const(new scala.util.Random(7).shuffle((1L to nDocs.toLong).toList))
      permB <- Gen.const(new scala.util.Random(11).shuffle((1L to nDocs.toLong).toList))
    } yield (permA.take(ka).zipWithIndex.map { case (d, i) => (d, i + 1L) },
      permB.take(kb).zipWithIndex.map { case (d, i) => (d, i + 1L) })
    forAll(gen, cases = 4) { case (la, lb) =>
      val out = graft.operators.Retrieval.rrfFuse(
        Seq("a" -> la.toDF("doc_id", "rank"), "b" -> lb.toDF("doc_id", "rank")),
        topK = 100)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      val ma = la.toMap; val mb = lb.toMap
      val expect = (ma.keySet ++ mb.keySet).map { d =>
        d -> (ma.get(d).map(r => 1000000L / (60L + r)).getOrElse(0L) +
          mb.get(d).map(r => 1000000L / (60L + r)).getOrElse(0L))
      }.toMap
      assert(out === expect)
    }
  }
}
