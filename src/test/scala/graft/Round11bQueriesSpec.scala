package graft

import org.apache.spark.sql.functions._

import graft.queries.{DedupQueries, EtlQueries, GraphQueries, RelationalQueries, TextQueries}

/** Late-round-11 additions: q137 EWMA anomaly detection (integer-exact
  * cross-multiplied flag), and friends. */
class Round11bQueriesSpec extends SparkSuite {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, Long, Double)]) =
    rows.toDF("user_id", "sec", "event_id", "value")
      .select($"user_id", timestamp_seconds($"sec").as("ts"),
        $"event_id", $"value")

  // ---- q137: EWMA anomaly ----

  test("q137 fixture: spike against a flat history flags exactly once") {
    val events = ev(Seq(
      (1L, 1L, 1L, 1.00), (1L, 2L, 2L, 1.00),
      (1L, 3L, 3L, 1.00), (1L, 4L, 4L, 200.00),
      (2L, 1L, 5L, 42.00) // singleton: never scored
    ))
    val out = RelationalQueries.ewmaAnomalyCore(spark, events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4)))
    // user 1: first event unscored (no history); events 2-3 match the
    // flat EWMA exactly; event 4's |20000*224 - 22400| = 4_457_600 >
    // 15000*224 = 3_360_000 cents*den
    assert(out.toSeq == Seq((1L, 4L, 3L, 1L, 4L), (2L, 1L, 0L, 0L, -1L)))
  }

  test("q137 boundary: deviation == T*den is NOT an anomaly; one cent over is") {
    // one prior event at $1.00 (den=128, ewma=100c); threshold $150
    val at = ev(Seq((1L, 1L, 1L, 1.00), (1L, 2L, 2L, 151.00)))
    val over = ev(Seq((1L, 1L, 1L, 1.00), (1L, 2L, 2L, 151.01)))
    val nAt = RelationalQueries.ewmaAnomalyCore(spark, at)
      .agg(sum($"n_anomalies")).collect()(0).getLong(0)
    val nOver = RelationalQueries.ewmaAnomalyCore(spark, over)
      .agg(sum($"n_anomalies")).collect()(0).getLong(0)
    assert(nAt == 0L, "strict inequality at the exact threshold")
    assert(nOver == 1L, "one cent past the threshold flags")
  }

  test("q137 window depth: an outlier 9 steps back is outside the spike's window") {
    // user 1: 8 flat priors then a spike; user 2: the same with a $400
    // outlier prepended. The outlier flags its OWN successor (it IS that
    // event's whole history) but sits at lag 9 from the spike, so the
    // spike's verdict — and every intermediate one — is untouched by it.
    val flat8u = (u: Long) => (1 to 8).map(i => (u, i.toLong + 1L, u * 100 + i + 1, 1.00))
    val without = flat8u(1L) :+ ((1L, 10L, 110L, 200.00))
    val with9 = ((2L, 1L, 201L, 400.00) +: flat8u(2L)) :+ ((2L, 10L, 210L, 200.00))
    val out = RelationalQueries.ewmaAnomalyCore(spark, ev(without ++ with9))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // user 1: only the spike flags; user 2: the outlier's successor (202)
    // plus the spike — one extra flag, same spike verdict
    assert(out.toSeq == Seq((1L, 9L, 8L, 1L, 110L), (2L, 10L, 9L, 2L, 202L)))
  }

  // ---- q138: Pareto-frontier selection ----

  /** A document with exactly n words of length len each. */
  private def doc(id: Long, n: Int, len: Int): (Long, String) =
    (id, Seq.fill(n)("abcdefghi".take(len)).mkString(" "))

  test("q138 fixture: ties kept, same-length and cross-bucket domination dropped") {
    val docs = Seq(
      doc(1, 10, 6), doc(2, 10, 6), // equal (a,b) pair: mutually undominated
      doc(3, 10, 4),                // same a as d1, lower b: dominated
      doc(4, 20, 3),                // frontier: longest
      doc(5, 18, 5),                // frontier: length/density tradeoff
      doc(6, 19, 2),                // dominated by d4 WITHIN bucket 1
      doc(7, 17, 5)                 // dominated by d5 within bucket 1 (b tie)
    ).toDF("doc_id", "text")
    val out = EtlQueries.paretoFrontierCore(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((4L, 20L, 3000L), (5L, 18L, 5000L),
      (1L, 10L, 6000L), (2L, 10L, 6000L)))
  }

  test("q138 property: bucketed plan == quadratic brute force on random metrics") {
    val r = new scala.util.Random(138)
    val rows = (1 to 200).map(i => doc(i.toLong, 1 + r.nextInt(40), 1 + r.nextInt(9)))
    val out = EtlQueries.paretoFrontierCore(spark, rows.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val m = rows.map { case (id, t) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      (id, ws.length.toLong, ws.map(_.length).sum * 1000L / ws.length)
    }
    val brute = m.filter { case (_, a, b) =>
      !m.exists { case (_, a2, b2) => a2 >= a && b2 >= b && (a2 > a || b2 > b) }
    }.map(t => (t._1, t._2, t._3)).toSet
    assert(out == brute)
  }

  // ---- q135: HTML extraction pipeline ----

  test("q135 fixture: title/h1/nav/footer are boilerplate; prose and entities survive") {
    val docs = Seq((1L, "srcA", "alpha beta gamma delta"))
      .toDF("doc_id", "source", "text")
    val r = TextQueries.htmlExtractCore(spark, docs).collect()(0)
    // 6 rendered lines: title, h1, the paragraph, the entity paragraph,
    // the all-link nav, the 2-word footer — only the two paragraphs stay
    assert(r.getLong(1) == 6L, "n_lines")
    assert(r.getLong(2) == 2L, "n_kept")
    // kept bytes: "alpha beta gamma delta\nTerms & conditions apply to
    // <everyone> here" — entities decoded, sentinels stripped
    assert(r.getLong(3) == 66L, "n_chars")
  }

  test("q135 link density: a half-link line stays, a mostly-link line drops") {
    // the gate is 2*link_chars <= total_chars on the sentinel-stripped line
    import graft.functions.HtmlText
    def kept(html: String): Boolean = {
      val l = HtmlText.extract(html)
      val st = l.filterNot(c => c == HtmlText.LinkOpen || c == HtmlText.LinkClose)
      val noLink = l.replaceAll(
        s"${HtmlText.LinkOpen}[^${HtmlText.LinkClose}]*${HtmlText.LinkClose}", "")
        .filterNot(c => c == HtmlText.LinkOpen || c == HtmlText.LinkClose)
      val links = st.length - noLink.length
      st.split(" ").count(_.nonEmpty) >= 4 && 2 * links <= st.length
    }
    assert(!kept("<p><a>four linked words here</a> no</p>")) // 22 link / 25 total
    assert(kept("<p><a>two words</a> and two more</p>"))     //  9 link / 22 total
  }

  test("q138 cross-bucket: a one-bucket-higher doc with equal b dominates") {
    // a=15 (bucket 0) vs a=17 (bucket 1), same density: only the longer stays
    val docs = Seq(doc(1, 15, 4), doc(2, 17, 4)).toDF("doc_id", "text")
    val out = EtlQueries.paretoFrontierCore(spark, docs)
      .select($"doc_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(2L))
  }

  // ---- q139: source-pair vocabulary drift ----

  test("q139 fixture: identical sources at distance 0; disjoint at the maximum") {
    val docs = Seq(
      ("sA", "x y z"), ("sB", "x y z"),     // identical distributions
      ("sC", "p q r q")                      // disjoint from both
    ).toDF("source", "text")
    val out = TextQueries.sourceDriftCore(spark, docs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4),
        r.getDouble(6))).toSeq
    // AB: 0. AC: disjoint → tv_num = n2·n1 + n1·n2 = 2·3·4 = 24, tv = 1.0
    assert(out == Seq(("sA", "sB", 0L, 0.0), ("sA", "sC", 24L, 1.0),
      ("sB", "sC", 24L, 1.0)))
  }

  test("q139 hand case: partial overlap matches the definition") {
    // s1: a a b (n1=3, a:2 b:1); s2: a c (n2=2, a:1 c:1)
    // tv_num = |2·2−1·3| + |1·2−0| + |0−1·3| = 1 + 2 + 3 = 6; tv = 6/12
    val docs = Seq(("s1", "a a b"), ("s2", "a c")).toDF("source", "text")
    val r = TextQueries.sourceDriftCore(spark, docs).collect()(0)
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
      r.getDouble(6)) == (3L, 2L, 6L, 1L, 0.5))
  }

  test("q139 property: sparse decomposition == dense definitional sum") {
    val rnd = new scala.util.Random(139)
    val vocabW = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    val docs = (1 to 30).map { i =>
      val src = s"s${rnd.nextInt(4)}"
      (src, (1 to (1 + rnd.nextInt(12)))
        .map(_ => vocabW(rnd.nextInt(vocabW.length))).mkString(" "))
    }.toDF("source", "text")
    val out = TextQueries.sourceDriftCore(spark, docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    // dense reference
    val rows = docs.collect().map(r => (r.getString(0), r.getString(1)))
    val counts = rows.groupBy(_._1).map { case (s, ds) =>
      s -> ds.flatMap(_._2.split(" ")).groupBy(identity).map { case (w, o) => w -> o.length.toLong }
    }
    val totals = counts.map { case (s, m) => s -> m.values.sum }
    val srcs = counts.keys.toSeq.sorted
    for (Seq(s1, s2) <- srcs.combinations(2)) {
      val (n1, n2) = (totals(s1), totals(s2))
      val dense = vocabW.map(w =>
        math.abs(counts(s1).getOrElse(w, 0L) * n2 -
          counts(s2).getOrElse(w, 0L) * n1)).sum
      assert(out((s1, s2)) == dense, s"pair ($s1,$s2)")
    }
  }
  // ---- q140: label-propagation communities ----

  /** Mirror a u<v pair list into the (u,v)+(v,u) edge frame. */
  private def mirrored(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("u", "v")

  test("q140 fixture: two bridged triangles resolve to two communities") {
    val edges = mirrored(Seq((1L,2L),(1L,3L),(2L,3L),(4L,5L),(4L,6L),(5L,6L),(3L,4L)))
    val out = GraphQueries.lpaCore(edges, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L->1L, 2L->1L, 3L->1L, 4L->4L, 5L->4L, 6L->4L))
  }

  test("q140 tie-break: equal vote counts adopt the smallest label") {
    // star 0—1, 0—2: every round-1 vote set ties; min label must win
    val edges = mirrored(Seq((0L,1L),(0L,2L)))
    val out = GraphQueries.lpaCore(edges, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L->0L, 1L->0L, 2L->0L))
  }

  test("q140 rounds matter: 1-round labels differ from the settled 3-round state") {
    val edges = mirrored(Seq((1L,2L),(1L,3L),(2L,3L),(4L,5L),(4L,6L),(5L,6L),(3L,4L)))
    val r1 = GraphQueries.lpaCore(edges, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // after one round the right triangle still carries mixed labels
    assert(r1 == Map(1L->1L, 2L->1L, 3L->1L, 4L->3L, 5L->4L, 6L->4L))
  }

  // ---- q142: containment dedup ----

  /** n distinct words wN.. as a doc text. */
  private def wordDoc(id: Long, from: Int, n: Int): (Long, String) =
    (id, (from until from + n).map(i => s"w$i").mkString(" "))

  test("q142 fixture: a verbatim quote inside a longer doc is containment, not Jaccard") {
    // doc 1: 60 words; doc 2: its first 20 words verbatim + its own tail
    val big = wordDoc(1, 0, 60)
    val quote = (2L, (0 until 20).map(i => s"w$i").mkString(" ") + " tailx taily")
    val other = wordDoc(3, 200, 40) // unrelated
    val docs = Seq(big, quote, other).toDF("doc_id", "text")
    val out = DedupQueries.containmentCore(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // shingles: big 58, quote 21 (18 quoted + 2 mixed + ... 22 tokens -> 20
    // distinct 3-gram windows), inter = the 18 pure-quote shingles
    assert(out.length == 1, s"exactly the (1,2) pair: $out")
    val (a, b, na, nb, inter) = out.head
    assert((a, b) == (1L, 2L))
    assert(nb < na, "the quote is the smaller side")
    assert(inter * DedupQueries.ContDen >= nb * DedupQueries.ContNum,
      "containment above the gate")
    assert(inter * 5 < (na + nb - inter) * 4, "Jaccard below the symmetric gate")
  }

  test("q142 exclusion: a symmetric near-duplicate pair is q26's, not q142's") {
    // two docs identical except one trailing word: Jaccard ~0.9 >= 0.8
    val d1 = wordDoc(1, 0, 40)
    val d2 = (2L, (0 until 40).map(i => s"w$i").mkString(" ") + " extra")
    val docs = Seq(d1, d2).toDF("doc_id", "text")
    assert(DedupQueries.containmentCore(spark, docs).count() == 0L)
  }

  test("q142 construction: every long-doc quote is detected on a corpus slice") {
    val docs = Tables.documents(spark, sf0001).limit(50)
    val out = DedupQueries.containmentCore(spark,
      DedupQueries.withQuotes(docs)).collect()
    // the original→own-quote pairs dominate; extra pairs are legitimate
    // (the corpus carries planted near-dups, whose quotes are contained
    // in each other's originals too)
    // short docs drop out by design: their quote IS a symmetric near-dup
    // (jaccard ≥ 0.8), which q142 excludes as q26's territory
    val ownQuote = out.count(r => r.getLong(1) == r.getLong(0) + 1000000L)
    assert(ownQuote >= 30, s"own-quote pairs: $ownQuote of ${out.length}")
    assert(ownQuote * 10 >= out.length * 9, "own-quote pairs dominate")
  }

  // ---- q141: incremental community assignment ----

  test("q141: adoption, equal-vote tie-break, and founders on a hand graph") {
    // old communities (3-round LPA over old-only edges): {1,2,3} -> 1,
    // {6,7,8} -> 6. New nodes (id % 5 == 0): 5 adopts 1 (two old
    // neighbors in community 1); 20 ties 1-vs-6 -> smaller label 1;
    // 10/15 connect only to each other -> founders
    val edges = mirrored(Seq(
      (1L,2L),(1L,3L),(2L,3L), (6L,7L),(6L,8L),(7L,8L),
      (2L,5L),(3L,5L), (1L,20L),(6L,20L), (10L,15L)))
    import graft.queries.GraphQueries
    val isNew = (x: Long) => x % GraphQueries.LpaNewMod == 0
    val oldE = edges.where(!($"u" % 5 === 0) && !($"v" % 5 === 0))
    val labels = GraphQueries.lpaCore(oldE, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L->1L, 2L->1L, 3L->1L, 6L->6L, 7L->6L, 8L->6L))
    // full incremental path via a corpus-shaped core: reuse the query
    // body by running lpaCore + assignment inline (the q141 fixture dual)
    val out = {
      val lab = GraphQueries.lpaCore(oldE, 3)
        .select($"l_partkey".as("u"), $"community")
      val newNodes = edges.select($"u".as("v")).where($"v" % 5 === 0).distinct()
      val votes = edges.where(!($"u" % 5 === 0) && $"v" % 5 === 0)
        .join(lab, Seq("u"))
        .groupBy($"v", $"community").agg(count(lit(1)).as("cnt"))
      val assigned = votes.groupBy($"v")
        .agg(max(struct($"cnt", (-$"community").as("nl"))).as("m"),
          sum($"cnt").as("n"))
        .select($"v", (-$"m.nl").as("community"), $"n")
      newNodes.join(assigned, Seq("v"), "left")
        .select($"v", coalesce($"community", $"v").as("community"),
          coalesce($"n", lit(0L)).as("n"))
        .orderBy($"v")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    }
    assert(out == Seq((5L, 1L, 2L), (10L, 10L, 0L), (15L, 15L, 0L),
      (20L, 1L, 2L)))
  }

  // ---- q143: bounded-hop weighted shortest paths ----

  /** Mirror weighted u<v pairs. */
  private def wMirrored(pairs: Seq[(Long, Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1, p._3))).toDF("u", "v", "w")

  test("q143: the cheapest route beats the fewest-hop route; rounds bound reach") {
    // seed 0. Direct 0->9 costs 10; the 3-hop detour 0->1->2->9 costs 3.
    // Node 30 hangs 5 hops out: unreached at 4 rounds.
    val wedges = wMirrored(Seq(
      (0L, 9L, 10L), (0L, 1L, 1L), (1L, 2L, 1L), (2L, 9L, 1L),
      (9L, 20L, 1L), (20L, 21L, 1L), (21L, 22L, 1L), (22L, 30L, 1L)))
    val out = GraphQueries.weightedPathsCore(wedges, 1L, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(9L) == 3L, "weighted distance takes the 3-hop detour")
    assert(out(1L) == 1L && out(2L) == 2L)
    assert(out(20L) == 4L, "via the detour: 3 + 1 (4 edges fit the horizon)")
    // 21/22: the cheap detour would need 5/6 edges — beyond the horizon,
    // so the ≤4-edge optimum rides the expensive direct 0->9 prefix
    assert(out(21L) == 12L && out(22L) == 13L)
    assert(!out.contains(30L), "5 hops out: beyond the 4-round horizon")
  }

  test("q143: a later round can IMPROVE an early greedy distance") {
    // round 1 reaches 5 directly at cost 9; round 3 finds 1+1+1
    val wedges = wMirrored(Seq(
      (0L, 5L, 9L), (0L, 3L, 1L), (3L, 4L, 1L), (4L, 5L, 1L)))
    val out = GraphQueries.weightedPathsCore(wedges, 1L, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(5L) == 3L)
  }

  // ---- q144: event-type transition matrix ----

  test("q144: hand-built sequences produce exact transition counts") {
    // user 1: a b a b ; user 2: a a b  — transitions:
    // a->b: 2 (u1) + 1 (u2) = 3; b->a: 1 (u1); a->a: 1 (u2)
    val events = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "a"), (1L, 4L, 4L, "b"),
      (2L, 1L, 5L, "a"), (2L, 2L, 6L, "a"), (2L, 3L, 7L, "b"))
      .toDF("user_id", "sec", "event_id", "event_type")
      .select($"user_id", timestamp_seconds($"sec").as("ts"),
        $"event_id", $"event_type")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val steps = events
      .withColumn("from_type", lag($"event_type", 1).over(w))
      .where($"from_type".isNotNull)
      .groupBy($"from_type", $"event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(steps == Map(("a","b") -> 3L, ("b","a") -> 1L, ("a","a") -> 1L))
  }
}
