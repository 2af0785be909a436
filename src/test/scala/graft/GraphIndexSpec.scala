package graft

import org.apache.spark.sql.functions._

import graft.llm.{Index, Privacy}
import graft.operators.{Graph, Layout}

/** Round-8 operator kernels: fixed-point PageRank / degree profile,
  * inverted-index postings + boolean retrieval, k-anonymity profiling,
  * and the Z-order layout key. */
class GraphIndexSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: hand-computed integer masses on a 3-cycle fragment") {
    // 1→2, 2→1, 3→1; scale 1000, N=3 ⇒ base 333; one iteration:
    //   p1(1) = (15·333 + 85·(333+333)) div 100 = 616
    //   p1(2) = (15·333 + 85·333) div 100       = 333
    //   p1(3) = (15·333 + 85·0) div 100         = 49
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val out = Graph.pagerank(nodes, edges, "id", iters = 1, scale = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 616L, 2L -> 333L, 3L -> 49L))
  }

  test("pagerank: dangling node keeps mass out of circulation") {
    // 1→2 only; node 1 receives nothing, node 2 receives all of 1's mass
    val nodes = Seq(1L, 2L).toDF("id")
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val out = Graph.pagerank(nodes, edges, "id", iters = 1, scale = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // base 500: p1(1) = 15·500 div 100 = 75; p1(2) = (7500+85·500)/100 = 500
    assert(out === Map(1L -> 75L, 2L -> 500L))
  }

  test("weighted pagerank: mass splits proportional to edge weight") {
    // 1→2 (w=3), 1→3 (w=1); scale 1000, N=3 ⇒ base 333, Σw(1)=4:
    //   contributions from 1: to 2 = (333·3) div 4 = 249,
    //                         to 3 = (333·1) div 4 = 83
    //   p1(1) = 15·333 div 100 = 49
    //   p1(2) = (15·333 + 85·249) div 100 = 261
    //   p1(3) = (15·333 + 85·83) div 100 = 120
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "weight")
    val out = Graph.pagerankWeighted(nodes, edges, "id", iters = 1,
        scale = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 49L, 2L -> 261L, 3L -> 120L))
    // uniform weights ≡ unweighted pagerank, bit for bit
    val uni = Seq((1L, 2L, 5L), (2L, 1L, 5L), (3L, 1L, 5L))
      .toDF("src", "dst", "weight")
    val w = Graph.pagerankWeighted(nodes, uni, "id", iters = 3,
        scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val u = Graph.pagerank(nodes,
        uni.select("src", "dst"), "id", iters = 3, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w === u, "uniform weights must reproduce the unweighted ranks")
    // non-positive weights drop: the node becomes dangling, not a crash
    val neg = Seq((1L, 2L, 0L), (1L, 3L, -4L)).toDF("src", "dst", "weight")
    val d = Graph.pagerankWeighted(nodes, neg, "id", iters = 1,
        scale = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d === Map(1L -> 49L, 2L -> 49L, 3L -> 49L))
  }

  test("personalized pagerank concentrates mass near the seed") {
    // path 1→2→3→4, seed {1}, scale 1000: mass decays along the path and
    // node 4 (3 hops out, no teleport) gets only damped flow-through;
    // node 5 is unreachable → exactly 0
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val seeds = Seq(1L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.pagerankPersonalized(nodes, seeds, edges, "id",
        iters = 3, scale = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(5L) === 0L, "unreachable from seeds → zero")
    // hand replay (the initial pulse is still traversing the path, so
    // node 4 momentarily holds the wave front): p0=(1000,0,0,0,0);
    // p1=(150,850,0,0,0); p2=(150,127,722,0,0); p3=(150,127,107,613,0)
    assert(out === Map(1L -> 150L, 2L -> 127L, 3L -> 107L, 4L -> 613L,
      5L -> 0L))
  }

  test("pagerank is partition-order invariant and conserves ≤ scale") {
    val nodes = spark.range(0, 40).toDF("id")
    val edges = (0 until 40).flatMap(i =>
      Seq((i.toLong, ((i + 1) % 40).toLong), (i.toLong, ((i * 7 + 3) % 40).toLong)))
      .toDF("src", "dst")
    val a = Graph.pagerank(nodes, edges, "id", iters = 3)
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    val b = Graph.pagerank(nodes.repartition(7), edges.repartition(5),
        "id", iters = 3)
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    assert(a === b, "ranks must not depend on input partitioning")
    assert(a.sum <= 1000000000000L, "truncation only ever loses mass")
    assert(a.forall(_ > 0))
  }

  test("hits: hand-computed L1-normalized integer masses") {
    // 1→3, 2→3, 3→1; scale 1000, N=3 ⇒ h0 = 333 each. Iteration 1:
    //   araw(3) = 666, araw(1) = 333, atot = 999
    //   a(3) = 666000 div 999 = 666; a(1) = 333000 div 999 = 333; a(2)=0
    //   hraw(1) = a(3) = 666; hraw(2) = 666; hraw(3) = a(1) = 333;
    //   htot = 1665 ⇒ h(1) = 666000 div 1665 = 400; h(2) = 400;
    //   h(3) = 333000 div 1665 = 200
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val out = Graph.hits(nodes, edges, "id", iters = 1, scale = 1000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out === Map(1L -> (333L, 400L), 2L -> (0L, 400L),
      3L -> (666L, 200L)))
  }

  test("hits: edge-less graph yields all-zero scores, not a div by zero") {
    val nodes = Seq(1L, 2L).toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val out = Graph.hits(nodes, edges, "id", iters = 2, scale = 1000L)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.forall(_ == ((0L, 0L))))
  }

  test("hits: overflow guard fires on a hub graph before iterating") {
    // star with center degree 4: scale = 2·10⁹ gives scale²·4 = 1.6·10¹⁹
    // > 2⁶³−1 ≈ 9.2·10¹⁸ — must error, never wrap to negative masses
    val nodes = Seq(0L, 1L, 2L, 3L, 4L).toDF("id")
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
      .toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      Graph.hits(nodes, star, "id", iters = 1, scale = 2000000000L)
    }
    assert(ex.getMessage.contains("overflow contract"), ex.getMessage)
    // the same graph on the default grid is far inside the bound and runs
    assert(Graph.hits(nodes, star, "id", iters = 1).count() == 5L)
  }

  test("hits is partition-order invariant and conserves ≤ scale per side") {
    val nodes = spark.range(0, 40).toDF("id")
    val edges = (0 until 40).flatMap(i =>
      Seq((i.toLong, ((i + 1) % 40).toLong),
        (i.toLong, ((i * 7 + 3) % 40).toLong)))
      .toDF("src", "dst")
    val a = Graph.hits(nodes, edges, "id", iters = 3)
      .orderBy("id").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val b = Graph.hits(nodes.repartition(7), edges.repartition(5),
        "id", iters = 3)
      .orderBy("id").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(a === b, "scores must not depend on input partitioning")
    assert(a.map(_._1).sum <= 100000000L && a.map(_._2).sum <= 100000000L,
      "L1 renormalization only ever loses mass to truncation")
  }

  test("triangles: hand-computed counts and integer lcc ppm") {
    // triangle {1,2,3} plus pendant 3—4; node 5 isolated.
    // deg: 1:2 2:2 3:3 4:1 5:0; tri: 1,2,3 → 1 each;
    // lcc: 1,2 → 2·1·10⁶ div 2 = 10⁶ (closed pair), 3 → 2·10⁶ div 6
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val ue = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("id_a", "id_b")
    val out = Graph.triangles(nodes, ue, "id")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out === Map(
      1L -> (2L, 1L, 1000000L), 2L -> (2L, 1L, 1000000L),
      3L -> (3L, 1L, 333333L), 4L -> (1L, 0L, 0L), 5L -> (0L, 0L, 0L)))
  }

  test("triangles: K4 counts every face at every corner; orientation " +
    "dedup never double-counts") {
    // complete graph on 4 nodes: 4 triangles, each node on 3 of them;
    // deg 3 everywhere ⇒ lcc = 2·3·10⁶ div (3·2) = 10⁶ exactly
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val ue = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("id_a", "id_b")
    val out = Graph.triangles(nodes, ue, "id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.forall(_ == ((3L, 3L, 1000000L))))
  }

  test("kCore: bounded peeling converges to the exact 2-core; one " +
    "round reports the honest intermediate state") {
    // triangle {1,2,3} + chain 3—4—5 + isolated 6: the 2-core is the
    // triangle; 4 survives round 1 (deg 2) but peels once 5 is gone
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val ue = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    def run(rounds: Int) = Graph.kCore(nodes, ue, "id", k = 2, rounds)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2))))
      .toMap
    val fix = run(rounds = 2) // fixpoint on this graph
    assert(fix === Map(
      1L -> ((true, 2L)), 2L -> ((true, 2L)), 3L -> ((true, 2L)),
      4L -> ((false, 0L)), 5L -> ((false, 0L)), 6L -> ((false, 0L))))
    assert(run(rounds = 5) === fix, "extra rounds past fixpoint are no-ops")
    // after ONE round 5 is peeled but 4 still holds its edge to 3, so
    // the membership test sees 3 at residual degree 3 — the documented
    // "after R rounds" semantics, not yet the exact core
    val one = run(rounds = 1)
    assert(one(3L) === ((true, 3L)) && one(4L) === ((false, 0L)))
  }

  test("kCore certificate: an under-peeled path graph reports " +
    "converged=false; a stable core (and the kNN fixture) report true") {
    // path 1—2—…—8 at k=2 peels its two endpoints per round — the
    // degeneracy worst case the bounded-round scaladoc warns about.
    // rounds=1: survivors after 1 peel = {3,4,5,6}, after 2 = {4,5} —
    // the certificate must say the budget under-peeled
    val path = (1L to 7L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val c1 = Graph.kCoreCertificate(path, k = 2, rounds = 1).collect().head
    assert(!c1.getBoolean(3), s"path at rounds=1 must not certify: $c1")
    assert(c1.getLong(0) === 4L && c1.getLong(1) === 2L)
    // residual path 2—…—7 still holds its two sub-k endpoints
    assert(c1.getLong(2) === 2L, s"pending: $c1")
    // rounds=4: the path has fully dissolved — nothing below k remains,
    // a genuine fixpoint (the exact 2-core is empty, the budget sufficed)
    val c4 = Graph.kCoreCertificate(path, k = 2, rounds = 4).collect().head
    assert(c4.getBoolean(3) && c4.getLong(0) === 0L && c4.getLong(2) === 0L)
    // two disjoint triangles: every vertex keeps degree 2 forever —
    // certified at the very first round, survivor count = 6
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L)).toDF("id_a", "id_b")
    val ct = Graph.kCoreCertificate(tri, k = 2, rounds = 1).collect().head
    assert(ct.getBoolean(3) && ct.getLong(0) === 6L && ct.getLong(1) === 6L)
    // the graph_kcore query fixture: mutual kNN graph over the sf0.001
    // embeddings at the query's exact parameters. At rounds=3 (the
    // query's budget) the certificate HONESTLY reports not-yet-converged
    // (285 → 279 survivors when this was written) — exactly the silent
    // under-peel it exists to expose; a few more rounds certify.
    val e = graft.core.Tables.embeddings(spark, sf001)
    val mutual = graft.llm.Similarity.mutualKnnEdges(
      graft.llm.Similarity.knnGraph(e, "vec_id", "embedding",
        k = 3, b = 4, dim = 64, bands = 2)).localCheckpoint()
    val c3 = Graph.kCoreCertificate(mutual, k = 2, rounds = 3)
      .collect().head
    assert(c3.getLong(0) >= c3.getLong(1),
      s"peeling is monotone — survivors may never grow: $c3")
    assert(!c3.getBoolean(3), s"rounds=3 must not certify: $c3")
    val certAt = (3 to 12).find { r =>
      Graph.kCoreCertificate(mutual, k = 2, rounds = r)
        .collect().head.getBoolean(3)
    }
    assert(certAt.isDefined,
      "kNN fixture must reach the 2-core fixpoint within 12 rounds")
    info(s"kNN fixture: rounds=3 gives $c3; certified at rounds=${certAt.get}")
  }

  test("link prediction: wedge scores on a path and a 4-cycle; " +
    "adjacent pairs and triangles never predict") {
    // path 1—2—3: only (1,3) is open, via center 2 (deg 2):
    //   cn = 1, aa_nano = round(10⁹/ln 2) = 1442695041, jac = 10⁶ div 1
    val path = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val p = Graph.linkPredict(path).collect()
    assert(p.length == 1)
    assert(p(0).getLong(0) == 1L && p(0).getLong(1) == 3L)
    assert(p(0).getLong(2) == 1L)
    assert(p(0).getLong(3) == 1442695041L)
    assert(p(0).getLong(4) == 1000000L)
    // 4-cycle 1—2—3—4—1: opens (1,3) and (2,4), each with two deg-2
    // centers: cn = 2, aa_nano = 2·round(10⁹/ln 2), jac = 2·10⁶ div 2
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
      .toDF("id_a", "id_b")
    val c = Graph.linkPredict(cyc).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted
    assert(c.toSeq == Seq(
      (1L, 3L, 2L, 2885390082L, 1000000L),
      (2L, 4L, 2L, 2885390082L, 1000000L)))
    // a triangle is fully adjacent — nothing to predict
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    assert(Graph.linkPredict(tri).count() == 0L)
  }

  test("label propagation: clamped seeds, majority vote, min-label ties") {
    // path 1–2–3–4 (symmetric); seeds: 1→10, 4→20.
    // round 1: 2 gets 10 (from 1), 3 gets 20 (from 4)
    // round 2: 2's neighbors carry {10, 20} — tie → SMALLEST label 10;
    //          3's neighbors carry {10, 20} — tie → 10? no: 3 sees 2(=10)
    //          and 4(=20) → tie → 10. Seeds never move.
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val seeds = Seq((1L, 10L), (4L, 20L)).toDF("id", "label")
    val dir = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val sym = dir.union(dir.select(col("dst").as("src"),
      col("src").as("dst")))
    val out = Graph.labelPropagate(nodes, seeds, sym, "id", "label",
        iters = 2)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L) === Some(10L) && out(4L) === Some(20L), "seeds clamp")
    assert(out(2L) === Some(10L), "tie breaks to the smallest label")
    assert(out(3L) === Some(10L))
    assert(out(5L) === None, "unreached node stays unlabeled")
  }

  test("label propagation keeps the previous label with no labeled votes") {
    // 1(seed)→2 then 2's only neighbor is 1; after round 1, node 3 has
    // no labeled in-neighbors ever (edge from 2 only arrives via 2's
    // label in round 2)
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val seeds = Seq((1L, 7L)).toDF("id", "label")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r1 = Graph.labelPropagate(nodes, seeds, edges, "id", "label",
        iters = 1)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(r1 === Map(1L -> Some(7L), 2L -> Some(7L), 3L -> None))
    val r2 = Graph.labelPropagate(nodes, seeds, edges, "id", "label",
        iters = 2)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(r2(3L) === Some(7L), "label reaches distance 2 in round 2")
  }

  test("degree profile merges both directions with zero-fill") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val out = Graph.degreeProfile(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out === Map(1L -> ((2L, 0L, 2L)), 2L -> ((1L, 1L, 2L)),
      3L -> ((0L, 2L, 2L))))
  }

  test("postings: sorted lists, exact df, stop terms capped to NULL") {
    val docs = Seq(
      (3L, "b a"), (1L, "a a c"), (2L, "a b")
    ).toDF("doc_id", "text")
    val out = Index.postings(docs, "text", "doc_id", maxDf = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.getString(2))))).toMap
    // 'a' in all 3 docs → over the cap: df kept, postings NULL
    assert(out("a") === ((3L, None)))
    assert(out("b") === ((2L, Some("2,3"))), "sorted by doc id")
    assert(out("c") === ((1L, Some("1"))))
  }

  test("boolean retrieval: AND needs every term, weak-AND counts") {
    val docs = Seq(
      (1L, "x y z"), (2L, "x y"), (3L, "x"), (4L, "q")
    ).toDF("doc_id", "text")
    val all = Index.searchAll(docs, "text", "doc_id", Seq("x", "y", "z"))
      .collect().map(_.getLong(0)).toSet
    assert(all === Set(1L))
    val any = Index.searchAny(docs, "text", "doc_id", Seq("x", "y", "z"),
        minMatch = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(any === Map(1L -> 3L, 2L -> 2L))
  }

  test("phrase search needs adjacency, counts every occurrence") {
    val docs = Seq(
      (1L, "x y z x y"), // two "x y" occurrences
      (2L, "x z y"),     // both terms, not adjacent
      (3L, "y x")        // wrong order
    ).toDF("doc_id", "text")
    val out = Index.searchPhrase(docs, "text", "doc_id", Seq("x", "y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L))
    // 3-term phrase chains the positional joins
    val tri = Index.searchPhrase(docs, "text", "doc_id", Seq("x", "y", "z"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri === Map(1L -> 1L))
  }

  test("searchAll counts duplicate query terms once") {
    val docs = Seq((1L, "x y")).toDF("doc_id", "text")
    val hit = Index.searchAll(docs, "text", "doc_id", Seq("x", "x", "y"))
      .collect().map(_.getLong(0)).toSet
    assert(hit === Set(1L), "terms.distinct gates the full-match count")
  }

  test("k-anonymity: class sizes, risk flags, exact ppm") {
    val df = Seq(
      ("en", "a"), ("en", "a"), ("en", "a"), // class of 3
      ("en", "b"), ("de", "a")               // two singletons
    ).toDF("lang", "src")
    val quasi = Seq(col("lang"), col("src"))
    val classes = Privacy.kAnonymityClasses(df, quasi, k = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(classes(("en", "a")) === ((3L, false)))
    assert(classes(("en", "b")) === ((1L, true)))
    assert(classes(("de", "a")) === ((1L, true)))
    val risk = Privacy.kAnonymityRisk(df, quasi, k = 2).collect().head
    assert(risk.getLong(0) === 5L && risk.getLong(1) === 3L)
    assert(risk.getLong(2) === 1L, "achieved k = min class size")
    assert(risk.getLong(3) === 2L)
    assert(risk.getLong(4) === 400000L, "2/5 exactly, in ppm")
  }

  test("l-diversity: a large homogeneous class is flagged, a small " +
    "diverse one is not") {
    // class (src a): 3 rows, all 'en' → l_div 1, at risk at l = 2;
    // class (src b): 2 rows, 2 langs → l_div 2, fine
    val df = Seq(
      ("en", "a"), ("en", "a"), ("en", "a"),
      ("en", "b"), ("de", "b")).toDF("lang", "src")
    val out = Privacy.lDiversityClasses(df, Seq(col("src")),
        col("lang"), l = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("a") === ((3L, 1L, true)),
      "k-anonymous but sensitive-homogeneous must flag")
    assert(out("b") === ((2L, 2L, false)))
  }

  test("hll overlap estimates track exact overlap within sketch error") {
    // two sources with known gram sets: A = docs of words w0..w599,
    // B = w300..w899 → |A|,|B| ≈ 598 3-shingles, overlap ≈ 298.
    // Raw-HLL rsd at m=256 is ~6.5%; assert a loose 4σ envelope (the
    // oracle pins exactness — this pins that the ESTIMATOR estimates).
    def doc(lo: Int, hi: Int) = (lo until hi).map(i => s"w$i").mkString(" ")
    val df = Seq(("a", doc(0, 600)), ("b", doc(300, 900)))
      .toDF("source", "text")
    val r = graft.llm.Sketches.hllSourceOverlap(df, "text", "source")
      .collect().head
    val (estA, estB, estU, ov) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(math.abs(estA - 598) < 160, s"est_a=$estA")
    assert(math.abs(estB - 598) < 160, s"est_b=$estB")
    assert(math.abs(estU - 898) < 240, s"est_union=$estU")
    assert(ov > 100 && ov < 500, s"overlap_est=$ov vs exact 298")
  }

  test("hll cardinality: estimates within sketch error and registers " +
    "merge by max (shard-union = whole)") {
    import graft.llm.Sketches
    val vals = (0 until 1200).map(i => ("k", s"v$i")).toDF("k", "v")
      .select(col("k"), md5(col("v")).as("h"))
    val whole = Sketches.cardinality(
      Sketches.registers(vals, Seq("k")), Seq("k")).collect().head
    assert(math.abs(whole.getDouble(2) - 1200) < 320,
      s"est=${whole.getDouble(2)} vs exact 1200 (4σ at m=256)")
    // mergeability: max-merging two shards' registers reproduces the
    // whole-corpus registers (and so the estimate) EXACTLY
    val shardA = Sketches.registers(
      vals.filter(substring(col("h"), 32, 1) < "8"), Seq("k"))
    val shardB = Sketches.registers(
      vals.filter(substring(col("h"), 32, 1) >= "8"), Seq("k"))
    val merged = shardA.unionByName(shardB)
      .groupBy(col("k"), col("idx")).agg(max(col("m")).as("m"))
    val est = Sketches.cardinality(merged, Seq("k")).collect().head
    assert(est.getLong(1) == whole.getLong(1) &&
      est.getDouble(2) == whole.getDouble(2),
      "shard-union registers must reproduce the whole-corpus estimate")
  }

  test("transition matrix: exact counts and ppm shares") {
    // user 1: A→B→A; user 2: A→B. Transitions: A→B ×2, B→A ×1.
    val df = Seq((1L, 1L, 1L, "A"), (1L, 2L, 2L, "B"), (1L, 3L, 3L, "A"),
      (2L, 1L, 4L, "A"), (2L, 2L, 5L, "B"))
      .toDF("u", "ts", "id", "et")
    val out = graft.operators.Sessionize.transitionMatrix(df, "u", "ts",
        "id", "et")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(("A", "B") -> ((2L, 1000000L)),
      ("B", "A") -> ((1L, 1000000L))))
  }

  test("group trend recovers an exact linear relation") {
    val df = (1 to 50).map(x => ("g", x.toLong, 3L * x + 7L))
      .toDF("source", "x", "y")
    val r = graft.llm.Corpus.groupTrend(df, "source", "x", "y")
      .collect().head
    assert(r.getLong(1) === 50L)
    assert(r.getDouble(2) === 3.0 && r.getDouble(3) === 7.0)
    // a single point cannot fit a line
    val one = Seq(("g", 1L, 5L)).toDF("source", "x", "y")
    val r1 = graft.llm.Corpus.groupTrend(one, "source", "x", "y")
      .collect().head
    assert(r1.isNullAt(2) && r1.isNullAt(3))
  }

  test("autocorrelation: alternating series is -1 at lag 1, +1 at lag 2") {
    val df = (1 to 40).map(i =>
      ("s", i.toLong, i.toLong, if (i % 2 == 0) 1.0 else -1.0))
      .toDF("series", "ts", "id", "value")
    val out = graft.operators.TimeSeries.autocorrelation(df, Seq("series"),
        "ts", "id", "value", maxLag = 2)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(out(1) === -1.0 && out(2) === 1.0)
    // constant series: zero variance → null
    val const = (1 to 10).map(i => ("c", i.toLong, i.toLong, 5.0))
      .toDF("series", "ts", "id", "value")
    val c = graft.operators.TimeSeries.autocorrelation(const, Seq("series"),
        "ts", "id", "value", maxLag = 1).collect().head
    assert(c.isNullAt(3))
  }

  test("degenerate inputs: round-8 ops return empty/partial, never crash") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val emptyVecs = Seq.empty[(Long, Array[Float])]
      .toDF("vec_id", "embedding")
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    // bpe: single-char words have no pairs → training ends after zero
    // merges instead of throwing on the empty argmax
    assert(graft.llm.Bpe.train(Seq("a b c").toDF("text"), "text",
      merges = 3).count() === 0)
    // bpe: corpus fuses completely before the merge budget runs out
    val early = graft.llm.Bpe.train(Seq("ab ab").toDF("text"), "text",
      merges = 5).collect()
    assert(early.length === 1 && early.head.getString(3) === "ab")
    // graph search: empty corpus → empty result with the contract schema
    val gs = graft.llm.Similarity.graphSearchTopK(emptyVecs, "vec_id",
      "embedding", emptyVecs, noEdges, k = 3, beam = 2, hops = 2, dim = 4)
    assert(gs.count() === 0 &&
      gs.columns.toSeq === Seq("query_id", "rank", "neighbor_id", "score"))
    // pagerank / labelprop / degree on empty graphs
    assert(graft.operators.Graph.pagerank(
      Seq.empty[Long].toDF("id"), noEdges, "id").count() === 0)
    assert(graft.operators.Graph.degreeProfile(noEdges).count() === 0)
    // postings/search on an empty corpus
    assert(graft.llm.Index.postings(emptyDocs, "text", "doc_id",
      maxDf = 10).count() === 0)
    assert(graft.llm.Index.searchPhrase(emptyDocs, "text", "doc_id",
      Seq("a", "b")).count() === 0)
    // waterfill / kanon / sketches / cusum / autocorr on empty frames
    assert(graft.llm.Sampling.waterfillAllocation(
      Seq.empty[(String, Long)].toDF("source", "tok"), "source", "tok",
      budget = 10L, weights = Nil).count() === 0)
    assert(graft.llm.Privacy.kAnonymityClasses(emptyDocs,
      Seq(col("text")), k = 2).count() === 0)
    assert(graft.llm.Sketches.hllSourceOverlap(
      Seq.empty[(String, String)].toDF("source", "text"), "text",
      "source").count() === 0)
    val emptyEv = Seq.empty[(String, Long, Long, Double)]
      .toDF("series", "ts", "id", "value")
    assert(graft.operators.TimeSeries.cusumChangePoint(emptyEv,
      Seq("series"), "ts", "id", "value").count() === 0)
    assert(graft.operators.TimeSeries.autocorrelation(emptyEv,
      Seq("series"), "ts", "id", "value", maxLag = 2).count() === 0)
  }

  test("seeded graph walk enters the query's cell; unseeded is stuck " +
    "at the global entry's component") {
    // two cosine clusters with NO cross edges: A (ids 1-3, along e0)
    // holds the global lowest id, B (ids 11-13, along e1) holds the
    // query's true neighbors. The unseeded walk starts at id 1 and can
    // never reach B; the IVF-seeded walk enters at B's cell
    // representative (id 11) and finds them.
    val corpus = Seq(
      (1L, Array(1.0f, 0.1f, 0f, 0f)), (2L, Array(1.0f, 0.2f, 0f, 0f)),
      (3L, Array(1.0f, 0.0f, 0f, 0f)),
      (11L, Array(0.1f, 1.0f, 0f, 0f)), (12L, Array(0.2f, 1.0f, 0f, 0f)),
      (13L, Array(0.0f, 1.0f, 0f, 0f))).toDF("vec_id", "embedding")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (11L, 12L), (12L, 13L), (13L, 11L)).toDF("src", "dst")
    val queries = Seq((100L, Array(0.05f, 1.0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val seeded = graft.llm.Similarity.graphSearchTopKSeeded(corpus,
        "vec_id", "embedding", queries, edges, k = 3, beam = 4, hops = 3,
        dim = 4, m = 2)
      .select("neighbor_id").as[Long].collect().toSet
    val unseeded = graft.llm.Similarity.graphSearchTopK(corpus,
        "vec_id", "embedding", queries, edges, k = 3, beam = 4, hops = 3,
        dim = 4)
      .select("neighbor_id").as[Long].collect().toSet
    assert(seeded === Set(11L, 12L, 13L), s"seeded=$seeded")
    assert(unseeded === Set(1L, 2L, 3L), s"unseeded=$unseeded")
    // empty-cell fallback: a query in a cell with no corpus vector
    // walks from the global entry instead of crashing
    val offCell = Seq((200L, Array(-1.0f, -0.05f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val fb = graft.llm.Similarity.graphSearchTopKSeeded(corpus, "vec_id",
        "embedding", offCell, edges, k = 3, beam = 4, hops = 3, dim = 4,
        m = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(fb === Set(1L, 2L, 3L), s"fallback=$fb")
  }

  test("pca power iteration finds the dominant axis") {
    // cloud stretched along e0 (±8) with ±0.25 jitter on e1: the top
    // component must align with e0 almost exactly, eigenvalue ≈ Σx²
    val vecs = (1 to 64).map { i =>
      val sign = if (i % 2 == 0) 1.0f else -1.0f
      Array(8.0f * sign, 0.25f * (if (i % 4 < 2) 1 else -1), 0.0f, 0.0f)
    }
    val df = vecs.map(v => Tuple1(v)).toDF("embedding")
    val out = graft.llm.Clustering.pcaTopComponent(df, "embedding",
        dim = 4, iters = 2)
      .orderBy("pos").collect()
    assert(out.length === 4)
    val comp = out.map(_.getDouble(1))
    assert(math.abs(comp(0)) > 0.999, s"e0 weight ${comp(0)}")
    assert(math.abs(comp(1)) < 0.04 && comp(2) === 0.0 && comp(3) === 0.0)
    val eig = out.head.getDouble(2)
    assert(eig > 0.0)
    // unit length on the quantization grid
    val nrm = math.sqrt(comp.map(x => x * x).sum)
    assert(math.abs(nrm - 1.0) < 1e-4, s"norm $nrm")
  }

  test("pca deflation recovers the spectral axes in order, " +
    "near-orthogonally") {
    // three separated variance scales on e0 (±8), e1 (±2), e2 (±0.5):
    // deflation must hand back the axes in eigenvalue order, each next
    // component near-orthogonal to the previous ones (exact orthogonality
    // is not promised — convergence + 2⁻¹² grid — but the fixture's
    // spectral gaps make the loop converge hard)
    val vecs = (0 until 64).map { i =>
      Array(
        8.0f * (if (i % 2 == 0) 1 else -1),
        2.0f * (if (i % 4 < 2) 1 else -1),
        0.5f * (if (i % 8 < 4) 1 else -1),
        0.0f)
    }
    val df = vecs.map(v => Tuple1(v)).toDF("embedding")
    val out = graft.llm.Clustering.pcaComponents(df, "embedding", dim = 4,
        nComponents = 3, iters = 4)
      .orderBy("comp", "pos").collect()
    assert(out.length === 12)
    val comps = out.groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(_.getDouble(2)).toIndexedSeq)
      .toMap
    val eigs = out.groupBy(_.getLong(0)).view
      .mapValues(_.head.getDouble(3)).toMap
    assert(math.abs(comps(1L)(0)) > 0.99, s"c1=${comps(1L)}")
    assert(math.abs(comps(2L)(1)) > 0.99, s"c2=${comps(2L)}")
    assert(math.abs(comps(3L)(2)) > 0.99, s"c3=${comps(3L)}")
    assert(eigs(1L) > eigs(2L) && eigs(2L) > eigs(3L), s"eigs=$eigs")
    def dot(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double =
      a.zip(b).map(p => p._1 * p._2).sum
    assert(math.abs(dot(comps(1L), comps(2L))) < 0.01)
    assert(math.abs(dot(comps(1L), comps(3L))) < 0.01)
    assert(math.abs(dot(comps(2L), comps(3L))) < 0.01)
    // each direction unit-length on the quantization grid
    (1L to 3L).foreach { c =>
      assert(math.abs(math.sqrt(dot(comps(c), comps(c))) - 1.0) < 1e-4) }
  }

  test("whitening rescales the spectral axes toward comparable spread " +
    "and nulls a degenerate component") {
    // same spectral fixture as the deflation test: axis variances 8/2/.5
    val vecs = (0 until 64).map { i =>
      Array(
        8.0f * (if (i % 2 == 0) 1 else -1),
        2.0f * (if (i % 4 < 2) 1 else -1),
        0.5f * (if (i % 8 < 4) 1 else -1),
        0.0f)
    }
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val out = graft.llm.Clustering.whiten(df, "vec_id", "embedding",
        dim = 4, nComponents = 3, iters = 4)
      .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    // raw coordinate scales differ 16×; whitened scales must be within
    // a small factor of each other (1/√λ rescale)
    def spread(xs: Seq[Double]) = xs.map(math.abs).max
    val (s1, s2, s3) = (spread(out.map(_._1)), spread(out.map(_._2)),
      spread(out.map(_._3)))
    assert(s1 / s2 < 3.0 && s2 / s1 < 3.0, s"w1=$s1 w2=$s2")
    assert(s2 / s3 < 3.0 && s3 / s2 < 3.0, s"w2=$s2 w3=$s3")
    // identical vectors: zero residual variance → eigen 0 → the guard
    // nulls every coordinate instead of dividing by zero
    val flat = Seq((1L, Array(1.0f, 1.0f)), (2L, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val f = graft.llm.Clustering.whiten(flat, "vec_id", "embedding",
      dim = 2, nComponents = 2, iters = 2).collect()
    assert(f.forall(r => r.isNullAt(1) && r.isNullAt(2)),
      s"degenerate spectrum must null: ${f.mkString(",")}")
  }

  test("silhouette: hand-computed on two clean 2-D clusters; argmin " +
    "excluded by index; degenerate zero distances give 0") {
    // ids 1,2 seed the two centroids; after the single update round the
    // centroids are (0, 0.5) and (10, 10.5) — all coordinates dyadic, so
    // quantization and the score folds are exact.
    val pts = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(10.0f, 10.0f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(10.0f, 11.0f)))
      .toDF("vec_id", "embedding")
    val out = graft.llm.Clustering.silhouette(pts, "vec_id", "embedding",
        k = 2, iters = 2, dim = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out(1L)._1 == 0L && out(2L)._1 == 1L)
    assert(out(1L)._1 == out(3L)._1 && out(2L)._1 == out(4L)._1)
    // point (0,0): a = 0.5 (own centroid), b = √(10² + 10.5²) = √210.25
    // = 14.5 exactly → sil = 14/14.5 = 0.9655172…
    assert(out(1L)._2 == 0.965517, out(1L).toString)
    assert(out.values.forall(_._2 > 0.9), s"clean separation: $out")
    // both centroids identical (duplicate seed vectors): a = b = 0 for
    // the seed point — the 0/0 guard must emit 0.0, not NaN
    val dup = Seq((1L, Array(1.0f, 1.0f)), (2L, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val d = graft.llm.Clustering.silhouette(dup, "vec_id", "embedding",
        k = 2, iters = 1, dim = 2)
      .collect().map(_.getDouble(2))
    assert(d.forall(_ == 0.0), d.mkString(","))
  }

  test("bpe training replays the classic merge sequence") {
    // corpus: aaab ×2, ab ×1.
    // r1: (a,a)=4 wins → aaab segments <aa><a><b>
    // r2: (a,b)=3 wins (beats (aa,a)=2) → <aa><ab>, <ab>
    // r3: (aa,ab)=2
    val df = Seq("aaab aaab ab").toDF("text")
    val out = graft.llm.Bpe.train(df, "text", merges = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(out.toSeq === Seq((1, "a", "a", "aa", 4L),
      (2, "a", "b", "ab", 3L), (3, "aa", "ab", "aaab", 2L)))
    val segs = graft.llm.Bpe.segmentedVocab(df, "text", merges = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(segs === Map("<aaab>" -> 2L, "<ab>" -> 1L))
  }

  test("bpe batch guard (c): an in-batch mint collision closes the " +
    "batch — two symbol-disjoint pairs minting the same symbol never " +
    "share a round") {
    import graft.llm.Bpe
    val universe = Set("ab", "cdef", "abcd", "ef", "x", "y")
    // (ab,cdef) and (abcd,ef) are pairwise symbol-disjoint (guard (a)
    // passes) yet both mint "abcdef" — reachable because segmentation of
    // the same substring is context-dependent; batching them would
    // conflate their rewrites/pair deltas
    val collide = IndexedSeq(("ab", "cdef", 10L), ("abcd", "ef", 9L),
      ("x", "y", 1L))
    assert(Bpe.selectBatch(collide, want = 2, universe) ===
      IndexedSeq(("ab", "cdef", 10L)))
    // control: same shape, different mints → both batch (guard (d)'s
    // strict gap to the excluded count=1 candidate holds)
    val fine = IndexedSeq(("ab", "cdef", 10L), ("abcd", "eg", 9L),
      ("x", "y", 1L))
    assert(Bpe.selectBatch(fine, want = 2, universe + "eg") ===
      IndexedSeq(("ab", "cdef", 10L), ("abcd", "eg", 9L)))
    // a mint colliding with the PRE-EXISTING universe cuts there too,
    // and position 0 always survives (the plain argmax is faithful)
    val preexist = IndexedSeq(("a", "b", 10L), ("c", "d", 9L), ("x", "y", 1L))
    assert(Bpe.selectBatch(preexist, want = 2,
      Set("a", "b", "c", "d", "cd", "x", "y")) ===
      IndexedSeq(("a", "b", 10L)))
  }

  test("bpe r11 in-batch mint guard is batch-size-NEUTRAL on the gate " +
    "fixture — every round's batch equals the pre-guard selection") {
    // Round-11 added a cut to selectBatch guard (c): a batch also closes
    // when a member's mint collides with an EARLIER member's mint (not
    // just the pre-existing universe). That cut can only SHORTEN batches
    // (more sequential rounds), so it was the one mechanism that could
    // explain bpe_train_deep's 2× driver-bench move in r11. Prove the
    // mechanism never fires on the gate fixture: replay every real
    // training round's batching decision against a replica of the
    // PRE-GUARD selector and assert the chosen batches are identical —
    // batch sizes (hence round count, hence per-round job count) are
    // unchanged, so the timing move was host noise.
    import graft.llm.Bpe
    // the pre-r11 selector replica lives in graft.tools.BpePreGuard —
    // ONE copy shared with the sf0.1 BpeBatchProbe so spec and probe
    // provably test the same baseline
    def preGuardBatch(top: IndexedSeq[(String, String, Long)], want: Int,
                      symbols: String => Boolean) =
      graft.tools.BpePreGuard(top, want, symbols)
    val rounds = scala.collection.mutable.ArrayBuffer.empty[
      (IndexedSeq[(String, String, Long)], Int, Set[String],
        IndexedSeq[(String, String, Long)])]
    val docs = graft.core.Tables.documents(spark, sf01)
    val merged = Bpe.trainObserved(docs, "text", merges = 500,
      batchCap = 8,
      (top, want, syms, acc) => rounds += ((top, want, syms, acc)))
    val nMerges = merged.count()
    assert(nMerges > 0 && rounds.nonEmpty,
      s"gate-fixture training produced $nMerges merges, ${rounds.length} rounds")
    rounds.zipWithIndex.foreach { case ((top, want, syms, acc), i) =>
      assert(acc === preGuardBatch(top, want, syms),
        s"round $i: r11 guard changed the batch (top=${top.take(4)})")
    }
    info(s"rounds=${rounds.length} merges=$nMerges batch sizes=" +
      rounds.map(_._4.length).mkString(","))
  }

  test("bpe segmentation counts corpus tokens under the trained merges") {
    // merges learned from the corpus: (a,a) then (a,b) then (aa,ab);
    // doc 1 "aaab ab" → [<aaab>, <ab>] = 2 tokens from 2 words;
    // doc 2 "ba" shares no merge → [<b><a>] = 2 tokens from 1 word
    val df = Seq((1L, "aaab aaab ab"), (2L, "ba")).toDF("doc_id", "text")
    val out = graft.llm.Bpe.segmentCorpus(df, "text", "doc_id",
        merges = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out(1L) === ((3L, 3L)), "three words → three fused tokens")
    assert(out(2L) === ((2L, 1L)), "unseen pair stays character cells")
  }

  test("bpe merge is left-to-right non-overlapping, ties break on text") {
    // "aaa": pairs (a,a)=2 but the merge fires once, at the left
    val df = Seq("aaa").toDF("text")
    val out = graft.llm.Bpe.train(df, "text", merges = 1).collect().head
    assert((out.getString(1), out.getString(2), out.getLong(4)) ===
      (("a", "a", 2L)))
    val segs = graft.llm.Bpe.segmentedVocab(df, "text", merges = 1)
      .collect().map(_.getString(0))
    assert(segs.toSeq === Seq("<aa><a>"))
  }

  test("graph search walks the chain from the entry to the target") {
    // five unit vectors on an arc; edges form the chain 0–1–2–3–4 (both
    // directions). Query = node 4's vector, entry = node 0: the walk
    // must traverse the whole chain in 4 hops and rank 3 (angularly
    // closest) above 2.
    val vecs = (0 to 4).map { i =>
      (i.toLong, Array(math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat))
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val chain = (0 to 3).flatMap(i =>
      Seq((i.toLong, i + 1L), (i + 1L, i.toLong))).toDF("src", "dst")
    val out = graft.llm.Similarity.graphSearchTopK(corpus, "vec_id",
        "embedding", corpus.filter(col("vec_id") === 4), chain,
        k = 2, beam = 2, hops = 4, dim = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 3L), (2L, 2L)))
    // too few hops: the walk cannot reach past the frontier
    val short = graft.llm.Similarity.graphSearchTopK(corpus, "vec_id",
        "embedding", corpus.filter(col("vec_id") === 4), chain,
        k = 1, beam = 2, hops = 1, dim = 2)
      .collect().map(r => r.getLong(2))
    assert(short.toSeq === Seq(1L), "one hop sees only node 1")
  }

  test("waterfill spills capped surplus to the uncapped sources") {
    // A: cap 10 (2 tokens/doc ×5 docs ×maxEpochs 1), B: cap 100;
    // equal weights, budget 60 → A caps at 10, B takes the spilled 50
    // (plain proportional would give each 30)
    val docs = ((1 to 5).map(i => ("A", 10L)) ++
      (1 to 5).map(i => ("B", 100L))).toDF("source", "tok")
    val out = graft.llm.Sampling.waterfillAllocation(docs, "source",
        "tok", budget = 520L, weights = Nil, maxEpochs = 1.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(4), r.getLong(5), r.getBoolean(7)))).toMap
    // capacities: A = 50, B = 500; budget 520 > 50+? cut math:
    // sorted A(50) then B(500); i=1: (520-0)*1 <= 50*2? no;
    // i=2: (520-50)*1 <= 500*1 yes → A capped 50, B = 470
    assert(out("A") === ((50L, 50L, true)))
    assert(out("B") === ((500L, 470L, false)))
    // budget beyond total capacity: everyone caps
    val all = graft.llm.Sampling.waterfillAllocation(docs, "source",
        "tok", budget = 10000L, weights = Nil, maxEpochs = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(all === Map("A" -> 50L, "B" -> 500L))
  }

  test("zorder key interleaves bits (x even, y odd positions)") {
    // x=5 (101b) → bits at positions 0,4 = 17; y=3 (011b) → 1,3 = 10
    val out = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zorderKey2(col("x"), col("y"), 3).as("z"))
      .collect().head.getLong(0)
    assert(out === 27L)
    // masking: values beyond `bits` wrap, never widen the key
    val wide = Seq((8L + 5L, 3L)).toDF("x", "y")
      .select(Layout.zorderKey2(col("x"), col("y"), 3).as("z"))
      .collect().head.getLong(0)
    assert(wide === 27L)
  }

  test("zorder stats: buckets bound both dimensions") {
    // full 4-bit × 4-bit grid; 4 leading key bits = the 4 quadrant-of-
    // quadrant buckets, each a 4×4 box: spans must be 3, not 15
    val grid = (0 until 16).flatMap(x => (0 until 16).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val st = Layout.zorderStats(grid, col("x"), col("y"), bits = 4,
      bucketBits = 4).collect()
    assert(st.length === 16)
    st.foreach { r =>
      assert(r.getLong(2) - 0 >= 0)
      assert(r.getLong(3) - r.getLong(2) === 3L, s"x span in $r")
      assert(r.getLong(5) - r.getLong(4) === 3L, s"y span in $r")
      assert(r.getLong(1) === 16L)
    }
  }
}
