package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, clique and separate pair resolve to min-id components") {
    // chain 1-2-3-4 (diameter 3 — needs multiple propagation rounds),
    // clique 10-11-12, pair 20-21
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("edge direction and duplicates are irrelevant; self-loops tolerated") {
    val got = cc(Seq((5L, 3L), (3L, 5L), (5L, 3L), (7L, 7L)))
    assert(got == Map(3L -> 3L, 5L -> 3L, 7L -> 7L))
  }

  test("long path converges within the diameter bound") {
    // path 0-1-2-...-12: worst case for label propagation
    val got = cc((0L until 12L).map(i => (i, i + 1)))
    assert(got.values.toSet == Set(0L))
    assert(got.size == 13)
  }

  test("adversarial depth-1000 chain converges in O(log diameter) rounds") {
    // pointer jumping halves label-chain depth per round: a diameter-1000
    // path must resolve well inside 16 rounds (plain propagation would need
    // 1000 and trip the cap — the cap IS the round-budget assertion here)
    val edges = (0L until 1000L).map(i => (i, i + 1)).toDF("src", "dst")
    // forced DISTRIBUTED path (localMaxRows = 0): the round-18 adaptive
    // local path would otherwise absorb this graph and the round-budget
    // assertion (the maxIters cap) would pin nothing
    val got = Graph.connectedComponentsImpl(edges, maxIters = 16,
        localMaxRows = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 1001)
    assert(got.values.toSet == Set(0L))
  }

  test("cc + bfs: driver-local and distributed paths return identical " +
    "frames (round 18 adaptive path)") {
    // chains, cliques, self-loops, duplicate/reversed edges, an island —
    // the same fixture family the behavioral tests above use, compared
    // path against path
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (5L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L), (11L, 10L), (20L, 21L),
      (21L, 20L), (30L, 31L))
    val df = edges.toDF("src", "dst")
    val dist = Graph.connectedComponentsImpl(df, 50, localMaxRows = 0L)
      .collect().map(_.toSeq).toSet
    val local = Graph.connectedComponentsImpl(df, 50,
        localMaxRows = Long.MaxValue)
      .collect().map(_.toSeq).toSet
    assert(dist == local, s"cc: distributed $dist != local $local")
    val raw = df.toDF("a", "b")
    val bEdges = raw.union(raw.select(col("b").as("a"), col("a").as("b")))
    val seeds = Seq(1L, 30L).toDF("node")
    val bDist = Graph.bfsHopsImpl(bEdges, seeds, 3, localMaxRows = 0L)
      .collect().map(_.toSeq).toSet
    val bLocal = Graph.bfsHopsImpl(bEdges, seeds, 3,
        localMaxRows = Long.MaxValue)
      .collect().map(_.toSeq).toSet
    assert(bDist == bLocal, s"bfs: distributed $bDist != local $bLocal")
  }

  test("property: components match a reference union-find on random graphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // small node universe forces dense/merging components; fixed seed for
    // reproducible runs, few trials (each runs distributed propagation)
    val edgeGen = Gen.listOfN(12,
      Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L)))
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // min-id normalization (path-compress to the final roots first)
      parent.keys.toSeq.foreach(find)
      parent.keys.map(k => k -> find(k)).toMap
    }
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(8)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)),
      Prop.forAll(edgeGen) { edges =>
        edges.isEmpty || cc(edges) == unionFind(edges)
      })
    assert(res.passed, res.status.toString)
  }

  test("q79 accounting consistent with the exact pair list") {
    val pairs = graft.ops.TextOps.exactJaccardPairs(spark, sf0001, 0.5)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val comp = Graph.connectedComponents(pairs)
    val nodes = pairs.select(col("src").as("n"))
      .union(pairs.select(col("dst").as("n"))).distinct().count()
    assert(comp.count() == nodes) // every paired doc gets a component
    val r = SparkEntry.queries("q79_dedup_clusters")(spark, sf0001).head()
    assert(r.getAs[Long]("n_docs_in_clusters") == nodes)
    assert(r.getAs[Long]("n_clusters") ==
      comp.select("component").distinct().count())
  }

  test("bfsHops: min-hop on a chain with a shortcut, bounded, visited-once") {
    import spark.implicits._
    // chain 1-2-3-4-5-6 plus shortcut 1-4: node 4 is hop 1 (not 3),
    // 5 is hop 2, 6 is hop 3; 9-10 is a disconnected island (absent)
    val raw = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (1L, 4L), (9L, 10L)).toDF("a", "b")
    val edges = raw.union(raw.select(col("b").as("a"), col("a").as("b")))
    val seeds = Seq(1L).toDF("node")
    val got = Graph.bfsHops(edges, seeds, maxHop = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2, 6L -> 3))
    // hop bound respected: maxHop 1 stops at the 1-hop shell
    val shell = Graph.bfsHops(edges, seeds, maxHop = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(shell == Map(1L -> 0, 2L -> 1, 4L -> 1))
    // multi-source: seeds {1, 10} reach the island too
    val multi = Graph.bfsHops(edges, Seq(1L, 10L).toDF("node"), maxHop = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(multi(9L) == 1 && multi(10L) == 0)
  }

  test("q230 keep-set partitions exactly q79's clusters") {
    val reps = SparkEntry.queries("q230_dedup_keep_set")(spark, sf0001)
      .collect()
    val q79 = SparkEntry.queries("q79_dedup_clusters")(spark, sf0001).head()
    assert(reps.length == q79.getAs[Long]("n_clusters"))
    assert(reps.map(_.getAs[Long]("sz")).sum ==
      q79.getAs[Long]("n_docs_in_clusters"))
    val lens = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars")).toMap
    reps.foreach { r =>
      assert(r.getAs[Long]("sz") >= 2, "a cluster needs at least a pair")
      // representative carries its own length, and the dropped checksum
      // excludes exactly the representative
      assert(lens(r.getAs[Long]("rep_doc")) == r.getAs[Long]("rep_chars"))
      assert(r.getAs[Long]("dropped_checksum") >= 0)
    }
  }
}
