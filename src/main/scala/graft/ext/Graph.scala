package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph analytics over edge tables — the link-authority side
  * of corpus curation (rank pages of a crawl by link structure, pick
  * canonical members of duplicate clusters, weight sources by citation).
  */
object Graph {

  /** PageRank by power iteration (Brin & Page, WWW 1998): `iters` rounds
    * of rank = (1−d)/n + d·Σ_in rank/outdeg over a directed edge table.
    *
    * Determinism contract (the rank-stability rule applied to an
    * ITERATED float): per-edge contributions round to 6 dp and sum as
    * DECIMAL — double addition is non-associative and partition order
    * would drift the ranks a little more every round — and each round's
    * rank re-rounds onto the same 6-dp grid, so any engine, partitioning,
    * or retry reproduces every round bit-for-bit (the DuckDB oracle
    * chains the identical recurrence).
    *
    * Shape at scale: all loop state is node-sized (rank table) or
    * edge-sized (one equi-join + one partial-agg'd groupBy(dst) per
    * round — hub nodes collapse map-side). Each round MATERIALIZES
    * through [[graft.ops.Materialize.stable]] (the CC-loop precedent:
    * round k must never replay rounds 1..k−1, and the durability knob
    * applies). The damping teleport rides a 1-row broadcast node count —
    * no driver-side scalar. Simplified dangling-node convention: nodes
    * without out-edges ABSORB rank (their mass is not redistributed), the
    * common formulation when edges come symmetrized — e.g. from near-dup
    * pairs — where dangling nodes cannot occur. Ranks then sum to 1 up
    * to rounding; with true dangling nodes they decay, which is fine for
    * RANKING but not for probability readings. */
  def pageRank(edges: DataFrame, iters: Int = 5, damping: Double = 0.85,
               srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    val dec = DecimalType(20, 6)
    // The edge table is referenced by EVERY round's join plus the
    // node/degree derivations — materialize once (edge-sized) or each
    // reference re-runs the upstream pipeline that produced the edges
    // (measured 16 s vs 3 s at sf0.1 over the near-dup-pair pipeline;
    // the Materialize.stable raison d'être). Node and degree tables are
    // node-sized; same treatment.
    val e = graft.ops.Materialize.stable(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")),
      "pagerank-edges")
    val nodes = graft.ops.Materialize.stable(
      e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct(),
      "pagerank-nodes")
    val nCount = nodes.agg(count(lit(1)).as("__n"))
    val outDeg = graft.ops.Materialize.stable(
      e.groupBy("src").agg(count(lit(1)).as("__deg")),
      "pagerank-outdeg")
    val r0 = graft.ops.Materialize.stable(
      nodes.crossJoin(broadcast(nCount))
        .withColumn("rank", round(lit(1.0) / col("__n"), 6).cast(dec))
        .select("node", "rank"),
      "pagerank-r0")
    val out = (1 to iters).foldLeft(r0) { (r, i) =>
      val contrib = e
        .join(r.withColumnRenamed("node", "src"), "src")
        .join(outDeg, "src")
        .withColumn("__c",
          round(col("rank").cast("double") / col("__deg"), 6).cast(dec))
        .groupBy(col("dst").as("node"))
        .agg(sum("__c").as("__in"))
      val next = graft.ops.Materialize.stable(
        nodes.join(contrib, Seq("node"), "left")
          .withColumn("__in", coalesce(col("__in"), lit(0).cast(dec)))
          .crossJoin(broadcast(nCount))
          .withColumn("rank", round(lit(1.0 - damping) / col("__n")
            + lit(damping) * col("__in").cast("double"), 6).cast(dec))
          .select("node", "rank"),
        s"pagerank-r$i")
      // next is materialized (stable is eager) — round i-1's blocks are
      // superseded; release so the loop holds 2 rounds of storage, not
      // `iters` (Materialize.release scaladoc has the full story).
      graft.ops.Materialize.release(r)
      next
    }
    // The returned round reads its own blocks only — the edge/node/degree
    // tables are no longer referenced by any unexecuted plan.
    Seq(e, nodes, outDeg).foreach(graft.ops.Materialize.release)
    out
  }

  /** PERSONALIZED PageRank (Haveliwala, WWW 2002): the teleport lands on
    * a SEED SET instead of everywhere — rank = (1−d)·t + d·Σ rank/deg
    * with t = 1/|S| on seeds, 0 elsewhere, r0 = t. The graph-expansion
    * move of seed-based corpus curation: given a hand-curated seed set,
    * rank the rest of the near-dup/link graph by proximity to it and
    * take the head (the BootCaT/focused-crawl idea as one bounded graph
    * job). Seeds outside the graph are ignored (loudly failing only when
    * NONE intersects — a wholly disjoint seed set means the wrong graph).
    * Same determinism discipline, materialization schedule, dangling
    * convention, and per-round cost as [[pageRank]]; nodes unreachable
    * from the seeds converge to rank 0 — that distance signal IS the
    * product. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
                           iters: Int = 5, damping: Double = 0.85,
                           srcCol: String = "src", dstCol: String = "dst",
                           seedCol: String = "node"): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    val dec = DecimalType(20, 6)
    val e = graft.ops.Materialize.stable(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")),
      "ppr-edges")
    val nodes = graft.ops.Materialize.stable(
      e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct(),
      "ppr-nodes")
    val outDeg = graft.ops.Materialize.stable(
      e.groupBy("src").agg(count(lit(1)).as("__deg")),
      "ppr-outdeg")
    val seedsIn = graft.ops.Materialize.stable(
      nodes.join(seeds.select(col(seedCol).as("node")).distinct(), "node"),
      "ppr-seeds")
    require(seedsIn.limit(1).count() == 1L,
      "no seed id appears in the graph — personalized PageRank over a " +
        "disjoint seed set is the zero vector; check the id spaces")
    val sCount = seedsIn.agg(count(lit(1)).as("__s"))
    val tp = graft.ops.Materialize.stable(
      nodes.join(seedsIn.withColumn("__is", lit(1)), Seq("node"), "left")
        .crossJoin(broadcast(sCount))
        .withColumn("__t", when(col("__is").isNotNull,
          lit(1.0) / col("__s")).otherwise(lit(0.0)))
        .select("node", "__t"),
      "ppr-teleport")
    val r0 = graft.ops.Materialize.stable(
      tp.withColumn("rank", round(col("__t"), 6).cast(dec))
        .select("node", "rank"),
      "ppr-r0")
    val out = (1 to iters).foldLeft(r0) { (r, i) =>
      val contrib = e
        .join(r.withColumnRenamed("node", "src"), "src")
        .join(outDeg, "src")
        .withColumn("__c",
          round(col("rank").cast("double") / col("__deg"), 6).cast(dec))
        .groupBy(col("dst").as("node"))
        .agg(sum("__c").as("__in"))
      val next = graft.ops.Materialize.stable(
        tp.join(contrib, Seq("node"), "left")
          .withColumn("__in", coalesce(col("__in"), lit(0).cast(dec)))
          .withColumn("rank", round(lit(1.0 - damping) * col("__t")
            + lit(damping) * col("__in").cast("double"), 6).cast(dec))
          .select("node", "rank"),
        s"ppr-r$i")
      graft.ops.Materialize.release(r) // superseded round (see pageRank)
      next
    }
    Seq(e, nodes, outDeg, seedsIn, tp).foreach(graft.ops.Materialize.release)
    out
  }

  /** k-core membership (Seidman 1983 "Network structure and minimum
    * degree"): the maximal subgraph where every node keeps degree ≥ k,
    * found by iterated peeling — drop nodes under degree k, recompute,
    * repeat to fixpoint. The dense-cluster detector of a near-dup graph:
    * a 2-core member sits in a CYCLE of mutual near-dups (template
    * farms), while tree-like chains peel away entirely — evidence one
    * notch stronger than a triangle count of zero vs one. Returns
    * (node, in_core) for every node of the input graph.
    *
    * Determinism: pure integer degrees and set membership — no float
    * anywhere, any partitioning lands on the same fixpoint (the peel is
    * confluent: removal order cannot change the maximal k-core).
    *
    * Shape at scale: each round is one degree groupBy (map-side
    * partials) + two semi-join-shaped filters of the edge table against
    * the node-sized keep set — edge-sized shuffles, node-sized state,
    * every round MATERIALIZED (the CC/pageRank loop discipline, durable
    * via `spark.graft.materialize.mode`). The convergence probe is one
    * node-sized count per round (the CC loop's probe precedent). Rounds
    * needed = peel depth, small on real graphs; a loud contract fails if
    * `maxIters` rounds cannot reach the fixpoint rather than returning a
    * half-peeled set — and the capped-mirror oracle stays exact because
    * post-fixpoint rounds are no-ops. */
  def kCore(edges: DataFrame, k: Int, maxIters: Int = 8,
            srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxIters >= 1 && maxIters <= 50,
      s"maxIters must be in [1, 50], got $maxIters")
    val und0 = graft.ops.Materialize.stable(
      edges.select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
        .filter(col("a") =!= col("b")).distinct(),
      "kcore-e0")
    val allNodes = graft.ops.Materialize.stable(
      und0.select(col("a").as("node"))
        .unionByName(und0.select(col("b").as("node"))).distinct(),
      "kcore-nodes")
    var e = und0
    var keep: DataFrame = null
    var prevCount = -1L
    var converged = false
    var i = 0
    while (i < maxIters && !converged) {
      val deg = e.select(col("a").as("node"))
        .unionByName(e.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("__deg"))
      val prevKeep = keep
      keep = graft.ops.Materialize.stable(
        deg.filter(col("__deg") >= k).select("node"), s"kcore-k$i")
      // keep(i) is materialized — keep(i-1) fed only the superseded edge
      // filter; release so the peel holds 2 rounds of blocks, not `i`.
      if (prevKeep != null) graft.ops.Materialize.release(prevKeep)
      val kc = keep.count()
      if (kc == prevCount) converged = true
      else {
        prevCount = kc
        val prevE = e
        e = graft.ops.Materialize.stable(
          e.join(keep.withColumnRenamed("node", "a"), "a")
            .join(keep.withColumnRenamed("node", "b"), "b")
            .select("a", "b"),
          s"kcore-e${i + 1}")
        // allNodes is its own materialization, so the superseded edge
        // rounds (incl. und0) are unreferenced once the filtered round
        // is readable.
        graft.ops.Materialize.release(prevE)
      }
      i += 1
    }
    require(converged,
      s"k-core peel did not reach its fixpoint within $maxIters rounds — " +
        "raise maxIters (each round removes at least one node, so the " +
        "peel depth of this graph exceeds the cap)")
    // The return plan reads allNodes + the final keep; the final edge
    // round is not referenced by anything downstream.
    graft.ops.Materialize.release(e)
    allNodes
      .join(keep.withColumn("__in", lit(true)), Seq("node"), "left")
      .select(col("node"), coalesce(col("__in"), lit(false)).as("in_core"))
  }

  /** Per-node triangle counts over an undirected graph given as a pair
    * table (either orientation, self-loops ignored). Triangles are the
    * local-clustering signal of a near-dup graph: a doc whose neighbors
    * are also near-dups of EACH OTHER sits in a dense boilerplate
    * cluster (template spam), while a bridge doc with many
    * triangle-free edges links otherwise-unrelated content — the
    * keep/drop evidence a cluster-representative pass wants beyond raw
    * degree. Returns (node, n_tri) for every node in the graph,
    * zero-filled.
    *
    * Shape at scale — degree orientation (Suri & Vassilvitskii, WWW
    * 2011 "Counting triangles and the curse of the last reducer"):
    * each undirected edge is directed from its lower-(degree, id)
    * endpoint to its higher one, so every node's OUT-degree is bounded
    * by O(√m) on any graph and the wedge join (out-neighbor pairs per
    * node) can never explode on a hub — a star node has huge degree but
    * ZERO out-edges under the orientation, so it generates no wedges at
    * all. Three equi-joins total (attach degrees, build wedges, close
    * them), each shuffling edge- or wedge-sized data; counts are exact
    * integers, so the result is partition-order-proof with no decimal
    * discipline needed. */
  def triangleCounts(edges: DataFrame, srcCol: String = "src",
                     dstCol: String = "dst"): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    // Node degrees off the canonical pair table (each edge counts once
    // per endpoint); node-sized, reused by the orientation and the
    // zero-fill.
    val deg = graft.ops.Materialize.stable(
      und.select(col("a").as("node"))
        .unionByName(und.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg")),
      "tri-deg")
    // Orient low-(deg, id) -> high-(deg, id). Ties in degree break by
    // id, so the order is total and the orientation deterministic.
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
    val oriented = graft.ops.Materialize.stable(
      withDeg.select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v"), col("db").as("dv")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"),
            col("da").as("dv"))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv")),
      "tri-oriented")
    // Wedges: ordered out-neighbor pairs (v, w) of each pivot u, ordered
    // by the same (deg, id) total order so each unordered pair appears
    // once; a wedge closes iff the oriented edge v->w exists (it can
    // only be oriented that way, v preceding w in the order).
    val e1 = oriented.select(col("u"), col("v"), col("dv"))
    val e2 = oriented.select(col("u"), col("v").as("w"), col("dv").as("dw"))
    val wedges = e1.join(e2, Seq("u"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .select("u", "v", "w")
    val tris = wedges.join(
      oriented.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
    val perNode = tris
      .select(col("u").as("node"))
      .unionByName(tris.select(col("v").as("node")))
      .unionByName(tris.select(col("w").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    deg.select("node")
      .join(perNode, Seq("node"), "left")
      .select(col("node"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }

  /** Resolve every node of a parent-pointer FOREST (org charts, category
    * trees, reply threads, file systems) to its root and depth by
    * pointer doubling: the state (node → current ancestor, steps) is
    * ITSELF the jump function, so joining the state to itself doubles
    * every pointer's reach — depth 2^rounds resolves in `rounds`
    * equi-joins, where the naive parent-walk would need depth joins.
    * Roots hold a zero-step self-loop, the squaring fixed point.
    *
    * Shape at scale: each round is ONE equi-join of two node-sized
    * tables (shuffle on the ancestor key), materialized-and-released so
    * the loop holds two rounds of blocks ([[pageRank]]'s discipline —
    * Materialize.release scaladoc). After the loop, one verification
    * join asserts every pointer reached a fixed point and throws loudly
    * if the forest is deeper than 2^rounds (or cyclic — a cycle never
    * resolves and is caught by the same audit). */
  def ancestorRoots(nodes: DataFrame, idCol: String, parentCol: String,
                    rounds: Int = 7): DataFrame = {
    require(rounds >= 1 && rounds <= 12,
      s"rounds must be in [1, 12] (depth reach 2^rounds), got $rounds")
    // Dangling audit FIRST: the doubling join is inner on the ancestor
    // key, so a parent id absent from the id column would silently drop
    // its children in round 1 — make that loud instead. One anti-join
    // count over node-sized tables.
    val dangling = nodes
      .select(col(parentCol).as("__ep")).filter(col("__ep").isNotNull)
      .join(nodes.select(col(idCol).as("__ep")), Seq("__ep"), "left_anti")
      .count()
    require(dangling == 0L,
      s"ancestorRoots: $dangling parent pointers reference ids absent " +
        s"from `$idCol` — dangling forest; repair the pointers first")
    val s0 = graft.ops.Materialize.stable(
      nodes.select(col(idCol).as("node"),
        coalesce(col(parentCol), col(idCol)).as("cur"),
        when(col(parentCol).isNotNull, 1L).otherwise(0L).as("depth")),
      "anc-s0")
    val out = (1 to rounds).foldLeft(s0) { (s, i) =>
      val jump = s.select(col("node").as("__jn"), col("cur").as("__jc"),
        col("depth").as("__jd"))
      val next = graft.ops.Materialize.stable(
        s.join(jump, col("cur") === col("__jn"))
          .select(col("node"), col("__jc").as("cur"),
            (col("depth") + col("__jd")).as("depth")),
        s"anc-s$i")
      graft.ops.Materialize.release(s)
      next
    }
    // root audit: every final pointer must land on a TRUE root (null
    // parent in the ORIGINAL table). A mere self-loop fixed point is
    // not enough — an even-length cycle converges to self-pointers, so
    // checking against the original parents is what catches both the
    // too-shallow-rounds case and cycles of any length.
    val parents = nodes.select(col(idCol).as("__vn"),
      col(parentCol).as("__vp"))
    val unresolved = out.join(parents, col("cur") === col("__vn"))
      .filter(col("__vp").isNotNull).count()
    require(unresolved == 0L,
      s"ancestorRoots: $unresolved pointers unresolved after $rounds " +
        "rounds — forest deeper than 2^rounds, or cyclic; raise `rounds`")
    // the final round's blocks back the returned frame — the caller
    // consumes them (pageRank's convention; Bench unpersists per query)
    out.select(col("node").as(idCol), col("cur").as("root"), col("depth"))
  }
}
