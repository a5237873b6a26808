package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list (SURVEY.md §2 C9).
  *
  * The dedup operators emit near-duplicate *pairs*; turning pairs into
  * dedup decisions needs the transitive closure — doc A ~ B and B ~ C
  * must land in one cluster even when A ~ C was never emitted. At 100 TB
  * the edge list itself is distributed, so this is the alternating
  * large-star / small-star algorithm of Kiveris et al., "Connected
  * Components in MapReduce and Beyond" (SoCC 2014): each round is two
  * groupBy-min + join passes over the edge list (map-side combinable,
  * keyed on node id), and the edge set provably converges to star
  * graphs rooted at each component's minimum node id in O(log n)
  * rounds — unlike plain label propagation, whose round count is the
  * graph diameter (linear for chain-shaped dup clusters).
  *
  * Per round the lineage is truncated with `localCheckpoint` so plan
  * depth stays constant; on a real cluster prefer
  * `spark.sparkContext.setCheckpointDir` + reliable `checkpoint` for
  * fault tolerance across long jobs (same call shape).
  *
  * Nodes with no edges don't appear in the output (a singleton is its
  * own cluster; callers union them back if needed).
  */
object GraphOps {

  /** Component label per node: `(node, component)` where `component`
    * is the minimum node id reachable from `node`. Input edges are
    * undirected; self-loops and duplicate edges are ignored.
    *
    * Adaptive execution: star rounds run distributed only while the
    * (shrinking) edge set exceeds `maxLocalEdges`; below that the
    * remainder is finished with a single-pass union-find on the driver
    * (≤ ~32 MB at the default two million edges). Star contraction
    * drives every component toward one edge per node, so even
    * billion-edge inputs spend only the first O(log n) rounds on the
    * cluster and skip the long tail of near-empty rounds — the same
    * large-then-local endgame production CC implementations use.
    * Set `maxLocalEdges = 0` to force fully-distributed execution.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25,
                          maxLocalEdges: Long = 2000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    var e = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter($"u" =!= $"v" && $"u".isNotNull && $"v".isNotNull)
      .distinct()
      .localCheckpoint()

    var converged = false
    var round = 0
    var fp = fingerprint(e)
    while (!converged && fp._1 > maxLocalEdges && round < maxIter) {
      // previous round's localCheckpoint blocks are reclaimed by the
      // ContextCleaner once the old Dataset is unreachable (Dataset
      // .unpersist would be a no-op on checkpoint blocks); on a real
      // cluster prefer reliable checkpoint() per the scaladoc
      e = smallStar(largeStar(e)).localCheckpoint()
      val nfp = fingerprint(e)
      converged = nfp == fp
      fp = nfp
      round += 1
    }

    if (!converged && fp._1 <= maxLocalEdges) return finishLocally(e)
    // never silently label an unconverged edge set: components would be
    // split into multiple ids with no error
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds " +
        s"(${fp._1} edges left, maxLocalEdges=$maxLocalEdges); raise " +
        "maxIter or maxLocalEdges")

    // converged edge set is a union of stars (node -> component min);
    // label roots as themselves and min-agg so a not-fully-converged
    // set still labels consistently per node
    e.select(greatest($"u", $"v").as("node"), least($"u", $"v").as("component"))
      .union(e.select(least($"u", $"v").as("node"),
        least($"u", $"v").as("component")))
      .groupBy("node").agg(min($"component").as("component"))
  }

  /** Endgame for edge sets small enough to fit on the driver: one
    * collect + path-compressed union-find, labels re-parallelized.
    */
  private def finishLocally(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val pairs = e.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.LongMap[Long]()
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) {
        val p = parent(x)
        parent(x) = parent.getOrElse(p, p) // halve the path
        x = parent(x)
      }
      x
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        // union by min so every root is its component's minimum id
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val nodes = pairs.iterator.flatMap(p => Iterator(p._1, p._2)).toSet
    spark.createDataset(nodes.toSeq.map(n => (n, find(n))))
      .toDF("node", "component")
  }

  /** large-star: every node connects its strictly-larger neighbors to
    * the minimum of its neighborhood (incl. itself).
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val und = e.union(e.select($"v".as("u"), $"u".as("v")))
    val mins = und.groupBy("u").agg(min($"v").as("mv"))
      .select($"u", least($"u", $"mv").as("m"))
    und.join(mins, "u")
      .filter($"v" > $"u")
      .select($"v".as("u"), $"m".as("v"))
      .filter($"u" =!= $"v")
      .distinct()
  }

  /** small-star: orient edges toward the smaller endpoint, then connect
    * each node and its smaller neighbors to the neighborhood minimum.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val or = e.select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
    val mins = or.groupBy("u").agg(min($"v").as("m"))
    or.join(mins, "u")
      .select($"v".as("u"), $"m".as("v"))
      .union(mins.select($"u", $"m".as("v")))
      .filter($"u" =!= $"v")
      .distinct()
  }

  /** Order-independent edge-set fingerprint for the convergence check:
    * (count, decimal sum of per-edge hashes — overflow-free under ANSI
    * mode). Two cheap aggregates — no sort, no collect of edges.
    */
  private def fingerprint(e: DataFrame): (Long, String) = {
    val spark = e.sparkSession
    import spark.implicits._
    e.agg(count(lit(1)).as("c"),
        coalesce(sum(xxhash64($"u", $"v").cast("decimal(38,0)")),
          lit(0)).cast("string").as("h"))
      .as[(Long, String)].head()
  }
}
