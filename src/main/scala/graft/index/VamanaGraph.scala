package graft.index

import scala.collection.mutable
import graft.functions.VectorKernels

/** Distance metric of an index (SURVEY.md §2.3 D7). Build-side traversal uses
  * the ordering-equivalent cheap forms (squared L2, 1-dot on normalized). */
sealed abstract class Metric(val name: String) extends Serializable {
  def dist(a: Array[Float], b: Array[Float]): Double
}
object Metric {
  case object L2 extends Metric("l2") {
    def dist(a: Array[Float], b: Array[Float]): Double = VectorKernels.l2sq(a, b)
  }
  /** Assumes normalized inputs; clamps at 0 (distance/mod.rs:192-223). */
  case object Cosine extends Metric("cosine") {
    def dist(a: Array[Float], b: Array[Float]): Double =
      VectorKernels.cosineDistNormalized(a, b)
  }
  case object InnerProduct extends Metric("ip") {
    def dist(a: Array[Float], b: Array[Float]): Double = VectorKernels.negDot(a, b)
  }
  def apply(name: String): Metric = name match {
    case "l2" => L2
    case "cosine" => Cosine
    case "ip" => InnerProduct
    case other => throw new IllegalArgumentException(s"unknown metric $other")
  }
}

/**
 * THE build-space transform — Matryoshka slice, then cosine normalize —
 * shared by the graph build, IVF routing (build assignment, probe routing,
 * delta re-routing), cluster-radius maintenance and SBQ quantization. ONE
 * definition on purpose: a drifted copy would mis-route delta rows or
 * corrupt stored radii with no compile-time signal. A standalone
 * Serializable object (not a DiskannIndex method) so closures INSIDE
 * DiskannIndex can call it without capturing the whole module.
 */
private[graft] object BuildSpace extends Serializable {
  def apply(raw: Array[Float], dimsToIndex: Int, metric: Metric): Array[Float] = {
    val sliced = if (dimsToIndex > 0) raw.take(dimsToIndex) else raw
    if (metric == Metric.Cosine) VectorKernels.normalize(sliced) else sliced
  }
}

/** Sorted-dedup label-set algebra (labels/mod.rs:84-142). Arrays must be
  * sorted ascending; empty array = no labels. */
object LabelSets {
  def normalize(raw: Array[Short]): Array[Short] =
    if (raw == null) Array.emptyShortArray else raw.distinct.sorted

  def overlaps(a: Array[Short], b: Array[Short]): Boolean = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val c = a(i) - b(j)
      if (c == 0) return true
      else if (c < 0) i += 1
      else j += 1
    }
    false
  }

  /** Is a ∩ b ⊆ self? The prune-safety rule (labels/mod.rs:84-111): an edge
    * may only be occluded by a neighbor that covers the labels shared by the
    * occluded candidate and the pruned node. */
  def containsIntersection(self: Array[Short], a: Array[Short], b: Array[Short]): Boolean = {
    var i = 0; var j = 0; var k = 0
    while (i < a.length && j < b.length) {
      val c = a(i) - b(j)
      if (c == 0) {
        while (k < self.length && self(k) < a(i)) k += 1
        if (k == self.length || self(k) > a(i)) return false
        i += 1; j += 1
      } else if (c < 0) i += 1
      else j += 1
    }
    true
  }
}

/**
 * In-memory Vamana (DiskANN-style) graph builder over one partition's rows —
 * the Spark-native replacement for the reference's page-based build
 * (SURVEY.md §2.5 G1-G8). Each Spark task builds one self-contained
 * sub-graph in executor heap; there is no cross-task shared state, which is
 * what makes the build embarrassingly parallel at cluster scale.
 *
 * Algorithm semantics mirror graph/mod.rs:
 *  - insert: greedy search collects the visited set as candidate neighbors;
 *    labeled vectors are inserted twice — once from the per-label start nodes
 *    with label-filtered traversal, once unfiltered from the default start
 *    (graph/mod.rs:637-717)
 *  - RobustPrune with alpha escalating ×1.2 per round up to maxAlpha, with
 *    max-factor memoization (graph/mod.rs:387-488)
 *  - label rule: a candidate can only be occluded by an admitted neighbor
 *    whose labels cover candidate∩node labels (graph/mod.rs:652-660 region)
 *  - back-edges added to every chosen neighbor; a node's list is pruned only
 *    when it exceeds ceil(R × 1.3) (GRAPH_SLACK_FACTOR, meta_page.rs:24)
 *  - first inserted node is the default start node; the first node carrying
 *    each label is that label's start node (graph/mod.rs:490-533)
 *  - zero-distance ties break on |nodeId delta| (neighbor_with_distance.rs:12-95)
 */
final class VamanaBuilder(
    val vectors: Array[Array[Float]],
    val labels: Array[Array[Short]], // null => unlabeled build
    val metric: Metric,
    val numNeighbors: Int,
    val searchListSize: Int,
    val maxAlpha: Double,
    /** SBQ codes of the rows (same order as `vectors`). When non-null the
      * whole build — insert traversal AND prune occlusion — runs on Hamming
      * distances over these codes, exactly like the reference's SBQ build
      * (SbqSearchDistanceMeasure / SbqNodeDistanceMeasure, sbq/mod.rs:139-190,
      * D8/D9): the graph's edges are then consistent with the quantized
      * metric the serving traversal uses, which measurably improves recall at
      * reference-default parameters over a full-precision build. null =
      * full-precision build (plain storage). */
    val codes: Array[Array[Long]] = null) {

  val n: Int = vectors.length
  private val slackLimit: Int = math.ceil(numNeighbors * 1.3).toInt

  // adjacency: parallel growable arrays per node
  private val nbr: Array[mutable.ArrayBuffer[Int]] =
    Array.fill(n)(new mutable.ArrayBuffer[Int](slackLimit + 1))
  private val nbrDist: Array[mutable.ArrayBuffer[Double]] =
    Array.fill(n)(new mutable.ArrayBuffer[Double](slackLimit + 1))

  private var defaultStart: Int = -1
  private val labelStart = mutable.Map.empty[Short, Int]

  private def labelsOf(i: Int): Array[Short] =
    if (labels == null) Array.emptyShortArray else labels(i)

  @inline private def dist(i: Int, j: Int): Double =
    if (codes != null) VectorKernels.hamming(codes(i), codes(j)).toDouble
    else metric.dist(vectors(i), vectors(j))

  /** distance==0 tie-break proxy for ip_distance (util/mod.rs:166-171). */
  @inline private def tieBreak(i: Int, j: Int): Int = math.abs(i - j).max(0)

  private def factor(candToPoint: Double, candId: Int, pointId: Int,
      candToExisting: Double, existingId: Int): Double = {
    val eps = java.lang.Math.ulp(1.0f).toDouble
    if (candToExisting < eps) {
      if (candToPoint < eps) {
        tieBreak(candId, pointId).toDouble / math.max(tieBreak(candId, existingId), 1).toDouble
      } else Double.MaxValue
    } else candToPoint / candToExisting
  }

  /** Candidate ordering: by distance, then id-delta tie break, then id. */
  private def sortCandidates(cands: mutable.ArrayBuffer[(Int, Double)], anchor: Int): Unit = {
    val arr = cands.sortInPlaceWith { (a, b) =>
      if (a._2 != b._2) a._2 < b._2
      else {
        val ta = tieBreak(a._1, anchor); val tb = tieBreak(b._1, anchor)
        if (ta != tb) ta < tb else a._1 < b._1
      }
    }
    locally(arr)
  }

  /** Greedy best-first search over the current graph (graph/mod.rs:331-385).
    * Returns the visited list (id, dist) — candidate neighbors for pruning. */
  def greedySearch(query: Array[Float], starts: Seq[Int], l: Int,
      filterLabels: Array[Short], excludeSelf: Int = -1): mutable.ArrayBuffer[(Int, Double)] =
    greedySearchBy(i => metric.dist(query, vectors(i)), starts, l, filterLabels, excludeSelf)

  /** As [[greedySearch]] but with an arbitrary query-to-node distance — the
    * build path passes Hamming over SBQ codes when `codes` is set. */
  def greedySearchBy(qdist: Int => Double, starts: Seq[Int], l: Int,
      filterLabels: Array[Short], excludeSelf: Int = -1): mutable.ArrayBuffer[(Int, Double)] = {
    val visited = new mutable.ArrayBuffer[(Int, Double)](l * 2)
    if (starts.isEmpty) return visited
    val inserted = new java.util.HashSet[Integer](l * 4)
    val ord = Ordering.by[(Int, Double), Double](_._2).reverse
    val candidates = mutable.PriorityQueue.empty[(Int, Double)](ord)
    starts.distinct.foreach { s =>
      if (inserted.add(s)) candidates.enqueue((s, qdist(s)))
    }
    while (candidates.nonEmpty &&
        (visited.length < l || candidates.head._2 < visited(l - 1)._2)) {
      val head = candidates.dequeue()
      // insert into sorted visited list
      var idx = visited.indexWhere(_._2 > head._2)
      if (idx < 0) idx = visited.length
      visited.insert(idx, head)
      // expand
      val ns = nbr(head._1)
      var i = 0
      while (i < ns.length) {
        val cand = ns(i)
        if (cand != excludeSelf && !inserted.contains(cand)) {
          val keep = filterLabels.isEmpty ||
            LabelSets.overlaps(labelsOf(cand), filterLabels)
          if (keep) {
            inserted.add(cand)
            candidates.enqueue((cand, qdist(cand)))
          }
        }
        i += 1
      }
    }
    visited
  }

  /** RobustPrune (graph/mod.rs:387-488). */
  def pruneNeighbors(pointId: Int, pointLabels: Array[Short],
      candidatesIn: mutable.ArrayBuffer[(Int, Double)]): mutable.ArrayBuffer[(Int, Double)] = {
    val candidates = candidatesIn.clone()
    sortCandidates(candidates, pointId)
    val results = new mutable.ArrayBuffer[(Int, Double)](numNeighbors)
    val maxFactors = Array.fill(candidates.length)(0.0)
    var alpha = 1.0
    val hasLabels = labels != null
    while (alpha <= maxAlpha && results.length < numNeighbors) {
      var i = 0
      while (i < candidates.length) {
        if (results.length >= numNeighbors) return results
        if (maxFactors(i) <= alpha) {
          maxFactors(i) = Double.MaxValue
          val (existingId, _) = candidates(i)
          results += candidates(i)
          var j = i + 1
          while (j < candidates.length) {
            if (maxFactors(j) <= maxAlpha) {
              val (candId, candToPoint) = candidates(j)
              val labelOk = !hasLabels ||
                LabelSets.containsIntersection(
                  labelsOf(existingId), labelsOf(candId), pointLabels)
              if (labelOk) {
                val dce = dist(candId, existingId)
                val f = factor(candToPoint, candId, pointId, dce, existingId)
                if (f > maxFactors(j)) maxFactors(j) = f
              }
            }
            j += 1
          }
        }
        i += 1
      }
      alpha *= 1.2
    }
    results
  }

  /** Merge new edges into a node's list; dedup, drop self-loops, prune only
    * when over the slack limit (graph/mod.rs:212-266). Returns final list. */
  private def addNeighbors(nodeId: Int,
      additions: Seq[(Int, Double)]): mutable.ArrayBuffer[(Int, Double)] = {
    val cur = nbr(nodeId)
    val curD = nbrDist(nodeId)
    // a seedFrozen graph's stored edges carry no distances (NaN sentinel):
    // materialize them the first time this node's list is touched — only
    // back-edge targets and pruned nodes ever pay, untouched base nodes
    // never do
    var m = 0
    while (m < curD.length) {
      if (curD(m).isNaN) curD(m) = dist(nodeId, cur(m))
      m += 1
    }
    val seen = new java.util.HashSet[Integer](cur.length + additions.length + 1)
    val merged = new mutable.ArrayBuffer[(Int, Double)](cur.length + additions.length)
    var i = 0
    while (i < cur.length) { seen.add(cur(i)); merged += ((cur(i), curD(i))); i += 1 }
    additions.foreach { case (id, d) =>
      if (id != nodeId && seen.add(id)) merged += ((id, d))
    }
    val fin =
      if (merged.length > slackLimit) pruneNeighbors(nodeId, labelsOf(nodeId), merged)
      else merged
    cur.clear(); curD.clear()
    fin.foreach { case (id, d) => cur += id; curD += d }
    fin
  }

  private def updateStartNodes(id: Int): Unit = {
    if (defaultStart < 0) defaultStart = id
    labelsOf(id).foreach { lb => labelStart.getOrElseUpdate(lb, id) }
  }

  private def startsFor(filterLabels: Array[Short]): Seq[Int] =
    if (filterLabels.isEmpty) Seq(defaultStart)
    else {
      val s = filterLabels.toSeq.flatMap(lb => labelStart.get(lb)).distinct
      if (s.isEmpty) Seq(defaultStart) else s
    }

  private def insertInternal(id: Int, noFilter: Boolean): Unit = {
    val filterLabels = if (noFilter) Array.emptyShortArray else labelsOf(id)
    val starts = startsFor(filterLabels)
    val visited = greedySearchBy(j => dist(id, j), starts, searchListSize,
      filterLabels, excludeSelf = id)
    val chosen = addNeighbors(id, visited.toSeq)
    // back-edges
    chosen.foreach { case (nb, d) => addNeighbors(nb, Seq((id, d))) }
  }

  /** graph/mod.rs:637-717: dual insert for labeled vectors. */
  def insert(id: Int): Unit = {
    updateStartNodes(id)
    if (id == defaultStart && nbr(id).isEmpty && n > 1 && id == 0) {
      // first node: nothing to connect yet
    }
    if (labelsOf(id).nonEmpty) insertInternal(id, noFilter = false)
    insertInternal(id, noFilter = true)
  }

  def build(): VamanaBuilder = {
    var i = 0
    while (i < n) { insert(i); i += 1 }
    finalizePrune()
    this
  }

  /** finalize (finalize_index_build, build.rs:905-960): node records hold
    * exactly R neighbor slots — prune any list still inside the 1.3× build
    * slack back down to numNeighbors before the graph is frozen. */
  private def finalizePrune(): Unit = {
    var i = 0
    while (i < n) {
      if (nbr(i).length > numNeighbors) {
        val merged = new mutable.ArrayBuffer[(Int, Double)](nbr(i).length)
        var j = 0
        while (j < nbr(i).length) {
          val d = if (nbrDist(i)(j).isNaN) dist(i, nbr(i)(j)) else nbrDist(i)(j)
          merged += ((nbr(i)(j), d))
          j += 1
        }
        val fin = pruneNeighbors(i, labelsOf(i), merged)
        nbr(i).clear(); nbrDist(i).clear()
        fin.foreach { case (id, d) => nbr(i) += id; nbrDist(i) += d }
      }
      i += 1
    }
  }

  private var preBuilt: Int = 0

  /**
   * Pre-seed indices [0, adj.length) with a FROZEN shard graph's stored
   * adjacency — the live-insert fold then adds only the appended rows
   * through the normal [[insert]] path, the reference's `aminsert` /
   * `Graph::insert` semantics (build.rs:464-557: create node, greedy search
   * for candidates, RobustPrune, back-edges) applied to the shard the row
   * routes to, instead of rebuilding the whole shard graph. Stored edges
   * carry no distances; they materialize lazily on first touch (see
   * [[addNeighbors]]), so fold cost is O(inserted · search) + O(touched
   * lists), never O(shard). Start-node election replays the stored insert
   * order — node 0 default, first carrier of each label — exactly what
   * [[GraphSearcher]] recomputes at decode time, so the resumed build and
   * the serving traversal agree on starts.
   */
  def seedFrozen(adj: Array[Array[Int]]): VamanaBuilder = {
    require(preBuilt == 0 && defaultStart < 0,
      "seedFrozen must run on a fresh builder")
    require(adj.length <= n, s"seed ${adj.length} > capacity $n")
    var i = 0
    while (i < adj.length) {
      val a = adj(i)
      var j = 0
      while (j < a.length) { nbr(i) += a(j); nbrDist(i) += Double.NaN; j += 1 }
      updateStartNodes(i)
      i += 1
    }
    preBuilt = adj.length
    this
  }

  /** Insert every node [[seedFrozen]] did not cover, then re-apply the
    * finalize prune — the resumed-build analog of [[build]]. Fold depth
    * does NOT erode the graph through the repeated finalize: 20 successive
    * folds score recall@10 equal to one fold of the identical rows (the
    * StreamingSpec endurance gate); the only quality delta vs a one-shot
    * build of everything is the FROZEN quantizer (trained on the base
    * corpus only — the reference's aminsert freezes it identically), which
    * a forced full rebuild (REINDEX) re-trains. */
  def buildAppended(): VamanaBuilder = {
    var i = preBuilt
    while (i < n) { insert(i); i += 1 }
    finalizePrune()
    this
  }

  def neighborsOf(i: Int): Array[Int] = nbr(i).toArray
  def startNode: Int = defaultStart
  def labelStartNodes: Map[Short, Int] = labelStart.toMap

  /** BFS reachability from the start nodes (debugging/mod.rs analog; used by
    * the connectivity gate build.rs:1717-1753). */
  def reachableCount(): Int = {
    if (defaultStart < 0) return 0
    val seen = new java.util.HashSet[Integer]()
    val stack = mutable.ArrayDeque[Int](
      (defaultStart +: labelStart.values.toSeq).distinct: _*)
    while (stack.nonEmpty) {
      val v = stack.removeLast()
      if (seen.add(v)) nbr(v).foreach(stack.append)
    }
    seen.size
  }
}
