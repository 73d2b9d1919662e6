package graft.bdf

import org.apache.spark.rdd.RDD

/** Deterministic distributed elementwise sum of per-partition double
  * arrays.
  *
  * `treeAggregate`/`reduce` combine partials in TASK-ARRIVAL order —
  * double addition is commutative but not associative, so the same job
  * can return different last-ulp results across runs even with a fixed
  * partitioning. This helper makes the reduction a pure function of the
  * partitioning: per-partition partials are keyed by partition id,
  * level-1 groups of ~sqrt(P) partials are summed in ascending-pid
  * order, and the driver folds the group sums in ascending-group order.
  * Same partitioning -> same bits, regardless of scheduling. Used by
  * the CG side solver and the distributed NW sufficient statistics so
  * the "deterministic for a fixed partitioning" contract actually
  * holds. */
private[bdf] object DetSum {

  /** @param partials (partitionId, partial) pairs, one per partition */
  def sum(partials: RDD[(Int, Array[Double])], len: Int): Array[Double] = {
    val p = math.max(1, partials.getNumPartitions)
    val groups = math.max(1, math.ceil(math.sqrt(p.toDouble)).toInt)
    val lvl1 = partials
      .map { case (pid, a) => (pid % groups, (pid, a)) }
      .groupByKey(groups)
      .map { case (g, it) =>
        val sorted = it.toArray.sortBy(_._1)
        val acc = new Array[Double](len)
        var i = 0
        while (i < sorted.length) {
          val b = sorted(i)._2
          var j = 0
          while (j < len) { acc(j) += b(j); j += 1 }
          i += 1
        }
        (g, acc)
      }
    val out = new Array[Double](len)
    lvl1.collect().sortBy(_._1).foreach { case (_, a) =>
      var j = 0
      while (j < len) { out(j) += a(j); j += 1 }
    }
    out
  }
}
