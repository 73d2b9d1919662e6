package graft.bdf

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Distributed conjugate-gradient solver for the Macau side-information
  * link (arXiv:1509.04610 §3.2): solve (X^T X + lambda I) beta = rhs
  * WITHOUT materializing X^T X — each CG iteration runs one distributed
  * pass over the row-partitioned feature matrix computing
  * X^T (X p) + lambda p via treeAggregate. This is the scale path for
  * side-info matrices whose Gram matrix (F x F) or row count make the
  * driver-side Cholesky in Gibbs.sampleBeta infeasible; the per-pass
  * cost is O(nnz(X) * K) and the driver only ever holds F x K state. */
object Cg {

  /** Rows of X zipped with their target rows (the noise-injected
    * centered factors): (features F, target K). */
  type XRow = (Array[Double], Array[Double])

  /** Solve (X^T X + lambda I) beta = X^T T + rhsExtra for all K columns
    * at once.
    * @param xt distributed rows of (x_i, t_i)
    * @param rhsExtra optional F x K term added to the right-hand side
    *                 (the Macau draw's sqrt(lambda)-scaled prior noise)
    * @return beta (F x K) */
  def solveNormal(spark: SparkSession, xt: DataFrame, fDim: Int, k: Int,
                  lambda: Double, maxIter: Int = 30,
                  tol: Double = 1e-9,
                  rhsExtra: Option[DenseMatrix[Double]] = None): DenseMatrix[Double] = {
    import spark.implicits._
    val rows = xt.select(col("features"), col("target"))
      .as[(Seq[Double], Seq[Double])]
      .rdd.map { case (f, t) => (f.toArray, t.toArray) }
      .persist()

    // rhs = X^T T, one distributed pass
    val rhs = rows.treeAggregate(DenseMatrix.zeros[Double](fDim, k))(
      seqOp = { (acc, r) =>
        val (x, t) = r
        var i = 0
        while (i < fDim) {
          val xi = x(i)
          if (xi != 0.0) {
            var j = 0
            while (j < k) { acc(i, j) += xi * t(j); j += 1 }
          }
          i += 1
        }
        acc
      },
      combOp = _ += _)
    rhsExtra.foreach(rhs += _)

    // A p = X^T (X p) + lambda p, one distributed pass per CG step for
    // ALL K systems simultaneously (p is F x K)
    def applyA(p: DenseMatrix[Double]): DenseMatrix[Double] = {
      val bp = spark.sparkContext.broadcast(p.toArray) // column-major F*K
      val xtxp = rows.treeAggregate(DenseMatrix.zeros[Double](fDim, k))(
        seqOp = { (acc, r) =>
          val x = r._1
          val pArr = bp.value
          // u = x^T p  (K)
          val u = new Array[Double](k)
          var j = 0
          while (j < k) {
            var s = 0.0
            var i = 0
            while (i < fDim) { s += x(i) * pArr(j * fDim + i); i += 1 }
            u(j) = s
            j += 1
          }
          // acc += x outer u
          var i = 0
          while (i < fDim) {
            val xi = x(i)
            if (xi != 0.0) {
              var j2 = 0
              while (j2 < k) { acc(i, j2) += xi * u(j2); j2 += 1 }
            }
            i += 1
          }
          acc
        },
        combOp = _ += _)
      bp.destroy()
      xtxp += p * lambda
    }

    // standard CG on K decoupled systems sharing each distributed pass
    val beta = DenseMatrix.zeros[Double](fDim, k)
    var r = rhs - applyA(beta)
    var p = r.copy
    var rs = DenseVector.tabulate(k)(j => r(::, j) dot r(::, j))
    var iter = 0
    while (iter < maxIter && breeze.linalg.max(rs) > tol) {
      val ap = applyA(p)
      var j = 0
      while (j < k) {
        val denom = p(::, j) dot ap(::, j)
        if (denom > 0) {
          val alpha = rs(j) / denom
          beta(::, j) :+= p(::, j) * alpha
          r(::, j) :-= ap(::, j) * alpha
        }
        j += 1
      }
      val rsNew = DenseVector.tabulate(k)(j2 => r(::, j2) dot r(::, j2))
      j = 0
      while (j < k) {
        val b = if (rs(j) > 0) rsNew(j) / rs(j) else 0.0
        p(::, j) := r(::, j) + p(::, j) * b
        j += 1
      }
      rs = rsNew
      iter += 1
    }
    rows.unpersist()
    beta
  }
}
