package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** N-D tensor column codec (SURVEY §1.4).
  *
  * The reference's TensorMessage holds N-D torch tensors per column; a
  * "row" of a 2-D column is its `shape[1:]` matrix and the column's
  * length is the first dimension (reference core/message.py:1036-1038;
  * examples/mnist.py:27 feeds 28×28 image rows). Here the same shape
  * convention is expressed structurally: an N-D tensor column is N
  * nested `ArrayType`s, row-major, innermost element FloatType by
  * convention (every op below is element-type-generic, so DoubleType
  * tensors work identically). The DataFrame row count IS the first
  * dimension, so `df.count()` is the reference's `len(message)`.
  *
  * Scale notes: every op is a per-row projection — O(tensor size) per
  * row, no shuffle, fully distributed. The lambdas inside
  * `transform`/`aggregate` are interpreted (not codegen'd); for
  * hot-path inner products over large tensors prefer the flat
  * encoding + the native kernels in
  * [[graft.expressions.HashExpressions]] (DoubleDot / DoubleL2Squared).
  */
object TensorColumn {

  /** Reshape a flat array into a `rows`×`cols` row-major matrix
    * (2-D tensor encoding). Null when `size(flat) != rows*cols` —
    * a visible failure rather than a silently ragged tensor. */
  def reshape2d(flat: Column, rows: Int, cols: Int): Column =
    when(size(flat) === lit(rows * cols),
      transform(sequence(lit(0), lit(rows - 1)),
        i => slice(flat, i * lit(cols) + lit(1), lit(cols))))

  /** Reshape a flat array into `d0`×`d1`×`d2` (3-D tensor encoding):
    * the outer dimension slices the flat array into `d0` slabs, each
    * reshaped 2-D. Null on size mismatch. */
  def reshape3d(flat: Column, d0: Int, d1: Int, d2: Int): Column =
    when(size(flat) === lit(d0 * d1 * d2),
      transform(sequence(lit(0), lit(d0 - 1)),
        i => transform(sequence(lit(0), lit(d1 - 1)),
          j => slice(flat, i * lit(d1 * d2) + j * lit(d2) + lit(1), lit(d2)))))

  /** Row-major flatten of a 2-D tensor (inverse of [[reshape2d]]). */
  def flatten2d(m: Column): Column = flatten(m)

  /** Row-major flatten of a 3-D tensor (inverse of [[reshape3d]]). */
  def flatten3d(t: Column): Column = flatten(transform(t, flatten(_)))

  /** Shape of a 2-D tensor as `[rows, cols]` (cols read from the first
    * row — the encoding is rectangular by construction). */
  def shape2d(m: Column): Column = array(size(m), size(element_at(m, 1)))

  /** Matrix row `i` (0-based) — the reference's `tensor[i]`. */
  def matrixRow(m: Column, i: Int): Column = element_at(m, i + 1)

  /** Matrix column `j` (0-based) as a flat array. */
  def matrixColumn(m: Column, j: Int): Column =
    transform(m, r => element_at(r, j + 1))

  /** 2-D slice `[r0, r0+rlen) × [c0, c0+clen)` (0-based), the tensor
    * analogue of `tensor[r0:r0+rlen, c0:c0+clen]`. */
  def slice2d(m: Column, r0: Int, rlen: Int, c0: Int, clen: Int): Column =
    transform(slice(m, r0 + 1, rlen), r => slice(r, c0 + 1, clen))

  /** Transpose of a 2-D tensor with `cols` columns (the column count is
    * a plan-time constant — the output's outer dimension). */
  def transpose(m: Column, cols: Int): Column =
    transform(sequence(lit(1), lit(cols)), j => transform(m, r => element_at(r, j)))

  /** Element-wise map over a 2-D tensor. */
  def mapElements(m: Column)(f: Column => Column): Column =
    transform(m, r => transform(r, f))

  /** Sequential left-fold sum of a flat array (deterministic IEEE
    * order: ((0+x0)+x1)+… — matches an oracle that writes the same
    * additions left-to-right). */
  def sumElements(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x.cast("double"))

  /** Row-major sum of every element of a 2-D tensor. */
  def sum2d(m: Column): Column = sumElements(flatten(m))

  /** Row-major sum of every element of a 3-D tensor. */
  def sum3d(t: Column): Column = sumElements(flatten3d(t))
}
