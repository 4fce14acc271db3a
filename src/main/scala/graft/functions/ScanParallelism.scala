package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Parallelism valve for heavy per-row kernels over small scans
  * (optimization r18, guide §2.5 "input skew"): a fixture-scale
  * parquet table is a single row group, so its scan is ONE task no
  * matter the core count — and a map-heavy kernel above it (CDC
  * boundary walk, winnowing minima) runs sequentially while 31 cores
  * idle (d19b at sf0.1: wall ≈ cpu ≈ 3.5 s). Split-size configs can't
  * help: parquet cannot split inside a row group.
  *
  * [[ensureScanParallelism]] hash-repartitions by the given column to
  * the session's shuffle parallelism ONLY when the frame's planned
  * partition count is below half of it — at corpus scale the scan has
  * ≥ parallelism splits and this is the identity (no exchange is
  * added where the data already feeds the machine). The exchange it
  * adds at fixture scale carries the scan's own bytes once (MBs).
  *
  * Caller contract: the frame must be scan-rooted (scan + projection/
  * filter only, NO exchange below) — the partition-count probe walks
  * `df.rdd`, which finalizes the physical plan and would otherwise
  * trigger upstream stage execution under AQE.
  */
private[graft] object ScanParallelism {
  def ensureScanParallelism(df: DataFrame, keyCol: String): DataFrame = {
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions * 2 >= p) df
    else df.repartition(p, col(keyCol))
  }
}
