package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}

/** Range-clustered parquet layout — the write-side half of data skipping.
  *
  * `repartitionByRange` on the cluster keys gives each output file a narrow,
  * (almost) non-overlapping key range; `sortWithinPartitions` then orders
  * rows inside the file so parquet row-group stats are tight too. A reader
  * filtering on the key prunes whole files/row groups via min/max stats
  * instead of scanning — at 100 TB the difference between touching one file
  * and touching ten thousand.
  *
  * "Almost": range partitioning may split a run of EQUAL key values across
  * two adjacent partitions, so consecutive files can share exactly one
  * boundary value — file ranges satisfy max(file_i) <= min(file_i+1), not
  * strict disjointness. LayoutSpec asserts exactly that contract plus
  * filter-correctness over the clustered copy.
  *
  * Range boundaries come from a sampled sketch of the data (Spark's range
  * partitioner), so file sizes stay balanced under skew without a manual
  * histogram. For multi-dimensional skipping (two uncorrelated predicates)
  * the 1-D sort generalizes to a space-filling curve over the key tuple —
  * out of scope here; the single-key form covers the corpus's
  * Ingestion_date/orderdate access patterns.
  */
object ClusteredWrite {

  def writeClustered(df: DataFrame, keys: Seq[Column], path: String,
                     numFiles: Int): Unit =
    df.repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(path)
}
