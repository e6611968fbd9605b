package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scale-safe GLOBAL ranking (the corpus-wide `dense_rank()`/`row_number()`
  * ledger the suffix-array family is built on).
  *
  * The naive spelling — `dense_rank() OVER (ORDER BY keys)` with no
  * PARTITION BY — collapses the ENTIRE dataset into one task: Spark plans
  * an empty-partitioning window as a single-partition exchange, so at
  * corpus scale the sort that defines the rank runs on one core with the
  * whole 100 TB behind it. (Spark even warns: "No Partition Defined for
  * Window operation".)
  *
  * These spellings are bit-identical to the naive window but every stage
  * is distributed:
  *
  *   1. a Catalyst global sort on the rank keys — a sampled range
  *      exchange whose partitions are ordered, non-overlapping key ranges
  *      balanced by ROW COUNT, however skewed the key VALUES are;
  *   2. `RDD.zipWithIndex` over the sorted stream — Spark core's own
  *      two-phase offset ledger: one lightweight count job over the
  *      sorted shuffle output computes per-partition offsets, then the
  *      attach pass adds `offset + local index` per partition. No
  *      single-partition stage ever sees more than one range partition.
  *
  * zipWithIndex is also what makes the result DETERMINISTIC: the range
  * boundaries are sampled ONCE when the sort's shuffle dependency is
  * instantiated and are then frozen in the RDD DAG that both the count
  * job and the attach pass execute — unlike two DataFrame branches over
  * one `repartitionByRange`, which re-plan (and re-sample, seeded by RDD
  * id) per branch and can disagree on boundaries. (That branch-divergence
  * corrupted an earlier offsets-table spelling of this operator; the
  * single-DAG shape is a correctness requirement, not a style choice.
  * Either way the emitted ranks are boundary-placement-invariant:
  * offset + local index reconstructs the same global order for any
  * placement.)
  *
  * [[denseRank]] must additionally avoid co-locating equal keys (a range
  * sort co-locates them, so a key carrying half the corpus would drag
  * half the rows into one partition). It ranks the DISTINCT key set — one
  * row per key, no heavy key exists by construction — and hash-joins the
  * ranks back onto the full rows: a uniform equi-join on the key itself,
  * broadcast when the key set is small, AQE skew-split otherwise.
  *
  * The RDD hop costs one row-serialization boundary per call; what it
  * buys is one fused sort+count+attach with no materialization barrier,
  * which at both bench and cluster scale beats the
  * checkpoint-the-partition-ids DataFrame spelling by a multiple.
  */
object GlobalRank {

  /** Adds `out` = `row_number() OVER (ORDER BY keys)` (1-based, ascending,
    * nulls first). The key tuple MUST be unique per row (the usual
    * tie-broken `(rank, id)` contract) — uniqueness is what makes the
    * sorted global index a rank without key co-location. */
  def rowNumber(df: DataFrame, keys: Seq[String], out: String): DataFrame =
    rankUnique(df, keys, out)

  /** Adds `out` = `dense_rank() OVER (ORDER BY keys)` (1-based, ascending,
    * nulls first). Keys may repeat arbitrarily — ranking happens on the
    * distinct key set, so a heavy key costs no more than a unique one.
    * Rows are matched back null-safely (a null key value joins its rank
    * like any other value). */
  def denseRank(df: DataFrame, keys: Seq[String], out: String): DataFrame = {
    val taken = (df.columns :+ out).toSet
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").dropWhile(taken.contains).next()
    val renamed = keys.map(k => k -> fresh("gr_" + k))
    val distinctKeys = df.select(keys.map(col): _*).distinct()
    val ranked = renamed.foldLeft(rankUnique(distinctKeys, keys, out)) {
      case (t, (k, a)) => t.withColumnRenamed(k, a)
    }
    val cond = renamed.map { case (k, a) => col(k) <=> col(a) }.reduce(_ && _)
    df.join(ranked, cond).drop(renamed.map(_._2): _*)
  }

  /** Adds `out` = `rank() OVER (ORDER BY keys)` (1-based, ascending,
    * nulls first) — the SPARSE rank: 1 + the number of rows with a
    * strictly smaller key tuple, so tied rows share a rank and the next
    * distinct key jumps by the tie count.
    *
    * ONE Catalyst sort, then the zipWithIndex pattern made group-aware:
    * a stats pass over the sorted shuffle output records, per partition,
    * the row count, the first/last key, and where the last tie group
    * begins; the driver folds those partitions-sized stats into per-
    * partition global offsets plus the rank to CARRY into a partition
    * whose leading rows continue the previous partition's open tie
    * group; the attach pass then ranks each partition in one linear
    * scan. Two narrow passes over one sorted shuffle — no join, no
    * second exchange, and the driver only ever touches O(partitions)
    * metadata.
    *
    * Key skew is handled by SPLITTING tie groups across partitions:
    * Spark's range partitioner maps equal sort keys to one partition
    * (measured: a 50%-heavy key concentrated wholesale), so the sort
    * key gets a unique synthetic tiebreak appended — the partitioner
    * then balances purely by row count, a heavy group spans as many
    * partitions as it needs, and the boundary carry restitches its
    * single rank across all of them. The tiebreak orders nothing
    * observable: ranks depend only on key equality and key order, so
    * the output is deterministic even though the tiebreak isn't.
    *
    * Contract (enforced): key columns must be ATOMIC value types
    * (string/numeric/bool/date/timestamp). Binary, array, map and struct
    * keys are rejected up front — the partition scans and the driver
    * carry fold compare keys with JVM `==` on the externalized values,
    * which for `Array[Byte]`/nested containers is reference equality and
    * would silently rank equal keys as distinct.
    *
    * Contract (documented): the INPUT must be deterministic under
    * recomputation. The stats pass and the attach pass execute the same
    * frozen sort DAG, which normally replays identical shuffle output;
    * but if shuffle files are lost and the upstream plan resamples on
    * recompute (non-deterministic sampling, `repartition` round-robin —
    * the known range-partition hazard), the recomputed partitions can
    * diverge from the frozen offset/carry arrays. For fault-tolerant
    * long runs, checkpoint/persist the input before ranking. */
  def sparseRank(df: DataFrame, keys: Seq[String], out: String,
      tiedOut: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    keys.foreach { k =>
      import org.apache.spark.sql.types._
      val dt = df.schema(k).dataType
      val atomic = dt match {
        case BinaryType | _: ArrayType | _: MapType | _: StructType => false
        case _ => true
      }
      require(atomic, s"sparseRank key '$k' has type ${dt.simpleString}: " +
        "binary/array/map/struct keys compare by reference in the rank " +
        "scans and would be silently mis-ranked; project an atomic key " +
        "(e.g. a hash or hex encoding) first")
    }
    val taken = (df.columns :+ out).toSet ++ tiedOut
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").dropWhile(taken.contains).next()
    val midC = fresh("gr_mid")
    val sorted = df.withColumn(midC, monotonically_increasing_id())
      .orderBy((keys.map(col) :+ col(midC)): _*)
    val schema0 = sorted.schema.add(out, LongType, nullable = false)
    val schema = tiedOut.fold(schema0)(t =>
      schema0.add(t, org.apache.spark.sql.types.BooleanType, nullable = false))
    val keyIdx = keys.map(sorted.schema.fieldIndex)
    val rdd = sorted.rdd
    val stats = rdd.mapPartitionsWithIndex { (pid, it) =>
      var count = 0L
      var firstKey: Seq[Any] = null
      var lastKey: Seq[Any] = null
      var lastGroupStart = 0L
      it.foreach { r =>
        val k = keyIdx.map(r.get)
        if (count == 0L) firstKey = k
        if (lastKey == null || k != lastKey) { lastGroupStart = count; lastKey = k }
        count += 1L
      }
      Iterator.single((pid, count, firstKey, lastKey, lastGroupStart))
    }.collect().sortBy(_._1)
    val nParts = rdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    val carryRank = new Array[Long](nParts)
    val carryKey = new Array[Seq[Any]](nParts)
    // first key of the next non-empty partition — the lookahead for the
    // last row's tie flag
    val nextFirst = new Array[Seq[Any]](nParts)
    var acc = 0L
    var openKey: Seq[Any] = null
    var openRank = 0L
    stats.foreach { case (pid, count, fk, lk, lgs) =>
      offsets(pid) = acc
      if (openKey != null && count > 0L && fk == openKey) {
        carryKey(pid) = openKey; carryRank(pid) = openRank
      }
      if (count > 0L) {
        // in sorted order lk == openKey forces the whole partition to be
        // the continuing group (fk == lk == openKey, lgs == 0)
        if (!(carryKey(pid) != null && lk == openKey && lgs == 0L)) {
          openKey = lk; openRank = acc + lgs + 1L
        }
        acc += count
      }
    }
    var nf: Seq[Any] = null
    stats.reverseIterator.foreach { case (pid, count, fk, _, _) =>
      nextFirst(pid) = nf
      if (count > 0L) nf = fk
    }
    val bc = spark.sparkContext.broadcast((offsets, carryRank, carryKey, nextFirst))
    val withTied = tiedOut.isDefined
    val ranked = rdd.mapPartitionsWithIndex { (pid, rawIt) =>
      val (offs, cR, cK, nFirst) = bc.value
      val it = rawIt.buffered
      var local = 0L
      var curKey: Seq[Any] = cK(pid)
      var curRank: Long = cR(pid)
      it.map { r =>
        val k = keyIdx.map(r.get)
        val continues = curKey != null && k == curKey
        if (!continues) { curKey = k; curRank = offs(pid) + local + 1L }
        local += 1L
        if (withTied) {
          val nextKey =
            if (it.hasNext) keyIdx.map(it.head.get) else nFirst(pid)
          val tied = continues || (nextKey != null && k == nextKey)
          Row.fromSeq(r.toSeq :+ curRank :+ tied)
        } else Row.fromSeq(r.toSeq :+ curRank)
      }
    }
    spark.createDataFrame(ranked, schema).drop(midC)
  }

  /** Global row_number for rows whose `keys` tuple is unique: Catalyst
    * sort → one zipWithIndex over the sorted shuffle output. */
  private def rankUnique(df: DataFrame, keys: Seq[String],
      out: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(keys.map(col): _*)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }
}
