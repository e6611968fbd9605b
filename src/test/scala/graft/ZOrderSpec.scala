package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ZOrder

/** Z-order layout: key correctness + the pruning claim measured from the
  * parquet footers themselves — for a 2-D box predicate, the z-ordered
  * layout must leave far fewer row groups whose min/max envelope
  * intersects the box than a single-column sort does (row groups a scan
  * cannot skip). */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zKey: bijective on the grid, interleaves bits as documented") {
    val df = (0 until 64).flatMap(a => (0 until 64).map(b => (a.toLong, b.toLong)))
      .toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zKey(col("a"), col("b"), 6).as("zk"))
    val rows = df.collect()
    // bijective: 4096 distinct keys for 4096 distinct points
    assert(rows.map(_.getLong(2)).distinct.length === 64 * 64)
    // spot values: (1,0)→1, (0,1)→2, (3,5)→bits 1,1 of a at 0,2 + 1,0,1 of b at 1,3,5
    val m = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m((0L, 0L)) === 0L)
    assert(m((1L, 0L)) === 1L)
    assert(m((0L, 1L)) === 2L)
    assert(m((3L, 5L)) === (1L | (1L << 2) | (1L << 1) | (1L << 5)))
  }

  test("zKeyN: 3-D bijective on the grid, bit i of dim d lands at i*k+d") {
    val df = (0 until 16).flatMap(a => (0 until 16).flatMap(b =>
        (0 until 16).map(c => (a.toLong, b.toLong, c.toLong))))
      .toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        ZOrder.zKeyN(Seq(col("a"), col("b"), col("c")), 4).as("zk"))
    val rows = df.collect()
    assert(rows.map(_.getLong(3)).distinct.length === 16 * 16 * 16)
    val m = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(m((0L, 0L, 0L)) === 0L)
    assert(m((1L, 0L, 0L)) === 1L)
    assert(m((0L, 1L, 0L)) === 2L)
    assert(m((0L, 0L, 1L)) === 4L)
    // (5,0,0) = bits 0,2 of dim 0 → z bits 0 and 6
    assert(m((5L, 0L, 0L)) === ((1L << 0) | (1L << 6)))
    // 2-D zKey is exactly the k=2 case
    val two = (0 until 32).flatMap(a => (0 until 32).map(b => (a.toLong, b.toLong)))
      .toDF("a", "b")
      .select(ZOrder.zKey(col("a"), col("b"), 5).as("z2"),
        ZOrder.zKeyN(Seq(col("a"), col("b")), 5).as("zn"))
      .collect()
    assert(two.forall(r => r.getLong(0) === r.getLong(1)))
  }

  /** Row groups whose (user_id, epoch) min/max envelope intersects the
    * box — the groups a stats-pruning scan must read. */
  private def overlapping(dir: String, uLo: Long, uHi: Long,
      tLo: Long, tHi: Long): (Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    var total = 0
    var overlap = 0
    files.foreach { f =>
      val rdr = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try rdr.getFooter.getBlocks.asScala.foreach { blk =>
        total += 1
        def range(name: String): (Long, Long) = {
          val c = blk.getColumns.asScala
            .find(_.getPath.toDotString == name).get.getStatistics
          (c.genericGetMin.asInstanceOf[Number].longValue,
            c.genericGetMax.asInstanceOf[Number].longValue)
        }
        val (uMin, uMax) = range("user_id")
        val (tMin, tMax) = range("epoch")
        if (uMax >= uLo && uMin <= uHi && tMax >= tLo && tMin <= tHi)
          overlap += 1
      } finally rdr.close()
    }
    (total, overlap)
  }

  test("2-D box predicate: z-ordered layout prunes row groups a 1-D sort cannot") {
    val root = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // synthetic 2-D data: 200k events over 1000 users × ~1000 time slots,
    // uncorrelated dimensions (the adversarial case for a 1-D sort)
    val events = spark.range(0, 200000).select(
      pmod(xxhash64(col("id")), lit(1000)).as("user_id"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000)).as("epoch"))
    val rowGroup = 256 * 1024 // small groups → many stats envelopes
    // layout A: sorted by time only (the default "order by ingestion time")
    events.repartitionByRange(4, col("epoch")).sortWithinPartitions(col("epoch"))
      .write.option("parquet.block.size", rowGroup.toString)
      .mode("overwrite").parquet(s"$root/bytime")
    // layout B: z-ordered on (user_id, epoch)
    ZOrder.writeZOrdered(events, s"$root/zorder", "user_id", "epoch",
      bits = 10, partitions = 4, blockSize = rowGroup)
    // two query shapes: a band in the SORTED dimension (the 1-D layout's
    // best case) and a band in the OTHER dimension (its worst case — the
    // user-id filter prunes NOTHING on a time-sorted file). Z-order's
    // value is bounding the worst case across dimensions.
    def frac(p: (Int, Int)): Double = p._2.toDouble / p._1
    val timeBand = (0L, 999L, 200L, 299L) // 10% of time, all users
    val userBand = (100L, 199L, 0L, 999L) // 10% of users, all times
    def run(dir: String, box: (Long, Long, Long, Long)) =
      overlapping(dir, box._1, box._2, box._3, box._4)
    val (tTotal, _) = run(s"$root/bytime", timeBand)
    val (zTotal, _) = run(s"$root/zorder", timeBand)
    assert(tTotal > 10 && zTotal > 10, s"need many row groups: $tTotal / $zTotal")
    val tWorst = math.max(frac(run(s"$root/bytime", timeBand)),
      frac(run(s"$root/bytime", userBand)))
    val zWorst = math.max(frac(run(s"$root/zorder", timeBand)),
      frac(run(s"$root/zorder", userBand)))
    // time-sorted reads ~every group for the user band (worst ≈ 1.0);
    // z-ordered bounds BOTH bands well under half the file
    assert(frac(run(s"$root/bytime", userBand)) > 0.9)
    // ~2× with tolerance: row-group flush points shift slightly with JVM
    // state, and a 16-group file quantizes the fraction to 1/16 steps —
    // the measured worst sits AT 0.5 on some runs (strict < 0.5·tWorst
    // flaked exactly on that boundary)
    assert(zWorst <= 0.55 * tWorst,
      s"z-order worst $zWorst not ~half of 1-D-sort worst $tWorst")
    // and the layouts hold identical data (count + checksum)
    val a = spark.read.parquet(s"$root/bytime")
      .agg(count(lit(1)), sum(col("user_id") * 1000 + col("epoch"))).head()
    val b = spark.read.parquet(s"$root/zorder")
      .agg(count(lit(1)), sum(col("user_id") * 1000 + col("epoch"))).head()
    assert(a === b)
  }

  /** k-D generalization of [[overlapping]]: row groups whose min/max
    * envelope intersects a k-D box (cols zipped with (lo,hi) bounds). */
  private def overlappingN(dir: String,
      box: Seq[(String, (Long, Long))]): (Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    var total = 0
    var overlap = 0
    files.foreach { f =>
      val rdr = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try rdr.getFooter.getBlocks.asScala.foreach { blk =>
        total += 1
        val hit = box.forall { case (name, (lo, hi)) =>
          val c = blk.getColumns.asScala
            .find(_.getPath.toDotString == name).get.getStatistics
          val mn = c.genericGetMin.asInstanceOf[Number].longValue
          val mx = c.genericGetMax.asInstanceOf[Number].longValue
          mx >= lo && mn <= hi
        }
        if (hit) overlap += 1
      } finally rdr.close()
    }
    (total, overlap)
  }

  test("3-D slab predicates: k-D z-order bounds the worst dimension a 1-D sort leaves unpruned") {
    val root = java.nio.file.Files.createTempDirectory("graft_zorder3").toString
    // three UNCORRELATED dimensions, 256 values each — the adversarial
    // case for any single-column sort (its two off-sort dims prune ~0)
    val events = spark.range(0, 200000).select(
      pmod(xxhash64(col("id")), lit(256)).as("user_id"),
      pmod(xxhash64(col("id"), lit(1)), lit(256)).as("epoch"),
      pmod(xxhash64(col("id"), lit(2)), lit(256)).as("domain"))
    val rowGroup = 128 * 1024
    events.repartitionByRange(4, col("epoch")).sortWithinPartitions(col("epoch"))
      .write.option("parquet.block.size", rowGroup.toString)
      .mode("overwrite").parquet(s"$root/bytime")
    ZOrder.writeZOrderedN(events, s"$root/zorder3",
      Seq("user_id", "epoch", "domain"), bits = 8,
      partitions = 4, blockSize = rowGroup)
    val all = (0L, 255L)
    val band = (100L, 125L) // a 10% slab
    val dims = Seq("user_id", "epoch", "domain")
    def slab(d: String): Seq[(String, (Long, Long))] =
      dims.map(c => c -> (if (c == d) band else all))
    def frac(p: (Int, Int)): Double = p._2.toDouble / p._1
    val (tot, _) = overlappingN(s"$root/zorder3", slab("epoch"))
    assert(tot > 10, s"need many row groups to measure pruning: $tot")
    // the 1-D sort's worst case: a slab in EITHER unsorted dim reads
    // essentially the whole file
    val tWorst = dims.map(d => frac(overlappingN(s"$root/bytime", slab(d)))).max
    assert(tWorst > 0.9, s"1-D layout should be unprunable off-sort: $tWorst")
    // 3-D z-order: a z-range row group spans ~f^(1/3) of each dim, so a
    // 10% slab in ANY dim skips a solid majority of groups — weaker than
    // the 2-D bound by geometry (envelopes fatten per extra dim), but
    // bounded in EVERY dimension instead of one
    val zWorst = dims.map(d => frac(overlappingN(s"$root/zorder3", slab(d)))).max
    assert(zWorst <= 0.75 * tWorst,
      s"3-D z-order worst $zWorst not well under 1-D-sort worst $tWorst")
    // identical content
    val a = spark.read.parquet(s"$root/bytime")
      .agg(count(lit(1)),
        sum(col("user_id") * 65536 + col("epoch") * 256 + col("domain"))).head()
    val b = spark.read.parquet(s"$root/zorder3")
      .agg(count(lit(1)),
        sum(col("user_id") * 65536 + col("epoch") * 256 + col("domain"))).head()
    assert(a === b)
  }
}
