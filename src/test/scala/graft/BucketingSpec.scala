package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Bucketing
import graft.ops.Bucketing.BucketConfig

/** Property-style invariants of the bucket math, from the reference's own
  * asserts (`bucket_manager.py:33-36,126,150-151,200`;
  * `bucketing_to_metadata.py:96-107`). Generated (w,h) pairs are pushed
  * through the real column expressions in one Spark job. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = BucketConfig()
  private val resos = Bucketing.makeBucketResolutions(cfg)

  private val dims: Seq[(Int, Int)] = {
    val gen = for {
      w <- Gen.chooseNum(16, 4096)
      h <- Gen.chooseNum(16, 4096)
    } yield (w, h)
    val sampled = Iterator.continually(gen.sample).flatten.take(300).toSeq
    // edge cases: exact grid reso, square at max, extreme ARs, tiny, huge
    sampled ++ Seq((640, 1024), (1024, 1024), (4096, 64), (64, 4096), (16, 16), (4000, 4000))
  }

  test("native-argmin upscale bucket == builtin HOF spelling, field for field") {
    val df = dims.toDF("w", "h")
      .select(
        Bucketing.selectBucketUpscale(col("w"), col("h"), resos).as("b"),
        Bucketing.selectBucketUpscaleNative(col("w"), col("h"), resos).as("n"))
    assert(df.filter(not(col("b") <=> col("n"))).count() === 0)
  }

  test("M2: reso grid — all step-aligned, within area, both orientations, sorted") {
    assert(resos.nonEmpty)
    resos.foreach { case (w, h) =>
      assert(w % cfg.steps === 0); assert(h % cfg.steps === 0)
      assert(w.toLong * h <= cfg.maxArea)
    }
    assert(resos === resos.sorted)
    assert(resos.toSet.map((p: (Int, Int)) => (p._2, p._1)) === resos.toSet) // orientation closure
  }

  test("M3 upscale path: reso from grid (or exact), resized covers reso on the binding side") {
    val df = dims.toDF("w", "h")
      .withColumn("b", Bucketing.selectBucketUpscale(col("w"), col("h"), resos))
      .select("w", "h", "b.reso_w", "b.reso_h", "b.resized_w", "b.resized_h", "b.ar_error")
    df.collect().foreach { r =>
      val (w, h) = (r.getInt(0), r.getInt(1))
      val (rw, rh) = (r.getInt(2), r.getInt(3))
      val (zw, zh) = (r.getLong(4), r.getLong(5))
      val exact = resos.contains((w, h))
      if (!exact) assert(resos.contains((rw, rh)), s"($w,$h) -> ($rw,$rh) not in grid")
      else assert((rw, rh) === ((w, h)))
      // `bucket_manager.py:200`: resized >= reso (scale picked on binding side)
      assert(zw >= rw - 1 && zh >= rh - 1, s"($w,$h): resized ($zw,$zh) < reso ($rw,$rh)")
      // argmin really is the min |ar error| over the grid
      if (!exact) {
        val ar = w.toDouble / h
        val best = resos.map { case (a, b) => math.abs(a.toDouble / b - ar) }.min
        assert(math.abs(math.abs(r.getDouble(6)) - best) < 1e-12)
      }
    }
  }

  test("M4 no-upscale path: oversized shrink to <= max area, step-aligned bucket") {
    val df = dims.toDF("w", "h")
      .withColumn("b", Bucketing.selectBucketNoUpscale(col("w"), col("h"), cfg))
      .select("w", "h", "b.reso_w", "b.reso_h", "b.resized_w", "b.resized_h")
    df.collect().foreach { r =>
      val (w, h) = (r.getInt(0), r.getInt(1))
      val (bw, bh) = (r.getLong(2), r.getLong(3))
      val (zw, zh) = (r.getLong(4), r.getLong(5))
      assert(bw % cfg.steps === 0 && bh % cfg.steps === 0)
      if (w.toLong * h > cfg.maxArea) {
        // `bucket_manager.py:122`: shrink target respects max area (+rounding slack)
        assert(zw * zh <= cfg.maxArea + cfg.steps * math.max(zw, zh),
          s"($w,$h) resized ($zw,$zh) blows area")
        assert(zw < w || zh < h)
      } else assert((zw, zh) === ((w.toLong, h.toLong)))
    }
  }

  test("M1: roundToSteps is idempotent and step-aligned") {
    val df = dims.map(_._1).toDF("x")
      .select(Bucketing.roundToSteps(col("x"), cfg.steps).as("r"))
      .select(col("r"), Bucketing.roundToSteps(col("r"), cfg.steps).as("rr"))
    df.collect().foreach { r =>
      assert(r.getInt(0) % cfg.steps === 0)
      assert(r.getInt(0) === r.getInt(1))
    }
  }

  test("M5: crop box centered within the bucket") {
    val df = dims.toDF("w", "h")
      .withColumn("b", Bucketing.selectBucketUpscale(col("w"), col("h"), resos))
      .select(col("w"), col("h"), col("b.reso_w").as("bw"), col("b.reso_h").as("bh"))
      .withColumn("c", Bucketing.cropLtrb(col("bw"), col("bh"), col("w"), col("h")))
      .select("bw", "bh", "c.crop_left", "c.crop_top", "c.crop_right", "c.crop_bottom")
    df.collect().foreach { r =>
      val (bw, bh) = (r.getInt(0), r.getInt(1))
      val (l, t, rt, bt) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(l >= 0 && t >= 0 && rt <= bw && bt <= bh, s"crop ($l,$t,$rt,$bt) outside ($bw,$bh)")
      // centered: margins differ by at most floor-rounding + fractional resize (<2px)
      assert(math.abs(l - (bw - rt)) < 2.0 && math.abs(t - (bh - bt)) < 2.0)
    }
  }
}
