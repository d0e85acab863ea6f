package graft

import graft.ops.Packing
import org.apache.spark.sql.Row

/** Unit coverage for the no-split packing strategy (x156): the next-fit
  * recurrence, its group independence, and the distributed secondary-sort
  * scan's equivalence to a plain sequential fold. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("nextFitPack: basic recurrence — close bin when the item doesn't fit") {
    // capacity 10: [4, 5, 2, 9, 1] → bins [0:{4,5}, 1:{2}, 2:{9,1}]
    val df = Seq(("a", 1L, 4L), ("a", 2L, 5L), ("a", 3L, 2L),
      ("a", 4L, 9L), ("a", 5L, 1L)).toDF("g", "o", "n")
    val out = Packing.nextFitPack(df, "g", "o", "n", capacity = 10L)
      .orderBy("o").collect().toSeq
    assert(out == Seq(
      Row("a", 1L, 4L, 0L, 0L),
      Row("a", 2L, 5L, 0L, 4L),
      Row("a", 3L, 2L, 1L, 0L),
      Row("a", 4L, 9L, 2L, 0L),
      Row("a", 5L, 1L, 2L, 9L)))
  }

  test("nextFitPack: oversized item occupies a bin of its own, no truncation") {
    // capacity 10: [3, 25, 4] → the 25 closes bin 0, owns bin 1 (offset
    // 0, exceeds capacity), and the 4 must open bin 2
    val df = Seq(("a", 1L, 3L), ("a", 2L, 25L), ("a", 3L, 4L))
      .toDF("g", "o", "n")
    val out = Packing.nextFitPack(df, "g", "o", "n", capacity = 10L)
      .orderBy("o").collect().toSeq
    assert(out == Seq(
      Row("a", 1L, 3L, 0L, 0L),
      Row("a", 2L, 25L, 1L, 0L),
      Row("a", 3L, 4L, 2L, 0L)))
  }

  test("nextFitPack: groups pack independently (state resets per group)") {
    val df = Seq(("a", 1L, 7L), ("b", 1L, 7L), ("a", 2L, 7L), ("b", 2L, 2L))
      .toDF("g", "o", "n")
    val out = Packing.nextFitPack(df, "g", "o", "n", capacity = 10L)
      .orderBy("g", "o").collect().toSeq
    assert(out == Seq(
      Row("a", 1L, 7L, 0L, 0L),
      Row("a", 2L, 7L, 1L, 0L),
      Row("b", 1L, 7L, 0L, 0L),
      Row("b", 2L, 2L, 0L, 7L)))
  }

  test("nextFitPack: distributed scan ≡ sequential fold, many groups over many partitions") {
    // deterministic pseudo-random sizes; 40 groups × 50 items spread
    // over 16 input partitions in shuffled input order — the secondary
    // sort must reconstruct doc order before the forward pass
    val rows = for (g <- 0 until 40; i <- 0 until 50)
      yield (s"g$g", i.toLong, ((g * 31 + i * 17) % 97 + 1).toLong)
    val shuffled = scala.util.Random.shuffle(rows.toVector)
    val df = spark.createDataset(shuffled).repartition(16)
      .toDF("g", "o", "n")
    val got = Packing.nextFitPack(df, "g", "o", "n", capacity = 128L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    // reference: plain per-group fold
    val exp = rows.groupBy(_._1).flatMap { case (g, items) =>
      var bin = 0L; var fill = 0L
      items.sortBy(_._2).map { case (_, o, n) =>
        if (fill > 0 && fill + n > 128L) { bin += 1; fill = 0L }
        val off = fill; fill += n
        (g, o) -> (bin, off)
      }
    }
    assert(got.size == rows.size)
    assert(got == exp)
  }

  test("bestFitPack: fullest-fitting bin wins; eviction only when the pool is full") {
    // capacity 10, pool 2:
    //   4 → bin0 (fill 4); 5 → best fit is bin0 (4+5=9 ≤ 10) → bin0@4;
    //   8 → fits nothing (bin0 fill 9), pool has room → bin1 (fill 8);
    //   1 → fullest fitting is bin0 (9+1=10) → bin0@9;
    //   7 → fits nothing (10, 8), pool full → evict fullest (bin0) → bin2;
    //   2 → fits bin1 (8+2=10) → bin1@8
    val df = Seq(("a", 1L, 4L), ("a", 2L, 5L), ("a", 3L, 8L),
      ("a", 4L, 1L), ("a", 5L, 7L), ("a", 6L, 2L)).toDF("g", "o", "n")
    val out = Packing.bestFitPack(df, "g", "o", "n", capacity = 10L,
      pool = 2).orderBy("o").collect().toSeq
    assert(out == Seq(
      Row("a", 1L, 4L, 0L, 0L),
      Row("a", 2L, 5L, 0L, 4L),
      Row("a", 3L, 8L, 1L, 0L),
      Row("a", 4L, 1L, 0L, 9L),
      Row("a", 5L, 7L, 2L, 0L),
      Row("a", 6L, 2L, 1L, 8L)))
  }

  test("bestFitPack: fill ties go to the lowest bin id; oversized doc owns a bin") {
    // capacity 12, pool 3: [4, 4, 30, 4] — the two 4s open bins 0 and…
    // no: 4 → bin0(4); 4 → bin0 fits (8) → bin0@4. Use sizes that force
    // two equal-fill bins first: [7, 7, 5, 30]
    //   7 → bin0(7); 7 → no fit (14 > 12) → bin1(7);
    //   5 → BOTH bins at fill 7 fit (12) → tie → bin0@7;
    //   30 oversized → fits nothing, pool has room → bin2(30), offset 0
    val out = Packing.bestFitPack(
      Seq(("a", 1L, 7L), ("a", 2L, 7L), ("a", 3L, 5L), ("a", 4L, 30L))
        .toDF("g", "o", "n"), "g", "o", "n", capacity = 12L, pool = 3)
      .orderBy("o").collect().toSeq
    assert(out == Seq(
      Row("a", 1L, 7L, 0L, 0L),
      Row("a", 2L, 7L, 1L, 0L),
      Row("a", 3L, 5L, 0L, 7L),
      Row("a", 4L, 30L, 2L, 0L)))
  }

  test("bestFitPack with pool=1 IS nextFitPack (law, random corpora)") {
    val rows = for (g <- 0 until 8; i <- 0 until 60)
      yield (s"g$g", i.toLong, ((g * 13 + i * 29) % 40 + 1).toLong)
    val df = spark.createDataset(rows.toVector).repartition(7)
      .toDF("g", "o", "n")
    val nf = Packing.nextFitPack(df, "g", "o", "n", capacity = 64L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    val bf1 = Packing.bestFitPack(df, "g", "o", "n", capacity = 64L,
      pool = 1).collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(bf1 == nf)
  }

  test("bestFitPack: distributed scan ≡ sequential fold; fewer-or-equal bins than next-fit") {
    val rows = for (g <- 0 until 20; i <- 0 until 60)
      yield (s"g$g", i.toLong, ((g * 31 + i * 17) % 97 + 1).toLong)
    val shuffled = scala.util.Random.shuffle(rows.toVector)
    val df = spark.createDataset(shuffled).repartition(16)
      .toDF("g", "o", "n")
    val P = 4
    val C = 128L
    val got = Packing.bestFitPack(df, "g", "o", "n", capacity = C, pool = P)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    // reference: plain per-group fold over the same recurrence
    val exp = rows.groupBy(_._1).flatMap { case (g, items) =>
      var nextB = 0L
      val bins = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      items.sortBy(_._2).map { case (_, o, n) =>
        val fit = bins.zipWithIndex
          .filter { case ((_, f), _) => f + n <= C }
          .sortBy { case ((b, f), _) => (-f, b) }.headOption
        val (bin, off) = fit match {
          case Some(((b, f), i)) => bins(i) = (b, f + n); (b, f)
          case None =>
            if (bins.size == P) {
              val ev = bins.zipWithIndex
                .sortBy { case ((b, f), _) => (-f, b) }.head._2
              bins.remove(ev): Unit
            }
            val b = nextB; nextB += 1; bins.append((b, n)); (b, 0L)
        }
        (g, o) -> (bin, off)
      }
    }
    assert(got.size == rows.size)
    assert(got == exp)
    // utilization: best-fit with a pool never uses MORE bins than
    // next-fit on this corpus (heuristic advantage, pinned empirically)
    val nf = Packing.nextFitPack(df, "g", "o", "n", capacity = C)
      .collect().map(r => (r.getString(0), r.getLong(3))).toSet
    val bfBins = got.toSeq.map { case ((g, _), (b, _)) => (g, b) }.toSet
    assert(bfBins.size <= nf.size,
      s"best-fit used ${bfBins.size} bins vs next-fit's ${nf.size}")
  }

  test("x156: bin fills respect capacity; bins are contiguous; offsets reconstruct") {
    val out = graft.queries.TrainingQueries.defs("x156_nextfit_packing")(
      spark, "/root/testdata/sf0.001")
      .select($"source", $"doc_id", $"n_tokens", $"bin_idx", $"bin_offset")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    out.groupBy(r => (r._1, r._4)).foreach { case ((src, bin), items) =>
      val sorted = items.sortBy(_._2)
      // offsets are the exclusive running sum of sizes within the bin
      var acc = 0L
      sorted.foreach { case (_, _, n, _, off) =>
        assert(off == acc, s"$src bin $bin offset mismatch")
        acc += n
      }
      // fill ≤ capacity unless the bin is a single oversized doc
      assert(acc <= 512L || items.size == 1,
        s"$src bin $bin overfull with ${items.size} docs")
    }
    // bins contiguous from 0 per source
    out.groupBy(_._1).foreach { case (src, items) =>
      val bins = items.map(_._4).distinct.sorted
      assert(bins == (0L until bins.size.toLong), s"$src bins not contiguous")
    }
  }
}
