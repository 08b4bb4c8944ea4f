package graft.queries

import graft.SparkSuite

/** ANN quality: the IVF scale path (q39) must recover most of the exact
  * top-k (q36) — measured, not assumed. */
class VectorsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("q39 IVF top-k recall vs exact q36 holds the 0.65 pin at nProbe=4/16") {
    val exact = Vectors.q36CosineTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Vectors.q39AnnIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(exact.nonEmpty)
    val recall = (exact intersect approx).size.toDouble / exact.size
    // random 64-d embeddings are a worst case for IVF (no cluster
    // structure); 4/16 buckets ≈ 25% of the corpus scanned, and measured
    // recall is ~0.68 after the Lloyd refinement (0.58 with raw first-16
    // seeds) — well above the 0.25 scanned-fraction baseline, which is
    // what proves the bucketing correlates with similarity. The whole
    // pipeline is deterministic (fixed seeds, deterministic tiebreaks),
    // so measured recall is a constant 0.68 on this corpus — the 0.65
    // floor is a REGRESSION PIN: perf work on q39 must not silently
    // trade recall back (r4 verdict item 7).
    info(s"IVF recall at nProbe=4/16: $recall")
    assert(recall >= 0.65, s"IVF recall $recall regressed below the 0.65 pin")
    // every approximate neighbor must carry the true cosine (exact
    // verification discipline: sims match the brute-force values)
    val exactSims = Vectors.q36CosineTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    Vectors.q39AnnIvf(spark, sf).collect().foreach { r =>
      val k = (r.getLong(0), r.getLong(2))
      exactSims.get(k).foreach(s => assert(s == r.getDouble(3)))
    }
  }

  test("q49 LSH top-k recall vs exact q36 beats the scanned-fraction baseline") {
    val exact = Vectors.q36CosineTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Vectors.q49AnnLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(approx.nonEmpty)
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(s"LSH recall at 9/256 buckets probed: $recall")
    // 9 of 256 buckets ≈ 3.5% of a uniformly-bucketed corpus — any recall
    // well above that proves the signatures correlate with cosine. The
    // signatures are deterministic (splitmix64 hyperplanes), so measured
    // recall is a constant 0.20 on this corpus — the 0.15 floor is a
    // REGRESSION PIN (r4 verdict item 7).
    assert(recall >= 0.15, s"LSH recall $recall regressed below the 0.15 pin")
    // exact-verification discipline: reported sims are true cosines
    val exactSims = Vectors.q36CosineTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    Vectors.q49AnnLsh(spark, sf).collect().foreach { r =>
      val k = (r.getLong(0), r.getLong(2))
      exactSims.get(k).foreach(s => assert(s == r.getDouble(3)))
    }
  }

  test("q37 near-dup pairs are symmetric-free and thresholded") {
    val rows = Vectors.q37CosineNearDup(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4)
    }
  }

  test("q95 label outliers match a by-hand centroid-distance recompute") {
    val rows = Vectors.q95LabelOutliers(spark, sf).collect()
    val e = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    assert(rows.length == e.length)
    // float-cast centroids per label (same absorption as the engine)
    val cents = e.groupBy(_._2).view.mapValues { vs =>
      val dims = vs.head._3.length
      Array.tabulate(dims)(i => (vs.map(_._3(i).toDouble).sum / vs.length).toFloat)
    }.toMap
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    val d2ById = e.map { case (id, lab, v) =>
      val c = cents(lab)
      id -> (dot(v, v) - 2.0 * dot(v, c) + dot(c, c))
    }.toMap
    rows.foreach { r =>
      val (id, d2) = (r.getLong(0), r.getDouble(2))
      // same fold; the float-cast centroid absorbs summation-order LSB
      // drift to ~1 ulp, so distances agree far tighter than any bug
      assert(math.abs(d2 - d2ById(id)) <= 1e-4, s"vec $id d2 $d2 vs ${d2ById(id)}")
      assert(d2 >= -1e-9, s"vec $id negative distance")
      assert(r.getBoolean(4) == (d2 > 1.05 * r.getDouble(3)), s"vec $id flag")
    }
    // the threshold must split the corpus (else the audit is vacuous)
    assert(rows.exists(_.getBoolean(4)) && rows.exists(!_.getBoolean(4)))
  }

  test("q98 k-means matches a by-hand Lloyd run and descends monotonically") {
    val rows = Vectors.q98Kmeans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val e = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    def d2(x: Array[Float], c: Array[Float]): Double =
      dot(x, x) - 2.0 * dot(x, c) + dot(c, c)
    def assign(cents: Map[Long, Array[Float]]) = e.map { case (id, v) =>
      val (cid, dd) = cents.toSeq
        .map { case (c, cv) => (c, d2(v, cv)) }
        .minBy { case (c, dd) => (dd, c) }
      (id, cid, dd)
    }
    def means(a: Array[(Long, Long, Double)]) = {
      val byId = e.toMap
      a.groupBy(_._2).view.mapValues { members =>
        val vs = members.map(m => byId(m._1))
        Array.tabulate(vs.head.length)(i =>
          (vs.map(_(i).toDouble).sum / vs.length).toFloat)
      }.toMap
    }
    val seeds = e.filter(_._1 < 16).map { case (id, v) => id -> v }.toMap
    val a0 = assign(seeds)
    val a1 = assign(means(a0))
    val a2 = assign(means(a1))
    val expect = a2.map(t => t._1 -> t).toMap
    assert(rows.length == e.length)
    rows.foreach { case (id, cluster, dd) =>
      assert(cluster == expect(id)._2, s"vec $id cluster")
      // float-cast centroids bound cross-impl drift to ~1 ulp of c
      assert(math.abs(dd - expect(id)._3) <= 1e-4, s"vec $id d2")
    }
    // Lloyd's monotone descent: each refinement round lowers (or holds)
    // the total within-cluster squared distance
    val s0 = a0.map(_._3).sum
    val s1 = a1.map(_._3).sum
    val s2 = a2.map(_._3).sum
    assert(s1 <= s0 + 1e-6 && s2 <= s1 + 1e-6, s"descent $s0 -> $s1 -> $s2")
    // the refinement must actually move something at this SF
    assert(s2 < s0)
    assert(rows.map(_._2).distinct.length > 1)
  }

  test("q59 quantization error respects the analytic half-step bound") {
    val rows = Vectors.q59QuantizeAudit(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (vmin, vmax, mae) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(vmax >= vmin)
      // round-to-nearest affine int8: per-element error <= scale/2
      val halfStep = (vmax - vmin) / 255.0 / 2.0
      assert(mae >= 0.0 && mae <= halfStep * 1.0000001,
        s"mae $mae exceeds half-step $halfStep")
    }
    // quantization is lossy on real vectors — error is not identically 0
    assert(rows.exists(_.getDouble(3) > 0.0))
  }

  test("q61 semantic dedup matches a brute-force in-bucket reference") {
    val sfLocal = "/root/testdata/sf0.01" // sf with known in-bucket dups
    val rows = Vectors.q61SemanticDedup(spark, sfLocal).collect()
    val e = graft.Tables.embeddings(spark, sfLocal)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    def bucket(v: Array[Float]): Long =
      (0 until 8).map(b => if (v(b) > 0f) 1L << b else 0L).sum
    def dot(x: Array[Float], y: Array[Float]): Double =
      x.indices.foldLeft(0.0)((acc, i) => acc + x(i).toDouble * y(i).toDouble)
    def cos(x: Array[Float], y: Array[Float]): Double =
      dot(x, y) / (math.sqrt(dot(x, x)) * math.sqrt(dot(y, y)))
    val dups = (for {
      (ib, vb) <- e; (ia, va) <- e
      if ia < ib && bucket(va) == bucket(vb) && cos(va, vb) >= 0.4
    } yield ib).toSet
    assert(dups.nonEmpty, "corpus has no in-bucket dups; assertion vacuous")
    assert(rows.map(_.getLong(0)).toSeq == e.map(_._1).filterNot(dups).toSeq)
    val byId = e.toMap
    rows.foreach(r => assert(r.getLong(1) == bucket(byId(r.getLong(0)))))
  }
}
