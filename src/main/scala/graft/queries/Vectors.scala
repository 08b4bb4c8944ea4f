package graft.queries

import graft.Tables._
import graft.functions.GraftFunctions.{dot => dot_f}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (Array[Float] column) —
  * the ANN surface of the training-data pipeline (BASELINE.json north
  * star).
  *
  * Dot products use the native codegen expression
  * `graft.functions.DotProductF` (a primitive loop spliced into
  * whole-stage codegen — no UDF boxing, no interpreted HOF fold). It is
  * the same left-to-right double fold as the DuckDB oracle's explicit
  * list_reduce, so values are bit-identical and top-k ranking /
  * threshold comparisons are deterministic across engines.
  *
  * Scale notes (100 TB design):
  *   - norms are hoisted to a per-vector column BEFORE any pairwise join
  *     (recomputing both norms per pair triples the work at N² pairs);
  *     the repartition barrier stops Catalyst from collapsing the
  *     projection and re-evaluating the kernel inside the join;
  *   - q36 broadcasts the (small) query set against a single scan of the
  *     corpus — the canonical brute-force ANN baseline: no shuffle of the
  *     big side;
  *   - q39 is the scale path: IVF-style partition pruning — vectors are
  *     bucketed by nearest centroid once, queries probe only nProbe
  *     buckets, so per-query work drops from O(N) to O(N·nProbe/K).
  *     Recall vs exact is measured in VectorsSpec.
  */
object Vectors {

  private def withNorm(df: DataFrame, vec: String, out: String): DataFrame =
    // partition count pinned (REPARTITION_BY_NUM): AQE sizes by shuffle
    // bytes and would coalesce this ~20 MB table to 2-3 partitions —
    // every downstream dot-product scan (q36/q39/q49 kernels, the
    // queries' dominant CPU) inherits its width from this cached layout
    df.withColumn(out, sqrt(dot_f(col(vec), col(vec))))
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
        col("vec_id"))

  /** The normed corpus every ANN query starts from. Persisted: q36 reads
    * it twice (query + corpus side), q39 four times (seeds, two
    * assignment passes, probes), q49 twice — and CacheManager shares the
    * one materialization ACROSS the ANN queries in a session (the
    * vector-index build you'd do once at cluster scale). ~20 bytes/dim
    * per vector, MEMORY_AND_DISK so a 100× corpus spills, not OOMs. */
  private def embNormed(s: SparkSession, d: String): DataFrame =
    withNorm(embeddings(s, d), "embedding", "nv")
      .transform(graft.CacheRegistry.trackPersist(_))

  /** q36: brute-force cosine top-k (k=5) for every 50th vector as query. */
  def q36CosineTopk(s: SparkSession, d: String): DataFrame = {
    val e = embNormed(s, d)
    val queries = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("nv").as("nq"))
    val scored = e.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", dot_f(col("qv"), col("embedding")) / (col("nq") * col("nv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Left-to-right double dot fold — same order as the DuckDB oracle's
    * explicit list_reduce, so sims are bit-identical across engines.
    * (IEEE multiply is commutative, so dot(a,b) ≡ dot(b,a) bit-for-bit
    * and block-pair orientation does not matter.) */
  private def dotD(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  /** Per-task memory cap for the q37 all-pairs scan: one block is at most
    * this many vectors (64-dim float + ids ≈ 0.5 KB each → ≈ 32 MB
    * materialized per task). */
  private val PairBlockCap = 65536L

  /** Blocks for the q37 all-pairs scan, derived from the corpus size (one
    * cheap count-only scan at plan time) so per-task memory stays bounded
    * by [[PairBlockCap]] as the corpus grows: B = ⌈N / cap⌉, block size
    * N/B ≤ cap. Each vector is replicated to (B+1)/2 block pairs per
    * side — that O(N·B) shuffle is the inherent cost of an exact N²/2
    * scan (the ANN escape hatches at scale are q39/q49). Output is
    * invariant to B: every unordered pair is scored exactly once with the
    * same bit-identical fold. */
  private def pairBlocks(n: Long): Int =
    math.max(8L, (n + PairBlockCap - 1) / PairBlockCap).toInt

  /** q37: embedding near-duplicate pairs — cosine ≥ 0.4, exact, all
    * N²/2 pairs.
    *
    * Block-partitioned pair join: every vector is assigned to block
    * b = id mod B, each unordered block pair (i ≤ j) becomes one cogroup
    * key, and a vector is replicated to the pairs its block participates
    * in (left copy to (b, j≥b), right copy to (i≤b, b)) — so each
    * unordered vector pair is scored exactly once, on the cluster, with
    * per-task memory bounded by one block. Nothing is collected to the
    * driver and no side is broadcast: this is the shape that survives a
    * 100× corpus (the N²/2 work is inherent to an exact scan; the ANN
    * path for scale is q39).
    *
    * The per-pair kernel stays the tight primitive loop (a declarative
    * broadcast NLJ measured ~13 µs/pair in row + boxing overhead); the
    * dot is the same left-to-right double fold as the oracle, so values
    * are bit-identical. */
  def q37CosineNearDup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // null and EMPTY embeddings carry no geometry: a null would NPE the
    // kernel where the oracle's NULL cosine just fails its predicate,
    // and a zero-length vector is dimension-corrupt (the fixed-width
    // fold indexes the other side's length — ragged input is
    // out-of-contract). Both are dropped HERE and in the oracle's WHERE
    // (mirrored guards, the engine's standing rule), so the two engines
    // agree row-for-row instead of each failing its own way.
    val e = embeddings(s, d)
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    // count-only scan (no embedding column read) to size the blocks
    val nB = pairBlocks(e.count())
    // Long block-pair keys: b*nB+j in Int wraps once nB > ~46k
    // (N ≳ 3e9 vectors) — exactly the corpus size the docstring
    // advertises; at Long it holds to nB = 3e9 blocks
    val nBL = nB.toLong
    val left = e.flatMap { case (id, v) =>
      val b = (id % nB).toInt
      (b until nB).map(j => (b * nBL + j, id, v))
    }
    val right = e.flatMap { case (id, v) =>
      val b = (id % nB).toInt
      (0 to b).map(i => (i * nBL + b, id, v))
    }
    left.groupByKey(_._1).cogroup(right.groupByKey(_._1)) { (key, la, ra) =>
      val diagonal = key / nBL == key % nBL // same block on both sides
      val rb = ra.map { case (_, id, v) => (id, v, math.sqrt(dotD(v, v))) }.toArray
      la.flatMap { case (_, idA, va) =>
        val na = math.sqrt(dotD(va, va))
        rb.iterator
          .filter(t => !diagonal || t._1 > idA) // diagonal: dedup + no self
          .map { case (idB, vb, nb) =>
            val sim = dotD(va, vb) / (na * nb)
            if (idA < idB) (idA, idB, sim) else (idB, idA, sim)
          }
          // !(sim < 0.4), not sim >= 0.4: keeps NaN (zero-norm vectors),
          // matching BOTH the DuckDB oracle's total order (NaN > all) and
          // Spark SQL's nanSafeCompare that q61's identical threshold
          // uses — a Scala primitive >= would silently drop those pairs
          // on one engine only
          .filter(t => !(t._3 < 0.4))
      }
    }.toDF("id_a", "id_b", "sim")
      .orderBy(col("id_a"), col("id_b"))
  }

  /** q39: IVF-bucketed approximate top-k — the scale path. Centroid
    * construction is the standard IVF training loop, deterministic and
    * cluster-sized: seed with the first 16 vectors, then one Lloyd
    * refinement — assign every vector to its nearest seed (broadcast
    * centroids, one corpus scan) and recompute each centroid as the
    * element-wise mean of its bucket. The mean runs as a
    * (bucket, dimension) partial aggregate: 16 × 64 groups, so map-side
    * combine collapses the shuffle to ~1k rows regardless of corpus
    * size. Every vector is then bucketed by nearest refined centroid; a
    * query probes only its 4 nearest buckets. Output is rows-only
    * checked (approximate by construction); recall vs exact q36 is
    * measured in VectorsSpec. */
  def q39AnnIvf(s: SparkSession, d: String): DataFrame = {
    val e = embNormed(s, d)
    val seeds = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"), col("nv").as("nc"))
    // argmax as a K-column conditional aggregation (r15, the q98
    // treatment): ONE codegen'd HashAggregate computes max(csim) per
    // centroid id via 16 `max(when(c_id = i, csim))` columns — the id
    // domain is static (seeds are `vec_id < 16`) — and a projection
    // takes the greatest with first-match-ascending tie-break, exactly
    // max_by's struct(csim, -c_id) order (highest sim, then LOWEST
    // centroid id). max_by itself planned as SortAggregate (struct
    // buffer → not UnsafeRow-mutable), whose per-row update is an
    // interpreted MutableProjection. embedding/nv ride through as
    // grouping KEYS (unique per vec_id, groups unchanged; keys may be
    // variable-width, only the buffer may not). NaN csims (zero-norm
    // vectors) keep their max_by behavior: Spark's max/greatest order
    // NaN above all and its double equality is NaN-safe, so the
    // first-match still lands on the lowest surviving id. ONE shape for
    // both the seed and the refined pass — structurally identical
    // generated code, so the second pass reuses the first's compiled
    // stage instead of paying Janino again.
    def assign(cents: DataFrame): DataFrame = {
      val maxs = (0 until 16).map(i =>
        max(when(col("c_id") === i, col("csim"))).as(s"_s$i"))
      val agg = e.crossJoin(broadcast(cents))
        .withColumn("csim",
          dot_f(col("cv"), col("embedding")) / (col("nc") * col("nv")))
        .groupBy(col("vec_id"), col("embedding"), col("nv"))
        .agg(maxs.head, maxs.tail: _*)
      val bucket = (0 until 16).foldRight(lit(null).cast("long")) {
        (i, rest) => when(col(s"_s$i") === col("_smax"), lit(i.toLong))
          .otherwise(rest)
      }
      agg.withColumn("_smax",
          greatest((0 until 16).map(i => col(s"_s$i")): _*))
        .withColumn("bucket", bucket)
        .select(col("vec_id"), col("embedding"), col("nv"), col("bucket"))
    }
    val refined = assign(seeds)
      .select(col("bucket").as("c_id"), col("embedding"))
      .select(col("c_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("c_id"), col("pos"))
      .agg(avg(col("v")).as("m"))
      .groupBy(col("c_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("c_id"),
        expr("transform(pm, x -> CAST(x.m AS FLOAT))").as("cv"))
    // 16 rows, but each broadcast consumer would otherwise re-run the
    // whole training pass (corpus × seeds assignment + mean) behind it —
    // persist makes "train once, probe twice" literal in the plan.
    // (norm inline, NOT via withNorm: its repartition barrier is for
    // corpus-sized frames and would add a useless 16-row exchange)
    val centroids = refined
      .withColumn("nc", sqrt(dot_f(col("cv"), col("cv"))))
      .transform(graft.CacheRegistry.trackPersist(_))
    def csim = dot_f(col("cv"), col("embedding")) / (col("nc") * col("nv"))
    // Probe selection: filter FIRST (the 2% query slice), then a tiny
    // queries × 16 crossJoin — not a corpus-wide third pass. probes is
    // ~4·N/50 rows and broadcasts below.
    val probes = e.filter(col("vec_id") % 50 === 0)
      .crossJoin(broadcast(centroids))
      .withColumn("csim", csim)
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("c_id"))))
      .filter(col("pr") <= 4) // nProbe = 4
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nv").as("nq"), col("c_id").as("probe_bucket"))
    // The built index: nearest REFINED centroid per vector — the second
    // (and last) full corpus × 16 pass, same compiled stage as the seed
    // pass. NOT persisted: it is consumed exactly once, by the candidate
    // scan below, and caching a corpus-wide array column costs more than
    // its single compute.
    val assigned = assign(centroids)
    // broadcast the small probe side: the corpus-side index never
    // shuffles (a hash join keyed on 16 distinct buckets would be the
    // worst possible exchange — every row into 16 skewed partitions)
    val scored = assigned.join(broadcast(probes),
        col("probe_bucket") === col("bucket") && col("query_id") =!= col("vec_id"))
      .withColumn("sim", dot_f(col("qv"), col("embedding")) / (col("nq") * col("nv")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id")))
        .cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** SRP hyperplane weights / bit width: the native kernel
    * (functions/VectorExpressions.scala, [[graft.functions.SrpKernel]])
    * owns the splitmix64 arithmetic; the DuckDB oracle embeds the same
    * weights as shortest-roundtrip literals via [[SrpKernel.mix64]]. */
  private def mix64(z0: Long): Long = graft.functions.SrpKernel.mix64(z0)
  private val SrpBits = graft.functions.SrpKernel.SrpBits

  /** q49: LSH-bucketed approximate top-k — the OTHER scale path next to
    * IVF (q39): 8-bit SRP signatures (bit b = sign(w_b · v) with
    * deterministic splitmix64 hyperplanes; Charikar'02 — cosine-similar
    * vectors agree per bit with probability 1 − θ/π) bucket the corpus
    * (256 buckets, one shuffle on the signature, no broadcast of the
    * corpus, no centroid training pass), and each query multi-probes its
    * own bucket plus the 8 Hamming-1 neighbors. The signature runs as
    * the native codegen'd [[graft.functions.SrpSig]] expression; exact
    * cosine (same bit-identical dot fold) ranks the candidates, so every
    * reported sim is the true value. Oracle restates the algorithm with
    * the same literal weights; recall vs exact q36 is pinned in
    * VectorsSpec. */
  def q49AnnLsh(s: SparkSession, d: String): DataFrame = {
    val e = embNormed(s, d)
      .withColumn("sig", graft.functions.GraftFunctions.srpSig(col("embedding")))
    val probeList = (0 until SrpBits)
      .map(b => s"int(sig ^ ${1 << b})").mkString("array(sig, ", ", ", ")")
    val queries = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nv").as("nq"), explode(expr(probeList)).as("probe"))
    val scored = queries.join(
        e.select(col("vec_id"), col("embedding"), col("nv"), col("sig")),
        col("probe") === col("sig") && col("query_id") =!= col("vec_id"))
      .withColumn("sim", dot_f(col("qv"), col("embedding")) / (col("nq") * col("nv")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id")))
        .cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  final case class QuantRow(vmin: Double, vmax: Double, mae: Double)

  /** Per-vector int8 quantization stats: min/max range, and the mean
    * absolute reconstruction error of round-to-nearest affine int8
    * codes (code = ⌊(x−min)/scale + 0.5⌋ clamped to [0,255],
    * scale = range/255). One pass, left-to-right fold — the oracle
    * mirrors the exact expression tree so doubles are bit-identical. */
  private val quantStats = udf { (v: Seq[Float]) =>
    // null AND empty both yield a null struct — the oracle mirrors the
    // empty case explicitly (len(embedding) = 0 THEN NULL; DuckDB's
    // list_min/list_max of [] are already NULL), else its ELSE branch
    // would compute 0/0 where this side returns NULL
    if (v == null || v.isEmpty) None
    else {
      var mn = v(0); var mx = v(0)
      var i = 1
      while (i < v.length) {
        if (v(i) < mn) mn = v(i)
        if (v(i) > mx) mx = v(i)
        i += 1
      }
      val mnD = mn.toDouble; val mxD = mx.toDouble
      val mae =
        if (mxD == mnD) 0.0
        else {
          val scale = (mxD - mnD) / 255.0
          var acc = 0.0
          i = 0
          while (i < v.length) {
            val x = v(i).toDouble
            val code = math.min(255.0,
              math.max(0.0, math.floor((x - mnD) / scale + 0.5)))
            acc += math.abs(x - (mnD + code * scale))
            i += 1
          }
          acc / v.length
        }
      Some(QuantRow(mnD, mxD, mae))
    }
  }

  /** q59: embedding int8 quantization audit — the storage-compression
    * op for embedding corpora (4× smaller than fp32): per-vector affine
    * int8 codes and their reconstruction error, the report you run
    * before switching an ANN index to quantized storage.
    *
    * 100 TB shape: pure per-row map work, no shuffle; the quantized
    * corpus inherits the same bucketing as the source (q39/q49 run
    * unchanged over codes + scale/offset columns). */
  def q59QuantizeAudit(s: SparkSession, d: String): DataFrame = {
    val q = quantStats(col("embedding"))
    embeddings(s, d).select(col("vec_id"),
        q("vmin").as("vmin"), q("vmax").as("vmax"), q("mae").as("mae"))
      .orderBy(col("vec_id"))
  }

  private val SemBits = 8

  /** q61: SemDeDup-shaped semantic dedup — cluster the embedding space,
    * then near-dedup only WITHIN clusters (Abbas et al. 2023's recipe
    * for embedding-level corpus dedup). Cluster = an 8-bit sign bucket
    * over the first `SemBits` dimensions: axis-aligned random-projection
    * LSH (coordinate hyperplanes). Unlike the k-means clustering of q39,
    * the bucket function is one CASE chain of float sign tests — ANSI-SQL
    * expressible — so this operator is oracle-checked end to end where
    * published SemDeDup pipelines are eyeballed. Within a bucket a vector
    * is a duplicate iff some SMALLER vec_id there has cosine ≥ 0.4 with
    * it (keep-first, the q42 rule); survivors ship.
    *
    * 100 TB shape: ONE shuffle, on the bucket id; pairwise work drops
    * from N² to Σ n_k² ≈ N²/K — the whole point of SemDeDup. K grows
    * with the corpus by adding sign bits, and a skewed bucket splits by
    * salting the pair join (ops/Skew toolbox). The cosine is the same
    * codegen left-to-right fold as q36/q37 (bit-identical to the
    * oracle's list_reduce), so the ≥-threshold decision is deterministic
    * across engines. */
  /** Shared by q61/q79: the axis-aligned SRP sign bucket (bit b set iff
    * embedding[b] > 0) — ONE definition, because both DuckDB oracles
    * mirror this expression literally and an edit to one copy but not
    * the other would break exactly one query's parity. */
  private def signBucket: org.apache.spark.sql.Column = (0 until SemBits)
    .map(b => when(col("embedding").getItem(b) > 0f, lit(1L << b)).otherwise(lit(0L)))
    .reduce(_ + _)

  def q61SemanticDedup(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("bucket", signBucket)
      .withColumn("nv", sqrt(dot_f(col("embedding"), col("embedding"))))
    val a = e.select(col("bucket"), col("vec_id").as("id_a"),
      col("embedding").as("va"), col("nv").as("na"))
    val b = e.select(col("bucket"), col("vec_id").as("id_b"),
      col("embedding").as("vb"), col("nv").as("nb"))
    val dups = a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .filter(dot_f(col("va"), col("vb")) / (col("na") * col("nb")) >= 0.4)
      .select(col("id_b").as("vec_id")).distinct()
    e.join(dups, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("bucket"), col("label"))
      .orderBy(col("vec_id"))
  }

  /** q79: SEMANTIC decontamination — flag corpus embeddings too close
    * to a held-out benchmark slice (vec_id % 41, the embedding twin of
    * q51's n-gram slice). Completes the leakage-detection matrix:
    * q51/q60 catch verbatim/near-verbatim contamination by n-gram
    * overlap; this catches PARAPHRASED contamination n-grams cannot
    * see. Same axis-aligned sign-bucket blocking as q61 (benchmark ×
    * corpus within a bucket only — SQL-expressible, so the oracle is
    * exact including the blocking's recall cut); at scale the
    * benchmark side is MBs and broadcasts, the corpus side never
    * self-joins. */
  def q79SemanticDecon(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
      .withColumn("bucket", signBucket)
      .withColumn("nv", sqrt(dot_f(col("embedding"), col("embedding"))))
    val bench = e.filter(col("vec_id") % 41 === 0)
      .select(col("bucket"), col("vec_id").as("bench_id"),
        col("embedding").as("vb"), col("nv").as("nb"))
    val corpus = e.filter(col("vec_id") % 41 =!= 0)
      .select(col("bucket"), col("vec_id"),
        col("embedding").as("va"), col("nv").as("na"))
    corpus.join(bench, Seq("bucket"))
      .withColumn("sim", dot_f(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("sim") >= 0.3)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_benchmark_hits"), max(col("sim")).as("max_sim"))
      .orderBy(col("vec_id"))
  }

  /** q95: noisy-label / embedding-outlier audit — squared euclidean
    * distance of every vector to its LABEL-GROUP centroid, flagged
    * where the distance exceeds 1.05× the group mean. The
    * label-consistency check a curation pipeline runs before training
    * on weakly-labeled data (a vector far from its own class centroid
    * is a mislabel or an encoder artifact).
    *
    * Determinism: centroids are per-(label, dim) double means CAST TO
    * FLOAT (the q39 trick — the float cast absorbs summation-order LSB
    * drift in both engines); d2 then comes from three [[dot_f]] folds
    * (d2 = x·x − 2·x·c + c·c, bit-identical to the oracle's
    * list_reduce); the per-label mean of d2 gets the same float
    * absorption before the threshold compare.
    *
    * 100 TB shape: centroid build is two partial-aggregable hash-aggs
    * keyed (label, dim) — vocabulary-sized output; the centroid and
    * per-label-stat tables BROADCAST back onto corpus scans; no
    * corpus-sized shuffle at any point (the output sort is the
    * driver-gate convention, not part of the operator). The corpus is
    * SCANNED three times (centroid build, per-label d2 stats, per-row
    * verdict) and the d2 subtree recomputes rather than persist:
    * caching a corpus-sized intermediate is the thing that does NOT
    * survive 100 TB, while scans parallelize perfectly — the analytic
    * shortcut (avg d2 from sufficient statistics) would cut one pass
    * but re-rounds differently and breaks the bit-pinned oracle. */
  def q95LabelOutliers(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val cent = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v")).as("m"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label"), expr("transform(pm, x -> CAST(x.m AS FLOAT))").as("cv"))
      // cc = cv·cv hoisted to the per-label table (r15, the q98
      // treatment): the fold ran once per corpus ROW for a value that
      // only depends on the label; same kernel, same floats, d2
      // bit-identical
      .withColumn("cc", dot_f(col("cv"), col("cv")))
    val j = e.join(broadcast(cent), Seq("label"))
      .withColumn("d2",
        dot_f(col("embedding"), col("embedding"))
          - lit(2.0) * dot_f(col("embedding"), col("cv"))
          + col("cc"))
      .select(col("vec_id"), col("label"), col("d2"))
    val st = j.groupBy(col("label"))
      .agg(avg(col("d2")).cast("float").as("a"))
    j.join(broadcast(st), Seq("label"))
      .withColumn("label_avg_d2", col("a").cast("double"))
      .withColumn("is_outlier", col("d2") > lit(1.05) * col("label_avg_d2"))
      .select(col("vec_id"), col("label"), col("d2"), col("label_avg_d2"),
        col("is_outlier"))
      .orderBy(col("vec_id"))
  }

  /** q98: k-means proper — Lloyd's algorithm, K=16, THREE assignment
    * passes over two mean-refinement rounds (q39 stops at one
    * refinement because IVF only needs a usable partition; this is the
    * clustering primitive itself, the SemDeDup/diversity-sampling
    * shape). Deterministic end to end: seeds are the first 16 vectors,
    * assignment is euclidean argmin with ties to the LOWEST centroid
    * id via one min_by partial aggregate (no window, no sort), and
    * each refined centroid is the per-(cluster, dim) double mean CAST
    * TO FLOAT (the q39/q95 absorption contract). d2 comes from the
    * dot-product identity x·x − 2·x·c + c·c with the shared
    * left-to-right fold, so the argmin decisions — and therefore the
    * whole trajectory — are oracle-decidable.
    *
    * An empty cluster simply drops out of the means table and later
    * passes assign over the survivors — the same inner-join semantics
    * in both engines, so even the degenerate path is deterministic.
    *
    * 100 TB shape: per iteration ONE corpus scan against 16 broadcast
    * centroids, argmin as a map-side-combining min_by keyed vec_id,
    * means as a (cluster, dim) partial aggregate (≤ K×dims rows out of
    * the shuffle regardless of corpus size). All three assignment
    * passes are structurally identical, so they share one compiled
    * stage; iterations scale linearly in corpus size, never quadratic. */
  def q98Kmeans(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
      .withColumn("xx", dot_f(col("embedding"), col("embedding")))
      .repartition(s.sessionState.conf.numShufflePartitions, col("vec_id"))
      .transform(graft.CacheRegistry.trackPersist(_))
    // cc = cv·cv hoisted onto the K-row centroid table (r15): the fold
    // ran once per (vector, centroid) PAIR — K·N evaluations of a value
    // that only depends on the centroid. Same kernel over the same
    // floats, so d2 is bit-identical; the per-pair kernel halves.
    def d2c = col("xx") - lit(2.0) * dot_f(col("embedding"), col("cv")) +
      col("cc")
    // Argmin as a K-column conditional aggregation (r15): ONE codegen'd
    // HashAggregate computes min(d2) per (vector, centroid-id) via 16
    // `min(when(c_id = i, d2))` columns — the centroid-id domain is
    // STATIC (seeds are `vec_id < 16`, and means() only ever re-keys by
    // those ids) — and a projection then takes the least of the 16 mins
    // with first-match-ascending tie-break, which is exactly min_by's
    // struct(d2, c_id) order. min_by itself is out: ANY struct-valued
    // agg buffer plans as SortAggregate, whose per-row update runs
    // through an interpreted MutableProjection (caseWhen + compareStruct
    // per (vector, centroid) pair — measured as q98's dominant cost);
    // a join-back alternative measured WORSE (joining on the double d2
    // wraps the key in normalizenanandzero — a fresh two-key exchange —
    // and baited a useless runtime bloom filter onto the corpus scan).
    // The embedding/xx ride through as GROUPING KEYS (unique per
    // vec_id, so groups are unchanged): keys may be variable-width —
    // only the BUFFER forces the SortAggregate fallback — so the vector
    // still never crosses a shuffle, sits in no agg buffer, and needs
    // no re-attach join. least() skips the all-NULL columns of empty
    // clusters, preserving the survivors-only semantics.
    def assign(cents: DataFrame): DataFrame = {
      val mins = (0 until 16).map(i =>
        min(when(col("c_id") === i, col("d2"))).as(s"_d$i"))
      val agg = e.crossJoin(broadcast(cents))
        .withColumn("d2", d2c)
        .groupBy(col("vec_id"), col("embedding"), col("xx"))
        .agg(mins.head, mins.tail: _*)
      val d2min = least((0 until 16).map(i => col(s"_d$i")): _*)
      // first ascending id whose min equals the overall min — ties to
      // the LOWEST c_id, as min_by's struct(d2, c_id) ordering did;
      // NULL === x is NULL (not true), so empty clusters fall through
      val cluster = (0 until 16).foldRight(lit(null).cast("long")) {
        (i, rest) => when(col(s"_d$i") === col("d2"), lit(i.toLong))
          .otherwise(rest)
      }
      agg.withColumn("d2", d2min)
        .withColumn("cluster", cluster)
        .select(col("vec_id"), col("embedding"), col("xx"),
          col("cluster"), col("d2"))
    }
    def means(assigned: DataFrame): DataFrame = assigned
      .select(col("cluster").as("c_id"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("c_id"), col("pos"))
      .agg(avg(col("v")).as("m"))
      .groupBy(col("c_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("c_id"), expr("transform(pm, x -> CAST(x.m AS FLOAT))").as("cv"))
      .withColumn("cc", dot_f(col("cv"), col("cv")))
      .transform(graft.CacheRegistry.trackPersist(_))
    val seeds = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
      .withColumn("cc", dot_f(col("cv"), col("cv")))
    val c1 = means(assign(seeds))
    val c2 = means(assign(c1))
    assign(c2)
      .select(col("vec_id"), col("cluster"), col("d2"))
      .orderBy(col("vec_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q98_kmeans"         -> (q98Kmeans _),
    "q95_label_outliers" -> (q95LabelOutliers _),
    "q79_semantic_decon" -> (q79SemanticDecon _),
    "q36_cosine_topk"    -> (q36CosineTopk _),
    "q37_cosine_neardup" -> (q37CosineNearDup _),
    "q39_ann_ivf"        -> (q39AnnIvf _),
    "q49_ann_lsh"        -> (q49AnnLsh _),
    "q59_quantize_audit" -> (q59QuantizeAudit _),
    "q61_semantic_dedup" -> (q61SemanticDedup _),
  )

  /** DuckDB mirror of DotProductF: `list_dot_product` over double-cast
    * lists is the same left-to-right double accumulation as the engine's
    * fold, so doubles stay bit-identical across engines — verified
    * empirically against the interpreted
    * `list_reduce(list_prepend(0.0, [x[i]*y[i] …]), +)` form on every
    * sf0.01 embedding pair (0 mismatches) before swapping. The native
    * kernel is what makes the all-pairs cosine oracles (q37/q63/q79)
    * feasible at sf0.1: the interpreted lambda stalled DuckDB for tens
    * of minutes on 2M pairs, the native form runs them in seconds, so
    * the whole cosine family graduates out of the pruned-oracle set. */
  private def duckDot(x: String, y: String): String =
    s"list_dot_product(CAST($x AS DOUBLE[]), CAST($y AS DOUBLE[]))"

  /** DuckDB mirror: identical left-to-right fold. */
  private[queries] def duckCosine(a: String, b: String): String =
    s"(${duckDot(a, b)}) / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)}))"

  val oracle: Map[String, String] = Map(
    // Lloyd restated: the same unrolled-iteration idiom as q39's oracle
    // (argmin → REAL-cast means → argmin …), euclidean via the dot
    // identity with the shared left-to-right fold. Spark's min_by over
    // struct(d2, c_id) is exactly ROW_NUMBER ORDER BY d2, c_id → rn=1.
    "q98_kmeans" -> {
      def d2(c: String) =
        s"""e.xx - 2.0 * ${duckDot("e.embedding", s"$c.cv")}
           |      + ${duckDot(s"$c.cv", s"$c.cv")}""".stripMargin
      def assign(cents: String) =
        s"""SELECT vec_id, embedding, xx, c_id AS cluster, d2 FROM (
           |  SELECT e.vec_id, e.embedding, e.xx, c.c_id, ${d2("c")} AS d2,
           |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |      ORDER BY ${d2("c")} ASC, c.c_id) AS rn
           |  FROM e CROSS JOIN $cents c) WHERE rn = 1""".stripMargin
      def cn(a: String) =
        s"""SELECT c_id, list(CAST(m AS REAL) ORDER BY pos) AS cv FROM (
           |  SELECT cluster AS c_id, pos, avg(CAST(v AS DOUBLE)) AS m FROM (
           |    SELECT cluster, unnest(range(1, len(embedding) + 1)) AS pos,
           |      unnest(embedding) AS v FROM $a)
           |  GROUP BY cluster, pos) GROUP BY c_id""".stripMargin
      s"""WITH e AS (SELECT vec_id, embedding,
         |    ${duckDot("embedding", "embedding")} AS xx FROM embeddings),
         |seeds AS (SELECT vec_id AS c_id, embedding AS cv FROM e
         |  WHERE vec_id < 16),
         |a0 AS (${assign("seeds")}),
         |cn1 AS (${cn("a0")}),
         |a1 AS (${assign("cn1")}),
         |cn2 AS (${cn("a1")}),
         |a2 AS (${assign("cn2")})
         |SELECT vec_id, cluster, d2 FROM a2 ORDER BY vec_id""".stripMargin
    },
    // Same float-absorption contract as q39: per-(label, dim) means and
    // the per-label d2 mean are REAL-cast before use, d2 itself is the
    // shared left-to-right fold — the threshold compare is deterministic.
    "q95_label_outliers" ->
      s"""WITH parts AS (SELECT label, unnest(range(1, len(embedding) + 1)) AS pos,
         |    unnest(embedding) AS v FROM embeddings),
         |means AS (SELECT label, pos, avg(CAST(v AS DOUBLE)) AS m
         |  FROM parts GROUP BY 1, 2),
         |cent AS (SELECT label, list(CAST(m AS REAL) ORDER BY pos) AS cv
         |  FROM means GROUP BY label),
         |j AS (SELECT e.vec_id, e.label,
         |    ${duckDot("e.embedding", "e.embedding")}
         |      - 2.0 * ${duckDot("e.embedding", "c.cv")}
         |      + ${duckDot("c.cv", "c.cv")} AS d2
         |  FROM embeddings e JOIN cent c USING (label)),
         |st AS (SELECT label, CAST(avg(d2) AS REAL) AS a FROM j GROUP BY label)
         |SELECT j.vec_id, j.label, j.d2, CAST(st.a AS DOUBLE) AS label_avg_d2,
         |  j.d2 > 1.05 * CAST(st.a AS DOUBLE) AS is_outlier
         |FROM j JOIN st USING (label) ORDER BY j.vec_id""".stripMargin,
    // IVF is approximate relative to TRUE top-k, but the ALGORITHM is
    // deterministic — this restates it (seed-assign argmax → per-(bucket,
    // dim) mean → probe top-4 → in-bucket top-5) rather than "exact"
    // search, so the hash compare decides the whole path. The refined
    // centroid means are the one order-sensitive double sum; Spark casts
    // them to FLOAT (q39AnnIvf `CAST(x.m AS FLOAT)`), which absorbs
    // summation-order LSB drift, and every OUTPUT sim is computed from
    // original embeddings with the shared left-to-right fold.
    "q39_ann_ivf" -> {
      def assign(cents: String) =
        s"""SELECT vec_id, embedding, nv, c_id AS bucket FROM (
           |  SELECT e.vec_id, e.embedding, e.nv, c.c_id,
           |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
           |      ${duckDot("c.cv", "e.embedding")} / (c.nc * e.nv) DESC, c.c_id) AS rn
           |  FROM en e CROSS JOIN $cents c) WHERE rn = 1""".stripMargin
      s"""WITH en AS (SELECT vec_id, embedding,
         |    sqrt(${duckDot("embedding", "embedding")}) AS nv FROM embeddings),
         |seeds AS (SELECT vec_id AS c_id, embedding AS cv, nv AS nc
         |  FROM en WHERE vec_id < 16),
         |b1 AS (${assign("seeds")}),
         |parts AS (SELECT bucket, unnest(range(1, len(embedding) + 1)) AS pos,
         |    unnest(embedding) AS v FROM b1),
         |means AS (SELECT bucket AS c_id, pos, avg(CAST(v AS DOUBLE)) AS m
         |  FROM parts GROUP BY bucket, pos),
         |cn0 AS (SELECT c_id, list(CAST(m AS REAL) ORDER BY pos) AS cv
         |  FROM means GROUP BY c_id),
         |cn AS (SELECT c_id, cv, sqrt(${duckDot("cv", "cv")}) AS nc FROM cn0),
         |probes AS (SELECT vec_id AS query_id, embedding AS qv, nv AS nq,
         |    c_id AS probe_bucket FROM (
         |  SELECT e.vec_id, e.embedding, e.nv, c.c_id,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |      ${duckDot("c.cv", "e.embedding")} / (c.nc * e.nv) DESC, c.c_id) AS pr
         |  FROM en e CROSS JOIN cn c WHERE e.vec_id % 50 = 0) WHERE pr <= 4),
         |b2 AS (${assign("cn")}),
         |scored AS (SELECT p.query_id, b.vec_id,
         |    ${duckDot("p.qv", "b.embedding")} / (p.nq * b.nv) AS sim
         |  FROM b2 b JOIN probes p
         |    ON p.probe_bucket = b.bucket AND p.query_id <> b.vec_id)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank,
         |  vec_id AS neighbor_id, sim FROM (
         |  SELECT scored.*, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY sim DESC, vec_id) AS rank FROM scored)
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    },
    // SRP-LSH restated the same way: the hyperplane weights are
    // deterministic constants (splitmix64((b<<32)|j) / Long.MaxValue —
    // mix64 above), emitted as shortest-roundtrip double literals so
    // DuckDB parses the exact same bits; per-bit sign folds
    // left-to-right over dimensions exactly as the srpSig UDF loop.
    "q49_ann_lsh" -> {
      val dims = 64
      def w(b: Int, j: Int): String = java.lang.Double.toString(
        mix64((b.toLong << 32) | j.toLong).toDouble / Long.MaxValue)
      def accExpr(b: Int): String = {
        val wb = (0 until dims).map(w(b, _)).mkString("[", ", ", "]")
        s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |  [($wb)[i] * CAST(embedding[i] AS DOUBLE)
           |   for i in range(1, len(embedding) + 1)]),
           |  (acc, v) -> acc + v)""".stripMargin.replace("\n", " ")
      }
      val sigExpr = (0 until SrpBits)
        .map(b => s"(CASE WHEN ${accExpr(b)} >= 0 THEN ${1 << b} ELSE 0 END)")
        .mkString(" + ")
      val probeList = (0 until SrpBits)
        .map(b => s"xor(sig, ${1 << b})").mkString("[sig, ", ", ", "]")
      s"""WITH en AS (SELECT vec_id, embedding,
         |    sqrt(${duckDot("embedding", "embedding")}) AS nv,
         |    CAST($sigExpr AS INTEGER) AS sig FROM embeddings),
         |q AS (SELECT vec_id AS query_id, embedding AS qv, nv AS nq,
         |    unnest($probeList) AS probe FROM en WHERE vec_id % 50 = 0),
         |scored AS (SELECT q.query_id, e.vec_id,
         |    ${duckDot("q.qv", "e.embedding")} / (q.nq * e.nv) AS sim
         |  FROM q JOIN en e ON q.probe = e.sig AND q.query_id <> e.vec_id)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank,
         |  vec_id AS neighbor_id, sim FROM (
         |  SELECT scored.*, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY sim DESC, vec_id) AS rank FROM scored)
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    },
    "q79_semantic_decon" -> {
      val duckBucket = (0 until SemBits)
        .map(b => s"(CASE WHEN embedding[${b + 1}] > 0 THEN ${1L << b} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH e AS (SELECT vec_id, embedding,
         |    CAST($duckBucket AS BIGINT) AS bucket FROM embeddings),
         |hits AS (SELECT c.vec_id,
         |    ${duckCosine("c.embedding", "b.embedding")} AS sim
         |  FROM e c JOIN e b ON c.bucket = b.bucket
         |  WHERE b.vec_id % 41 = 0 AND c.vec_id % 41 != 0)
         |SELECT vec_id, COUNT(*) AS n_benchmark_hits, MAX(sim) AS max_sim
         |FROM hits WHERE sim >= 0.3
         |GROUP BY vec_id ORDER BY vec_id""".stripMargin
    },
    "q59_quantize_audit" ->
      """WITH s AS (SELECT vec_id, embedding,
        |    CAST(list_min(embedding) AS DOUBLE) AS mn,
        |    CAST(list_max(embedding) AS DOUBLE) AS mx
        |  FROM embeddings)
        |SELECT vec_id, mn AS vmin, mx AS vmax,
        |  CASE WHEN len(embedding) = 0 THEN NULL
        |       WHEN mx = mn THEN 0.0 ELSE
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      [abs(CAST(x AS DOUBLE) - (mn + least(255.0, greatest(0.0,
        |         floor((CAST(x AS DOUBLE) - mn) / ((mx - mn) / 255.0) + 0.5)))
        |         * ((mx - mn) / 255.0)))
        |       for x in embedding]), (a, b) -> a + b) / len(embedding)
        |  END AS mae
        |FROM s ORDER BY vec_id""".stripMargin,
    "q36_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
         |           WHERE vec_id % 50 = 0),
         |scored AS (SELECT q.query_id, e.vec_id,
         |    ${duckCosine("q.qv", "e.embedding")} AS sim
         |  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
         |ranked AS (SELECT query_id, vec_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
         |  FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id, sim
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q37_cosine_neardup" ->
      // the len/NULL guards mirror the Spark-side filter (null/empty
      // vectors carry no geometry — dropped on BOTH engines); NOT
      // (sim < 0.4) keeps NaN zero-norm pairs, the convention Spark
      // SQL's nanSafeCompare and DuckDB's total order share
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${duckCosine("a.embedding", "b.embedding")} AS sim
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE len(a.embedding) > 0 AND len(b.embedding) > 0
         |  AND NOT (${duckCosine("a.embedding", "b.embedding")} < 0.4)
         |ORDER BY id_a, id_b""".stripMargin,
    "q61_semantic_dedup" -> {
      val duckBucket = (0 until SemBits)
        .map(b => s"(CASE WHEN embedding[${b + 1}] > 0 THEN ${1L << b} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH e AS (SELECT vec_id, label, embedding,
         |    CAST($duckBucket AS BIGINT) AS bucket FROM embeddings),
         |dup AS (SELECT DISTINCT b.vec_id FROM e a JOIN e b
         |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |    WHERE ${duckCosine("a.embedding", "b.embedding")} >= 0.4)
         |SELECT vec_id, bucket, label FROM e
         |WHERE vec_id NOT IN (SELECT vec_id FROM dup)
         |ORDER BY vec_id""".stripMargin
    },
  )
}
