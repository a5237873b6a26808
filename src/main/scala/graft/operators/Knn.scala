package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search (SURVEY.md §2 D-series): exact brute-force top-k
  * as the correctness baseline; random-hyperplane LSH and IVF cell
  * probing as the scale paths.
  *
  * Scale posture: the query set is the small side and is always
  * broadcast; the corpus is never collected. Brute force is
  * O(|corpus|·|queries|) map work with no shuffle until the final
  * per-query top-k; LSH/IVF first cut the corpus to matching buckets /
  * probed cells so the per-query work is a small fraction of the
  * corpus — that fraction is the recall/cost dial.
  */
object Knn {

  /** Sequential-fold dot product over two ARRAY<DOUBLE> columns — the
    * fold order matches a plain left-to-right sum so results are
    * reproducible bit-for-bit.
    */
  def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity over ARRAY<DOUBLE> columns — fused native kernel
    * (one pass, no intermediate product array), same sequential
    * accumulation order as the fold form.
    */
  def cosineD(a: Column, b: Column): Column =
    graft.functions.vec.cosine(a, b)

  /** Float embedding column cast to ARRAY<DOUBLE> (do all math in
    * double: deterministic, and matches the DuckDB oracle's ::DOUBLE[]).
    */
  def asDouble(vec: Column): Column = transform(vec, x => x.cast("double"))

  /** Exact top-k cosine neighbors of each query vector (self excluded).
    * Queries are broadcast; the only shuffle is the per-query window.
    */
  def bruteForce(corpus: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosineD(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** D10: radius (range) search — ALL corpus vectors within cosine ≥
    * `tau` of each query, unbounded by k (the other half of the ANN
    * API surface: top-k answers "the best few", radius answers
    * "everything this similar" — candidate generation for clustering,
    * near-dup audits, recall denominators). Entirely MAP-SIDE: queries
    * broadcast, the fused cosine kernel scores each (corpus × query)
    * pair inside the scan's stage and the threshold filters there too
    * — the per-query window top-k pays never runs, so the plan has NO
    * shuffle at all and scales with scan bandwidth × |queries|. Output
    * size is data-dependent (that is the point of radius search);
    * callers bound it with `tau`, not a cap.
    */
  def rangeSearch(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, tau: Double): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv")))
    corpus.select(col(idCol).as("neighbor_id"),
        asDouble(col(vecCol)).as("cv"))
      .join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosineD(col("qv"), col("cv")))
      .filter(col("cosine") >= tau)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
  }

  /** Random-hyperplane LSH ANN: corpus and queries are bucketed by
    * `bands` independent sign-bit keys; a candidate is any corpus
    * vector sharing ≥1 bucket with the query; exact cosine re-ranks
    * the candidates. Recall (vs [[bruteForce]]) rises with `bands`
    * and falls with `planesPerBand` — asserted in the spec. The
    * defaults (32 bands × 6 planes) measure recall 0.88–0.90 on the
    * synthetic corpus (which has no strong neighbors — max cosine
    * ~0.5, the hardest case for hyperplane LSH) while keeping the
    * expected candidate fraction ≈ 1−(1−2⁻⁶)³² ≈ 0.4 of the corpus
    * for uncorrelated vectors; on clustered real embeddings the same
    * settings scan a far smaller fraction for the same recall.
    */
  def lsh(corpus: DataFrame, queries: DataFrame, idCol: String,
          vecCol: String, dim: Int, k: Int, bands: Int = 32,
          planesPerBand: Int = 6, seed: Long = 7L): DataFrame =
    lshTopK(corpus, queries, idCol, vecCol, dim, k, bands, planesPerBand,
        seed, filterCol = scala.None)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cosine"))

  /** [[lsh]] and [[filteredLsh]]'s one shared body: band keys only ride
    * the bucket shuffle (vectors stay out of the exploded stream),
    * query keys broadcast, exact-cosine rescore of the distinct
    * candidate set. With `filterCol` set, the filter value joins the
    * bucket key (candidates born filtered) and comes back as `label`.
    */
  private def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                      vecCol: String, dim: Int, k: Int, bands: Int,
                      planesPerBand: Int, seed: Long,
                      filterCol: Option[String]): DataFrame = {
    val planes = Dedup.hyperplanes(bands * planesPerBand, dim, seed)
    val fk = filterCol.toSeq
    def keyed(df: DataFrame, id: String) =
      df.select(col(idCol).as(id) +: fk.map(col) :+
          posexplode(graft.functions.vec.hyperplaneBuckets(
            asDouble(col(vecCol)), planes, planesPerBand)): _*)
        .toDF(Seq(id) ++ fk ++ Seq("band", "bkey"): _*)
    val candIds = keyed(corpus, "neighbor_id")
      .join(broadcast(keyed(queries, "query_id")),
        fk ++ Seq("band", "bkey"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
      .distinct() // a pair can collide in several bands
    val q = broadcast(queries.select(
      Seq(col(idCol).as("query_id")) ++
        fk.map(c => col(c).as("label")) :+
        asDouble(col(vecCol)).as("qv"): _*))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    candIds.join(c, "neighbor_id").join(q, "query_id")
      .withColumn("cosine", cosineD(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** IVF-style ANN: a deterministic coarse codebook (every `stride`-th
    * corpus vector, with the CELL COUNT capped at `maxCells` — a pure
    * stride ties |cells| to n/stride, making the assign step
    * super-linear in corpus size; the effective stride grows with the
    * corpus instead, the fixed-nlist posture real IVF indexes use),
    * each corpus vector assigned to its nearest centroid cell, each
    * query probing its `nProbe` nearest cells. At scale the assign step
    * is a broadcast map + partial-aggregating argmax (codebook ≪
    * corpus; no n×|codebook| shuffle) and the search only scans probed
    * cells.
    */
  /** The broadcast (cell_id, centroid) coarse-quantizer table every IVF
    * family member shares: a TRAINED table when `coarse` is passed
    * (e.g. a full-vector [[kmeansSubCodebooks]] run with m = 1), else
    * the anchored systematic stride sample with the cell count CAPPED
    * at `maxCells` — a pure stride ties |cells| to n/stride, making
    * coarse assignment O(n²/stride) (super-linear in corpus size); the
    * effective stride grows with the corpus instead (FAISS's
    * fixed-nlist posture), so assignment stays O(n·maxCells) at any
    * scale. The sample anchors at the corpus' minimum id-residue so the
    * codebook is never empty (ids 1..49 with stride 50 would pick zero
    * centroids if the anchor were hardcoded to residue 0). `knownCount`
    * skips the count action when the caller already has it.
    */
  /** The anchored-stride systematic coarse codebook, public so callers
    * can FREEZE it into a persisted layout ([[buildIvfPqIndex]]'s
    * `coarse` override) and still replay the assignment in a plain-SQL
    * oracle — the deterministic twin of a trained
    * [[kmeansSubCodebooks]] coarse table. Returns broadcast-hinted
    * `(cell_id, centroid: array<double>)`.
    */
  def strideCoarse(corpus: DataFrame, idCol: String, vecCol: String,
                   stride: Int = 50, maxCells: Int = 256): DataFrame =
    coarseTable(corpus, idCol, vecCol, stride, maxCells, scala.None,
      "strideCoarse")

  private def coarseTable(corpus: DataFrame, idCol: String, vecCol: String,
                          stride: Int, maxCells: Int,
                          coarse: Option[DataFrame], who: String,
                          knownCount: Option[Long] = scala.None): DataFrame =
    broadcast(coarse.map(_.select(col("cell_id"),
        asDouble(col("centroid")).as("centroid")))
      .getOrElse {
        val n = knownCount.getOrElse(corpus.count())
        require(n > 0, s"$who needs a non-empty corpus")
        val effStride = math.max(stride.toLong,
          math.ceil(n / maxCells.toDouble).toLong)
        val anchorMod = corpus
          .agg(min(pmod(col(idCol).cast("long"), lit(effStride))).as("m"))
          .head().getLong(0)
        corpus.filter(pmod(col(idCol), lit(effStride)) === anchorMod)
          .select(col(idCol).as("cell_id"),
            asDouble(col(vecCol)).as("centroid"))
      })

  def ivf(corpus: DataFrame, queries: DataFrame, idCol: String,
          vecCol: String, k: Int, stride: Int = 50,
          nProbe: Int = 5, maxCells: Int = 256,
          coarse: Option[DataFrame] = scala.None): DataFrame = {
    val n = corpus.count()
    if (n == 0) // empty corpus -> empty, correctly-shaped:
      // same column order and types as the normal path (neighbor_id
      // keeps the corpus id type, whatever it is)
      return queries.limit(0).select(col(idCol).as("query_id"))
        .withColumn("rank", lit(0L))
        .crossJoin(corpus.limit(0).select(col(idCol).as("neighbor_id")))
        .withColumn("cosine", lit(null).cast("double")) // nullable, like cosineD's
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    ivfCandidates(corpus, queries, idCol, vecCol, stride, nProbe,
        maxCells, coarse, knownCount = Some(n))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** The IVF candidate stream shared by top-k [[ivf]] and radius
    * [[rangeSearchIvf]]: corpus assigned to its nearest coarse cell,
    * queries probe their nProbe nearest cells (broadcast), exact
    * cosine on the probed pairs, self excluded. The assignment is an
    * argmax AGGREGATION (max_by is partial-aggregatable, so the
    * broadcast-NLJ'd n×C rows reduce map-side to one row per vector —
    * the n×C stream is never shuffled, unlike a row_number window
    * which would materialize and sort it; ties on csim break toward
    * the smallest cell_id).
    */
  private def ivfCandidates(corpus: DataFrame, queries: DataFrame,
                            idCol: String, vecCol: String, stride: Int,
                            nProbe: Int, maxCells: Int,
                            coarse: Option[DataFrame],
                            knownCount: Option[Long]): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    val centroids = coarseTable(corpus, idCol, vecCol, stride, maxCells,
      coarse, "ivf", knownCount)
    val cells = c.join(centroids)
      .withColumn("csim", cosineD(col("cv"), col("centroid")))
      .groupBy(col("neighbor_id"))
      .agg(max_by(struct(col("cell_id"), col("cv")),
        struct(col("csim"), -col("cell_id"))).as("best"))
      .select(col("best.cell_id").as("cell_id"), col("neighbor_id"),
        col("best.cv").as("cv"))
    // probe: nProbe nearest cells per query
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("qsim").desc, col("cell_id"))
    val probes = broadcast(q.join(centroids)
      .withColumn("qsim", cosineD(col("qv"), col("centroid")))
      .withColumn("qrn", row_number().over(wProbe))
      .filter(col("qrn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell_id")))
    cells.join(probes, "cell_id")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosineD(col("qv"), col("cv")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
  }

  /** D10b: IVF-pruned radius search — the SCALE PATH for
    * [[rangeSearch]]: brute-force radius scans the whole corpus for
    * every query set, which is exactly right until the corpus is 100
    * TB; here each query probes only its `nProbe` nearest coarse cells
    * and thresholds exact cosine inside them, so the scanned fraction
    * is ~nProbe/cells of the corpus. Approximate in precisely the
    * [[ivf]] top-k sense (a neighbor assigned to an unprobed cell is
    * missed — FAISS's range_search-on-IVF contract); the spec measures
    * radius-recall against the exact [[rangeSearch]] answer and the
    * registered query pins it ≥ the IVF top-k recall floor on the sf
    * corpus.
    */
  def rangeSearchIvf(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, tau: Double,
                     stride: Int = 50, nProbe: Int = 5,
                     maxCells: Int = 256,
                     coarse: Option[DataFrame] = scala.None): DataFrame = {
    // count once ([[ivf]]'s pattern): the same action serves the
    // empty-corpus guard AND coarseTable's stride computation
    val n = corpus.count()
    if (n == 0) // empty corpus -> empty, correctly-shaped
      return queries.limit(0).select(col(idCol).as("query_id"))
        .crossJoin(corpus.limit(0).select(col(idCol).as("neighbor_id")))
        .withColumn("cosine", lit(null).cast("double"))
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
    ivfCandidates(corpus, queries, idCol, vecCol, stride, nProbe,
        maxCells, coarse, knownCount = Some(n))
      .filter(col("cosine") >= tau)
  }

  /** Squared L2 over two ARRAY<DOUBLE> columns, sequential fold order
    * (bit-reproducible, oracle-replayable like [[dotD]]).
    */
  def l2sqD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Product-quantization ANN with asymmetric distance (ADC) and exact
    * re-rank — the memory-compressed search path a 100 TB corpus needs:
    * each vector is stored as `m` small codes (one byte each at
    * ksub ≤ 256) instead of `dim` floats, and candidate scoring reads
    * only those codes plus a per-query distance table.
    *
    *  1. Sub-codebooks: the vector space is split into `m` contiguous
    *     subspaces of dim/m dims; the codebook of subspace j is the j-th
    *     subvector of the `ksub` lowest-id corpus vectors. Deterministic
    *     by construction — like [[ivf]]'s systematic codebook, this
    *     isolates the search machinery from k-means training (which a
    *     production run would substitute; every downstream step is
    *     unchanged) and keeps the DuckDB oracle an exact replay.
    *  2. Encode: every corpus vector gets, per subspace, the id of its
    *     L2-nearest sub-centroid (ties to the smallest id) — an
    *     `m × ksub` broadcast map + partial-aggregating argmin, never a
    *     shuffled n×ksub stream.
    *  3. ADC scan: each query precomputes its `m × ksub` table of
    *     squared-L2 subdistances, reshaped to a nested array and
    *     BROADCAST; approx dist(q, x) = sum_j table[j][code_j(x)] is a
    *     pure map-side expression fold (sub-ascending, so the double
    *     sum is order-stable for the oracle) — no per-(pair, subspace)
    *     rows ever shuffle.
    *  4. The `overscan · k` best approx candidates per query are found
    *     with a salted two-phase top-k (per-(query, salt) window, then
    *     a window over the surviving `salts · overscan · k` rows — the
    *     per-query sort never has a single-task corpus-sized
    *     partition), then re-ranked by exact cosine — the standard PQ
    *     shortlist+refine.
    *
    * Scale posture: codes are O(n·m) small ints built by one
    * partial-agg shuffle; the scan is the canonical O(n·m) table
    * lookups per query, all map work against the broadcast tables; the
    * only corpus-sized shuffles are the codes groupBy and the salted
    * first-phase window.
    */
  def pq(corpus: DataFrame, queries: DataFrame, idCol: String,
         vecCol: String, dim: Int, k: Int, m: Int = 8, ksub: Int = 16,
         overscan: Int = 4, salts: Int = 32): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val d = dim / m
    // the codebook sample is the ids 0..ksub-1, so a code IS its
    // position in the table row; fail loudly on sparse/offset id spaces —
    // this require applies ONLY to the systematic path; [[pqTrained]]
    // works on any id space
    val nCent = corpus.filter(col(idCol) < ksub).count()
    require(nCent == ksub,
      s"pq's systematic codebook needs contiguous ids 0..${ksub - 1} " +
        s"in the corpus, found $nCent of $ksub — use pqTrained for " +
        "non-contiguous id spaces")
    def subs(df: DataFrame, id: String) =
      df.select(col(idCol).as(id),
          posexplode(transform(sequence(lit(0), lit(m - 1)),
            j => slice(asDouble(col(vecCol)), j * d + 1, lit(d)))))
        .toDF(id, "sub", "subvec")
    val centroids = subs(corpus.filter(col(idCol) < ksub), "cell_id")
      .select(col("sub"), col("cell_id"), col("subvec").as("cvec"))
    pqSearch(corpus, queries, idCol, vecCol, centroids, dim, k, m, ksub,
      overscan, salts)
  }

  /** Lloyd's k-means sub-codebooks for [[pqTrained]] — the slot the
    * systematic codebook in [[pq]] stands in for. Deterministic and
    * oracle-replayable by construction:
    *
    *  - training set: the vectors with `id % em == 0` where
    *    `em = max(trainMod, ceil(count / maxTrain))` — a deterministic
    *    sample whose SIZE is capped: k-means quality needs a fixed
    *    number of examples per centroid, not a corpus fraction, so as
    *    the corpus scales the modulus rises and training cost stays
    *    constant (~maxTrain vectors) while encoding still covers
    *    everything. The cap assumes roughly dense ids (the realized
    *    sample under a sparse id space is smaller but still
    *    deterministic and engine-replayable from the same formula);
    *  - init: the `ksub` smallest-id training vectors' subvectors
    *    (`orderBy(id).limit(ksub)` — a distributed top-k, no global
    *    sort), codebook slot = rank, so ANY id space yields codes
    *    0..ksub-1;
    *  - assign: `l2sqD` argmin with ties to the smallest cell — the
    *    (dist, cell_id) struct-min rule, identical to the encode step;
    *  - update: per-component means computed from QUANTIZED integer
    *    sums (`floor(v·2²⁰ + 0.5)` summed as longs): integer addition
    *    is associative, so the result is bit-identical however the sum
    *    is ordered or partitioned — a SQL oracle replays it exactly,
    *    and (since r18) the Lloyd loop itself runs DRIVER-LOCAL on the
    *    one collected sample: the cap bounds driver state at ~maxTrain
    *    vectors (MBs) at ANY corpus size, and the former
    *    per-iteration broadcast-join + partial-agg + collect cycle
    *    paid distributed-job scheduling for microseconds of ALU work.
    *    The ≤2⁻²⁰ quantization nudge is far below any clustering
    *    signal. Empty clusters keep their previous centroid. The ONLY
    *    distributed work is the capped sample collect (plus the count
    *    unless `knownCount` supplies it) — the corpus never moves.
    *
    * Returns `(sub, cell_id, cvec)` with cell_id 0..ksub-1, the
    * codebook shape [[pqSearch]] consumes.
    */
  def kmeansSubCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                         dim: Int, m: Int, ksub: Int, iters: Int = 2,
                         trainMod: Int = 4, maxTrain: Int = 8192,
                         knownCount: Option[Long] = scala.None)
      : DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(maxTrain >= ksub, s"maxTrain $maxTrain < ksub $ksub")
    val d = dim / m
    val spark = corpus.sparkSession
    import spark.implicits._
    val S = 1048576.0 // 2^20 quantization scale for associative sums
    // parquet-metadata-cheap count; raises the modulus so the sample
    // stays ~maxTrain however large the corpus grows. `knownCount`
    // skips the pass when the caller already holds the input's row
    // count (the C13 knownCounts precedent): [[ivfpqResidualTrained]]'s
    // residual frame has EXACTLY one row per corpus vector, so counting
    // it would re-run the full coarse-assign lineage for one constant.
    val n = knownCount.getOrElse(corpus.count())
    val em = math.max(trainMod.toLong, (n + maxTrain - 1) / maxTrain)
    // ONE distributed action: collect the count-capped sample
    // (≤ ~maxTrain vectors — MBs at any corpus size, the cap exists
    // precisely so training state is constant). Every Lloyd iteration
    // then runs DRIVER-LOCAL, reproducing the former distributed plan
    // bit-for-bit: the update sums were already QUANTIZED-INTEGER
    // (associative ⇒ partitioning-invariant), the assignment argmin
    // replays l2sqD's sequential fold and min_by's (dist, cell_id)
    // struct order, and the mean replays the exact
    // `sq.toDouble / cnt / S` division chain. The former shape — one
    // broadcast-join + partial-agg + collect action PER iteration over
    // a persisted ~8k-row sample — paid per-iteration job scheduling
    // for work that is microseconds of ALU; at bench sf that overhead
    // was 60-80% of every trained query's wall time (guide §1.2: fix
    // the algorithm's pass structure before per-task tuning).
    val sampRows = corpus
      .filter(pmod(col(idCol).cast("long"), lit(em)) === 0)
      .select(col(idCol).cast("long").as("_id"),
        asDouble(col(vecCol)).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(sampRows.length >= ksub,
      s"k-means needs >= $ksub training vectors, found " +
        s"${math.min(sampRows.length, ksub)} " +
        s"(training sample = ids with id % $em == 0)")
    // cent(sub)(cell)(component); init = the ksub smallest-id sample
    // vectors' subvectors (the former orderBy(_id).limit(ksub))
    var cent: Array[Array[Array[Double]]] = Array.tabulate(m, ksub) {
      (j, c) => sampRows(c)._2.slice(j * d, (j + 1) * d)
    }
    def centDf = cent.zipWithIndex.flatMap { case (byCell, j) =>
      byCell.zipWithIndex.map { case (cv, c) => (j, c.toLong, cv.toSeq) }
    }.toSeq.toDF("sub", "cell_id", "cvec")
    for (_ <- 1 to iters) {
      val sq = Array.ofDim[Long](m, ksub, d)
      val cnt = Array.ofDim[Long](m, ksub)
      sampRows.foreach { case (_, v) =>
        var j = 0
        while (j < m) {
          // argmin over (dist, cell_id): ascending cell order + strict
          // `<` keeps the smallest cell on ties, the min_by struct rule;
          // Double.compare is Spark's double ordering (NaN greatest)
          var best = 0
          var bestDist = java.lang.Double.MAX_VALUE
          var c = 0
          while (c < ksub) {
            val cv = cent(j)(c)
            var acc = 0.0 // l2sqD: sequential fold in component order
            var i = 0
            while (i < d) {
              val diff = v(j * d + i) - cv(i)
              acc += diff * diff
              i += 1
            }
            if (c == 0 || java.lang.Double.compare(acc, bestDist) < 0) {
              best = c; bestDist = acc
            }
            c += 1
          }
          var i = 0
          while (i < d) {
            // floor(comp·S + 0.5) summed as longs — the associative
            // integer sum the distributed update used
            sq(j)(best)(i) += math.floor(v(j * d + i) * S + 0.5).toLong
            i += 1
          }
          cnt(j)(best) += 1L
          j += 1
        }
      }
      val next = cent.map(_.map(_.clone()))
      var j = 0
      while (j < m) {
        var c = 0
        while (c < ksub) {
          if (cnt(j)(c) > 0L) { // empty clusters keep their centroid
            var i = 0
            while (i < d) {
              next(j)(c)(i) = sq(j)(c)(i).toDouble / cnt(j)(c) / S
              i += 1
            }
          }
          c += 1
        }
        j += 1
      }
      cent = next
    }
    centDf
  }

  /** [[pq]] with TRAINED k-means sub-codebooks instead of the
    * systematic id-sampled ones — the production PQ path: works on any
    * id space (no contiguity requirement) and fits the codebook to the
    * corpus distribution. Same search machinery, same output shape.
    */
  def pqTrained(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, dim: Int, k: Int, m: Int = 8,
                ksub: Int = 16, iters: Int = 2, trainMod: Int = 4,
                maxTrain: Int = 8192, overscan: Int = 4,
                salts: Int = 32): DataFrame = {
    val centroids = kmeansSubCodebooks(corpus, idCol, vecCol, dim, m, ksub,
      iters, trainMod, maxTrain)
    pqSearch(corpus, queries, idCol, vecCol, centroids, dim, k, m, ksub,
      overscan, salts)
  }

  /** IVF × PQ — the composition a true 100 TB corpus needs: vectors are
    * assigned to coarse IVF cells (the [[ivf]] quantizer) AND encoded as
    * PQ codes (the [[pq]] compressor); a query probes its `nProbe`
    * nearest cells and ADC-scans ONLY the codes in probed cells, so the
    * per-query work is the probed fraction of the corpus instead of the
    * flat-PQ O(n·m) full scan ([[pq]]'s scale ceiling — its ratio100 was
    * the suite's worst precisely because every query touches every
    * code). Exact cosine re-ranks the shortlist as usual.
    *
    * Plan shape: coarse assign and PQ encode are both broadcast +
    * partial-agg reductions over the corpus; their two per-vector
    * outputs co-shuffle once on the vector id (a production store would
    * persist that (cell, codes) pairing as the index); `probes` and the
    * per-query ADC tables are broadcast, so cell pruning happens
    * map-side — non-probed vectors are dropped without a shuffle and
    * without computing any distance.
    *
    * `codebooks`: pass [[kmeansSubCodebooks]] output for trained
    * sub-quantizers on arbitrary id spaces; default is the systematic
    * codebook (with [[pq]]'s contiguous-id requirement). `coarse`:
    * pass a trained `(cell_id, centroid)` coarse quantizer (e.g. a
    * full-vector [[kmeansSubCodebooks]] run with m = 1, the same slot
    * [[ivf]] has); default is the anchored systematic stride sample.
    * With BOTH passed the composition is the full production IVFADC —
    * any id space, data-fitted cells and sub-codebooks. Cells are
    * pruned on RAW-vector codes (the simpler IVFADC variant);
    * [[ivfpqResidual]] is the residual-encoding refinement — sharper
    * ADC at the cost of per-(query, cell) tables.
    */
  def ivfpq(corpus: DataFrame, queries: DataFrame, idCol: String,
            vecCol: String, dim: Int, k: Int, stride: Int = 50,
            nProbe: Int = 5, m: Int = 8, ksub: Int = 16,
            overscan: Int = 4, salts: Int = 32,
            maxCells: Int = 256,
            codebooks: Option[DataFrame] = scala.None,
            coarse: Option[DataFrame] = scala.None): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val d = dim / m
    // systematic-path constants in ONE eager pass (r19): with neither a
    // trained coarse table nor trained codebooks, this used to run three
    // separate jobs inside the timed query — count(n) for the effective
    // stride, a min(pmod) aggregate for the stride anchor, and a
    // pushed-down filter count for the codebook contiguity check. The
    // anchor and the check now ride one combined aggregate over the same
    // id-column scan (one fewer corpus pass at any scale).
    val (coarseDf, nCentOpt): (DataFrame, Option[Long]) = coarse match {
      case Some(_) =>
        (coarseTable(corpus, idCol, vecCol, stride, maxCells, coarse,
          "ivfpq"),
          if (codebooks.isEmpty)
            Some(corpus.filter(col(idCol) < ksub).count())
          else scala.None)
      case scala.None =>
        val n = corpus.count()
        require(n > 0, "ivfpq needs a non-empty corpus")
        val effStride = math.max(stride.toLong,
          math.ceil(n / maxCells.toDouble).toLong)
        val row = corpus.agg(
          min(pmod(col(idCol).cast("long"), lit(effStride))).as("m"),
          count(when(col(idCol) < ksub, lit(1))).as("nc")).head()
        val cd = broadcast(corpus
          .filter(pmod(col(idCol), lit(effStride)) === row.getLong(0))
          .select(col(idCol).as("cell_id"),
            asDouble(col(vecCol)).as("centroid")))
        (cd, if (codebooks.isEmpty) Some(row.getLong(1)) else scala.None)
    }
    // coarse assign: partial-agg argmax, no cv carried (re-rank joins
    // the corpus again); ties toward the smallest cell_id
    val cells = corpus
      .select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .join(coarseDf)
      .withColumn("csim", cosineD(col("cv"), col("centroid")))
      .groupBy(col("neighbor_id"))
      .agg(max_by(col("cell_id"), struct(col("csim"), -col("cell_id")))
        .as("cell_id"))
    // query probes: top-nProbe cells per query (tiny; broadcast)
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("qsim").desc, col("cell_id"))
    val probes = broadcast(q.join(coarseDf)
      .withColumn("qsim", cosineD(col("qv"), col("centroid")))
      .withColumn("qrn", row_number().over(wProbe))
      .filter(col("qrn") <= nProbe)
      .select(col("query_id"), col("cell_id")))
    // ---- PQ codebooks (systematic unless trained ones are passed)
    def subs(df: DataFrame, id: String) =
      df.select(col(idCol).as(id),
          posexplode(transform(sequence(lit(0), lit(m - 1)),
            j => slice(asDouble(col(vecCol)), j * d + 1, lit(d)))))
        .toDF(id, "sub", "subvec")
    val pqCent = broadcast(codebooks.getOrElse {
      val nCent = nCentOpt.get
      require(nCent == ksub,
        s"ivfpq's systematic codebook needs contiguous ids 0..${ksub - 1}" +
          s" in the corpus, found $nCent of $ksub — pass " +
          "kmeansSubCodebooks output for non-contiguous id spaces")
      subs(corpus.filter(col(idCol) < ksub), "cell_id")
        .select(col("sub"), col("cell_id"), col("subvec").as("cvec"))
    })
    // PQ encode (same partial-agg shape as pqSearch)
    val codes = subs(corpus, "neighbor_id")
      .join(pqCent, "sub")
      .withColumn("dist", l2sqD(col("subvec"), col("cvec")))
      .groupBy(col("neighbor_id"), col("sub"))
      .agg(min_by(col("cell_id"), struct(col("dist"), col("cell_id")))
        .as("code"))
      .groupBy(col("neighbor_id"))
      .agg(sort_array(collect_list(struct(col("sub"), col("code"))))
        .as("sc"))
      .select(col("neighbor_id"),
        transform(col("sc"), s => s("code")).as("codes"))
    // per-query ADC tables (same as pqSearch), broadcast
    val qtab = broadcast(subs(queries, "query_id")
      .join(pqCent, "sub")
      .withColumn("qdist", l2sqD(col("subvec"), col("cvec")))
      .groupBy(col("query_id"))
      .agg(sort_array(collect_list(struct(col("sub"),
        col("cell_id").cast("long").as("code"), col("qdist")))).as("e"))
      .select(col("query_id"),
        transform(sequence(lit(0), lit(m - 1)), j =>
          transform(sequence(lit(0), lit(ksub - 1)), c =>
            element_at(col("e"), (j * ksub + c + 1).cast("int"))("qdist")))
          .as("tbl")))
    // candidate set = vectors whose cell each query probed — the ONLY
    // corpus-sized shuffle after encode is the codes⋈cells id join; the
    // probes/qtab joins are broadcast, so pruning + ADC stay map-side
    val approx = codes.join(cells, "neighbor_id")
      .join(probes, "cell_id")
      .join(qtab, "query_id")
      .withColumn("adist",
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, j) =>
          acc + element_at(
            element_at(col("tbl"), (j + lit(1)).cast("int")),
            (element_at(col("codes"), (j + lit(1)).cast("int")) + lit(1))
              .cast("int"))))
    val wLocal = Window.partitionBy(col("query_id"), col("salt"))
      .orderBy(col("adist"), col("neighbor_id"))
    val wShort = Window.partitionBy(col("query_id"))
      .orderBy(col("adist"), col("neighbor_id"))
    val shortlist = approx
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("salt", pmod(col("neighbor_id"), lit(salts)))
      .withColumn("lrn", row_number().over(wLocal))
      .filter(col("lrn") <= k * overscan)
      .withColumn("srn", row_number().over(wShort))
      .filter(col("srn") <= k * overscan)
      .select(col("query_id"), col("neighbor_id"))
    val qv = broadcast(queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv")))
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    shortlist.join(cv, "neighbor_id").join(qv, "query_id")
      .withColumn("cosine", cosineD(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Per-vector coarse residuals under a `(cell_id, centroid)` coarse
    * quantizer: `(neighbor_id, ccell, rv)` with
    * `rv = v − centroid(cell(v))` — exactly the assignment rule
    * [[ivfpqResidual]] uses (scalar-only `max_by` argmax, ties toward
    * the smallest cell_id, centroid re-attached by broadcast). This is
    * the TRAINING PROJECTION for residual-space sub-codebooks: feed it
    * to [[kmeansSubCodebooks]] (idCol = "neighbor_id", vecCol = "rv")
    * and pass the result as [[ivfpqResidual]]'s `codebooks`. A
    * production run training and searching in one job pays the coarse
    * assign lineage twice (once under the k-means sample filter — which
    * pushes down to the sampled ids — once in the search); persist this
    * frame to pay it once.
    */
  def residuals(corpus: DataFrame, idCol: String, vecCol: String,
                coarse: DataFrame): DataFrame = {
    val coarseDf = broadcast(coarse.select(col("cell_id"),
      asDouble(col("centroid")).as("centroid")))
    val corpusVec = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    val assign = corpusVec
      .join(coarseDf)
      .withColumn("csim", cosineD(col("cv"), col("centroid")))
      .groupBy(col("neighbor_id"))
      .agg(max_by(col("cell_id"), struct(col("csim"), -col("cell_id")))
        .as("ccell"))
    assign.join(corpusVec, "neighbor_id")
      .join(broadcast(coarseDf.select(col("cell_id").as("ccell"),
        col("centroid"))), "ccell")
      .select(col("neighbor_id"), col("ccell"),
        zip_with(col("cv"), col("centroid"), (x, y) => x - y).as("rv"))
  }

  /** IVF × PQ with RESIDUAL encoding — the full FAISS-style IVFADC:
    * each vector is PQ-encoded as its residual `v − centroid(cell(v))`,
    * and a query builds a separate ADC table per probed cell from
    * `q − centroid(cell)`. Residuals have far smaller spread than raw
    * vectors, so the same m×ksub codebook resolves much finer distances
    * — higher shortlist fidelity at identical code size. The extra
    * costs stay broadcast-sized: ADC tables are per (query, probed
    * cell) — `|Q|·nProbe·m·ksub` doubles — and the sub-codebook is
    * built over residual space (systematically, from the residuals of
    * the `ksub` lowest ids; or pass `codebooks` trained on
    * [[residuals]] and/or a trained `coarse` quantizer — see
    * [[ivfpqResidualTrained]] for the fully-trained composition on
    * arbitrary id spaces).
    *
    * The "far smaller spread" premise needs CLUSTERED data: on a
    * structureless corpus `var(x − centroid) ≈ 2·var(x)` and residual
    * codes are coarser than raw ones (the synthetic test corpus
    * measures recall 0.22 vs raw [[ivfpq]]'s ~0.5 — spec-documented).
    * Real embedding corpora are clustered; that is the case this
    * operator exists for.
    *
    * Plan shape: the coarse assign aggregates ONLY the scalar winning
    * cell id (array-valued aggregation buffers force Spark out of hash
    * aggregation into a sort-based fallback over the n×cells stream —
    * measured 6× slower at 100× data when the centroid rode through
    * `max_by`), and the residual is computed by re-attaching the vector
    * (one id-keyed co-shuffle, the same join the raw path pays for
    * codes⋈cells) and the centroid (broadcast). The 16 codebook
    * residuals are built on a dedicated ksub-row branch so the
    * broadcast codebook's lineage never re-plans the corpus-sized
    * assignment; encode / probed-cell pruning / salted shortlist /
    * exact re-rank all match [[ivfpq]].
    */
  def ivfpqResidual(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, dim: Int, k: Int, stride: Int = 50,
                    nProbe: Int = 5, m: Int = 8, ksub: Int = 16,
                    overscan: Int = 4, salts: Int = 32,
                    maxCells: Int = 256,
                    codebooks: Option[DataFrame] = scala.None,
                    coarse: Option[DataFrame] = scala.None): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val d = dim / m
    // systematic-path constants in ONE eager pass — the [[ivfpq]] r19
    // shape: stride anchor and codebook contiguity check share one
    // combined aggregate instead of two separate jobs
    val (coarseDf, nCentOpt): (DataFrame, Option[Long]) = coarse match {
      case Some(_) =>
        (coarseTable(corpus, idCol, vecCol, stride, maxCells, coarse,
          "ivfpqResidual"),
          if (codebooks.isEmpty)
            Some(corpus.filter(col(idCol) < ksub).count())
          else scala.None)
      case scala.None =>
        val n = corpus.count()
        require(n > 0, "ivfpqResidual needs a non-empty corpus")
        val effStride = math.max(stride.toLong,
          math.ceil(n / maxCells.toDouble).toLong)
        val row = corpus.agg(
          min(pmod(col(idCol).cast("long"), lit(effStride))).as("m"),
          count(when(col(idCol) < ksub, lit(1))).as("nc")).head()
        val cd = broadcast(corpus
          .filter(pmod(col(idCol), lit(effStride)) === row.getLong(0))
          .select(col(idCol).as("cell_id"),
            asDouble(col(vecCol)).as("centroid")))
        (cd, if (codebooks.isEmpty) Some(row.getLong(1)) else scala.None)
    }
    // coarse assign with a SCALAR aggregate only (see scaladoc), then
    // re-attach the vector and the winning centroid to form residuals
    val cells = residuals(corpus, idCol, vecCol, coarseDf)
    // probes keep the residual query vector per probed cell
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("qsim").desc, col("cell_id"))
    val probes = broadcast(q.join(coarseDf)
      .withColumn("qsim", cosineD(col("qv"), col("centroid")))
      .withColumn("qrn", row_number().over(wProbe))
      .filter(col("qrn") <= nProbe)
      .select(col("query_id"), col("cell_id"),
        zip_with(col("qv"), col("centroid"), (x, y) => x - y).as("rqv")))
    // residual sub-codebook ("slot" = codebook index, distinct from the
    // coarse cell_id): TRAINED residual-space codebooks when passed
    // ([[kmeansSubCodebooks]] over [[residuals]] — any id space), else
    // the systematic residual subvectors of ids 0..ksub-1
    def rsubs(df: DataFrame, id: String, vc: String, extra: Seq[String]) =
      df.select((col(id) +: extra.map(col)) :+
          posexplode(transform(sequence(lit(0), lit(m - 1)),
            j => slice(col(vc), j * d + 1, lit(d)))): _*)
        .toDF((Seq(id) ++ extra ++ Seq("sub", "subvec")): _*)
    val pqCent = broadcast(codebooks
      .map(_.select(col("sub"), col("cell_id").cast("long").as("slot"),
        col("cvec")))
      .getOrElse {
        val nCent = nCentOpt.get
        require(nCent == ksub,
          s"ivfpqResidual's systematic codebook needs contiguous ids " +
            s"0..${ksub - 1} in the corpus, found $nCent of $ksub — pass " +
            "codebooks trained on [[residuals]] for non-contiguous id " +
            "spaces (see ivfpqResidualTrained)")
        // the ksub codebook residuals on their own ksub-row branch (same
        // assignment rule, ksub×cells rows — trivial), so the broadcast
        // codebook's lineage is corpus-free however many joins consume it
        val wCb = Window.partitionBy(col("slot"))
          .orderBy(col("csim").desc, col("cell_id"))
        val cbRes = corpus.filter(col(idCol) < ksub)
          .select(col(idCol).as("slot"), asDouble(col(vecCol)).as("cv"))
          .join(coarseDf)
          .withColumn("csim", cosineD(col("cv"), col("centroid")))
          .withColumn("rn", row_number().over(wCb))
          .filter(col("rn") === 1)
          .select(col("slot"),
            zip_with(col("cv"), col("centroid"), (x, y) => x - y).as("rv"))
        rsubs(cbRes, "slot", "rv", Seq.empty)
          .select(col("sub"), col("slot"), col("subvec").as("cvec"))
      })
    // encode residuals; the coarse cell rides along to the code row
    val codes = rsubs(cells, "neighbor_id", "rv", Seq("ccell"))
      .join(pqCent, "sub")
      .withColumn("dist", l2sqD(col("subvec"), col("cvec")))
      .groupBy(col("neighbor_id"), col("sub"))
      .agg(min_by(col("slot"), struct(col("dist"), col("slot"))).as("code"),
        first(col("ccell")).as("ccell"))
      .groupBy(col("neighbor_id"))
      .agg(sort_array(collect_list(struct(col("sub"), col("code"))))
        .as("sc"),
        first(col("ccell")).as("cell_id"))
      .select(col("neighbor_id"), col("cell_id"),
        transform(col("sc"), s => s("code")).as("codes"))
    // per-(query, probed cell) ADC tables from the residual query
    val qtab = broadcast(rsubs(probes, "query_id", "rqv", Seq("cell_id"))
      .join(pqCent, "sub")
      .withColumn("qdist", l2sqD(col("subvec"), col("cvec")))
      .groupBy(col("query_id"), col("cell_id"))
      .agg(sort_array(collect_list(struct(col("sub"),
        col("slot").cast("long").as("code"), col("qdist")))).as("e"))
      .select(col("query_id"), col("cell_id"),
        transform(sequence(lit(0), lit(m - 1)), j =>
          transform(sequence(lit(0), lit(ksub - 1)), c =>
            element_at(col("e"), (j * ksub + c + 1).cast("int"))("qdist")))
          .as("tbl")))
    val approx = codes
      .join(probes.select(col("query_id"), col("cell_id")), "cell_id")
      .join(qtab, Seq("query_id", "cell_id"))
      .withColumn("adist",
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, j) =>
          acc + element_at(
            element_at(col("tbl"), (j + lit(1)).cast("int")),
            (element_at(col("codes"), (j + lit(1)).cast("int")) + lit(1))
              .cast("int"))))
    val wLocal = Window.partitionBy(col("query_id"), col("salt"))
      .orderBy(col("adist"), col("neighbor_id"))
    val wShort = Window.partitionBy(col("query_id"))
      .orderBy(col("adist"), col("neighbor_id"))
    val shortlist = approx
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("salt", pmod(col("neighbor_id"), lit(salts)))
      .withColumn("lrn", row_number().over(wLocal))
      .filter(col("lrn") <= k * overscan)
      .withColumn("srn", row_number().over(wShort))
      .filter(col("srn") <= k * overscan)
      .select(col("query_id"), col("neighbor_id"))
    val qv = broadcast(queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv")))
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    shortlist.join(cv, "neighbor_id").join(qv, "query_id")
      .withColumn("cosine", cosineD(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** [[ivfpqResidual]] with every quantizer TRAINED — the production
    * IVFADC composition on arbitrary id spaces: a full-vector k-means
    * coarse quantizer (m = 1, `nCells` centroids), then residual-space
    * sub-codebooks fit by the same Lloyd machinery over [[residuals]]
    * (k-means trains on `v − centroid(cell(v))`, the space the codes
    * actually live in — FAISS's `train_residual`). All training is
    * count-capped deterministic sampling ([[kmeansSubCodebooks]]), so
    * training cost is constant in corpus size; the search plan is
    * [[ivfpqResidual]]'s unchanged.
    */
  def ivfpqResidualTrained(corpus: DataFrame, queries: DataFrame,
                           idCol: String, vecCol: String, dim: Int, k: Int,
                           nProbe: Int = 5, m: Int = 8, ksub: Int = 16,
                           nCells: Int = 16, iters: Int = 2,
                           trainMod: Int = 4, maxTrain: Int = 8192,
                           overscan: Int = 4, salts: Int = 32): DataFrame = {
    // one corpus count serves BOTH trainings: the residual frame has
    // exactly one row per corpus vector (assign emits one winning cell
    // per id, both re-attach joins are key-preserving), so counting it
    // would re-run the full coarse-assign lineage for the same number
    val n = corpus.count()
    val coarseCb = kmeansSubCodebooks(corpus, idCol, vecCol, dim,
        m = 1, ksub = nCells, iters = iters, trainMod = trainMod,
        maxTrain = maxTrain, knownCount = Some(n))
      .select(col("cell_id"), col("cvec").as("centroid"))
    val res = residuals(corpus, idCol, vecCol, coarseCb)
    val cbs = kmeansSubCodebooks(res, "neighbor_id", "rv", dim, m, ksub,
      iters = iters, trainMod = trainMod, maxTrain = maxTrain,
      knownCount = Some(n))
    ivfpqResidual(corpus, queries, idCol, vecCol, dim, k,
      nProbe = nProbe, m = m, ksub = ksub, overscan = overscan,
      salts = salts, codebooks = Some(cbs), coarse = Some(coarseCb))
  }

  /** The PQ search machinery shared by [[pq]] and [[pqTrained]]:
    * encode → per-query ADC tables → map-side approx-distance fold →
    * salted two-phase shortlist → exact re-rank. `centroids` must be
    * `(sub: 0..m-1, cell_id: 0..ksub-1 CONTIGUOUS, cvec)` — a code
    * indexes the ADC table row by position.
    */
  private def pqSearch(corpus: DataFrame, queries: DataFrame, idCol: String,
                       vecCol: String, centroidsIn: DataFrame, dim: Int,
                       k: Int, m: Int, ksub: Int, overscan: Int,
                       salts: Int): DataFrame = {
    val d = dim / m
    // (id, sub, subvec): the m contiguous subvectors of each vector
    def subs(df: DataFrame, id: String) =
      df.select(col(idCol).as(id),
          posexplode(transform(sequence(lit(0), lit(m - 1)),
            j => slice(asDouble(col(vecCol)), j * d + 1, lit(d)))))
        .toDF(id, "sub", "subvec")
    val centroids = broadcast(centroidsIn)
    // encode: per (vector, subspace) the L2-nearest sub-centroid id;
    // min_by is partial-aggregatable (same shape as ivf's assign), and
    // the per-vector codes collapse to ONE sub-ordered array row
    val codes = subs(corpus, "neighbor_id")
      .join(centroids, "sub")
      .withColumn("dist", l2sqD(col("subvec"), col("cvec")))
      .groupBy(col("neighbor_id"), col("sub"))
      .agg(min_by(col("cell_id"), struct(col("dist"), col("cell_id")))
        .as("code"))
      .groupBy(col("neighbor_id"))
      .agg(sort_array(collect_list(struct(col("sub"), col("code"))))
        .as("sc"))
      .select(col("neighbor_id"),
        transform(col("sc"), s => s("code")).as("codes"))
    // per-query subdistance tables reshaped to tbl[m][ksub] (sorted by
    // (sub, code), so position j*ksub + c IS (sub j, code c)) — |Q| rows
    // of m·ksub doubles, broadcast
    val qtab = broadcast(subs(queries, "query_id")
      .join(centroids, "sub")
      .withColumn("qdist", l2sqD(col("subvec"), col("cvec")))
      .groupBy(col("query_id"))
      .agg(sort_array(collect_list(struct(col("sub"),
        col("cell_id").cast("long").as("code"), col("qdist")))).as("e"))
      .select(col("query_id"),
        transform(sequence(lit(0), lit(m - 1)), j =>
          transform(sequence(lit(0), lit(ksub - 1)), c =>
            element_at(col("e"), (j * ksub + c + 1).cast("int"))("qdist")))
          .as("tbl")))
    // ADC: map-side fold of m table lookups per (vector, query) pair
    val approx = codes.join(qtab)
      .withColumn("adist",
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, j) =>
          acc + element_at(
            element_at(col("tbl"), (j + lit(1)).cast("int")),
            (element_at(col("codes"), (j + lit(1)).cast("int")) + lit(1))
              .cast("int"))))
    // two-phase top-(overscan·k): local per-salt cut, then the global
    // cut over salts·overscan·k survivors — identical result to one
    // global window (the global top-S is inside the union of per-salt
    // top-S), without a corpus-sized single-task sort per query
    val wLocal = Window.partitionBy(col("query_id"), col("salt"))
      .orderBy(col("adist"), col("neighbor_id"))
    val wShort = Window.partitionBy(col("query_id"))
      .orderBy(col("adist"), col("neighbor_id"))
    val shortlist = approx
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("salt", pmod(col("neighbor_id"), lit(salts)))
      .withColumn("lrn", row_number().over(wLocal))
      .filter(col("lrn") <= k * overscan)
      .withColumn("srn", row_number().over(wShort))
      .filter(col("srn") <= k * overscan)
      .select(col("query_id"), col("neighbor_id"))
    // exact cosine re-rank of the shortlist
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    shortlist.join(c, "neighbor_id").join(q, "query_id")
      .withColumn("cosine", cosineD(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** D9: in-engine recall@k evaluation — the index-quality report a
    * production vector store runs continuously (an ANN index silently
    * decays as the corpus drifts from its training distribution; D8's
    * append scaladoc says "rebuild when recall decays" — THIS is the
    * operator that notices). Per query: how many of the exact top-k
    * rows (`exact`) the approximate result (`approx`) recovered, and
    * the recall fraction. A left join from truth to the approx set,
    * one per-query partial-agg count — both inputs are top-k-bounded
    * (k rows per query), so the whole report is O(|queries|·k)
    * whatever the corpus size; the expensive part is producing `exact`,
    * which an operations cadence amortizes over a SAMPLED query set.
    */
  def recall(exact: DataFrame, approx: DataFrame): DataFrame = {
    // denominator = the per-query count of exact rows (recall@k when
    // `exact` is a top-k table): a truth set with fewer than k rows
    // (corpus smaller than k+1, or a filtered slice) must still score
    // 1.0 when the index recovered everything recoverable. The approx
    // side is deduped first so a caller handing a non-deduped
    // candidate list can't fan out joined truth rows and corrupt both
    // counts. The exact projection is deduped for the same reason: a
    // truth table with duplicate (query_id, neighbor_id) rows would
    // fan out the join and inflate n_hits and n_exact together,
    // silently skewing recall.
    exact.select(col("query_id"), col("neighbor_id")).distinct()
      .join(approx.select(col("query_id"), col("neighbor_id")).distinct()
        .withColumn("_hit", lit(1L)),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("_hit"), lit(0L))).as("n_hits"),
        count(lit(1)).as("n_exact"))
      .withColumn("recall", round(col("n_hits") / col("n_exact"), 6))
      .orderBy("query_id")
  }

  /** D9b: recall@k vs nProbe TUNING SWEEP over ONE IVF geometry — the
    * measured recall-vs-cost curve that turns the main IVF knob into
    * an engineering decision (each +1 probe scans ~1/cells more of
    * the corpus; the question is what recall it buys ON THIS corpus).
    * ONE plan, not |settings| searches: the corpus is cell-assigned
    * once, each query's cells are ranked once to max(nProbes), exact
    * cosine runs once per probed (query, candidate) pair at the
    * WIDEST setting, and every narrower setting is a filter on the
    * candidate's probe rank (probing p cells sees exactly the pairs
    * with rank ≤ p — the nested-probe property) — so the sweep costs
    * one max-setting search plus per-setting top-k windows. Truth is
    * one [[bruteForce]] top-k. One row per (n_probe, query): (n_probe,
    * query_id, n_hits, n_exact, recall); recall is non-decreasing in
    * n_probe per query BY CONSTRUCTION (candidate sets nest), which
    * the spec pins along with per-setting equality to the
    * single-setting [[ivf]]+[[recall]] composition.
    */
  def recallSweep(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, k: Int,
                  nProbes: Seq[Int] = Seq(1, 2, 4, 8),
                  stride: Int = 50, maxCells: Int = 256,
                  coarse: Option[DataFrame] = scala.None): DataFrame = {
    require(nProbes.nonEmpty && nProbes.forall(_ >= 1),
      s"nProbes must be non-empty positive settings, got $nProbes")
    val spark = corpus.sparkSession
    import spark.implicits._
    val maxProbe = nProbes.max
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    val centroids = coarseTable(corpus, idCol, vecCol, stride, maxCells,
      coarse, "recallSweep")
    // the ivfCandidates assignment: broadcast argmax, partial-agg safe
    val cells = c.join(centroids)
      .withColumn("csim", cosineD(col("cv"), col("centroid")))
      .groupBy(col("neighbor_id"))
      .agg(max_by(struct(col("cell_id"), col("cv")),
        struct(col("csim"), -col("cell_id"))).as("best"))
      .select(col("best.cell_id").as("cell_id"), col("neighbor_id"),
        col("best.cv").as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("qsim").desc, col("cell_id"))
    // ranked to the WIDEST setting; qrn is each cell's probe rank
    val probes = broadcast(q.join(centroids)
      .withColumn("qsim", cosineD(col("qv"), col("centroid")))
      .withColumn("qrn", row_number().over(wProbe))
      .filter(col("qrn") <= maxProbe)
      .select(col("query_id"), col("qv"), col("cell_id"), col("qrn")))
    val cand = cells.join(probes, "cell_id")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosineD(col("qv"), col("cv")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("qrn"))
    sweepScore(cand, corpus, queries, idCol, vecCol, k, nProbes)
  }

  /** The shared scoring tail of the nProbe sweeps: per-setting top-k
    * windows over the rank-annotated candidate set (probing p cells
    * sees exactly the pairs with `qrn` ≤ p — the nested-probe
    * property), one [[bruteForce]] truth, recall per (n_probe, query).
    */
  private def sweepScore(cand: DataFrame, corpus: DataFrame,
                         queries: DataFrame, idCol: String,
                         vecCol: String, k: Int,
                         nProbes: Seq[Int]): DataFrame = {
    val spark = cand.sparkSession
    import spark.implicits._
    val settings = broadcast(
      nProbes.distinct.sorted.toDF("n_probe"))
    val wSet = Window.partitionBy(col("n_probe"), col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val approx = cand.join(settings, col("qrn") <= col("n_probe"))
      .withColumn("rank", row_number().over(wSet))
      .filter(col("rank") <= k)
      .select(col("n_probe"), col("query_id"), col("neighbor_id"),
        lit(1L).as("_hit"))
    val exact = bruteForce(corpus, queries, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
      .crossJoin(settings)
    exact.join(approx, Seq("n_probe", "query_id", "neighbor_id"), "left")
      .groupBy(col("n_probe"), col("query_id"))
      .agg(sum(coalesce(col("_hit"), lit(0L))).as("n_hits"),
        count(lit(1)).as("n_exact"))
      .withColumn("recall", round(col("n_hits") / col("n_exact"), 6))
      .orderBy("n_probe", "query_id")
  }

  /** D9c: [[recallSweep]] off the PERSISTED IVF×PQ store — the
    * serving-side twin: the in-plan sweep pays D3's per-call
    * corpus→cell assignment (the suite's knn_ivf-shaped ratio100);
    * here the stored layout IS the assignment, so a sweep reads only
    * the probed `cell_id=` partitions (the [[rangeSearchIndexed]]
    * partition-filter pattern) plus exact vectors for the candidate
    * rescore — the amortized cost curve an operator actually sweeps
    * against a production store. When the store was built under the
    * frozen [[strideCoarse]] (the registered fixture), the stored
    * assignment equals the in-plan argmax rule exactly, so answers
    * equal [[recallSweep]]'s verbatim (spec-pinned) and the oracle
    * replays the in-plan formulation with no store in sight.
    */
  def recallSweepIndexed(spark: SparkSession, dir: String,
                         queries: DataFrame, idCol: String,
                         vecCol: String, dim: Int, k: Int,
                         corpus: DataFrame,
                         nProbes: Seq[Int] = Seq(1, 2, 4, 8))
      : DataFrame = {
    require(nProbes.nonEmpty && nProbes.forall(_ >= 1),
      s"nProbes must be non-empty positive settings, got $nProbes")
    val maxProbe = nProbes.max
    val coarseRaw = spark.read.parquet(s"$dir/coarse")
    requireIndexDim(coarseRaw, dir, dim)
    val coarseDf = broadcast(coarseRaw
      .select(col("cell_id"), asDouble(col("centroid")).as("centroid")))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("qsim").desc, col("cell_id"))
    val probes0 = q.join(coarseDf)
      .withColumn("qsim", cosineD(col("qv"), col("centroid")))
      .withColumn("qrn", row_number().over(wProbe))
      .filter(col("qrn") <= maxProbe)
      .select(col("query_id"), col("qv"), col("cell_id"), col("qrn"))
    val probes = broadcast(probes0)
    // O(|queries|·maxProbe) driver-side cell list -> partition filter:
    // only probed cells' FILES are read. Collected from the UNHINTED
    // frame: a broadcast hint atop a collected aggregate is not part of
    // any join and only trips HintErrorLogger (r19 hygiene).
    val probedCells = probes0.select(col("cell_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    val cand = readCodes(spark, dir)
      .filter(col("cell_id").isin(probedCells: _*))
      .select(col("neighbor_id"), col("cell_id"))
      .join(probes, "cell_id")
      .filter(col("neighbor_id") =!= col("query_id"))
      .join(cv, "neighbor_id")
      .withColumn("cosine", cosineD(col("qv"), col("cv")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("qrn"))
    sweepScore(cand, corpus, queries, idCol, vecCol, k, nProbes)
  }

  /** D8 (build): persisted IVF×PQ index — the "build once, search
    * many" lifecycle production vector stores run, as a parquet layout
    * Spark can partition-prune:
    *
    *   dir/coarse/           (cell_id, centroid)    — coarseCells rows
    *   dir/codebooks/        (sub, cell_id, cvec)   — m·ksub rows
    *   dir/codes/cell_id=C/  (neighbor_id, codes)   — one Hive
    *                         partition per coarse cell
    *
    * Both quantizers are the trained k-means tables
    * ([[kmeansSubCodebooks]], count-capped sample); assignment and
    * encode are the same broadcast + partial-agg reductions [[ivfpq]]
    * plans inline. The payoff over the in-plan path: the corpus-sized
    * train/assign/encode cost is paid ONCE at build, and every later
    * search scans only its probed `cell_id=` partitions — file-layer
    * pruning, no per-run encode.
    */
  def buildIvfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                      dir: String, dim: Int, m: Int = 8, ksub: Int = 16,
                      coarseCells: Int = 16, iters: Int = 2,
                      trainMod: Int = 2,
                      coarse: Option[DataFrame] = scala.None,
                      codebooks: Option[DataFrame] = scala.None): Unit = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val d = dim / m
    // `coarse` override = FAISS's pretrained-quantizer constructor
    // (IndexIVFPQ takes an already-trained coarse index): callers can
    // freeze e.g. [[strideCoarse]] — whose assignment a plain-SQL
    // oracle can replay — or a coarse trained on a reference
    // distribution; default trains full-vector k-means here.
    // `codebooks` is the same posture for the PQ side — REQUIRED when
    // several shard builds must later [[mergeIvfPqIndexes]] (stores
    // with independently-trained quantizers cannot merge: the same
    // byte codes would decode to different subvectors).
    val coarseTab = coarse.map(_.select(col("cell_id"),
        col("centroid")))
      .getOrElse(kmeansSubCodebooks(corpus, idCol, vecCol, dim, 1,
          coarseCells, iters, trainMod)
        .select(col("cell_id"), col("cvec").as("centroid")))
    val cbs = codebooks
      .map(_.select(col("sub"), col("cell_id"), col("cvec")))
      .getOrElse(kmeansSubCodebooks(corpus, idCol, vecCol, dim, m, ksub,
        iters, trainMod))
    coarseTab.write.mode("overwrite").parquet(s"$dir/coarse")
    cbs.write.mode("overwrite").parquet(s"$dir/codebooks")
    assignAndEncode(corpus, idCol, vecCol,
        broadcast(coarseTab.select(col("cell_id"),
          asDouble(col("centroid")).as("centroid"))), cbs, m, d)
      .write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$dir/codes")
  }

  /** The ONE coarse-assign + PQ-encode pipeline shared by
    * [[buildIvfPqIndex]] and [[appendToIvfPqIndex]] (build-vs-append
    * drift would silently corrupt the persisted index): broadcast
    * argmax cell assignment (ties toward the smallest cell_id — the
    * [[ivfpq]] rule), broadcast argmin sub-code encode, both
    * partial-agg reductions; returns `(neighbor_id, codes, cell_id)`.
    */
  private def assignAndEncode(rows: DataFrame, idCol: String,
                              vecCol: String, coarseB: DataFrame,
                              cbs: DataFrame, m: Int, d: Int): DataFrame = {
    val cells = rows
      .select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .join(coarseB)
      .withColumn("csim", cosineD(col("cv"), col("centroid")))
      .groupBy(col("neighbor_id"))
      .agg(max_by(col("cell_id"), struct(col("csim"), -col("cell_id")))
        .as("cell_id"))
    val subs = rows.select(col(idCol).as("neighbor_id"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          j => slice(asDouble(col(vecCol)), j * d + 1, lit(d)))))
      .toDF("neighbor_id", "sub", "subvec")
    val codes = subs.join(broadcast(cbs), "sub")
      .withColumn("dist", l2sqD(col("subvec"), col("cvec")))
      .groupBy(col("neighbor_id"), col("sub"))
      .agg(min_by(col("cell_id"), struct(col("dist"), col("cell_id")))
        .as("code"))
      .groupBy(col("neighbor_id"))
      .agg(sort_array(collect_list(struct(col("sub"), col("code"))))
        .as("sc"))
      .select(col("neighbor_id"),
        transform(col("sc"), s => s("code")).as("codes"))
    codes.join(cells, "neighbor_id")
  }

  /** The stored build dim of a [[buildIvfPqIndex]] layout is the
    * coarse centroid length; append/search must match it EXACTLY — a
    * caller whose dim merely shares divisibility by m would otherwise
    * slice mismatched-length subvectors and silently corrupt the
    * persisted codes (one tiny-read head() against the coarse table).
    */
  private def requireIndexDim(coarse: DataFrame, dir: String,
                              dim: Int): Unit = {
    val stored = coarse.select(size(col("centroid"))).head().getInt(0)
    require(stored == dim,
      s"index at $dir was built with dim $stored, caller passed $dim")
  }

  /** The codes table's read schema (partition column last, as parquet
    * partition inference returns it). */
  private val CodesSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("neighbor_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("codes",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType)),
    org.apache.spark.sql.types.StructField("cell_id",
      org.apache.spark.sql.types.IntegerType)))

  /** Read `dir/codes`, tolerating the fully-purged state (a legal
    * retention outcome — [[removeFromIvfPqIndex]] drops every
    * `cell_id=` partition when the whole corpus is purged): an empty
    * frame with the layout's schema comes back instead of a parquet
    * schema-inference failure, so search answers "no neighbors" and a
    * later append restores the index.
    */
  private def readCodes(spark: SparkSession, dir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(s"$dir/codes")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasCells = fs.exists(root) && fs.listStatus(root).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith("cell_id="))
    if (hasCells) spark.read.parquet(s"$dir/codes")
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], CodesSchema)
  }

  /** D8 (append): add new vectors to a [[buildIvfPqIndex]] layout
    * WITHOUT retraining — the FAISS `add` lifecycle an ingest cycle
    * runs: the stored coarse table and sub-codebooks are read back
    * (frozen), the delta is assigned + encoded with the same broadcast
    * partial-agg reductions, and its codes APPEND into the existing
    * `cell_id=` partitions (dynamic partition append — untouched cells'
    * files are not rewritten). Quantization drifts as the corpus grows
    * away from the training distribution — the accepted trade
    * production stores make between per-batch retrains; rebuild when
    * recall decays.
    */
  def appendToIvfPqIndex(delta: DataFrame, idCol: String, vecCol: String,
                         dir: String, dim: Int): Unit = {
    val spark = delta.sparkSession
    val coarseRaw = spark.read.parquet(s"$dir/coarse")
    requireIndexDim(coarseRaw, dir, dim)
    val coarseB = broadcast(coarseRaw
      .select(col("cell_id"), asDouble(col("centroid")).as("centroid")))
    val cbs = spark.read.parquet(s"$dir/codebooks")
    val m = cbs.agg(max(col("sub"))).head().getInt(0) + 1
    require(dim % m == 0, s"dim $dim not divisible by index m $m")
    assignAndEncode(delta, idCol, vecCol, coarseB, cbs, m, dim / m)
      .write.mode("append").partitionBy("cell_id")
      .parquet(s"$dir/codes")
  }

  /** D8 (remove): delete vectors from a [[buildIvfPqIndex]] layout —
    * the GDPR-purge / retention lifecycle, WITHOUT a full rebuild and
    * without touching the search path: only the `cell_id=` partitions
    * that actually contain a purged id are rewritten (dynamic
    * partition overwrite), every other partition's files stay
    * byte-identical, and [[searchIvfPqIndex]] needs no tombstone
    * awareness because deleted codes physically leave the layout. A
    * cell whose every code is purged has its partition directory
    * removed outright. Codebooks and coarse centroids are NOT retrained
    * (same frozen-quantizer trade as [[appendToIvfPqIndex]] — rebuild
    * when recall decays). The purge list is an id set (broadcast —
    * deletion requests are bounded, nothing corpus-scale); the only
    * driver-side materialization is the affected CELL list, ≤
    * coarseCells rows by construction. Returns the number of codes
    * removed.
    */
  def removeFromIvfPqIndex(deleteIds: DataFrame, idCol: String,
                           dir: String): Long = {
    val spark = deleteIds.sparkSession
    val ids = deleteIds.select(col(idCol).cast("long").as("neighbor_id"))
      .distinct()
    val codes = readCodes(spark, dir)
    val affected = codes.join(broadcast(ids), "neighbor_id")
    val cells = affected.select(col("cell_id")).distinct().collect()
      .map(_.getAs[Number](0).intValue()).sorted
    if (cells.isEmpty) return 0L
    val removed = affected.count()
    // localCheckpoint (not persist): the write below dynamically
    // OVERWRITES $dir/codes, the very path this frame's lineage reads.
    // A cached plan can lose blocks (executor death) mid-commit and
    // recompute from partially-swapped source files, persisting
    // corrupt codes; checkpointing truncates the lineage so the write
    // plan has no path back to the directory being replaced.
    // Dataset.unpersist only releases CacheManager entries and never
    // touches the RDD-level blocks a localCheckpoint pins, so snapshot
    // the persistent-RDD set and free exactly the checkpoint's blocks
    // in the finally below — otherwise every purge leaks a
    // cells-sized block set until RDD GC. (Assumes no concurrent
    // persist in this session between the snapshot and the diff — the
    // single-writer posture this maintenance API already requires.)
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val remaining = codes
      .filter(col("cell_id").isin(cells.map(Integer.valueOf): _*))
      .join(broadcast(ids), Seq("neighbor_id"), "left_anti")
      .localCheckpoint()
    try {
      val keptCells = remaining.select(col("cell_id")).distinct().collect()
        .map(_.getAs[Number](0).intValue()).toSet
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "dynamic")
      try remaining.write.mode("overwrite").partitionBy("cell_id")
        .parquet(s"$dir/codes")
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case scala.None => spark.conf.unset(key)
      }
      // dynamic overwrite only rewrites partitions present in the
      // data — a fully-purged cell keeps its old files unless the
      // directory is dropped explicitly
      val root = new org.apache.hadoop.fs.Path(s"$dir/codes")
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      cells.filterNot(keptCells).foreach { c =>
        fs.delete(new org.apache.hadoop.fs.Path(root, s"cell_id=$c"), true)
      }
      StoreMaintenance.refreshPath(spark, s"$dir/codes")
    } finally {
      val rdds = spark.sparkContext.getPersistentRDDs
      (rdds.keySet diff persistedBefore)
        .foreach(id => rdds.get(id).foreach(_.unpersist(blocking = false)))
    }
    removed
  }

  /** D8 (compact): coalesce fragmented `cell_id=` partitions after an
    * append-heavy ingest cycle — every [[appendToIvfPqIndex]] is a
    * pure file-add, so a store that ingested B batches carries up to
    * B+1 files per probed cell, and each [[searchIvfPqIndex]] pays
    * per-file open/footer/task costs on KB-sized splits (the classic
    * small-files tax at cluster scale). Only cells over
    * `maxFilesPerCell` files are read (partition-pruned) and
    * rewritten to one file each; every other cell's files stay
    * byte-identical (spec-pinned), the row set is unchanged, and the
    * search path needs no awareness (same rows, fewer files). Frozen
    * quantizers are untouched — compaction is file surgery, not a
    * rebuild. Returns (cellsCompacted, filesBefore, filesAfter).
    */
  def compactIvfPqIndex(spark: SparkSession, dir: String,
                        maxFilesPerCell: Int = 1): (Int, Long, Long) =
    StoreMaintenance.compactPartitioned(spark, s"$dir/codes", "cell_id",
      maxFilesPerCell)

  /** D8 (stats): per-cell health of a [[buildIvfPqIndex]] layout —
    * (cell_id, n_codes, n_files, bytes) — the report that drives the
    * compact/rebuild decision (file fragmentation → [[compactIvfPqIndex]];
    * cell-count imbalance → recall drift, rebuild). The listing side
    * is O(coarseCells) driver work; the count side is one
    * column-pruned partial aggregation over the codes.
    */
  def ivfPqIndexStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val files = StoreMaintenance
      .partitionFileStats(spark, s"$dir/codes", "cell_id")
      .toDF("cell_id", "n_files", "bytes")
    readCodes(spark, dir)
      .groupBy(col("cell_id")).agg(count(lit(1)).as("n_codes"))
      .join(files, Seq("cell_id"), "right")
      .withColumn("n_codes", coalesce(col("n_codes"), lit(0L)))
      .select(col("cell_id"), col("n_codes"), col("n_files"), col("bytes"))
      .orderBy("cell_id")
  }

  /** D8 (fsck): structural integrity check over a [[buildIvfPqIndex]]
    * layout — the [[graft.operators.BulkLoad]] repair discipline for
    * the vector store: after crashes, manual surgery, or a bad writer,
    * an index can hold silently-corrupt state that search only
    * surfaces as wrong answers. One report row per invariant:
    * (check, ok, n_bad, detail).
    *
    *   - `coarse_uniform`: centroid lengths agree (the stored dim);
    *   - `codebooks_complete`: subs tile 0..m−1, every sub carries the
    *     same cell count, every cvec is dim/m long;
    *   - `codes_len`: every code array is exactly m long;
    *   - `codes_range`: every code falls in [0, ksub);
    *   - `ids_unique`: no neighbor_id appears twice (a replayed append
    *     or a mid-compaction crash duplicates rows — search would
    *     return the same neighbor twice);
    *   - `cells_known`: every stored cell_id has a coarse centroid
    *     (an orphan partition is unreachable by any probe — rows
    *     silently invisible).
    *
    * Cost: the metadata checks are tiny reads; the codes checks are
    * one partial-agg pass plus one id-keyed shuffle for uniqueness —
    * fsck cadence, not query cadence.
    */
  def fsckIvfPqIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the integrity checker must REPORT a missing/empty/unreadable
    // sidecar as the corruption it is, not crash on it (an empty max
    // would NPE below and the fsck would die exactly when needed)
    def tryRead(name: String): Either[String, DataFrame] =
      try {
        val df = spark.read.parquet(s"$dir/$name")
        if (df.head(1).isEmpty) Left(s"$name sidecar is EMPTY")
        else Right(df)
      } catch {
        case e: Exception =>
          Left(s"$name sidecar unreadable: ${
            Option(e.getMessage).getOrElse(e.getClass.getName).take(80)}")
      }
    (tryRead("coarse"), tryRead("codebooks")) match {
      case (cE, bE) if cE.isLeft || bE.isLeft =>
        val skip = "skipped: quantizer sidecar corrupt"
        return Seq(
          ("coarse_uniform", cE.isRight, if (cE.isLeft) 1L else 0L,
            cE.left.getOrElse("readable")),
          ("codebooks_complete", bE.isRight, if (bE.isLeft) 1L else 0L,
            bE.left.getOrElse("readable")),
          ("codes_len", false, 0L, skip),
          ("codes_range", false, 0L, skip),
          ("ids_unique", false, 0L, skip),
          ("cells_known", false, 0L, skip)
        ).toDF("check", "ok", "n_bad", "detail")
      case _ => ()
    }
    val coarse = spark.read.parquet(s"$dir/coarse")
    val dimCounts = coarse.groupBy(size(col("centroid")).as("d"))
      .count().collect()
    val dim = dimCounts.map(r => (r.getInt(0), r.getLong(1)))
      .maxBy(_._2)._1
    val badDims = dimCounts.filter(_.getInt(0) != dim)
      .map(_.getLong(1)).sum
    val cbs = spark.read.parquet(s"$dir/codebooks")
    val m = cbs.agg(max(col("sub"))).head().getInt(0) + 1
    val subStats = cbs.groupBy(col("sub"))
      .agg(count(lit(1)).as("k"),
        countDistinct(size(col("cvec"))).as("dl"),
        max(size(col("cvec"))).as("dmax"))
      .collect()
    val ksub = subStats.map(_.getAs[Long]("k")).max.toInt
    val cbBad =
      (0 until m).count(s => !subStats.exists(_.getAs[Int]("sub") == s)) +
        subStats.count(r => r.getAs[Long]("k") != ksub ||
          r.getAs[Long]("dl") != 1L ||
          r.getAs[Int]("dmax") != dim / m)
    val codes = readCodes(spark, dir)
    val known = coarse.select(col("cell_id")).distinct().collect()
      .map(_.getAs[Number](0).intValue()).toSet
    // one partial-agg pass for the per-row invariants
    val rowBad = codes.agg(
      sum(when(size(col("codes")) =!= m, 1L).otherwise(0L)).as("len"),
      sum(when(exists(col("codes"),
        c => c < 0 || c >= ksub), 1L).otherwise(0L)).as("rng"),
      sum(when(!col("cell_id").isin(known.toSeq.map(Integer.valueOf): _*),
        1L).otherwise(0L)).as("orphan"))
      .collect().headOption
    val (badLen, badRng, orphan) = rowBad match {
      case Some(r) if !r.isNullAt(0) =>
        (r.getAs[Long]("len"), r.getAs[Long]("rng"), r.getAs[Long]("orphan"))
      case _ => (0L, 0L, 0L) // empty (fully-purged) store: all clean
    }
    val dupIds = codes.groupBy(col("neighbor_id"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).count()
    Seq(
      ("coarse_uniform", badDims == 0L, badDims,
        s"stored dim $dim, ${coarse.count()} centroids"),
      ("codebooks_complete", cbBad == 0, cbBad.toLong,
        s"m=$m ksub=$ksub subdim=${dim / m}"),
      ("codes_len", badLen == 0L, badLen, s"expect $m codes per row"),
      ("codes_range", badRng == 0L, badRng, s"expect codes in [0, $ksub)"),
      ("ids_unique", dupIds == 0L, dupIds,
        "duplicate neighbor_id rows (replayed append / crashed compact)"),
      ("cells_known", orphan == 0L, orphan,
        s"${known.size} coarse cells")
    ).toDF("check", "ok", "n_bad", "detail")
  }

  /** D8 (merge): combine stores built under the SAME frozen quantizers
    * into one — FAISS `merge_from`, the distributed-build endgame:
    * shard a billion-vector corpus, run [[buildIvfPqIndex]] per shard
    * in parallel (each with the shared pretrained `coarse` +
    * `codebooks` overrides), then merge = pure FILE CONCATENATION per
    * `cell_id=` partition — no Spark job touches a code row, because
    * identical quantizers mean identical cell assignment and byte
    * semantics. Quantizer identity is VERIFIED (exact row-set equality
    * of both sidecars, driver-side — they are tiny), not trusted: the
    * same byte codes under different codebooks decode to different
    * vectors, the silent-corruption worst case. Sources' files are
    * copied with disambiguated names; `dst` may be one of the sources
    * (in-place merge = copy the others in). Returns the number of
    * code files copied. Single-writer posture; run
    * [[fsckIvfPqIndex]] after (ids_unique catches shard overlap —
    * merge does not dedup across shards, exactly like FAISS). The
    * (src, dst) file list is enumerated driver-side (O(partitions ×
    * shards)) but the BYTES move as a Spark job
    * ([[StoreMaintenance.copyFilesDistributed]]) — merge bandwidth
    * scales with the cluster, the driver touches no data path.
    * `dryRun=true` runs the full quantizer-admission check and file
    * enumeration (incompatible shards still refuse loudly) but moves
    * nothing — returns the would-copy count.
    */
  def mergeIvfPqIndexes(spark: SparkSession, dst: String,
                        srcs: Seq[String],
                        dryRun: Boolean = false): Long = {
    // quantizer identity compared on TYPED values (integer key fields
    // + vector elements), not Row.toString renderings: string equality
    // is brittle (double formatting, -0.0 vs 0.0) and would refuse a
    // numerically-identical but re-serialized sidecar. The sort key is
    // the TYPED key tuple (fields in name order, so a re-serialized
    // sidecar with reordered columns still compares) — never a hash
    // fold, whose collisions would make the sorted order depend on
    // nondeterministic collect() order and spuriously refuse an
    // identical sidecar
    def sidecar(dir: String, name: String): Seq[(Seq[Int], Seq[Double])] =
      spark.read.parquet(s"$dir/$name").collect().map { r =>
        val (vecFields, keyFields) = r.schema.fields.partition(
          _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
        require(vecFields.length == 1,
          s"$name sidecar must have exactly one vector column")
        val key = keyFields.sortBy(_.name).map(f =>
          r.getAs[Number](f.name).intValue()).toSeq
        // normalize -0.0 to 0.0 AT READ so sorting and equality agree
        (key, r.getAs[scala.collection.Seq[Number]](vecFields.head.name)
          .map(_.doubleValue() + 0.0).toSeq)
      }.sortBy(p => (p._1, p._2))(
        Ordering.Tuple2(Ordering.Implicits.seqOrdering[Seq, Int],
          Ordering.Implicits.seqOrdering[Seq, Double])).toSeq
    def sameSidecar(a: Seq[(Seq[Int], Seq[Double])],
                    b: Seq[(Seq[Int], Seq[Double])]): Boolean =
      a.size == b.size && a.zip(b).forall { case ((ka, va), (kb, vb)) =>
        ka == kb && va.size == vb.size &&
          va.zip(vb).forall { case (x, y) =>
            java.lang.Double.compare(x + 0.0, y + 0.0) == 0 }
      }
    val wantCoarse = sidecar(dst, "coarse")
    val wantCbs = sidecar(dst, "codebooks")
    srcs.foreach { s =>
      require(sameSidecar(sidecar(s, "coarse"), wantCoarse),
        s"$s was built under a DIFFERENT coarse quantizer than $dst — " +
          "stores with independent quantizers cannot merge")
      require(sameSidecar(sidecar(s, "codebooks"), wantCbs),
        s"$s was built under DIFFERENT codebooks than $dst")
    }
    val dstRoot = new org.apache.hadoop.fs.Path(s"$dst/codes")
    val pairs = srcs.filterNot(_ == dst).zipWithIndex.flatMap {
      case (src, i) =>
        StoreMaintenance.partitionDirs(spark,
            new org.apache.hadoop.fs.Path(s"$src/codes"), "cell_id")
          .flatMap { case (cell, p) =>
            StoreMaintenance.dataFiles(spark, p).map { case (f, _) =>
              (f.toString, new org.apache.hadoop.fs.Path(dstRoot,
                s"cell_id=$cell/merge$i-${f.getName}").toString)
            }
          }
    }
    // dry run: the full admission check ran (incompatible quantizers
    // refused loudly above) — report the would-copy count, move nothing
    if (dryRun) pairs.size.toLong
    else StoreMaintenance.copyFilesDistributed(spark, pairs)
  }

  /** D8 (repair): fix what [[fsckIvfPqIndex]] flags, without a rebuild
    * — the BulkLoad backup/repair discipline completing the store's
    * lifecycle: duplicate neighbor_id rows collapse to ONE surviving
    * copy (deterministic winner: smallest (cell_id, codes-hash), so
    * re-running after a crash converges), malformed rows (wrong code
    * length, out-of-range codes) drop — no ADC can score garbage —
    * and orphan-cell partitions (no coarse centroid ⇒ unreachable by
    * any probe) drop outright. File surgery only: the orphan dirs are
    * deleted and ONLY the cells containing an offending row are
    * rewritten (dynamic overwrite, localCheckpoint-before-overwrite
    * lineage guard); every clean cell's files stay byte-identical.
    * Returns (rowsDropped, cellsRewritten). Idempotent; quantizers
    * untouched (a drifted quantizer is [[ivfPqIndexDrift]]'s rebuild
    * territory, not repair's).
    */
  def repairIvfPqIndex(spark: SparkSession, dir: String): (Long, Int) = {
    val coarse = spark.read.parquet(s"$dir/coarse")
    val cbs = spark.read.parquet(s"$dir/codebooks")
    // refuse loudly on an empty quantizer sidecar — repair has no
    // basis to judge codes without one (fsck reports it; rebuilding
    // or restoring the sidecar is the operator's call, not surgery's)
    require(cbs.head(1).nonEmpty && coarse.head(1).nonEmpty,
      s"$dir quantizer sidecars are empty — run fsckIvfPqIndex; " +
        "repair cannot proceed without coarse + codebooks")
    val m = cbs.agg(max(col("sub"))).head().getInt(0) + 1
    val ksub = cbs.groupBy(col("sub")).agg(count(lit(1)).as("k"))
      .agg(max(col("k"))).head().getLong(0).toInt
    val known = coarse.select(col("cell_id")).distinct().collect()
      .map(_.getAs[Number](0).intValue()).toSet
    val root = new org.apache.hadoop.fs.Path(s"$dir/codes")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // orphan partitions: unreachable, drop the directories outright
    val orphanDirs = StoreMaintenance.partitionDirs(spark, root, "cell_id")
      .filterNot(d => known(d._1))
    val orphanRows = if (orphanDirs.isEmpty) 0L
      else spark.read.parquet(orphanDirs.map(_._2.toString): _*).count()
    orphanDirs.foreach(d => fs.delete(d._2, true))
    if (orphanDirs.nonEmpty)
      StoreMaintenance.refreshPath(spark, s"$dir/codes")
    val codes = readCodes(spark, dir)
    val wellFormed = size(col("codes")) === m &&
      !exists(col("codes"), c => c < 0 || c >= ksub)
    // deterministic dup winner per id (well-formed copies outrank
    // malformed ones, so a dup pair never loses both); losers +
    // malformed rows leave
    val ranked = codes.withColumn("_rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("neighbor_id"))
        .orderBy(when(wellFormed, 0).otherwise(1),
          col("cell_id"), hash(col("codes")))))
    val offending = ranked.filter(!wellFormed || col("_rn") > 1)
    val dropped = offending.count()
    val cells = offending.select(col("cell_id")).distinct().collect()
      .map(_.getAs[Number](0).intValue()).sorted
    if (cells.nonEmpty) {
      val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
      val keep = ranked
        .filter(col("cell_id").isin(cells.map(Integer.valueOf): _*))
        .filter(wellFormed && col("_rn") === 1)
        .select(col("neighbor_id"), col("codes"), col("cell_id"))
        .localCheckpoint()
      try {
        val keptCells = keep.select(col("cell_id")).distinct().collect()
          .map(_.getAs[Number](0).intValue()).toSet
        val key = "spark.sql.sources.partitionOverwriteMode"
        val prev = spark.conf.getOption(key)
        spark.conf.set(key, "dynamic")
        try keep.write.mode("overwrite").partitionBy("cell_id")
          .parquet(s"$dir/codes")
        finally prev match {
          case Some(v) => spark.conf.set(key, v)
          case scala.None => spark.conf.unset(key)
        }
        cells.filterNot(keptCells).foreach { c =>
          fs.delete(new org.apache.hadoop.fs.Path(root, s"cell_id=$c"),
            true)
        }
        StoreMaintenance.refreshPath(spark, s"$dir/codes")
      } finally {
        val rdds = spark.sparkContext.getPersistentRDDs
        (rdds.keySet diff persistedBefore)
          .foreach(id => rdds.get(id).foreach(_.unpersist(blocking = false)))
      }
    }
    (orphanRows + dropped, orphanDirs.size + cells.length)
  }

  /** D8 (drift): the REBUILD TRIGGER's number — append/remove run
    * under frozen quantizers, and "rebuild when recall decays" is
    * folklore until something measures the decay. Per cell:
    *
    *   - `recon_cos`: mean cosine between each indexed code's PQ
    *     reconstruction and the corpus's CURRENT vector — decaying
    *     recon fidelity means the codebooks no longer describe the
    *     data (the ADC scores search ranks by degrade with it);
    *   - `frac_misassigned`: fraction of rows whose current vector's
    *     nearest coarse centroid is no longer its STORED cell — probes
    *     open the stored cell, so a misassigned row is invisible to
    *     exactly the queries that should find it.
    *
    * A fresh build scores misassignment 0 by construction; monitor
    * the trend after append cycles and rebuild on the knee. Cost is
    * one corpus-linear pass: codes explode to (id, sub, code), the
    * cosine decomposes per sub-slice (Σⱼ dot(cvecⱼ, sliceⱼ) over the
    * sub-norm products) against broadcast codebooks, assignment is
    * the same broadcast argmax as the build — partial-agg reductions,
    * no corpus-side window.
    */
  def ivfPqIndexDrift(spark: SparkSession, dir: String, corpus: DataFrame,
                      idCol: String, vecCol: String): DataFrame = {
    val coarseRaw = spark.read.parquet(s"$dir/coarse")
    val dim = coarseRaw.select(size(col("centroid"))).head().getInt(0)
    val cbs = spark.read.parquet(s"$dir/codebooks")
    val m = cbs.agg(max(col("sub"))).head().getInt(0) + 1
    val d = dim / m
    val vecs = corpus.select(col(idCol).cast("long").as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    val codes = readCodes(spark, dir)
    // recon cosine, decomposed per sub: dot(recon, v) = Σ_j dot(cvec_j,
    // slice_j), |recon|² = Σ_j |cvec_j|², |v|² computed once
    val parts = codes
      .select(col("neighbor_id"), col("cell_id"),
        posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(cbs.select(col("sub"),
        col("cell_id").as("code"), col("cvec"))), Seq("sub", "code"))
      .join(vecs, "neighbor_id")
      .withColumn("slice", slice(col("cv"), col("sub") * d + 1, lit(d)))
      .withColumn("vn2", aggregate(col("cv"), lit(0.0),
        (acc, x) => acc + x * x))
      .groupBy(col("neighbor_id"), col("cell_id"))
      .agg(
        sum(aggregate(zip_with(col("cvec"), col("slice"), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x)).as("dot"),
        sum(aggregate(col("cvec"), lit(0.0),
          (acc, x) => acc + x * x)).as("rn2"),
        first(col("vn2")).as("vn2"))
    val recon = parts
      .withColumn("rcos", col("dot") / (sqrt(col("rn2")) * sqrt(col("vn2"))))
      .select(col("neighbor_id"), col("cell_id"), col("rcos"))
    // current-nearest coarse cell vs the stored one — the build's own
    // argmax rule (ties toward the smallest cell_id)
    val coarseB = broadcast(coarseRaw.select(col("cell_id").as("ncell"),
      asDouble(col("centroid")).as("centroid")))
    val nearest = codes.select(col("neighbor_id")).join(vecs, "neighbor_id")
      .join(coarseB)
      .withColumn("csim", cosineD(col("cv"), col("centroid")))
      .groupBy(col("neighbor_id"))
      .agg(max_by(col("ncell"), struct(col("csim"), -col("ncell")))
        .as("ncell"))
    recon.join(nearest, "neighbor_id")
      .groupBy(col("cell_id"))
      .agg(count(lit(1)).as("n_codes"),
        round(avg(col("rcos")), 6).as("recon_cos"),
        round(avg(when(col("ncell") =!= col("cell_id"), 1.0)
          .otherwise(0.0)), 6).as("frac_misassigned"))
      .orderBy("cell_id")
  }

  /** D8 (advise): the maintenance ADVISOR — one (store, action ∈
    * repair|rebuild|compact|ok, reason) runbook row joining the
    * store's fsck, drift, and fragmentation numbers under
    * [[StoreMaintenance.adviseRow]]'s precedence: corruption beats
    * drift beats fragmentation (corrupt rows pollute the other two
    * numbers; a drifted quantizer makes compaction pointless).
    * Rebuild triggers when the code-weighted mean of
    * [[ivfPqIndexDrift]]'s `frac_misassigned` — the fraction of
    * stored vectors whose CURRENT nearest coarse cell differs from
    * their stored one, i.e. probes that now look in the wrong
    * partition — crosses `maxMisassigned`. Compact triggers when any
    * `cell_id=` partition holds more than `maxFilesPerCell` files
    * ([[compactIvfPqIndex]]'s knob). Driver cost: the fsck + stats
    * passes plus drift's one corpus join — the fsck cadence.
    */
  def adviseIvfPqIndex(spark: SparkSession, dir: String,
                       corpus: DataFrame, idCol: String, vecCol: String,
                       maxFilesPerCell: Int = 1,
                       maxMisassigned: Double = 0.2): DataFrame = {
    val fsckBad = fsckIvfPqIndex(spark, dir)
      .filter(!col("ok")).count()
    val rebuild = if (fsckBad > 0) scala.None else {
      val d = ivfPqIndexDrift(spark, dir, corpus, idCol, vecCol)
        .agg((sum(col("frac_misassigned") * col("n_codes")) /
          sum(col("n_codes"))).as("w"))
        .head().getAs[Double]("w")
      if (d > maxMisassigned)
        Some(f"$d%.4f of stored codes are coarse-misassigned vs the " +
          f"current corpus (> $maxMisassigned%.2f) - the frozen " +
          "quantizers no longer fit; rebuild")
      else scala.None
    }
    val fragged = StoreMaintenance
      .partitionFileStats(spark, s"$dir/codes", "cell_id")
      .count(_._2 > maxFilesPerCell)
    val compact = if (fragged > 0)
      Some(s"$fragged cell partition(s) over $maxFilesPerCell file(s) " +
        "- compactIvfPqIndex")
    else scala.None
    StoreMaintenance.adviseRow(spark, dir, fsckBad, rebuild, compact)
  }

  /** D8 (search): probe a [[buildIvfPqIndex]] layout. Coarse +
    * codebooks are tiny reads (broadcast); each query's nProbe cells
    * become a `cell_id IN (...)` partition filter on the codes dir —
    * only probed partitions' FILES are read (Hive-style pruning shown
    * as PartitionFilters in the scan, pinned by the spec). ADC +
    * shortlist + optional exact re-rank mirror [[ivfpq]] exactly, so
    * with `rescoreWith` = the corpus the results are identical to the
    * in-plan trained ivfpq — the spec asserts row equality. The qtab /
    * ADC / salted-shortlist block below deliberately MIRRORS
    * [[ivfpq]]'s (the spec's row-equality assertion is the drift
    * guard); it reads codes from the index instead of encoding, so the
    * two cannot share one body without threading the whole search
    * through an indirection that obscures both.
    */
  def searchIvfPqIndex(spark: SparkSession, dir: String,
                       queries: DataFrame, idCol: String, vecCol: String,
                       dim: Int, k: Int, nProbe: Int = 5,
                       overscan: Int = 4, salts: Int = 32,
                       rescoreWith: Option[DataFrame] = scala.None)
      : DataFrame = {
    val coarseRaw = spark.read.parquet(s"$dir/coarse")
    requireIndexDim(coarseRaw, dir, dim)
    val coarseDf = broadcast(coarseRaw
      .select(col("cell_id"), asDouble(col("centroid")).as("centroid")))
    val cbs = spark.read.parquet(s"$dir/codebooks")
    val mk = cbs.agg(max(col("sub")).as("m"), max(col("cell_id")).as("c"))
      .head()
    val m = mk.getInt(0) + 1
    val ksub = mk.getLong(1).toInt + 1
    require(dim % m == 0, s"dim $dim not divisible by index m $m")
    val d = dim / m
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("qsim").desc, col("cell_id"))
    val probes0 = q.join(coarseDf)
      .withColumn("qsim", cosineD(col("qv"), col("centroid")))
      .withColumn("qrn", row_number().over(wProbe))
      .filter(col("qrn") <= nProbe)
      .select(col("query_id"), col("cell_id"))
    val probes = broadcast(probes0)
    // O(|queries|·nProbe) driver-side cell list -> a partition filter.
    // Collected from the UNHINTED frame (see recallSweepIndexed).
    val probedCells = probes0.select(col("cell_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    val codes = readCodes(spark, dir)
      .filter(col("cell_id").isin(probedCells: _*))
    val qsubs = queries.select(col(idCol).as("query_id"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          j => slice(asDouble(col(vecCol)), j * d + 1, lit(d)))))
      .toDF("query_id", "sub", "subvec")
    val qtab = broadcast(qsubs.join(broadcast(cbs), "sub")
      .withColumn("qdist", l2sqD(col("subvec"), col("cvec")))
      .groupBy(col("query_id"))
      .agg(sort_array(collect_list(struct(col("sub"),
        col("cell_id").cast("long").as("code"), col("qdist")))).as("e"))
      .select(col("query_id"),
        transform(sequence(lit(0), lit(m - 1)), j =>
          transform(sequence(lit(0), lit(ksub - 1)), c =>
            element_at(col("e"), (j * ksub + c + 1).cast("int"))("qdist")))
          .as("tbl")))
    val approx = codes
      .join(probes, "cell_id")
      .join(qtab, "query_id")
      .withColumn("adist",
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, j) =>
          acc + element_at(
            element_at(col("tbl"), (j + lit(1)).cast("int")),
            (element_at(col("codes"), (j + lit(1)).cast("int")) + lit(1))
              .cast("int"))))
      .filter(col("neighbor_id") =!= col("query_id"))
    rescoreWith match {
      case scala.None =>
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("adist"), col("neighbor_id"))
        approx.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= k)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            col("adist"))
      case Some(corpus) =>
        val wLocal = Window.partitionBy(col("query_id"), col("salt"))
          .orderBy(col("adist"), col("neighbor_id"))
        val wShort = Window.partitionBy(col("query_id"))
          .orderBy(col("adist"), col("neighbor_id"))
        val shortlist = approx
          .withColumn("salt", pmod(col("neighbor_id"), lit(salts)))
          .withColumn("lrn", row_number().over(wLocal))
          .filter(col("lrn") <= k * overscan)
          .withColumn("srn", row_number().over(wShort))
          .filter(col("srn") <= k * overscan)
          .select(col("query_id"), col("neighbor_id"))
        val qv = broadcast(queries.select(col(idCol).as("query_id"),
          asDouble(col(vecCol)).as("qv")))
        val cv = corpus.select(col(idCol).as("neighbor_id"),
          asDouble(col(vecCol)).as("cv"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))
        shortlist.join(cv, "neighbor_id").join(qv, "query_id")
          .withColumn("cosine", cosineD(col("qv"), col("cv")))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= k)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            col("cosine"))
    }
  }

  /** D7: filtered ANN — top-k cosine neighbors among corpus rows that
    * MATCH the query's `filterCol` value (label / language / tenant
    * partition: the metadata-constrained vector search real stores
    * serve). The filter key is fused INTO the LSH bucket join key, so
    * candidates are generated ALREADY filtered (pre-filtering): at
    * selective filters this beats generating a global candidate set
    * and post-filtering it — the classic filtered-vector-search
    * failure mode, where post-filtering a top-R shortlist leaves fewer
    * than k survivors and recall collapses. Same hyperplane kernel,
    * bands and exact-rescore shape as [[lsh]]; a candidate pair must
    * share (filter value, band, key).
    *
    * Scale: identical to [[lsh]] — the fused key adds selectivity to
    * the bucket join (strictly FEWER candidates), query keys stay
    * broadcast, and the per-label bucket population is what bounds
    * per-task work; a degenerate single-label corpus degrades exactly
    * to [[lsh]], never worse.
    */
  def filteredLsh(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, filterCol: String, dim: Int, k: Int,
                  bands: Int = 32, planesPerBand: Int = 6,
                  seed: Long = 7L): DataFrame =
    lshTopK(corpus, queries, idCol, vecCol, dim, k, bands, planesPerBand,
        seed, filterCol = Some(filterCol))
      .select(col("query_id"), col("label"), col("rank"),
        col("neighbor_id"), col("cosine"))

  /** D6: multi-vector late-interaction retrieval (the MaxSim rule
    * ColBERT-style retrievers use): both sides split into m = dim/d
    * sub-vectors ("token vectors");
    * `score(q, doc) = Σ_{query slice} max_{doc slice} cosine`.
    * Candidates are generated TOKEN-level — per-slice random-hyperplane
    * LSH keys; a doc is a candidate when ANY of its slices shares a
    * (band, key) bucket with ANY query slice — then exact MaxSim runs
    * only on candidates: the token-ANN → doc-gather → exact-rescore
    * shape production late-interaction systems use.
    *
    * Determinism: each per-(query, doc, query-slice) max cosine is
    * quantized to the 2²⁰ integer grid BEFORE the cross-slice sum, so
    * the score is an order-independent integer; ties break on
    * neighbor_id. The fused [[graft.functions.vec.cosine]] kernel's
    * sequential fold matches the oracle's list_sum bit-for-bit, so the
    * quantization cannot straddle engines.
    *
    * Scale: the keyed stream is m small (band, key) rows per vector —
    * vectors never ride that shuffle; query keys and query slices are
    * broadcast, so candidate pruning and the m² slice cosines are
    * map-side. The only corpus-sized shuffles are the candidate
    * distinct and the slice gather keyed on vector ids. On clustered
    * real embeddings the bucket match prunes most of the corpus; on
    * structureless data it degrades to near-brute-force (the honest
    * LSH floor), never worse.
    */
  def maxSim(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, dim: Int, k: Int, m: Int = 4,
             bands: Int = 16, planesPerBand: Int = 6,
             seed: Long = 11L): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val d = dim / m
    val planes = Dedup.hyperplanes(bands * planesPerBand, d, seed)
    def slices(df: DataFrame, id: String, out: String) =
      df.select(col(idCol).as(id),
          posexplode(transform(sequence(lit(0), lit(m - 1)),
            j => slice(asDouble(col(vecCol)), j * d + 1, lit(d)))))
        .toDF(id, "sl", out)
    def keyed(df: DataFrame, id: String) =
      slices(df, id, "sv").select(col(id),
          posexplode(graft.functions.vec.hyperplaneBuckets(col("sv"),
            planes, planesPerBand)))
        .toDF(id, "band", "bkey")
    val cand = keyed(corpus, "neighbor_id")
      .join(broadcast(keyed(queries, "query_id")), Seq("band", "bkey"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id").distinct()
    val qs = broadcast(slices(queries, "query_id", "qv")
      .select(col("query_id"), col("sl").as("qsl"), col("qv")))
    val cs = slices(corpus, "neighbor_id", "sv")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    cand.join(cs, "neighbor_id").join(qs, "query_id")
      .withColumn("mq",
        floor(graft.functions.vec.cosine(col("qv"), col("sv")) *
          lit(1048576.0) + lit(0.5)).cast("long"))
      .groupBy(col("query_id"), col("neighbor_id"), col("qsl"))
      .agg(max(col("mq")).as("mqs"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("mqs")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        (col("score").cast("double") / lit(1048576.0 * m)).as("maxsim"))
  }

  // ---- D11: scalar quantization (SQ8) ----------------------------------

  /** SQ8 training: per-dimension `[lo, hi]` over the corpus, returned
    * as `(lo, scale)` with `scale = (hi-lo)/255` (1.0 on constant
    * dimensions, where every code is 0 regardless). ONE partial-agg
    * shuffle of `dim` groups (min/max combine map-side), and the
    * collected result is `dim` rows — bounded by the vector width, not
    * the corpus, exactly like the k-means centroid collect.
    */
  def sqTrain(corpus: DataFrame, vecCol: String, dim: Int)
      : (Array[Double], Array[Double]) = {
    val mm = corpus.select(posexplode(asDouble(col(vecCol))))
      .toDF("j", "x")
      .groupBy("j").agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    require(mm.length == dim,
      s"sqTrain: corpus vectors span ${mm.length} dimensions, caller " +
        s"declared $dim — ragged or mis-declared vector column")
    (mm.map(_._2),
      mm.map { case (_, l, h) => if (h > l) (h - l) / 255.0 else 1.0 })
  }

  /** SQ8 encode: `code_j = clamp(floor((x_j - lo_j)/scale_j + 0.5),
    * 0, 255)` — a pure map-side expression (the explicit `+0.5` floor
    * keeps rounding identical across engines; banker's rounding would
    * not replay). One byte of information per dimension: the 8×
    * compression production stores run when PQ's codebook loss is too
    * much and raw floats too big.
    */
  def sqCodes(vec: Column, lo: Array[Double], scale: Array[Double])
      : Column = {
    val loL = array(lo.map(lit(_)): _*)
    val scL = array(scale.map(lit(_)): _*)
    transform(asDouble(vec), (x, i) =>
      least(lit(255L), greatest(lit(0L),
        floor((x - element_at(loL, i + lit(1))) /
          element_at(scL, i + lit(1)) + lit(0.5)))).cast("int"))
  }

  /** SQ8 reconstruction: `x̂_j = lo_j + code_j · scale_j` — what the
    * scan scores against (within scale/2 of the original per
    * dimension).
    */
  def sqRecon(codes: Column, lo: Array[Double], scale: Array[Double])
      : Column = {
    val loL = array(lo.map(lit(_)): _*)
    val scL = array(scale.map(lit(_)): _*)
    transform(codes, (c, i) =>
      element_at(loL, i + lit(1)) +
        c.cast("double") * element_at(scL, i + lit(1)))
  }

  /** D11: scalar-quantized ANN (FAISS `SQ8`) — the third compression
    * point on the memory/recall dial, completing the family: Flat
    * (exact, dim floats), SQ8 (dim bytes, near-lossless), PQ (m bytes,
    * lossy). Each corpus vector stores one 8-bit code per dimension
    * under a per-dimension affine `[lo, hi]` grid; the scan scores the
    * full-precision query against the RECONSTRUCTED vector (the
    * asymmetric rule — the query is never quantized), shortlists
    * `overscan·k`, and re-ranks the shortlist by exact cosine.
    *
    * Scale posture: training is one `dim`-group partial-agg pass
    * (constant output in corpus size); encode and the reconstruction
    * scoring are map-side expressions against broadcast queries. NOTE
    * on the IO posture: this in-plan variant derives the codes from
    * the full-precision column (encode∘decode as a projection below
    * the join), so the scan still reads floats — the ARITHMETIC
    * models the SQ8 scan, not its 8× memory footprint. The persisted
    * byte-codes store that realizes the footprint is
    * [[buildSqIndex]]/[[searchSqIndex]], whose scan reads ONLY the
    * int-code column off disk. The
    * shortlist uses the same salted two-phase top-k as [[pq]] (no
    * corpus-sized single-task sort); only the shortlist joins back to
    * full-precision vectors. Every arithmetic step (floor-rounding,
    * clamp, affine recon, sequential-fold cosine) is
    * oracle-replayable.
    */
  def sq(corpus: DataFrame, queries: DataFrame, idCol: String,
         vecCol: String, dim: Int, k: Int,
         overscan: Int = 4, salts: Int = 32): DataFrame = {
    val (lo, scale) = sqTrain(corpus, vecCol, dim)
    // reconstruct ONCE per corpus row (a projection below the join) —
    // the per-pair work is then only the cosine fold, not a recon per
    // query; decode-then-scan is exactly how an SQ flat scan runs
    val recon = corpus.select(col(idCol).as("neighbor_id"),
      sqRecon(sqCodes(col(vecCol), lo, scale), lo, scale).as("rv"))
    sqScanRerank(recon, corpus, queries, idCol, vecCol, k, overscan,
      salts)
  }

  /** The ONE SQ8 scan → salted shortlist → exact re-rank body behind
    * the in-plan [[sq]] and the persisted-index [[searchSqIndex]]
    * (shared so the two can never drift — the spec's row-equality pin
    * is then structural): `recon` supplies
    * `(neighbor_id, rv: array<double>)` reconstructed vectors, from
    * wherever the codes came.
    */
  private def sqScanRerank(recon: DataFrame, corpus: DataFrame,
                           queries: DataFrame, idCol: String,
                           vecCol: String, k: Int, overscan: Int,
                           salts: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv")))
    val approx = recon.join(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("acos", cosineD(col("qv"), col("rv")))
    val wLocal = Window.partitionBy(col("query_id"), col("salt"))
      .orderBy(col("acos").desc, col("neighbor_id"))
    val wShort = Window.partitionBy(col("query_id"))
      .orderBy(col("acos").desc, col("neighbor_id"))
    val shortlist = approx
      .withColumn("salt", pmod(col("neighbor_id"), lit(salts)))
      .withColumn("lrn", row_number().over(wLocal))
      .filter(col("lrn") <= k * overscan)
      .withColumn("srn", row_number().over(wShort))
      .filter(col("srn") <= k * overscan)
      .select(col("query_id"), col("neighbor_id"))
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    shortlist.join(cv, "neighbor_id").join(q, "query_id")
      .withColumn("cosine", cosineD(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cosine"))
  }

  /** D11b (build): persist the SQ8 store — the layout that actually
    * REALIZES the 8× memory posture ([[sq]] only models the
    * arithmetic; its scan still reads floats):
    *
    *   dir/grid/    (j, lo, scale)        — dim rows, the affine grid
    *   dir/codes/   (neighbor_id, codes)  — one int code per dim
    *
    * Training is [[sqTrain]]'s one dim-group partial-agg pass; encode
    * is [[sqCodes]] map-side. A later [[searchSqIndex]] scans ONLY
    * the codes column off disk — the full-precision vectors are
    * touched for the `overscan·k` shortlist re-rank alone.
    */
  def buildSqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                   dir: String, dim: Int,
                   grid: Option[(Array[Double], Array[Double])] =
                     scala.None): Unit = {
    // `grid` override = the pretrained-quantizer slot (the
    // buildIvfPqIndex coarse/codebooks posture): REQUIRED when shard
    // builds must later [[mergeSqIndexes]]
    val (lo, scale) = grid.getOrElse(sqTrain(corpus, vecCol, dim))
    require(lo.length == dim && scale.length == dim,
      s"grid override length ${lo.length}/${scale.length} != dim $dim")
    val spark = corpus.sparkSession
    import spark.implicits._
    lo.zip(scale).zipWithIndex
      .map { case ((l, s), j) => (j, l, s) }.toSeq
      .toDF("j", "lo", "scale")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/grid")
    corpus.select(col(idCol).cast("long").as("neighbor_id"),
        sqCodes(col(vecCol), lo, scale).as("codes"))
      .write.mode("overwrite").parquet(s"$dir/codes")
  }

  /** The stored affine grid of a [[buildSqIndex]] layout, dim-length
    * arrays — the frozen quantizer append/search must reuse. */
  def sqIndexGrid(spark: SparkSession, dir: String)
      : (Array[Double], Array[Double]) = {
    val rows = spark.read.parquet(s"$dir/grid").collect()
      .map(r => (r.getAs[Int]("j"), r.getAs[Double]("lo"),
        r.getAs[Double]("scale")))
      .sortBy(_._1)
    (rows.map(_._2), rows.map(_._3))
  }

  /** D11b (append): encode a delta under the FROZEN grid and file-add
    * it — the [[appendToIvfPqIndex]] posture (no retrain; rebuild
    * when the grid's [lo, hi] no longer covers the data). */
  def appendToSqIndex(delta: DataFrame, idCol: String, vecCol: String,
                      dir: String, dim: Int): Unit = {
    StoreMaintenance.recoverFlat(delta.sparkSession, s"$dir/codes")
    val (lo, scale) = sqIndexGrid(delta.sparkSession, dir)
    require(lo.length == dim,
      s"index at $dir was built with dim ${lo.length}, caller passed $dim")
    delta.select(col(idCol).cast("long").as("neighbor_id"),
        sqCodes(col(vecCol), lo, scale).as("codes"))
      .write.mode("append").parquet(s"$dir/codes")
  }

  /** D11b (remove): purge ids from the codes store — file-level
    * surgery like [[graft.operators.Dedup.removeFromLshIndex]] (the
    * store is flat, unpartitioned): only files containing a purged id
    * are rewritten (survivors appended as new files, then the old
    * files deleted), every other file stays byte-identical. Returns
    * the number of code rows removed.
    */
  def removeFromSqIndex(deleteIds: DataFrame, idCol: String,
                        dir: String): Long = {
    val spark = deleteIds.sparkSession
    StoreMaintenance.recoverFlat(spark, s"$dir/codes")
    val ids = deleteIds.select(col(idCol).cast("long").as("neighbor_id"))
      .distinct()
    val codes = spark.read.parquet(s"$dir/codes")
      .withColumn("_file", input_file_name())
    val affected = codes.join(broadcast(ids), "neighbor_id")
      .select(col("_file")).distinct().collect()
      .map(_.getString(0)).sorted
    if (affected.isEmpty) return 0L
    val touched = codes.filter(col("_file").isin(affected: _*))
    val removed = touched.join(broadcast(ids), "neighbor_id").count()
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val remaining = touched
      .join(broadcast(ids), Seq("neighbor_id"), "left_anti")
      .select(col("neighbor_id"), col("codes"))
      .localCheckpoint()
    try {
      remaining.write.mode("append").parquet(s"$dir/codes")
      val fs = new org.apache.hadoop.fs.Path(s"$dir/codes")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      affected.foreach { f =>
        fs.delete(new org.apache.hadoop.fs.Path(new java.net.URI(f)), false)
      }
      // the deletes bypass the Spark writer: drop any cached listing
      StoreMaintenance.refreshPath(spark, s"$dir/codes")
    } finally {
      val rdds = spark.sparkContext.getPersistentRDDs
      (rdds.keySet diff persistedBefore)
        .foreach(id => rdds.get(id).foreach(_.unpersist(blocking = false)))
    }
    removed
  }

  /** D11b (compact): combine the small files an append-per-batch
    * ingest leaves in the flat codes store — files under `minBytes`
    * merge into one, files at or over it stay byte-identical
    * (spec-pinned). CRASH-SAFE via the staged-rename journal
    * ([[StoreMaintenance.compactFlat]]): every open path of this
    * store sweeps [[StoreMaintenance.recoverFlat]] first, so a
    * mid-compaction crash can never leave duplicate or missing code
    * rows at rest. Returns (filesCompacted, filesBefore, filesAfter).
    */
  def compactSqIndex(spark: SparkSession, dir: String,
                     minBytes: Long = 4L << 20): (Int, Long, Long) =
    StoreMaintenance.compactFlat(spark, s"$dir/codes", minBytes)

  /** D11b (stats): flat-store health — ONE row (n_codes, n_files,
    * bytes, n_small_files), the [[ivfPqIndexStats]] report for the
    * unpartitioned layout: `n_small_files` (under `minBytes`) is the
    * [[compactSqIndex]] trigger. Listing is O(files) driver work; the
    * count is one column-pruned pass.
    */
  def sqIndexStats(spark: SparkSession, dir: String,
                   minBytes: Long = 4L << 20): DataFrame = {
    import spark.implicits._
    StoreMaintenance.recoverFlat(spark, s"$dir/codes")
    val files = StoreMaintenance.dataFiles(spark,
      new org.apache.hadoop.fs.Path(s"$dir/codes"))
    val n = if (files.isEmpty) 0L
      else spark.read.parquet(s"$dir/codes").count()
    Seq((n, files.size.toLong, files.map(_._2).sum,
        files.count(_._2 < minBytes).toLong))
      .toDF("n_codes", "n_files", "bytes", "n_small_files")
  }

  /** D11b (merge): combine SQ stores built under the SAME affine grid
    * — the [[mergeIvfPqIndexes]] posture for the flat layout: grid
    * identity VERIFIED (same bytes under different grids reconstruct
    * different vectors), then flat file concatenation — enumerated
    * driver-side, BYTES moved as a Spark job
    * ([[StoreMaintenance.copyFilesDistributed]]). Returns files
    * copied; run [[fsckSqIndex]] after for shard-overlap dups.
    * `dryRun=true`: admission check + enumeration only, returns the
    * would-copy count.
    */
  def mergeSqIndexes(spark: SparkSession, dst: String,
                     srcs: Seq[String],
                     dryRun: Boolean = false): Long = {
    val (wlo, wsc) = sqIndexGrid(spark, dst)
    srcs.foreach { s =>
      val (lo, sc) = sqIndexGrid(spark, s)
      require(lo.sameElements(wlo) && sc.sameElements(wsc),
        s"$s was built under a DIFFERENT affine grid than $dst — " +
          "codes are not comparable")
    }
    val dstRoot = new org.apache.hadoop.fs.Path(s"$dst/codes")
    val pairs = srcs.filterNot(_ == dst).zipWithIndex.flatMap {
      case (src, i) =>
        StoreMaintenance.dataFiles(spark,
            new org.apache.hadoop.fs.Path(s"$src/codes"))
          .map { case (f, _) =>
            (f.toString, new org.apache.hadoop.fs.Path(dstRoot,
              s"merge$i-${f.getName}").toString)
          }
    }
    // dry run: grid-identity admission ran above — count, don't copy
    if (dryRun) pairs.size.toLong
    else StoreMaintenance.copyFilesDistributed(spark, pairs)
  }

  /** D11b (fsck): [[fsckIvfPqIndex]]'s discipline for the flat SQ8
    * store — (check, ok, n_bad, detail) per invariant: the affine grid
    * tiles dimensions 0..dim−1 exactly once with finite rows, every
    * code array is dim long with codes in [0, 255], and neighbor_id is
    * unique (the replayed-append / crashed-compaction signature). One
    * partial-agg pass plus one id-keyed shuffle.
    */
  def fsckSqIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    StoreMaintenance.recoverFlat(spark, s"$dir/codes")
    // report a missing/empty/unreadable grid sidecar instead of
    // crashing on it — the fsckIvfPqIndex guard for the flat store
    val gridE: Either[String, Array[(Int, Double, Double)]] =
      try {
        val g = spark.read.parquet(s"$dir/grid")
          .select(col("j"), col("lo"), col("scale")).collect()
          .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
        if (g.isEmpty) Left("grid sidecar is EMPTY") else Right(g)
      } catch {
        case e: Exception => Left(s"grid sidecar unreadable: ${
          Option(e.getMessage).getOrElse(e.getClass.getName).take(80)}")
      }
    if (gridE.isLeft) {
      val skip = "skipped: grid sidecar corrupt"
      return Seq(
        ("grid_complete", false, 1L, gridE.left.getOrElse("")),
        ("codes_len", false, 0L, skip),
        ("codes_range", false, 0L, skip),
        ("ids_unique", false, 0L, skip)
      ).toDF("check", "ok", "n_bad", "detail")
    }
    val grid = gridE.toOption.get
    val dim = grid.map(_._1).max + 1
    val gridBad =
      (0 until dim).count(j => grid.count(_._1 == j) != 1).toLong +
        grid.count(g => g._2.isNaN || g._3.isNaN || g._3 < 0).toLong
    val codes = spark.read.parquet(s"$dir/codes")
    val rowBad = codes.agg(
      sum(when(size(col("codes")) =!= dim, 1L).otherwise(0L)).as("len"),
      sum(when(exists(col("codes"),
        c => c < 0 || c > 255), 1L).otherwise(0L)).as("rng"))
      .collect().headOption
    val (badLen, badRng) = rowBad match {
      case Some(r) if !r.isNullAt(0) =>
        (r.getAs[Long]("len"), r.getAs[Long]("rng"))
      case _ => (0L, 0L)
    }
    val dupIds = codes.groupBy(col("neighbor_id"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).count()
    Seq(
      ("grid_complete", gridBad == 0L, gridBad,
        s"dim $dim affine rows"),
      ("codes_len", badLen == 0L, badLen, s"expect $dim codes per row"),
      ("codes_range", badRng == 0L, badRng, "expect codes in [0, 255]"),
      ("ids_unique", dupIds == 0L, dupIds,
        "duplicate neighbor_id rows (replayed append / crashed compact)")
    ).toDF("check", "ok", "n_bad", "detail")
  }

  /** D11b (repair): fix what [[fsckSqIndex]] flags, without a rebuild
    * — [[repairIvfPqIndex]]'s discipline for the flat store: malformed
    * rows (wrong code length, out-of-range codes) DROP — no scan can
    * reconstruct garbage — and duplicate neighbor_id rows (replayed
    * append / crashed pre-journal compaction) collapse to ONE
    * deterministic survivor (smallest codes-hash, so re-running after
    * a crash converges; a true replayed append's copies are
    * byte-identical, so any survivor is the same row). FILE surgery
    * only: offender files (those containing a malformed row or any
    * copy of a duplicated id — all copies of a dup are offender-file
    * resident by construction) are rewritten via append-then-delete;
    * every clean file stays byte-identical (spec-pinned). Refuses
    * loudly on an empty/unreadable grid sidecar — repair has no basis
    * to judge code rows without the dim (fsck reports it; restoring
    * the sidecar is the operator's call). Idempotent; the grid itself
    * is never touched (a drifted grid is [[sqIndexDrift]]'s rebuild
    * territory). Returns (rowsDropped, filesRewritten).
    */
  def repairSqIndex(spark: SparkSession, dir: String): (Long, Int) = {
    StoreMaintenance.recoverFlat(spark, s"$dir/codes")
    val (lo, _) = sqIndexGrid(spark, dir)
    require(lo.nonEmpty,
      s"$dir grid sidecar is empty — run fsckSqIndex; repair cannot " +
        "judge code rows without the affine grid")
    val dim = lo.length
    val codes = spark.read.parquet(s"$dir/codes")
      .withColumn("_file", input_file_name())
    val isMalformed = size(col("codes")) =!= dim ||
      exists(col("codes"), c => c < 0 || c > 255)
    val dupIds = codes.groupBy(col("neighbor_id"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1)
      .select(col("neighbor_id"))
    val offenders = codes.filter(isMalformed).select(col("_file"))
      .unionAll(codes.join(dupIds, "neighbor_id").select(col("_file")))
      .distinct().collect().map(_.getString(0)).sorted
    if (offenders.isEmpty) return (0L, 0)
    val touched = codes.filter(col("_file").isin(offenders: _*))
    val nTouched = touched.count()
    // survivors: well-formed rows, one deterministic copy per id
    val wId = Window.partitionBy(col("neighbor_id"))
      .orderBy(xxhash64(col("codes")))
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val survivors = touched.filter(!isMalformed)
      .withColumn("_rn", row_number().over(wId))
      .filter(col("_rn") === 1)
      .select(col("neighbor_id"), col("codes"))
      .localCheckpoint()
    try {
      val kept = survivors.count()
      survivors.write.mode("append").parquet(s"$dir/codes")
      val fs = new org.apache.hadoop.fs.Path(s"$dir/codes")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      offenders.foreach { f =>
        fs.delete(new org.apache.hadoop.fs.Path(new java.net.URI(f)), false)
      }
      // the deletes bypass the Spark writer: drop any cached listing
      StoreMaintenance.refreshPath(spark, s"$dir/codes")
      (nTouched - kept, offenders.length)
    } finally {
      val rdds = spark.sparkContext.getPersistentRDDs
      (rdds.keySet diff persistedBefore)
        .foreach(id => rdds.get(id).foreach(_.unpersist(blocking = false)))
    }
  }

  /** D11b (advise): [[adviseIvfPqIndex]]'s runbook row for the flat
    * SQ8 store — same precedence ([[StoreMaintenance.adviseRow]]).
    * Rebuild triggers when the dim-averaged `frac_out_of_range` of
    * [[sqIndexDrift]] — current corpus values clamping to the grid's
    * edge codes, unbounded reconstruction error — crosses
    * `maxOutOfRange`. Compact triggers when the store holds
    * `minSmallFiles` or more files under `minBytes`
    * ([[compactSqIndex]]'s knob; one small file is just the tail of
    * the last append, two or more is an ingest pattern worth
    * merging).
    */
  def adviseSqIndex(spark: SparkSession, dir: String, corpus: DataFrame,
                    vecCol: String, minBytes: Long = 4L << 20,
                    minSmallFiles: Int = 2,
                    maxOutOfRange: Double = 0.05): DataFrame = {
    val fsckBad = fsckSqIndex(spark, dir).filter(!col("ok")).count()
    val rebuild = if (fsckBad > 0) scala.None else {
      val d = sqIndexDrift(spark, dir, corpus, vecCol)
        .agg(avg(col("frac_out_of_range")).as("w"))
        .head().getAs[Double]("w")
      if (d > maxOutOfRange)
        Some(f"$d%.4f of current corpus values fall outside the " +
          f"frozen affine grid (> $maxOutOfRange%.2f) - codes clamp; " +
          "rebuild")
      else scala.None
    }
    val small = StoreMaintenance.dataFiles(spark,
        new org.apache.hadoop.fs.Path(s"$dir/codes"))
      .count(_._2 < minBytes)
    val compact = if (small >= minSmallFiles)
      Some(s"$small files under $minBytes bytes - compactSqIndex")
    else scala.None
    StoreMaintenance.adviseRow(spark, dir, fsckBad, rebuild, compact)
  }

  /** D11b (drift): the SQ store's rebuild trigger — the frozen affine
    * grid was trained on the build corpus's per-dimension [lo, hi];
    * "rebuild when the grid no longer covers the data" needs a number.
    * Per dimension: the fraction of CURRENT corpus values falling
    * outside the stored [lo, lo + 255·scale] (those clamp to the edge
    * codes — reconstruction error unbounded), and the mean absolute
    * reconstruction error in grid units (err / scale; a healthy
    * quantizer sits ≤ 0.5 by construction, drifting data pushes it
    * up). One map-side pass (posexplode + broadcast grid literals),
    * one dim-group partial agg — dim rows out.
    */
  def sqIndexDrift(spark: SparkSession, dir: String, corpus: DataFrame,
                   vecCol: String): DataFrame = {
    val (lo, scale) = sqIndexGrid(spark, dir)
    val loL = array(lo.map(lit(_)): _*)
    val scL = array(scale.map(lit(_)): _*)
    corpus.select(posexplode(asDouble(col(vecCol))).as(Seq("j", "x")))
      .withColumn("_lo", element_at(loL, col("j") + 1))
      .withColumn("_sc", element_at(scL, col("j") + 1))
      .withColumn("_hi", col("_lo") + col("_sc") * 255.0)
      .withColumn("_out",
        when(col("x") < col("_lo") || col("x") > col("_hi"), 1.0)
          .otherwise(0.0))
      // the stored code this value would clamp to, and its recon error
      // in grid units (scale 0 = a constant dim at build: any drift
      // there is pure out-of-range, the error term stays 0)
      .withColumn("_code",
        when(col("_sc") > 0,
          least(lit(255.0), greatest(lit(0.0),
            floor((col("x") - col("_lo")) / col("_sc") + 0.5))))
          .otherwise(lit(0.0)))
      .withColumn("_gerr",
        when(col("_sc") > 0,
          abs(col("x") - (col("_lo") + col("_code") * col("_sc"))) /
            col("_sc")).otherwise(lit(0.0)))
      .groupBy(col("j"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("_out")), 6).as("frac_out_of_range"),
        round(avg(col("_gerr")), 6).as("mean_err_grid_units"))
      .orderBy("j")
  }

  /** D11b (search): the SQ8 flat scan off the PERSISTED store — the
    * read path whose IO matches the memory claim: the scan reads the
    * int-code column only (dim bytes of information per vector, not
    * dim floats), reconstructs map-side under the stored grid, and
    * re-ranks the `overscan·k` shortlist against `corpus`
    * full-precision vectors (the only float read, shortlist-sized).
    * Identical answers to the in-plan [[sq]] when the store was built
    * from the same corpus (same grid, same codes, shared
    * [[sqScanRerank]] body — spec-pinned).
    */
  def searchSqIndex(spark: SparkSession, dir: String, queries: DataFrame,
                    idCol: String, vecCol: String, dim: Int, k: Int,
                    corpus: DataFrame, overscan: Int = 4,
                    salts: Int = 32): DataFrame = {
    StoreMaintenance.recoverFlat(spark, s"$dir/codes")
    val (lo, scale) = sqIndexGrid(spark, dir)
    require(lo.length == dim,
      s"index at $dir was built with dim ${lo.length}, caller passed $dim")
    val recon = spark.read.parquet(s"$dir/codes")
      .select(col("neighbor_id"), sqRecon(col("codes"), lo, scale).as("rv"))
    sqScanRerank(recon, corpus, queries, idCol, vecCol, k, overscan,
      salts)
  }

  /** D10c: radius search over the PERSISTED index — the scale path
    * [[rangeSearchIvf]]'s scaladoc promises ("a production deployment
    * amortizes the assignment across query batches via the D8
    * persisted layout"): the corpus→cell assignment that dominates the
    * in-plan row's cost (corpus-linear, paid per call) is read back
    * from [[buildIvfPqIndex]]'s layout instead, so a query batch costs
    * only its probes + the pruned-partition candidate read. Each query
    * probes its `nProbe` nearest STORED coarse cells; the probed cell
    * set becomes a `cell_id IN (...)` partition filter on `dir/codes`
    * (only those partitions' files are read); candidates join back to
    * `corpus` for exact cosine and the τ threshold.
    *
    * The radius contract returns exact-verified cosines, so the index
    * contributes its ASSIGNMENT (the partition layout), not its PQ
    * codes — ADC distances are L2-against-quantized and cannot decide
    * a cosine threshold exactly. Approximation is precisely
    * [[rangeSearchIvf]]'s: a neighbor assigned to an unprobed cell is
    * missed; given the same coarse table the two return IDENTICAL
    * rows (spec-pinned), this one without the per-call corpus pass.
    *
    * `corpus` must be the id+vector table the index was built from
    * (ids are checked only by the join; a drifted corpus surfaces as
    * missing candidates, same contract as [[searchIvfPqIndex]]'s
    * `rescoreWith`).
    */
  def rangeSearchIndexed(spark: SparkSession, dir: String,
                         queries: DataFrame, idCol: String,
                         vecCol: String, dim: Int, tau: Double,
                         corpus: DataFrame, nProbe: Int = 5)
      : DataFrame = {
    val coarseRaw = spark.read.parquet(s"$dir/coarse")
    requireIndexDim(coarseRaw, dir, dim)
    val coarseDf = broadcast(coarseRaw
      .select(col("cell_id"), asDouble(col("centroid")).as("centroid")))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("qsim").desc, col("cell_id"))
    val probes0 = q.join(coarseDf)
      .withColumn("qsim", cosineD(col("qv"), col("centroid")))
      .withColumn("qrn", row_number().over(wProbe))
      .filter(col("qrn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell_id"))
    val probes = broadcast(probes0)
    // O(|queries|·nProbe) driver-side cell list -> a partition filter
    // ([[searchIvfPqIndex]]'s pattern): only probed cells' FILES read.
    // Collected from the UNHINTED frame (see recallSweepIndexed).
    val probedCells = probes0.select(col("cell_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    val cand = readCodes(spark, dir)
      .filter(col("cell_id").isin(probedCells: _*))
      .select(col("neighbor_id"), col("cell_id"))
      .join(probes, "cell_id")
      .filter(col("neighbor_id") =!= col("query_id"))
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    cand.join(cv, "neighbor_id")
      .withColumn("cosine", cosineD(col("qv"), col("cv")))
      .filter(col("cosine") >= tau)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
  }
}
