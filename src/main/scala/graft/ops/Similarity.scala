package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design: the brute-force path is the correctness baseline (and is
  * the right tool for one-off small query sets — broadcast the queries,
  * scan the corpus once, no shuffle of the corpus). The hyperplane-LSH
  * path is the 100 TB shape: bucket assignment is a per-row map (no
  * shuffle), candidate generation joins only within buckets, and the
  * expected bucket population falls geometrically with the plane count.
  *
  * All arithmetic is double (exact widening from float), dot products via
  * `zip_with`/`aggregate` (codegen'd, no UDF); similarities are rounded at
  * 1e-6 before any threshold/rank so results are reproducible across
  * engines.
  */
object Similarity {

  /** elementwise double cast. */
  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** dot product via the native codegen'd expression
    * ([[graft.functions.VecDot]]): same float->double widening and
    * left-to-right IEEE summation as the `zip_with`+`aggregate` HOF
    * formulation, ~10x faster (fused primitive loop inside whole-stage
    * codegen vs interpreted lambda dispatch). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine similarity rounded to 6 decimals (cross-engine stable). */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** cosine from precomputed norms: one dot per pair instead of three —
    * the norms are computed once per row, not once per pair. This is what
    * makes all-pairs / top-k scans tractable: pair cost drops to a single
    * fused multiply-add loop over the vector. */
  private def cosineWithNorms(a: Column, na: Column, b: Column, nb: Column): Column =
    round(dot(a, b) / (na * nb), 6)

  private def withNorm(df: DataFrame, vecCol: String, out: String): DataFrame =
    df.withColumn(out, norm(col(vecCol)))

  /** Brute-force top-k cosine neighbors for a (small) query set.
    * `queries`/`corpus`: (idCol, vecCol). The query side is broadcast; the
    * corpus is scanned once; ranking tie-breaks on neighbor id. Returns
    * (query_id, neighbor_id, rank, sim). */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = withNorm(queries, vecCol, "__qn")
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"), col("__qn"))
    val c = withNorm(corpus, vecCol, "__cn")
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"), col("__cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosineWithNorms(col("__qv"), col("__qn"), col("__cv"), col("__cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }

  /** HARD-NEGATIVE mining for contrastive training: for each query, the
    * top-k most-similar corpus vectors with a DIFFERENT label — the
    * standard triplet/contrastive miner (the informative negatives are
    * the ones the model currently confuses with the anchor's class).
    * `maxSim` (exclusive upper cap, default 1.0 = no cap) implements the
    * usual mislabel guard: a different-label vector at near-identical
    * similarity is more often a labeling error than a useful negative,
    * so production miners cap it out.
    *
    * Shuffle profile = [[bruteForceTopK]]'s: queries (small by
    * construction — the anchors of a training batch) broadcast with
    * their labels, the corpus streams once, one query-keyed rank window.
    * At corpus scale compose the same filter over [[ivfTopK]]'s probed
    * cells instead — the label test rides the candidate join either way.
    * Returns (query_id, neighbor_id, rank, sim). */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int, maxSim: Double = 1.0): DataFrame = {
    val q = withNorm(queries, vecCol, "__qn")
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"), col("__qn"),
        col(labelCol).as("__ql"))
    val c = withNorm(corpus, vecCol, "__cn")
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"), col("__cn"),
        col(labelCol).as("__cl"))
    val scored = c.crossJoin(broadcast(q))
      // plain (null-excluding) inequality, SQL `<>` semantics: an
      // UNLABELED row is neither a positive nor a negative — it cannot
      // certify a label difference, so it never mines as one
      .filter(col("query_id") =!= col("neighbor_id") && col("__cl") =!= col("__ql"))
      .withColumn("sim", cosineWithNorms(col("__qv"), col("__qn"), col("__cv"), col("__cn")))
      // strict cap; >= 1.0 means "no cap" (an exact-copy negative rounds
      // to sim exactly 1.0 and must still mine when uncapped)
      .filter(if (maxSim >= 1.0) lit(true) else col("sim") < maxSim)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }

  /** IVF (inverted-file) cell assignment — the centroid-partitioned ANN
    * scale path beside hyperplane LSH: every vector joins the cell of its
    * nearest centroid (cosine; ties -> lowest centroid id). Centroids are
    * broadcast (there are few by construction) and the argmax is ONE
    * map-side-combinable aggregate — no window, no shuffle of the corpus
    * beyond the final per-id combine. Search then only scans probed
    * cells ([[ivfTopK]]). Returns (vec_id, cell_id). */
  def ivfCells(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String, centVecCol: String): DataFrame = {
    val c = withNorm(corpus, vecCol, "__vn")
      .select(col(idCol).as("vec_id"), col(vecCol).as("__v"), col("__vn"))
    val cents = withNorm(centroids, centVecCol, "__cn")
      .select(col(centIdCol).cast("long").as("__cid"), col(centVecCol).as("__c"), col("__cn"))
    c.crossJoin(broadcast(cents))
      .withColumn("__sim", cosineWithNorms(col("__v"), col("__vn"), col("__c"), col("__cn")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("__sim").as("s"), (-col("__cid")).as("negcid"))).as("__best"))
      .select(col("vec_id"), (-col("__best.negcid")).as("cell_id"))
  }

  /** Multi-probe cell assignment: each vector's `nprobe` nearest cells
    * (cosine desc, centroid id asc), for recovering recall at cell
    * boundaries. One window keyed by vec_id over the per-vector centroid
    * scores — the shuffle carries |vectors| * |centroids| tiny rows, not
    * the corpus. Returns (vec_id, cell_id, probe). */
  def ivfProbeCells(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String, centVecCol: String,
      nprobe: Int): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val v = withNorm(vectors, vecCol, "__vn")
      .select(col(idCol).as("vec_id"), col(vecCol).as("__v"), col("__vn"))
    val cents = withNorm(centroids, centVecCol, "__cn")
      .select(col(centIdCol).cast("long").as("__cid"), col(centVecCol).as("__c"), col("__cn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("__sim").desc, col("__cid").asc)
    v.crossJoin(broadcast(cents))
      .withColumn("__sim", cosineWithNorms(col("__v"), col("__vn"), col("__c"), col("__cn")))
      .withColumn("probe", row_number().over(w))
      .filter(col("probe") <= nprobe)
      .select(col("vec_id"), col("__cid").as("cell_id"), col("probe"))
  }

  /** One Lloyd (k-means) centroid-update step over the IVF assignment —
    * how the cell centroids are trained in the first place: assign every
    * vector to its nearest centroid ([[ivfCells]] semantics, broadcast
    * argmax), then average the members of each cell elementwise.
    *
    * The mean is computed in exact integer micro-space: each component is
    * offset by +2.0 (keeps unit-scale sums positive) and scaled to micro
    * units BEFORE summation, so the sum is order-independent integer
    * arithmetic and the result is bit-identical across engines and
    * partitionings — a float sum's value depends on reduction order,
    * which no distributed engine fixes. The mean itself uses FLOOR
    * division, which agrees with DuckDB's `//` for negative sums too, so
    * components below -2.0 still produce exact cross-engine results.
    *
    * Plan shape at 100 TB: the assignment argmax completes map-side (each
    * vector's centroid rows are colocated by the broadcast cross join), so
    * shuffle 1 carries one row per vector; shuffle 2 is the (cell, dim)
    * partial-aggregated sums — |cells| * dim rows. No window, no corpus
    * materialization.
    *
    * Output: (cell_id, dim, mean_micro, n_members) — dim is 0-based,
    * mean_micro is the de-offset micro-scaled component mean.
    */
  def kmeansUpdate(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String, centVecCol: String): DataFrame = {
    val c = withNorm(corpus, vecCol, "__vn")
      .select(col(idCol).as("vec_id"), col(vecCol).as("__v"), col("__vn"))
    val cents = withNorm(centroids, centVecCol, "__cn")
      .select(col(centIdCol).cast("long").as("__cid"), col(centVecCol).as("__c"), col("__cn"))
    val assigned = c.crossJoin(broadcast(cents))
      .withColumn("__sim", cosineWithNorms(col("__v"), col("__vn"), col("__c"), col("__cn")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("__sim").as("s"), (-col("__cid")).as("negcid"))).as("__best"),
        // every row of a vec_id group carries the same vector
        first(col("__v")).as("__v"))
      .select((-col("__best.negcid")).as("cell_id"), col("__v"))
    assigned
      .select(col("cell_id"), posexplode(col("__v")).as(Seq("dim", "x")))
      .groupBy(col("cell_id"), col("dim"))
      .agg(sum(expr("cast(round((cast(x as double) + 2.0D) * 1000000.0D, 0) as bigint)")).as("__s"),
        count(lit(1)).as("n_members"))
      .select(col("cell_id"), col("dim").cast("long").as("dim"),
        // floor division (not Spark's truncating `div`): matches DuckDB's
        // `//` for NEGATIVE sums too, so the +2.0 offset is belt — not
        // the only thing keeping out-of-range components correct
        (expr("CAST(floor(CAST(__s AS DECIMAL(38,0)) / n_members) AS BIGINT)")
          - lit(2000000L)).as("mean_micro"),
        col("n_members"))
  }

  /** Symmetric per-vector int8 quantization — the 4x storage cut an
    * embedding store takes before ANN serving: q_i = round(x_i * 127 /
    * max|x|), reconstructed as q_i * max|x| / 127. Pure per-row HOF
    * projection, no shuffle.
    *
    * Output is cross-engine hash-checkable: the quantized codes are
    * reported as an md5 over their comma-joined decimal form, the scale
    * and the mean absolute reconstruction error as rounded integers
    * (scale_e9, err_e6). The error fold is a left-to-right sequential
    * sum — deterministic, same order both engines. Zero vectors quantize
    * to all-zero codes with scale 0.
    *
    * Returns (id, scale_e9, q_md5, err_e6). */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val out = df
      .withColumn("__v", asDouble(col(vecCol)))
      .withColumn("__mx", array_max(transform(col("__v"), x => abs(x))))
      .withColumn("__q", when(col("__mx") === 0.0,
          transform(col("__v"), _ => lit(0L)))
        .otherwise(transform(col("__v"),
          x => round(x * lit(127.0) / col("__mx"), 0).cast("long"))))
      .withColumn("__err", when(col("__mx") === 0.0, lit(0.0)).otherwise(expr(
        """aggregate(zip_with(__v, __q, (x, q) -> abs(x - q * __mx / 127.0D)),
          |          0.0D, (acc, e) -> acc + e) / size(__v)""".stripMargin)))
    out.select(col(idCol),
      round(col("__mx") / 127.0 * 1e9, 0).cast("long").as("scale_e9"),
      // concat_ws silently skips a NULL array — guard so a null vector
      // yields null codes (not md5("")), like every other output column
      when(col("__q").isNull, lit(null).cast("string"))
        .otherwise(md5(concat_ws(",", transform(col("__q"), q => q.cast("string")))))
        .as("q_md5"),
      round(col("__err") * 1e6, 0).cast("long").as("err_e6"))
  }

  /** Binary sign quantization: dimension d contributes bit `d % 32` of
    * code word `d / 32` — set iff `v(d) > 0`. 32 dims per 64-bit word
    * (bits 32..63 stay clear) so the packed values remain small positive
    * BIGINTs that every engine's integer arithmetic agrees on — no
    * sign-bit/overflow edge at word 63 to argue about cross-engine.
    *
    * This is the classic binarization trade: a 768-dim float32 embedding
    * (3 KiB) becomes 24 longs (192 B) — 16x less memory and bandwidth —
    * and distance becomes XOR+popcount ([[hammingTopK]]), the cheapest
    * comparison a vector search can make. At 100 TB the binary codes of
    * a billion-vector corpus fit where the floats never would, which is
    * why binary rerank-then-refine is the standard first stage.
    *
    * Zero and negative dims quantize to 0-bits (sign(0) has no bit), a
    * null vector yields null codes. Returns (id, n_dims, codes). */
  def binarySignCodes(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val words = expr(
      s"""transform(sequence(0, (size($vecCol) + 31) div 32 - 1),
         |  w -> aggregate(sequence(0, 31), 0L,
         |    (acc, b) -> acc + IF(w * 32 + b < size($vecCol)
         |                         AND element_at($vecCol, cast(w * 32 + b + 1 as int)) > 0,
         |                         shiftleft(1L, b), 0L)))""".stripMargin)
    df.select(col(idCol), size(col(vecCol)).cast("long").as("n_dims"), words.as("codes"))
  }

  /** Hamming top-k over binary sign codes: both sides pack once
    * ([[binarySignCodes]]), the (small) query side broadcasts, and each
    * corpus row pays one fused XOR+popcount loop per query
    * ([[graft.functions.VecHamming]], codegen'd — the HOF
    * `aggregate(zip_with(...))` form runs interpreted). Ranking
    * tie-breaks (distance, neighbor id) ascending so the result is
    * deterministic. The corpus never shuffles; the per-query top-k
    * window runs on a relation of |queries| * |corpus| SCORES (id pairs
    * + int distance), not vectors. Returns (query_id, neighbor_id,
    * rank, dist). */
  def hammingTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = binarySignCodes(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("codes").as("__qc"))
    val c = binarySignCodes(corpus, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("codes").as("__cc"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dist",
        graft.functions.VectorFunctions.vec_hamming(col("__qc"), col("__cc")).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("dist").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("dist"))
  }

  /** IVF top-k: corpus vectors live in their nearest cell; each query
    * ranks within its `nprobe` nearest cells — the search cost is the
    * probed cells' population, not the corpus. nprobe=1 is the classic
    * trade (lower recall at cell boundaries); nprobe=2+ recovers boundary
    * neighbors for nprobe× probe cost, still corpus-scan-free. */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, k: Int,
      centroids: DataFrame, centIdCol: String, centVecCol: String,
      nprobe: Int = 1): DataFrame = {
    val cCells = ivfCells(corpus, idCol, vecCol, centroids, centIdCol, centVecCol)
    val qCells =
      (if (nprobe == 1) ivfCells(queries, idCol, vecCol, centroids, centIdCol, centVecCol)
       else ivfProbeCells(queries, idCol, vecCol, centroids, centIdCol, centVecCol, nprobe)
         .drop("probe"))
      .withColumnRenamed("vec_id", "query_id")
    val c = withNorm(corpus, vecCol, "__cn")
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"), col("__cn"))
      .join(cCells, col("neighbor_id") === cCells("vec_id")).drop("vec_id")
    val q = withNorm(queries, vecCol, "__qn")
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"), col("__qn"))
      .join(qCells, Seq("query_id"))
    val scored = c.join(broadcast(q), Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosineWithNorms(col("__qv"), col("__qn"), col("__cv"), col("__cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"), col("cell_id"))
  }

  /** Deterministic pseudo-random hyperplane sign for (plane, dim): +1 when
    * md5's first hex digit has its high bit set. Reproducible everywhere —
    * no RNG state to ship to executors. */
  private[ops] def planeSign(plane: Int, dim: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$plane:$dim".getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
  }

  /** Random-hyperplane LSH bucket per row: `planes` sign-bits of
    * sign(sum_i s(p,i) * v_i). The +-1 sign matrix is a pure function of
    * md5("plane:dim"), derived once on the driver and shipped as array
    * literals — per row the bucket is `planes` fused dot products, no md5,
    * no shuffle. Returns df + "bucket" (bitstring).
    *
    * Sign literals are sized to the ACTUAL vector dimension: `maxDims <= 0`
    * (default) probes one row at plan time — embedding dims are fixed per
    * corpus, and this is what keeps every dimension participating instead
    * of silently bucketing 512-dim vectors on a 256-dim prefix (a recall
    * leak with no signal). A vector LONGER than the derived/declared dims
    * fails loudly at execution unless the caller opts into prefix
    * bucketing with `allowPrefix` (shorter vectors just use their own
    * length — they genuinely have fewer dimensions). */
  def hyperplaneBuckets(df: DataFrame, vecCol: String, planes: Int = 8,
      maxDims: Int = -1, allowPrefix: Boolean = false): DataFrame = {
    val dims =
      if (maxDims > 0) maxDims
      // probe a NON-NULL row for the corpus dimension (a leading null
      // vector must not NPE the plan-time probe)
      else math.max(1, df.select(size(col(vecCol)).as("__n"))
        .filter(col("__n").isNotNull && col("__n") >= 0).take(1)
        .headOption.map(_.getInt(0)).getOrElse(1))
    // vec_dot is null-strict on length mismatch, so the prefix semantics
    // are explicit here: both the vector and the sign literal are sliced
    // to the common length before the dot product
    val n = least(size(col(vecCol)), lit(dims))
    val bits = (0 until planes).map { p =>
      // dims are 1-based, matching the oracle's sign derivation
      val signs = lit((1 to dims).map(i => planeSign(p, i)).toArray)
      when(round(dot(slice(col(vecCol), lit(1), n), slice(signs, lit(1), n)), 6) >= 0, "1")
        .otherwise("0")
    }
    val bucket = concat(bits: _*)
    // null vectors get a null bucket (they have no geometry to hash) —
    // short-circuited FIRST, or the dim guard's null comparison would
    // fall through to raise_error and kill the job on one null row
    val guarded =
      if (allowPrefix) bucket
      else when(col(vecCol).isNull, lit(null).cast("string"))
        .when(size(col(vecCol)) <= dims, bucket)
        .otherwise(raise_error(concat(
          lit("hyperplaneBuckets: vector dim "), size(col(vecCol)).cast("string"),
          lit(s" exceeds dims=$dims; pass maxDims (and allowPrefix=true to bucket on a prefix)"))))
    df.withColumn("bucket", guarded)
  }

  /** Bucketed ANN: top-k by cosine within each query's bucket. Falls back
    * to fewer-than-k results when a bucket is sparse (standard IVF/LSH
    * recall trade-off; probe more buckets by lowering `planes`). */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, k: Int, planes: Int = 8): DataFrame = {
    val all = withNorm(hyperplaneBuckets(df, vecCol, planes), vecCol, "__cn")
    val q = withNorm(hyperplaneBuckets(queries, vecCol, planes), vecCol, "__qn")
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"), col("__qn"), col("bucket"))
    val c = all.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"), col("__cn"), col("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosineWithNorms(col("__qv"), col("__qn"), col("__cv"), col("__cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }

  /** Product-quantization encode — the compression step of the classic
    * IVF+PQ ANN stack ([[ivfCells]] partitions the corpus; this shrinks
    * each vector to `m` small integer codes): the vector splits into `m`
    * contiguous subspaces, and each subspace is replaced by the id of its
    * nearest codebook entry (L2, distance micro-rounded before the argmin
    * so the choice is cross-engine exact; ties -> lowest codebook id).
    *
    * Scale shape: the codebook is broadcast (k entries by construction —
    * k-means trained via [[kmeansUpdate]]); the per-(vector, subspace)
    * argmin is one map-side-combinable aggregate over |corpus| * m tiny
    * rows (the full-width vector never shuffles), and the code assembly
    * groups the same m rows. Output storage is m integers per vector —
    * the 8-32x cut that makes a 100 TB embedding store serveable.
    *
    * Returns (vec_id, code_0 .. code_{m-1}). */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame, cbIdCol: String, cbVecCol: String, m: Int,
      maxCodebookEntries: Int = 65536): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    // the codebook is broadcast and cross-joined per subspace: fail
    // loudly if it is not actually small (a PQ codebook is 2^4..2^16
    // entries by design; anything bigger is a mis-passed corpus)
    val cbCount = codebook.limit(maxCodebookEntries + 1).count()
    require(cbCount <= maxCodebookEntries,
      s"pqEncode: codebook has > $maxCodebookEntries entries — not broadcastable")
    val dim = pqDim(codebook, cbVecCol, "pqEncode")
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m subspaces")
    val sub = dim / m
    def slices(v: Column): Column = pqSlices(v, m, sub)
    // a corpus vector whose dimension differs from the codebook's gets
    // NULL slices -> null distances -> null codes: a LONGER vector would
    // otherwise silently encode on a prefix (the hyperplaneBuckets
    // truncation trap), a shorter one on null-padded garbage
    def guardedSlices(v: Column): Column =
      when(v.isNotNull && size(v) === dim, slices(v))
        // m null slices, NOT a null array: the row keeps its m (j, null)
        // entries so the vector still appears in the output — with null
        // codes — instead of vanishing from it
        .otherwise(array((0 until m).map(_ => lit(null).cast("array<double>")): _*))
    val c = corpus.select(col(idCol).as("vec_id"),
      posexplode(guardedSlices(col(vecCol))).as(Seq("j", "__sv")))
    val cb = codebook.select(col(cbIdCol).cast("long").as("__cid"),
      posexplode(slices(col(cbVecCol))).as(Seq("j", "__cv")))
    val codes = c.join(broadcast(cb), Seq("j"))
      .withColumn("__d", pqL2e6)
      .groupBy(col("vec_id"), col("j"))
      // null distance (null vector, or a length mismatch null-padded by
      // zip_with) must yield a NULL code, not the lowest cid — a bare
      // min(struct(null, cid)) would sort the null distance FIRST and
      // hand garbage rows real-looking codes. Wrapping in when() makes
      // min skip them; an all-null group aggregates to null.
      .agg(min(when(col("__d").isNotNull,
        struct(col("__d").as("d"), col("__cid").as("cid")))).as("__best"))
      .select(col("vec_id"), col("j"), col("__best.cid").as("__code"))
    codes.groupBy(col("vec_id"))
      .agg(max(when(col("j") === 0, col("__code"))).as("code_0"),
        (1 until m).map(j =>
          max(when(col("j") === j, col("__code"))).as(s"code_$j")): _*)
  }

  /** Codebook vector dimension (first non-null entry) — shared dim probe
    * of the PQ encode/search family. */
  private def pqDim(codebook: DataFrame, cbVecCol: String, fn: String): Int =
    codebook.select(size(col(cbVecCol)).as("__n"))
      .filter(col("__n").isNotNull && col("__n") > 0).take(1)
      .headOption.map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException(s"$fn: empty codebook"))

  /** The m contiguous subspace slices of a full-width vector. */
  private def pqSlices(v: Column, m: Int, sub: Int): Column =
    array((0 until m).map(j => slice(asDouble(v), j * sub + 1, sub)): _*)

  /** Micro-rounded subspace L2 between __sv and __cv — THE PQ distance,
    * integer-exact across engines. One definition so encode and both
    * search paths can never disagree on the arithmetic. */
  private def pqL2e6: Column = round(expr(
    """aggregate(zip_with(__sv, __cv, (x, y) -> (x - y) * (x - y)),
      |          0.0D, (acc, e) -> acc + e)""".stripMargin) * lit(1e6), 0).cast("long")

  /** Query-side ADC distance table: (query_id, j, __cid, __qd) for every
    * (query subvector, codebook entry) pair — |queries| x m x |codebook|
    * tiny rows, broadcast by callers. A null/short/long query emits NO
    * subvectors and therefore no neighbors — unguarded, its all-null ADC
    * would rank FIRST (nulls-first window order) and a longer vector
    * would silently search on a prefix. */
  private def pqQueryDistTable(queries: DataFrame, qIdCol: String, qVecCol: String,
      codebook: DataFrame, cbIdCol: String, cbVecCol: String,
      m: Int, dim: Int): DataFrame = {
    val sub = dim / m
    val q = queries.select(col(qIdCol).as("query_id"),
      posexplode(when(col(qVecCol).isNotNull && size(col(qVecCol)) === dim,
        pqSlices(col(qVecCol), m, sub))).as(Seq("j", "__sv")))
      .filter(col("__sv").isNotNull)
    val cb = codebook.select(col(cbIdCol).cast("long").as("__cid"),
      posexplode(pqSlices(col(cbVecCol), m, sub)).as(Seq("j", "__cv")))
    q.join(cb, Seq("j")).select(col("query_id"), col("j"), col("__cid"),
      pqL2e6.as("__qd"))
  }

  /** Melt (…, code_0..code_{m-1}) rows to (…, j, __code), dropping null
    * codes (null/mismatched at encode time). */
  private def pqMeltCodes(df: DataFrame, m: Int, keep: Seq[Column]): DataFrame =
    df.select(keep :+
      posexplode(array((0 until m).map(j => col(s"code_$j")): _*)).as(Seq("j", "__code")): _*)
      .filter(col("__code").isNotNull)

  /** Shared ADC tail: sum subspace distances per (query, neighbor), rank
    * ascending (ties -> neighbor id), keep top-k. Self-matches dropped. */
  private def pqRankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("adc_e6").asc, col("neighbor_id").asc)
    scored
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("__qd")).as("adc_e6"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("adc_e6"))
  }

  /** PQ ADC (asymmetric distance computation) search — the serving-side
    * half of product quantization: neighbors are ranked by the sum over
    * subspaces of the distance from the QUERY'S exact subvector to the
    * centroid each corpus code names. The corpus's floats are never
    * touched — only its m-integer codes — which is the whole point: the
    * full-width vectors can live in cold storage.
    *
    * Uses the same micro-rounded L2 arithmetic as [[pqEncode]], so the
    * ADC total is integer-exact across engines. Scale shape: the
    * query-side distance table is |queries| x m x |codebook| tiny rows
    * (broadcast); the codes table joins it map-side and one
    * (query, vec) aggregate + per-query top-k window follow. Vectors
    * that carry null codes (null/mismatched at encode time) are skipped.
    *
    * Returns (query_id, neighbor_id, rank, adc_e6). */
  def pqSearch(queries: DataFrame, qIdCol: String, qVecCol: String,
      codes: DataFrame, codesIdCol: String,
      codebook: DataFrame, cbIdCol: String, cbVecCol: String,
      m: Int, k: Int): DataFrame = {
    require(m >= 1 && k >= 1, s"need m >= 1 and k >= 1, got m=$m k=$k")
    val dim = pqDim(codebook, cbVecCol, "pqSearch")
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m subspaces")
    val qdist = pqQueryDistTable(queries, qIdCol, qVecCol,
      codebook, cbIdCol, cbVecCol, m, dim)
    val melted = pqMeltCodes(codes, m, Seq(col(codesIdCol).as("neighbor_id")))
    pqRankTopK(melted.join(broadcast(qdist),
      melted("j") === qdist("j") && col("__code") === col("__cid")), k)
  }

  /** Candidate-restricted PQ ADC search — [[pqSearch]] with the
    * (query, neighbor) pair set fixed up front instead of all-pairs. The
    * serving half of an IVF+PQ index: the caller derives candidates from
    * cell probes, so the ADC join touches |candidates| * m code rows, not
    * |queries| * |corpus| * m. Same micro-rounded L2, same null guards
    * (a null/mismatched query emits no subvectors and therefore NO
    * neighbors; null-coded corpus rows are skipped).
    *
    * `cand` columns: (query_id, neighbor_id, code_0..code_{m-1}).
    * Returns (query_id, neighbor_id, rank, adc_e6). */
  def pqSearchCandidates(queries: DataFrame, qIdCol: String, qVecCol: String,
      cand: DataFrame,
      codebook: DataFrame, cbIdCol: String, cbVecCol: String,
      m: Int, k: Int): DataFrame = {
    require(m >= 1 && k >= 1, s"need m >= 1 and k >= 1, got m=$m k=$k")
    val dim = pqDim(codebook, cbVecCol, "pqSearchCandidates")
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m subspaces")
    val qdist = pqQueryDistTable(queries, qIdCol, qVecCol,
      codebook, cbIdCol, cbVecCol, m, dim)
    val melted = pqMeltCodes(cand, m, Seq(col("query_id"), col("neighbor_id")))
    val joined = melted.join(broadcast(qdist),
      melted("query_id") === qdist("query_id") && melted("j") === qdist("j") &&
        col("__code") === col("__cid"))
      .drop(qdist("query_id")).drop(qdist("j"))
    pqRankTopK(joined, k)
  }

  /** SemDeDup-style semantic deduplication: vectors are assigned to IVF
    * cells (nearest of the given centroids), and within each cell a
    * vector is dropped when a LOWER-id neighbor sits at cosine >= tau —
    * each near-duplicate group survives as exactly its lowest id. Returns
    * the kept rows as (vec_id, cell_id).
    *
    * The pair scan is cell-keyed (one equi-join shuffle) and quadratic
    * only WITHIN a cell — the published design point: pick enough
    * centroids that cells stay small (corpus/k on average), never
    * all-pairs. Cross-cell near-duplicates are invisible by construction
    * (the same recall trade the paper accepts); lower tau or fewer cells
    * to trade cost for recall. */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String, centVecCol: String,
      tau: Double): DataFrame = {
    // the [[ivfCells]] argmax, with the vector (and its norm) carried
    // through the aggregate — every row of a vec_id group repeats them —
    // so the pair stage needs no join back to the corpus
    val c = withNorm(Spread(corpus), vecCol, "__n")
      .select(col(idCol).as("vec_id"), col(vecCol).as("__v"), col("__n"))
    val cents = withNorm(centroids, centVecCol, "__cn")
      .select(col(centIdCol).cast("long").as("__cid"), col(centVecCol).as("__c"), col("__cn"))
    val v = c.crossJoin(broadcast(cents))
      .withColumn("__sim", cosineWithNorms(col("__v"), col("__n"), col("__c"), col("__cn")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("__sim").as("s"), (-col("__cid")).as("negcid"))).as("__best"),
        first(col("__v")).as("__v"), first(col("__n")).as("__n"))
      .select(col("vec_id"), (-col("__best.negcid")).as("cell_id"), col("__v"), col("__n"))
    val hi = v.select(col("cell_id"), col("vec_id").as("__id_hi"),
      col("__v").as("__v1"), col("__n").as("__n1"))
    val lo = v.select(col("cell_id"), col("vec_id").as("__id_lo"),
      col("__v").as("__v2"), col("__n").as("__n2"))
    val dropped = hi.join(lo, Seq("cell_id"))
      .filter(col("__id_lo") < col("__id_hi"))
      .filter(cosineWithNorms(col("__v1"), col("__n1"), col("__v2"), col("__n2")) >= tau)
      .select(col("__id_hi").as("vec_id")).distinct()
    v.join(dropped, Seq("vec_id"), "left_anti").select(col("vec_id"), col("cell_id"))
  }

  /** Embedding near-duplicate pairs: cosine >= threshold over co-bucketed
    * pairs (or all pairs when `bruteForce`). Returns (id1, id2). */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bruteForce: Boolean = false, planes: Int = 8): DataFrame = {
    // the stream side pays one fused VecDot per candidate pair — spread
    // (grow-only) so a single-row-group corpus doesn't serialize the
    // whole O(n^2) filter on one core
    val base = withNorm(Spread(df), vecCol, "__n")
    val simAtLeast = (v1: Column, n1: Column, v2: Column, n2: Column) =>
      cosineWithNorms(v1, n1, v2, n2) >= threshold
    if (bruteForce) {
      // broadcast one full side: every partition of `a` scans the
      // broadcast copy — parallel across a's splits (a constant-key join
      // would funnel ALL pairs through one shuffle partition)
      val a = base.select(col(idCol).as("id1"), col(vecCol).as("__v1"), col("__n").as("__n1"))
      val b = base.select(col(idCol).as("id2"), col(vecCol).as("__v2"), col("__n").as("__n2"))
      a.crossJoin(broadcast(b)).filter(col("id1") < col("id2"))
        .filter(simAtLeast(col("__v1"), col("__n1"), col("__v2"), col("__n2")))
        .select(col("id1"), col("id2"))
    } else {
      val bucketed = hyperplaneBuckets(base, vecCol, planes)
      val a = bucketed.select(col("bucket"), col(idCol).as("id1"), col(vecCol).as("__v1"), col("__n").as("__n1"))
      val b = bucketed.select(col("bucket"), col(idCol).as("id2"), col(vecCol).as("__v2"), col("__n").as("__n2"))
      // each row has exactly one bucket, so a pair appears at most once —
      // no distinct (and no extra shuffle) needed
      a.join(b, Seq("bucket")).filter(col("id1") < col("id2"))
        .filter(simAtLeast(col("__v1"), col("__n1"), col("__v2"), col("__n2")))
        .select(col("id1"), col("id2"))
    }
  }

  /** EXACT cosine near-dup pairs, tiled: same output as
    * `nearDupPairs(bruteForce = true)` without broadcasting either side.
    *
    * An exact threshold join over DENSE vectors is intrinsically
    * Omega(n^2) compute — no order of the coordinates prunes the way a
    * gram frequency order prunes set joins — so the scalable form is not
    * a smaller join but an EVENLY DISTRIBUTED one: hash every row into
    * one of `tiles` buckets and materialize each unordered bucket pair
    * (i, j) as one join tile. A row lands in ~(tiles+1)/2 tiles (linear
    * replication, controlled), every task owns a (n/tiles)^2 pair block
    * that fits memory no matter the corpus size, and no single executor
    * sees more than 2n/tiles vectors at once. The tile key is the join
    * key, so Spark schedules the n^2 work as `tiles^2/2` uniform tasks —
    * the shape that survives a 1000-executor scale-out where the
    * broadcast arm OOMs the driver.
    *
    * An off-diagonal pair meets in exactly one tile with one
    * orientation; the diagonal tile sees both orientations, so it alone
    * keeps id1 < id2 and the output is canonicalized with
    * least/greatest. */
  def nearDupPairsTiled(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, tiles: Int = 16): DataFrame = {
    require(tiles >= 2, s"tiles must be >= 2, got $tiles")
    val base = withNorm(Spread(df), vecCol, "__n")
      .withColumn("__b", pmod(xxhash64(col(idCol)), lit(tiles)).cast("int"))
    val left = base.select(col(idCol).as("id1"), col(vecCol).as("__v1"),
        col("__n").as("__n1"), col("__b").as("__bi"))
      .withColumn("__tile",
        explode(expr(s"transform(sequence(__bi, ${tiles - 1}), j -> __bi * $tiles + j)")))
    val right = base.select(col(idCol).as("id2"), col(vecCol).as("__v2"),
        col("__n").as("__n2"), col("__b").as("__bj"))
      .withColumn("__tile",
        explode(expr(s"transform(sequence(0, __bj), i -> i * $tiles + __bj)")))
    left.join(right, Seq("__tile"))
      .filter(col("__bi") =!= col("__bj") || col("id1") < col("id2"))
      .filter(col("id1") =!= col("id2"))
      .filter(cosineWithNorms(col("__v1"), col("__n1"), col("__v2"), col("__n2")) >= threshold)
      .select(least(col("id1"), col("id2")).as("id1"),
        greatest(col("id1"), col("id2")).as("id2"))
  }

  /** Rows under which [[nearDupPairsExact]] picks the broadcast
    * brute-force arm: vectors are fixed-width (embeddings table: 64 x 4B
    * + overhead ~= 0.5 KiB/row), so a row budget IS a byte budget —
    * 100k rows ~= 50 MiB broadcast, the same line as
    * [[graft.exec.Mor.BroadcastDeleteBytesMax]]. */
  val ExactCosineBroadcastRowsMax: Long = 100000L

  /** Exact cosine near-dup pairs, arm chosen by corpus size: broadcast
    * brute force under [[ExactCosineBroadcastRowsMax]] rows (one
    * broadcast, zero shuffles), the tiled join above it — tile count
    * sized so each tile side stays near the broadcast budget. Both arms
    * emit identical pairs. Sub-quadratic COMPUTE requires accepting
    * approximation: that is `nearDupPairs(bruteForce = false)` /
    * [[ivfFlatTopK]], not this function. */
  def nearDupPairsExact(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, broadcastRowsMax: Long = ExactCosineBroadcastRowsMax): DataFrame = {
    require(broadcastRowsMax > 0,
      s"broadcastRowsMax must be positive (it also sizes the tiles), got $broadcastRowsMax")
    val rows = df.count()
    if (rows <= broadcastRowsMax)
      nearDupPairs(df, idCol, vecCol, threshold, bruteForce = true)
    else {
      val tiles = math.max(2L, (rows + broadcastRowsMax - 1) / broadcastRowsMax)
      nearDupPairsTiled(df, idCol, vecCol, threshold, tiles.toInt)
    }
  }
}
