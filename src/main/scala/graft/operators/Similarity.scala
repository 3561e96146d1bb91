package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2-D).
  *
  * Three tiers:
  *  - bruteForce: exact top-k (the correctness baseline; O(q·n) — fine
  *    for a probe set, never for all-pairs at scale);
  *  - lsh: random-hyperplane buckets — candidates only from the probe's
  *    bucket, embarrassingly parallel, O(n/2^planes) per probe;
  *  - ivf: inverted-file — coarse centroids partition the corpus into
  *    cells; probes search the nProbe nearest cells only. Cell
  *    assignment is a broadcast join (centroid table is tiny), so the
  *    corpus is scanned once, shuffled once on cell id.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each probe row. */
  def bruteForce(spark: SparkSession, emb: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    val q = probes.select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val scored = broadcast(q)
      .join(emb, $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        round(Fns.cosine_sim($"qe", $"embedding"), 9).as("cos_sim"))
    val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"neighbor_id")
    scored.withColumn("rk", row_number().over(w)).filter($"rk" <= k)
  }

  /** Radius (range) search: every corpus vector with cosine >= tau of
    * each probe — the "all near-duplicates of X" / recall-set query
    * that top-k can't express. One broadcast of the probe set + one
    * corpus scan, no shuffle at all (score + filter apply in-scan);
    * at 100 TB this is the embarrassingly-parallel exact baseline, and
    * the LSH/IVF cell pruning used by the top-k paths composes
    * unchanged when the probe count grows. */
  def rangeSearch(spark: SparkSession, emb: DataFrame, probes: DataFrame, tau: Double): DataFrame = {
    import spark.implicits._
    val q = probes.select($"vec_id".as("query_id"), $"embedding".as("qe"))
    broadcast(q)
      .join(emb, $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        round(Fns.cosine_sim($"qe", $"embedding"), 9).as("cos_sim"))
      .filter($"cos_sim" >= tau)
  }

  /** LSH-bucketed ANN: probes only compare within their bucket. */
  def lshTopK(spark: SparkSession, emb: DataFrame, probes: DataFrame,
              k: Int, numPlanes: Int = 8): DataFrame = {
    import spark.implicits._
    val bucketed = emb.select($"vec_id", $"embedding",
      Fns.lsh_bucket($"embedding", numPlanes).as("bucket"))
    val q = probes.select($"vec_id".as("query_id"), $"embedding".as("qe"),
      Fns.lsh_bucket($"embedding", numPlanes).as("bucket"))
    val scored = broadcast(q)
      .join(bucketed, Seq("bucket"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        round(Fns.cosine_sim($"qe", $"embedding"), 9).as("cos_sim"))
    val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"neighbor_id")
    scored.withColumn("rk", row_number().over(w)).filter($"rk" <= k)
  }

  /** Deterministic distributed k-means (Lloyd's): init = embeddings of
    * the k smallest vec_ids; each round assigns via a broadcast of the
    * k×dim centroid table and re-averages per cell. All data movement
    * is one groupBy per round over (cell, pos) — no collect of
    * anything data-sized (centroids are k×dim floats).
    * Returns (cell, centroid: Array[Float]). */
  def kmeans(spark: SparkSession, emb: DataFrame, k: Int, iters: Int): DataFrame = {
    import spark.implicits._
    var centroids = emb.orderBy($"vec_id").limit(k)
      .select(monotonically_increasing_id().as("cell"), $"embedding".as("ce"))
      .select($"cell", $"ce")
    for (_ <- 1 to iters) {
      val w = Window.partitionBy($"vec_id").orderBy($"cell_sim".desc, $"cell")
      val assigned = emb.crossJoin(broadcast(centroids))
        .withColumn("cell_sim", Fns.cosine_sim($"embedding", $"ce"))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" === 1)
        .select($"cell", $"embedding")
      centroids = assigned
        .select($"cell", posexplode($"embedding").as(Seq("pos", "v")))
        .groupBy($"cell", $"pos")
        .agg(avg($"v").as("cv"))
        .groupBy($"cell")
        .agg(array_sort(collect_list(struct($"pos", $"cv"))).as("pairs"))
        .select($"cell", expr("transform(pairs, p -> cast(p.cv as float))").as("ce"))
        .localCheckpoint()
    }
    centroids.select($"cell", $"ce".as("centroid"))
  }

  /** Coarse centroid table: trained cells when given, else the
    * deterministic first-k init (must not assume 0-based contiguous
    * vec_ids — take the first k in id order and re-number). */
  private[graft] def coarseCentroids(emb: DataFrame, nCells: Int,
                              trained: Option[DataFrame]): DataFrame =
    trained
      .map(_.select(col("cell"), col("centroid").as("ce")))
      .getOrElse(emb.orderBy(col("vec_id")).limit(nCells)
        .select(row_number().over(Window.orderBy(col("vec_id"))).cast("long").as("cell"),
          col("embedding").as("ce")))

  /** The `keep` nearest cells for each row of `df` (broadcast of the
    * tiny centroid table). cell_sim rounded to 9dp before ranking: the
    * rank is then stable against sub-nano float drift (and
    * engine-reproducible).
    *
    * The corpus is round-robin spread to cluster width FIRST: this
    * stage is CPU-bound (rows × nCells cosines), and parquet's
    * columnar compression packs hundreds of thousands of vectors into
    * one split — left to scan-split parallelism, a 200k×3125-cell
    * assignment ran on ONE core (the r9 sf10 sweep stall). The
    * row-level shuffle is a single pass over the vectors, orders of
    * magnitude cheaper than the scoring it parallelizes; skipped when
    * the scan already has enough splits. */
  private[graft] def nearestCells(centroids: DataFrame, df: DataFrame,
                           idCol: String, vecCol: String, keep: Int): DataFrame =
    nearestCellsArr(centroids, df, vecCol, keep)
      .withColumn("cell", explode(col("_cells"))).drop("_cells")

  /** [[nearestCells]] with the ranked cell list kept as an ARRAY column
    * (`_cells`, nearest-first) instead of exploded — the shared-pass
    * form [[ivfTopK]]'s self-ANN path derives BOTH the top-1 assignment
    * (element 1) and the nProbe probe list (explode) from, so the
    * corpus×centroid kernel runs once, not twice. */
  private[graft] def nearestCellsArr(centroids: DataFrame, df: DataFrame,
                           vecCol: String, keep: Int): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val spread = if (df.rdd.getNumPartitions >= par) df else df.repartition(par)
    // top-`keep` INSIDE the row, not via crossJoin+window: the row_number
    // formulation exploded every vector into nCells candidate rows —
    // each carrying the full embedding — and shuffled them all for the
    // per-vector window (measured ~180 GB at 200k vectors × 3125 cells;
    // the r9 sf10 ENOSPC). The centroid table is collected driver-side
    // (index-build metadata, ≤65536 × dim floats — what a FAISS coarse
    // quantizer holds in RAM) and rides into the fused TopCells kernel
    // with the task closure: one tight scoring loop per vector, no
    // exchange, no per-centroid expression plumbing. Ordering stays
    // `round(cos, 9) DESC, cell ASC` — see TopCells's exactness notes.
    val centRows = centroids.select(col("cell").cast("long"), col("ce")).collect()
    val cellIds = centRows.map(_.getLong(0))
    val cvecs = centRows.map(_.getSeq[Float](1).toArray.map(_.toDouble))
    spread.withColumn("_cells", Fns.top_cells(col(vecCol), cellIds, cvecs, keep))
  }

  /** One-pass disk layout for an IVF index over a manifest table:
    * ONE shuffle places every assignment row in its cell's partition,
    * one staged write emits exactly one file per nonempty cell, one
    * stats-carrying commit lands the whole index — build cost is one
    * pass over the assignment and O(1) commits REGARDLESS of cell
    * count (the loop this replaces paid one filtered scan + one
    * commit per cell: O(cells) passes, O(cells) log versions).
    *
    * Placement is a value-identity partitioner over the (tiny, dense)
    * cell-id set — the one spot the RDD bridge is the precise tool:
    * DataFrame range/hash repartitioning targets SIZE balance, not key
    * identity, and may lawfully merge two small cells into one file or
    * split a big one across two, which breaks the one-file-per-cell
    * stats contract the probe-side census verifies (a merged file
    * makes `readRange(cell)` over-read; a split one breaks the
    * planned-files count). Rows are sorted by vec_id within each file
    * for deterministic layout. Returns the committed version (always
    * 0 — a fresh index dir). */
  private[graft] def buildIvfManifestIndex(s: SparkSession, assigned: DataFrame,
                                           cells: Array[Long], root: String,
                                           sortCol: String = "vec_id",
                                           statCols: Seq[String] = Seq("cell")): Long = {
    val rank: Map[Long, Int] = cells.sorted.zipWithIndex.toMap
    val schema = assigned.schema
    val cellIdx = schema.fieldIndex("cell")
    val placed = s.createDataFrame(
      assigned.rdd.keyBy(_.getLong(cellIdx))
        .partitionBy(new org.apache.spark.Partitioner {
          override def numPartitions: Int = rank.size
          override def getPartition(key: Any): Int = rank(key.asInstanceOf[Long])
        }).values, schema)
      .sortWithinPartitions(col(sortCol))
    val v = graft.sources.ManifestTable.appendWithStats(s, placed, root, statCols: _*)
    require(v == 0L, s"IVF index build must be ONE commit; landed at v$v")
    v
  }

  /** IVF-style ANN. Coarse centroids default to a deterministic
    * first-k init; pass `trainedCentroids` (e.g. from [[kmeans]]) for
    * trained cells. */
  /** @param broadcastProbes broadcast the probe side of the cell join
    *        (default). Right for the typical small probe set — it keeps
    *        the corpus un-shuffled; pass false for probe sets too big
    *        to broadcast (e.g. corpus-vs-corpus self-ANN) and the
    *        planner falls back to a shuffle join. */
  /** @param corpusFilter predicate applied to the corpus DURING cell
    *        probing (i.e. on the posting lists, after assignment but
    *        before scoring) — filtered ANN for predicate+vector
    *        retrieval. The index (centroids, assignment) is built on
    *        the FULL corpus — one index serves every predicate — but
    *        every scored candidate already satisfies the predicate, so
    *        the top-k is k MATCHING results. Contrast post-filtering
    *        (filter the unfiltered top-k afterwards), which at
    *        selectivity s returns ~s·k rows and starves recall —
    *        measured by ann_filtered_recall. At scale the filter is a
    *        column predicate on the fixed-width assignment table:
    *        Catalyst pushes it below the probe join, so candidate
    *        volume shrinks by s instead of growing nProbe. */
  def ivfTopK(spark: SparkSession, emb: DataFrame, probes: DataFrame,
              k: Int, nCells: Int = 8, nProbe: Int = 2,
              trainedCentroids: Option[DataFrame] = None,
              broadcastProbes: Boolean = true,
              corpusFilter: Option[Column] = None): DataFrame = {
    import spark.implicits._
    val centroids = coarseCentroids(emb, nCells, trainedCentroids)

    // Self-ANN (the probe side IS the corpus object): ONE fused
    // corpus×centroid kernel pass at keep=nProbe, checkpointed; the
    // top-1 assignment is element 1 of the same ranked cell list the
    // probes explode (identical ordering expression ⇒ bit-identical to
    // two separate passes). The generic path below pays the assignment
    // and probe kernels separately — correct when the probe set is a
    // different (usually tiny) frame, pure waste when probes ≡ corpus
    // (knn_graph ran the n·C scoring twice).
    val (assigned0, probeCells) =
      if ((probes eq emb) && corpusFilter.isEmpty) {
        val cells = nearestCellsArr(centroids, emb, "embedding", nProbe)
          .localCheckpoint() // feeds both join sides; n×(vec+nProbe longs)
        (cells.withColumn("cell", element_at($"_cells", 1)).drop("_cells"),
          cells.select($"vec_id".as("query_id"), $"embedding".as("qe"),
            explode($"_cells").as("cell")))
      } else {
        (nearestCells(centroids, emb, "vec_id", "embedding", 1), // corpus: 1 cell each
          nearestCells(centroids,
            probes.select($"vec_id".as("query_id"), $"embedding".as("qe")),
            "query_id", "qe", nProbe)) // probes: nProbe cells
      }
    val assigned = corpusFilter.fold(assigned0)(assigned0.filter)

    val probeSide = if (broadcastProbes) broadcast(probeCells) else probeCells
    val scored = probeSide
      .join(assigned, Seq("cell"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        round(Fns.cosine_sim($"qe", $"embedding"), 9).as("cos_sim"))
    val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"neighbor_id")
    scored.withColumn("rk", row_number().over(w)).filter($"rk" <= k)
  }

  /** Cell-blocked candidate pairs: assign every vector to its nearest
    * coarse cell, emit intra-cell (vec_a < vec_b) pairs with 9dp
    * cosine. The only corpus-sized join is an EQUI-join on cell id —
    * each cell is processed independently (embarrassingly parallel),
    * so pair generation is O(Σ cell²), tuned by nCells / trained
    * centroids, never a corpus-wide nested-loop join. Size nCells
    * ~ n/targetCellSize (and pass [[kmeans]] output) so cells stay
    * bounded as the corpus grows. */
  def cellPairs(spark: SparkSession, emb: DataFrame, nCells: Int = 8,
                trainedCentroids: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    val centroids = coarseCentroids(emb, nCells, trainedCentroids)
    // materialize the assignment once: it feeds BOTH self-join sides,
    // and aliasing would defeat exchange reuse — without this the
    // centroid scoring pass (the crossJoin + window) runs twice
    val assigned = nearestCells(centroids, emb, "vec_id", "embedding", 1)
      .localCheckpoint()
    val a = assigned.select($"cell", $"vec_id".as("vec_a"), $"embedding".as("ea"))
    val b = assigned.select($"cell", $"vec_id".as("vec_b"), $"embedding".as("eb"))
    a.join(b, a("cell") === b("cell") && $"vec_a" < $"vec_b")
      .select($"vec_a", $"vec_b", round(Fns.cosine_sim($"ea", $"eb"), 9).as("cos_sim"))
  }

  /** SemDeDup-style semantic deduplication over [[cellPairs]]: drop any
    * vector that has a smaller-id neighbor with cosine ≥ tau inside its
    * cell.
    *
    * Returns the removal list: (drop_id, kept_by = min qualifying
    * smaller id, n_dups = number of qualifying smaller-id neighbors).
    * Keep-set = corpus ∖ drop_ids. */
  def semDedup(spark: SparkSession, emb: DataFrame, tau: Double,
               nCells: Int = 8,
               trainedCentroids: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    cellPairs(spark, emb, nCells, trainedCentroids)
      .filter($"cos_sim" >= tau)
      .groupBy($"vec_b".as("drop_id"))
      .agg(min($"vec_a").as("kept_by"), count(lit(1)).as("n_dups"))
  }

  /** Sign-bit binary-quantization code: bit i of word w is set iff
    * embedding[w·64 + i] > 0, packed into ⌈dim/64⌉ longs. Computed
    * in-scan with builtin higher-order functions — no explode, no
    * shuffle; a 64-dim corpus compresses 256 B of floats to ONE long
    * per vector, so the candidate scan below moves 8 bytes/vector. */
  def signBitCode(e: String): Column =
    expr(
      s"""transform(
         |  sequence(0, cast(ceil(size($e) / 64.0) as int) - 1),
         |  w -> aggregate(sequence(0, 63), cast(0 as bigint), (acc, i) ->
         |    acc + IF(w * 64 + i < size($e)
         |             AND element_at($e, w * 64 + i + 1) > cast(0 as double),
         |      shiftleft(cast(1 as bigint), i), cast(0 as bigint))))""".stripMargin)

  /** Hamming distance between two packed sign-bit codes (bit_count of
    * the per-word XOR, summed — builtins only, applied in-scan). */
  def hammingDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, v) => acc + v)

  /** Binary-quantization ANN: Hamming pre-rank over packed sign-bit
    * codes selects k·mult candidates per probe, then the exact cosine
    * re-ranks just those. The fourth compressed-domain tier next to
    * LSH buckets, IVF cells and PQ/ADC: where PQ needs a trained
    * codebook, BQ is training-free and its scan reads 8 bytes per
    * vector per 64 dims (a 32× read reduction the sign of each
    * component preserves surprisingly well — the production operating
    * point popularized by RaBitQ-style quantizers).
    *
    * Scale shape: codes are computed in the corpus scan (no shuffle);
    * probe codes broadcast; the Hamming scan is map-only over 8-byte
    * codes; per-probe top-(k·mult) is a partitioned window (the
    * TopKRewrite heap exec replaces the sort); only the tiny candidate
    * set — never the corpus — is re-ranked, via two broadcast joins
    * into one more corpus scan. */
  def bqTopK(spark: SparkSession, emb: DataFrame, probes: DataFrame,
             k: Int, mult: Int = 8): DataFrame = {
    import spark.implicits._
    val coded = emb.withColumn("code", signBitCode("embedding"))
    val q = broadcast(probes
      .withColumn("code", signBitCode("embedding"))
      .select($"vec_id".as("query_id"), $"embedding".as("qe"),
        $"code".as("qc")))
    // map-only scored scan: 8-byte codes, no embedding payload
    val scored = q.drop("qe")
      .join(coded.select($"vec_id", $"code"), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        hammingDist($"qc", $"code").cast("long").as("hamming"))
    val wh = Window.partitionBy($"query_id").orderBy($"hamming", $"neighbor_id")
    val cand = scored.withColumn("cr", row_number().over(wh))
      .filter($"cr" <= k * mult).drop("cr")
    // exact re-rank of the candidate set only: candidates + probe
    // embeddings both broadcast into a second corpus scan
    val re = emb.join(broadcast(cand), emb("vec_id") === cand("neighbor_id"))
      .join(broadcast(q.select($"query_id", $"qe")), "query_id")
      .select($"query_id", $"neighbor_id", $"hamming",
        round(Fns.cosine_sim($"qe", $"embedding"), 9).as("cos_sim"))
    val wr = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"neighbor_id")
    re.withColumn("rk", row_number().over(wr)).filter($"rk" <= k)
      .select($"query_id", $"neighbor_id", $"rk", $"cos_sim", $"hamming")
  }
}
