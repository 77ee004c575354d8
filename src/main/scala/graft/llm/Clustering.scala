package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-means clustering over an `array<float>` embedding column — Lloyd's
  * algorithm, the topic/deduplication clustering step of an embedding
  * pipeline (and the real centroid trainer behind [[Similarity.ivfTopK]],
  * which documents its deterministic seed pick as a k-means drop-in).
  *
  * Scale shape per iteration:
  *  - assignment: centroids are k rows — broadcast over the unshuffled
  *    corpus scan, argmin by squared euclidean distance (sequential-fold
  *    arithmetic, same discipline as [[Similarity]]);
  *  - update: vectors `posexplode` to (cluster, dim, component) and hash-
  *    aggregate — map-side partial agg collapses each partition to at most
  *    k*dim rows before anything ships, so the shuffle is O(k*dim), not
  *    O(corpus).
  *
  * Determinism (the property that lets the driver's DuckDB gate check an
  * *iterative* algorithm): seeds are the first k vectors by id — the same
  * deterministic choice [[Similarity.ivfTopK]] makes — and each updated
  * centroid component is `sum(round(x*1e6)) / (n*1e6)`: the numerator is
  * an integer sum (order-independent where double summation is not), so
  * every iteration — and therefore every assignment — is bit-identical on
  * both engines at any parallelism. Ties in the argmin break by cluster id.
  *
  * The driver-side iteration loop with `localCheckpoint` per round is the
  * standard Spark shape for iterative ML (same as [[Dedup.clusters]]);
  * fixed `iters` keeps the oracle expressible as an unrolled CTE chain —
  * production callers use [[kmeansConverged]] (movement-eps loop) seeded
  * by the deterministic farthest-first rule ([[farthestFirstSeeds]]).
  */
object Clustering {

  /** Compiled kernel (higher-order `aggregate`/`zip_with` are
    * CodegenFallback — interpreted per row — and this runs corpus × k
    * times per Lloyd round); same fold order → same bits as the HOF
    * formulation, pinned in `VecFunctionsSpec`. */
  private def sqDist(v: Column, c: Column): Column =
    graft.functions.HashFunctions.sqDist(v, c)

  /** One Lloyd assignment: nearest centroid per vector.
    * `centroids`: (cluster, c: array<double>). Returns (vec_id, v, cluster,
    * dist).
    *
    * Input contract (shared by every public entry point in this file):
    *  - `vec_id` is UNIQUE. The assignment is a per-row projection, so a
    *    duplicate id yields one output row PER input row (each weighted
    *    separately in the centroid update) — there is no per-id collapse.
    *  - A NULL vector is kept with a NULL cluster and NULL dist (the
    *    kernel null-propagates and the index join is a left join) — it
    *    never reaches the centroid update (`posexplode` of NULL emits
    *    nothing) and never silently disappears from the output. Callers
    *    wanting Similarity's norm>0 discipline filter before calling.
    *  - A vector whose length differs from the centroid dimension is an
    *    ERROR (the kernel raises), not a silent drop.
    *
    * ZERO-SHUFFLE: centroids are k tiny driver rows (the discipline this
    * file already follows — every round collects them for the movement
    * check), so the argmin is a per-row compiled kernel over a LITERAL
    * flattened centroid matrix ([[graft.functions.GraftVecOps
    * .nearestSqDist]]) plus a broadcast k-row join mapping the matrix
    * index back to the cluster id — a pure projection of the corpus. The
    * previous `crossJoin(broadcast) → groupBy(vec_id) → min(struct) +
    * first(v)` spelling shuffled the whole corpus (with its vectors)
    * every Lloyd round AND sort-aggregated it (struct/array aggregation
    * buffers are UnsafeRow-immutable, so HashAggregateExec refuses and
    * both exchange sides sort corpus×k rows) — per round at 100 TB that
    * is the difference between a map-only pass and a full-corpus
    * sort-shuffle. Matrix rows are ordered by cluster id (nulls first),
    * so the kernel's first-wins rule reproduces `min(struct(dist,
    * cluster))`'s (dist asc, cluster asc) tiebreak exactly; distances are
    * bit-identical (same fold order) and the oracle CTE chain still
    * hash-matches. */
  private def assign(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val idType = centroids.schema("cluster").dataType
    // nulls-first ordering = min(struct)'s null-smallest comparison
    val rows = centroids.select(col("cluster"), col("c"))
      .orderBy(col("cluster").asc_nulls_first).collect()
      .map(r => (r.get(0), r.getSeq[Double](1))).toSeq
    assignLocal(vecs, rows, idType)
  }

  /** [[assign]] from driver-resident centroids already in tiebreak order
    * (cluster asc, nulls first): [[convergedLoop]] holds them as local
    * state, so re-collecting the k-row frame per round would be a wasted
    * Spark job — it sorts locally and calls this directly. */
  private def assignLocal(
      vecs: DataFrame,
      sorted: Seq[(Any, Seq[Double])],
      idType: org.apache.spark.sql.types.DataType): DataFrame = {
    val spark = vecs.sparkSession
    if (sorted.isEmpty)
      return vecs
        .select(col("vec_id"), col("v"),
          lit(null).cast(idType).as("cluster"), lit(0.0).as("dist"))
        .filter(lit(false))
    val cents = sorted.map(_._2)
    val dim = cents.head.length
    require(cents.forall(_.length == dim),
      s"centroid dimensions differ: ${cents.map(_.length).distinct.mkString(", ")}")
    val flat = new Array[Double](sorted.length * dim)
    var i = 0
    while (i < sorted.length) {
      val c = cents(i)
      var j = 0
      while (j < dim) { flat(i * dim + j) = c(j); j += 1 }
      i += 1
    }
    val idxToCluster = localDf(spark,
      sorted.toIndexedSeq.zipWithIndex.map { case ((id, _), ix) =>
        org.apache.spark.sql.Row(ix, id) },
      org.apache.spark.sql.types.StructType(Seq(
        field("__ci", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("cluster", idType, nullable = true))))
    vecs
      .select(col("vec_id"), col("v"),
        graft.functions.HashFunctions.nearestSqDist(col("v"), typedLit(flat), dim).as("__nd"))
      .select(col("vec_id"), col("v"),
        col("__nd").getItem(0).cast("int").as("__ci"),
        col("__nd").getItem(1).as("dist"))
      // left join: a NULL vector null-propagates to a NULL __ci, and an
      // inner join would silently drop the row — the documented contract
      // keeps it with cluster = NULL, dist = NULL
      .join(broadcast(idxToCluster), Seq("__ci"), "left")
      .select(col("vec_id"), col("v"), col("cluster"), col("dist"))
  }

  /** Driver-side sort into [[assignLocal]]'s tiebreak order (id asc,
    * nulls first) for the id types whose local ordering provably matches
    * Spark's: integral ids naturally, strings by UTF-8 bytes (Spark
    * compares `UTF8String` binary, NOT Java's UTF-16 `compareTo` — they
    * diverge on supplementary characters). Returns None for any other
    * type; callers then pay the k-row collecting [[assign]] instead of
    * risking a tiebreak divergence. */
  private def sortForAssign(
      centroids: Seq[(Any, Seq[Double])],
      idType: org.apache.spark.sql.types.DataType): Option[Seq[(Any, Seq[Double])]] = {
    import org.apache.spark.sql.types._
    val cmp: Option[(Any, Any) => Int] = idType match {
      case LongType => Some((a, b) =>
        java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long]))
      case IntegerType => Some((a, b) =>
        java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int]))
      case ShortType => Some((a, b) =>
        java.lang.Short.compare(a.asInstanceOf[Short], b.asInstanceOf[Short]))
      case StringType => Some((a, b) => {
        val x = a.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val y = b.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val n = math.min(x.length, y.length)
        var i = 0
        var r = 0
        while (r == 0 && i < n) {
          r = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
          i += 1
        }
        if (r != 0) r else java.lang.Integer.compare(x.length, y.length)
      })
      case _ => None
    }
    cmp.map { c =>
      centroids.sortWith { case ((x, _), (y, _)) =>
        if (x == null) y != null
        else if (y == null) false
        else c(x, y) < 0
      }
    }
  }

  /** Micros-mean centroid update: (cluster, c) with
    * c(d) = sum(round(v(d)*1e6)) / (n*1e6) per dimension. */
  private def update(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("cluster", "dim")
      .agg(
        sum(round(col("x") * 1e6).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .select(col("cluster"), col("dim"),
        (col("s").cast("double") / (col("n") * 1000000L)).as("cx"))
      .groupBy("cluster")
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("cx")))),
        e => e.getField("cx")).as("c"))

  /** Lloyd's k-means: `iters` rounds from the first-k-by-id seeds.
    * Returns (vec_id, cluster, dist_micros) of the final assignment.
    *
    * EAGER: like every iterative trainer here, constructing the returned
    * frame RUNS the training jobs (per-round `localCheckpoint`s plus the
    * final centroid collect) — the result is a plan over frozen centroids,
    * not a lazy recipe that retrains on each action.
    *
    * @param vectors (idCol, vecCol: array<float>) input
    * @param k       cluster count; seeds = the k smallest ids
    * @param iters   fixed iteration count (production: until movement < eps)
    */
  def kmeans(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 2): DataFrame =
    kmeansAssigned(vectors, idCol, vecCol, k, iters)
      .select(col("vec_id"), col("cluster"),
        round(col("dist") * 1e6).cast("long").as("dist_micros"))

  /** [[kmeans]] keeping the prepared double vector alongside each
    * assignment — (vec_id, v, cluster, dist): the input shape for
    * operators that consume both the cell structure and the vectors
    * (e.g. [[Dedup.semantic]]'s within-cell cosine pruning), saving
    * those callers a corpus self-join to recover `v`. */
  def kmeansAssigned(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 2): DataFrame = {
    require(k > 0 && iters > 0, "need k > 0 and iters > 0")
    val spark = vectors.sparkSession
    val idType = vectors.select(col(idCol)).schema.head.dataType
    val vecs = vectors
      .select(col(idCol).as("vec_id"), Similarity.asDouble(col(vecCol)).as("v"))
    // seed centroids: the k smallest ids AMONG NON-NULL VECTORS
    // (deterministic, engine-portable, and robust to sparse/offset id
    // spaces where `vec_id < k` would silently yield fewer than k seeds;
    // k-means++ would sharpen quality but needs sequential randomized
    // passes). The not-null filter honors the NULL-vector contract above:
    // a NULL vector can be ASSIGNED (to a NULL cluster) but never SEED —
    // a NULL centroid would crash the assignment kernel. orderBy+limit
    // compiles to TakeOrderedAndProject — per-partition top-k, no global
    // sort.
    //
    // Centroids are k tiny rows, so they live on the DRIVER between
    // rounds (the convergedLoop discipline): each round is exactly ONE
    // distributed job — collect the k updated centroids — instead of a
    // k-row checkpoint job plus a re-collect inside the next assignment.
    // NOTE the fixed-iters contract is preserved exactly: the next
    // round's centroid set is update()'s output AS IS — a cluster that
    // empties DROPS (unlike kmeansConverged, which retains it).
    var centroids: Seq[(Any, Seq[Double])] = vecs
      .filter(col("v").isNotNull)
      .orderBy(col("vec_id"))
      .limit(k)
      .collect()
      .map(r => (r.get(0), r.getSeq[Double](1))).toSeq
    def centroidDf: DataFrame = localDf(spark,
      centroids.map { case (id, c) => org.apache.spark.sql.Row(id, c) },
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cluster", idType, nullable = true),
        field("c", doubleArray))))
    def assignCurrent(): DataFrame = sortForAssign(centroids, idType) match {
      case Some(s) => assignLocal(vecs, s, idType)
      case None => assign(vecs, centroidDf)
    }
    var i = 0
    while (i < iters - 1) {
      centroids = update(assignCurrent()).collect()
        .map(r => (r.get(0), r.getSeq[Double](1))).toSeq
      i += 1
    }
    assignCurrent()
  }

  /** Deterministic farthest-first (Gonzalez) seeding — the derandomized
    * k-means++ analog: seed 1 is the smallest id; each subsequent seed is
    * the vector FARTHEST from its nearest already-chosen seed (ties break
    * to the smallest id). Spreads seeds like k-means++ does in
    * expectation, with none of the sequential sampling randomness — so
    * the driver's DuckDB gate can check it as an unrolled CTE chain.
    *
    * Scale shape: k-1 driver rounds over a RUNNING per-vector min-distance
    * state — each round scores the remaining vectors against only the
    * NEWEST seed (`least(dmin, dist_to_new_seed)`), never the whole seed
    * set, so total work is genuinely O(k·n·dim) (rescoring against all
    * chosen seeds each round would be O(k²·n·dim)). The argmax is
    * `orderBy(…).limit(1)` — TakeOrderedAndProject, a per-partition top-1
    * merged on the driver: no shuffle, no window, no all-pairs, and (being
    * ordering-based, not `max_by(-id)`) it works for STRING ids and keeps
    * NULL-id rows in play (null-safe `<=>` exclusion, NULLs ordered after
    * every real id). Seeds themselves are k tiny rows, so they live on the
    * DRIVER (the Spark-ML centroid discipline): each round is exactly one
    * k-row-collect job over the checkpointed state plus one state
    * re-checkpoint — no per-round union/seed-materialization jobs. `min`
    * over doubles is order-independent, so the running-dmin values are
    * bit-identical to a rescore-everything formulation and the DuckDB
    * oracle chain still hash-matches.
    *
    * Returns (cluster = seed vec_id, c = seed vector, dmin_micros =
    * round(1e6 × squared distance to the nearest earlier seed); 0 for the
    * first seed). If the input has fewer than k rows, all of them seed.
    */
  def farthestFirstSeeds(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val spark = vectors.sparkSession
    val idType = vectors.select(col(idCol)).schema.head.dataType
    val vecs = vectors
      .select(col(idCol).as("vec_id"), Similarity.asDouble(col(vecCol)).as("v"))
    val rows = farthestFirstSeedsDriver(vecs, k)
      .map { case (id, c, dm) => org.apache.spark.sql.Row(id, c, dm) }
    localDf(spark, rows, org.apache.spark.sql.types.StructType(Seq(
      // nullable: a NULL-id corpus row may legitimately become a seed
      org.apache.spark.sql.types.StructField("cluster", idType, nullable = true),
      field("c", doubleArray),
      field("dmin_micros", org.apache.spark.sql.types.LongType))))
  }

  private def field(name: String, t: org.apache.spark.sql.types.DataType) =
    org.apache.spark.sql.types.StructField(name, t, nullable = false)
  private def doubleArray = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.DoubleType, containsNull = false)
  private def localDf(
      spark: org.apache.spark.sql.SparkSession,
      rows: Seq[org.apache.spark.sql.Row],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)

  /** Driver-side core of [[farthestFirstSeeds]]: takes the PREPARED
    * (vec_id, v: array&lt;double&gt;) corpus so callers that already
    * checkpointed it don't pay a second source scan; returns
    * (seed id, components, dmin_micros) in selection order. */
  private def farthestFirstSeedsDriver(
      vecs: DataFrame,
      k: Int): Seq[(Any, Seq[Double], Long)] = {
    require(k > 0, "need k > 0")
    // NULL-id rows participate in seeding (as the left_anti formulation
    // did): exclusion is null-safe (<=>), and tiebreak ordering puts a
    // NULL id after every real id. At most one NULL seed can be chosen —
    // <=> removes all NULL rows once one wins — which is the only coherent
    // reading of "distinct seeds" over an id column that cannot
    // distinguish its NULLs.
    // the first seed must have a vector (a NULL seed centroid would crash
    // the assignment kernel); later rounds exclude NULL-v rows naturally
    // (their dmin is NULL, ordered after every real distance)
    val first = vecs.filter(col("v").isNotNull)
      .orderBy(col("vec_id").asc_nulls_last).limit(1).collect()
    if (first.isEmpty) return Nil
    val seeds = scala.collection.mutable.ArrayBuffer[(Any, Seq[Double], Long)](
      (first.head.get(0), first.head.getSeq[Double](1), 0L))
    // state: every not-yet-chosen vector with its min squared distance to
    // the seeds chosen so far; checkpointed per round so round r re-scores
    // only against the newest seed instead of replaying r stacked
    // projections from the scan (the top-1 collect then reads the
    // checkpointed blocks — a cheap second job, not a second corpus pass).
    var state = vecs
      .filter(!(col("vec_id") <=> lit(seeds.head._1)))
      .select(col("vec_id"), col("v"),
        sqDist(col("v"), typedLit(seeds.head._2)).as("dmin"))
      .localCheckpoint()
    var i = 1
    var exhausted = false
    while (i < k && !exhausted) {
      // Farthest first, smallest id on a distance tie. orderBy+limit(1)
      // plans as TakeOrderedAndProject (per-partition top-1, driver merge
      // of `partitions` singletons — no shuffle) and, unlike the previous
      // max_by(-id) tiebreak, never negates the id, so string doc_id
      // corpora order lexicographically instead of failing analysis.
      val rows = state
        .filter(col("dmin").isNotNull) // NULL-v rows never seed
        .orderBy(col("dmin").desc, col("vec_id").asc_nulls_last)
        .limit(1)
        .collect()
      if (rows.isEmpty) exhausted = true // input exhausted before k seeds
      else {
        val next = rows.head
        val (id, c, dmin) = (next.get(0), next.getSeq[Double](1), next.getDouble(2))
        seeds += ((id, c, math.round(dmin * 1e6)))
        if (i < k - 1) // last round: the state would go unread
          state = state
            .filter(!(col("vec_id") <=> lit(id)))
            .select(col("vec_id"), col("v"),
              least(col("dmin"), sqDist(col("v"), typedLit(c))).as("dmin"))
            .localCheckpoint()
      }
      i += 1
    }
    seeds.toSeq
  }

  /** Lloyd's k-means iterated to convergence: rounds run until the total
    * squared centroid movement drops to `eps` or `maxIters` is hit — the
    * production loop the fixed-`iters` [[kmeans]] trades away for oracle
    * expressibility. Seeds come from [[farthestFirstSeeds]] (default) or
    * the first k ids. A cluster that loses all members keeps its previous
    * centroid (Lloyd's must not silently drop below k).
    *
    * Centroids are k tiny rows, so they live on the DRIVER (the Spark-ML
    * iterative discipline): each round is exactly ONE distributed job —
    * collect the k updated centroids from the assign→update pipeline —
    * and the empty-cluster retention plus movement check are free local
    * arithmetic. No per-round join, checkpoint, or second aggregate; the
    * corpus is never collected.
    *
    * Returns (vec_id, cluster, dist_micros) of the final assignment. */
  def kmeansConverged(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      eps: Double = 1e-9,
      maxIters: Int = 20,
      farthestFirst: Boolean = true): DataFrame = {
    val (vecs, centroidDf) =
      convergedLoop(vectors, idCol, vecCol, k, eps, maxIters, farthestFirst)
    assign(vecs, centroidDf)
      .select(col("vec_id"), col("cluster"),
        round(col("dist") * 1e6).cast("long").as("dist_micros"))
  }

  /** The trained model: (prepared corpus, converged centroid table).
    * The corpus comes back as the loop's `localCheckpoint`ed
    * (vec_id, v: array&lt;double&gt;) — downstream consumers (e.g.
    * [[Similarity.ivfTopKWith]] search over the same vectors) should read
    * THIS instead of re-scanning the source, so the materialization the
    * training paid for is reused rather than duplicated. */
  def kmeansConvergedModel(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      eps: Double = 1e-9,
      maxIters: Int = 20,
      farthestFirst: Boolean = true): (DataFrame, DataFrame) =
    convergedLoop(vectors, idCol, vecCol, k, eps, maxIters, farthestFirst)

  /** Just the converged (cluster, c: array&lt;double&gt;) centroid table —
    * e.g. the coarse quantizer for [[Similarity.ivfTopKWith]] (rename
    * `cluster`→`centroid_id`, `c`→`vc`). Prefer [[kmeansConvergedModel]]
    * when the same corpus is consumed downstream. */
  def kmeansConvergedCentroids(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      eps: Double = 1e-9,
      maxIters: Int = 20,
      farthestFirst: Boolean = true): DataFrame =
    kmeansConvergedModel(vectors, idCol, vecCol, k, eps, maxIters, farthestFirst)._2

  /** Shared Lloyd-to-convergence loop: returns the checkpointed prepared
    * corpus and the final driver-built centroid table. */
  private def convergedLoop(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      eps: Double,
      maxIters: Int,
      farthestFirst: Boolean): (DataFrame, DataFrame) = {
    require(k > 0 && maxIters > 0 && eps >= 0, "need k > 0, maxIters > 0, eps >= 0")
    val spark = vectors.sparkSession
    val idType = vectors.select(col(idCol)).schema.head.dataType
    // materialize the prepared corpus ONCE: every Lloyd round re-reads it,
    // and re-scanning the source + float→double conversion per round would
    // multiply the scan cost by the iteration count (the same input-caching
    // discipline Spark ML's iterative trainers follow)
    val vecs = vectors
      .select(col(idCol).as("vec_id"), Similarity.asDouble(col(vecCol)).as("v"))
      .localCheckpoint()
    // seeds come from NON-NULL vectors only (same contract note as
    // kmeansAssigned: NULL vectors assign, they never seed)
    var centroids: Seq[(Any, Seq[Double])] =
      if (farthestFirst) farthestFirstSeedsDriver(vecs, k).map(s => (s._1, s._2))
      else vecs.filter(col("v").isNotNull).orderBy(col("vec_id")).limit(k).collect()
        .map(r => (r.get(0), r.getSeq[Double](1))).toSeq
    def centroidDf: DataFrame = localDf(spark,
      centroids.map { case (id, c) => org.apache.spark.sql.Row(id, c) },
      org.apache.spark.sql.types.StructType(Seq(
        // nullable: a NULL-id corpus row may legitimately seed a cluster
        org.apache.spark.sql.types.StructField("cluster", idType, nullable = true),
        field("c", doubleArray))))
    // The loop holds the centroids on the driver, so each round sorts them
    // locally into assign's tiebreak order instead of collecting the k-row
    // frame back — one Spark job per round (the update collect), same as
    // the pre-kernel shape. Falls back to the collecting assign for id
    // types without a driver-side Spark-ordering equivalent.
    def assignCurrent(): DataFrame = sortForAssign(centroids, idType) match {
      case Some(s) => assignLocal(vecs, s, idType)
      case None => assign(vecs, centroidDf)
    }
    var moved = Double.MaxValue
    var i = 0
    while (moved > eps && i < maxIters) {
      val updated = update(assignCurrent()).collect()
        .map(r => r.get(0) -> r.getSeq[Double](1)).toMap
      val next = centroids.map { case (id, cOld) =>
        val cNew = updated.getOrElse(id, cOld) // empty cluster keeps its centroid
        (id, cNew, cOld.lazyZip(cNew).map((a, b) => (a - b) * (a - b)).sum)
      }
      moved = next.map(_._3).sum
      centroids = next.map(t => (t._1, t._2))
      i += 1
    }
    (vecs, centroidDf)
  }
}
