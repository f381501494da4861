package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Portable

/** Similarity search family (SURVEY.md §2.D) over the embeddings
  * table (64-dim float vectors).
  *
  * a1 is the exact baseline: brute-force cosine top-k with the probe
  * set broadcast (scales as one scan of the corpus per batch of
  * probes). a2/a3 are the 100 TB paths: random-hyperplane LSH buckets
  * and IVF coarse cells bound the candidate set so the corpus is
  * never fully scanned per probe. Both share a1's rerank stage.
  */
object Similarity extends QueryPack {

  private val K = 3          // neighbors returned
  // 4 planes → 16 buckets: sized for the test corpus (500–5000
  // vectors). At real scale raise this (and/or use multi-probe) so
  // bucket occupancy stays ~corpus/2^planes ≈ rerank budget.
  private val Planes = 4
  private val NProbe = 2     // IVF cells searched per probe

  /** Vectors with their L2 norm precomputed once, map-side — every
    * downstream pair then costs a single codegen'd dot product. The
    * float→double widening is a native array cast (codegen), not an
    * interpreted per-element transform lambda. */
  private def vecs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", graft.functions.Vec.norm(col("emb")))

  private def cosPre(pEmb: Column, pNrm: Column, emb: Column, nrm: Column): Column =
    graft.functions.Vec.dot(pEmb, emb) / (pNrm * nrm)

  /** Deterministic pseudo-random hyperplane weights for (plane, dim):
    * md5-derived uniform in [-1, 1). The planes are CONSTANT, so they
    * are materialized driver-side once (same md5-prefix arithmetic as
    * the oracle's SQL formula) and enter the plan as array literals —
    * the per-row transform(sequence(...), md5...) form re-evaluated
    * 64 interpreted digests per row per plane. */
  private def planeWeights(p: Int): Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 64).map { i =>
      md.reset()
      val dig = md.digest(s"$p|$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = ((dig(0) & 0xff) << 8) | (dig(1) & 0xff)
      h.toDouble / 32768.0 - 1.0
    }
  }

  private def planeDot(emb: Column, p: Int): Column =
    Portable.dotD(emb, typedLit(planeWeights(p)))

  /** 8-bit sign bucket of the hyperplane projections. */
  private def lshBucket(emb: Column): Column =
    concat((0 until Planes).map(p => when(planeDot(emb, p) > 0, "1").otherwise("0")): _*)

  private def planeDotSql(emb: String, p: Int): String =
    s"""list_sum(list_transform(generate_series(1, 64),
       |    i -> $emb[i] * (('0x' || substring(md5('$p|' || (i-1)::VARCHAR), 1, 4))::BIGINT / 32768.0 - 1.0)))""".stripMargin

  private def lshBucketSql(emb: String): String =
    (0 until Planes).map(p =>
      s"(CASE WHEN ${planeDotSql(emb, p)} > 0 THEN '1' ELSE '0' END)").mkString("concat(", ", ", ")")

  private val CosSql =
    "list_dot_product(p.emb, v.emb) / (sqrt(list_dot_product(p.emb, p.emb)) * sqrt(list_dot_product(v.emb, v.emb)))"

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact top-k: broadcast the probe set against one corpus scan.
    "a1_knn_brute" -> { (s, d) =>
      val v = vecs(s, d)
      val probes = v.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("probe_id"), col("emb").as("p_emb"), col("nrm").as("p_nrm"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("cosine").desc, col("vec_id"))
      v.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
        .withColumn("cosine", cosPre(col("p_emb"), col("p_nrm"), col("emb"), col("nrm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .select(col("probe_id"), col("vec_id"), col("rank"), col("cosine"))
        .orderBy(col("probe_id"), col("rank"))
    },

    // LSH: candidates restricted to the probe's sign bucket, then
    // exact rerank. Bucket assignment is one map-side expression.
    "a2_knn_lsh" -> { (s, d) =>
      val v = vecs(s, d).withColumn("bucket", lshBucket(col("emb")))
      val probes = v.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("probe_id"), col("emb").as("p_emb"),
          col("nrm").as("p_nrm"), col("bucket").as("p_bucket"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("cosine").desc, col("vec_id"))
      v.join(broadcast(probes),
          col("bucket") === col("p_bucket") && col("vec_id") =!= col("probe_id"))
        .withColumn("cosine", cosPre(col("p_emb"), col("p_nrm"), col("emb"), col("nrm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .select(col("probe_id"), col("vec_id"), col("rank"), col("cosine"))
        .orderBy(col("probe_id"), col("rank"))
    },

    // IVF: coarse centroids (every 50th vector), each vector assigned
    // to its nearest cell; a probe searches only its nprobe=2 nearest
    // cells. Centroid set is broadcast everywhere.
    "a3_ivf_knn" -> { (s, d) =>
      val v = vecs(s, d)
      val cents = v.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("cent_id"), col("emb").as("c_emb"), col("nrm").as("c_nrm"))
      // nearest cell per vector
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(col("c_cos").desc, col("cent_id"))
      val assigned = v.join(broadcast(cents))
        .withColumn("c_cos", cosPre(col("emb"), col("nrm"), col("c_emb"), col("c_nrm")))
        .withColumn("crank", row_number().over(wAssign))
        .filter(col("crank") === 1)
        .select(col("vec_id"), col("emb"), col("nrm"), col("cent_id").as("cell"))
      // nprobe nearest cells per probe
      val probes = v.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("probe_id"), col("emb").as("p_emb"), col("nrm").as("p_nrm"))
      val wProbe = Window.partitionBy(col("probe_id"))
        .orderBy(col("pc_cos").desc, col("cent_id"))
      val probeCells = probes.join(broadcast(cents))
        .withColumn("pc_cos", cosPre(col("p_emb"), col("p_nrm"), col("c_emb"), col("c_nrm")))
        .withColumn("crank", row_number().over(wProbe))
        .filter(col("crank") <= NProbe)
        .select(col("probe_id"), col("p_emb"), col("p_nrm"), col("cent_id").as("cell"))
      // search only those cells
      val wRank = Window.partitionBy(col("probe_id"))
        .orderBy(col("cosine").desc, col("vec_id"))
      assigned.join(broadcast(probeCells),
          assigned("cell") === probeCells("cell") && col("vec_id") =!= col("probe_id"))
        .withColumn("cosine", cosPre(col("p_emb"), col("p_nrm"), col("emb"), col("nrm")))
        .withColumn("rank", row_number().over(wRank))
        .filter(col("rank") <= K)
        .select(col("probe_id"), col("vec_id"), col("rank"), col("cosine"))
        .orderBy(col("probe_id"), col("rank"))
    },

    // Multi-probe LSH: each probe searches its own sign bucket PLUS
    // every Hamming-1 neighbor bucket (flip one plane bit) — the
    // standard recall lever that avoids adding hash tables. Candidate
    // volume grows by ×(planes+1) probed buckets, corpus-side work is
    // unchanged (one bucket per vector, map-side).
    "a6_knn_multiprobe" -> { (s, d) =>
      val v = vecs(s, d).withColumn("bucket", lshBucket(col("emb")))
      val probes = v.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("probe_id"), col("emb").as("p_emb"),
          col("nrm").as("p_nrm"), col("bucket").as("p_bucket"))
      def flipped(i: Int): Column = concat(
        substring(col("p_bucket"), 1, i),
        when(substring(col("p_bucket"), i + 1, 1) === "1", "0").otherwise("1"),
        substring(col("p_bucket"), i + 2, Planes - i - 1))
      val expanded = probes.withColumn("search_bucket",
        explode(array(col("p_bucket") +: (0 until Planes).map(flipped): _*)))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("cosine").desc, col("vec_id"))
      v.join(broadcast(expanded),
          col("bucket") === col("search_bucket") && col("vec_id") =!= col("probe_id"))
        .withColumn("cosine", cosPre(col("p_emb"), col("p_nrm"), col("emb"), col("nrm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .select(col("probe_id"), col("vec_id"), col("rank"), col("cosine"))
        .orderBy(col("probe_id"), col("rank"))
    },

    // One Lloyd iteration of IVF centroid refinement: assign every
    // vector to its nearest seed centroid, recompute each cell's
    // centroid as the element-wise member mean, reassign against the
    // refined centroids, and report per-cell occupancy + mean
    // similarity. The index-build loop a vector store runs: each
    // iteration is one corpus scan + a (cell, dim) aggregation whose
    // size is cells×dims regardless of corpus size; centroids stay
    // broadcast.
    "a5_ivf_refine" -> { (s, d) =>
      val v = vecs(s, d)
      val cents = v.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("cent_id"), col("emb").as("c_emb"), col("nrm").as("c_nrm"))
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(col("c_cos").desc, col("cent_id"))
      val assigned = v.join(broadcast(cents))
        .withColumn("c_cos", cosPre(col("emb"), col("nrm"), col("c_emb"), col("c_nrm")))
        .withColumn("crank", row_number().over(wAssign))
        .filter(col("crank") === 1)
        .select(col("vec_id"), col("emb"), col("nrm"), col("cent_id").as("cell"))
      // refined centroid = element-wise mean of members
      val refined = assigned
        .select(col("cell"), posexplode(col("emb")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell").as("r_cell"),
          transform(col("pm"), e => e.getField("m")).as("r_emb"))
        .withColumn("r_nrm", graft.functions.Vec.norm(col("r_emb")))
      val wre = Window.partitionBy(col("vec_id"))
        .orderBy(col("re_cos").desc, col("r_cell"))
      v.join(broadcast(refined))
        .withColumn("re_cos", cosPre(col("emb"), col("nrm"), col("r_emb"), col("r_nrm")))
        .withColumn("rrank", row_number().over(wre))
        .filter(col("rrank") === 1)
        .groupBy(col("r_cell").as("cell"))
        .agg(count(lit(1)).as("n_members"), avg(col("re_cos")).as("mean_cos"))
        .orderBy(col("cell"))
    },

    // Hard-negative mining: for each probe, the single nearest
    // neighbor carrying a DIFFERENT label (the cross-label margin
    // example a contrastive training pipeline wants). Same broadcast
    // one-corpus-scan shape as a1.
    "a4_cross_label_nn" -> { (s, d) =>
      val v = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("emb"))
        .withColumn("nrm", graft.functions.Vec.norm(col("emb")))
      val probes = v.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("probe_id"), col("label").as("p_label"),
          col("emb").as("p_emb"), col("nrm").as("p_nrm"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("cosine").desc, col("vec_id"))
      v.join(broadcast(probes), col("label") =!= col("p_label"))
        .withColumn("cosine", cosPre(col("p_emb"), col("p_nrm"), col("emb"), col("nrm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") === 1)
        .select(col("probe_id"), col("p_label"), col("vec_id").as("nn_id"),
          col("label").as("nn_label"), col("cosine"))
        .orderBy(col("probe_id"))
    }
  )

  def oracle: Map[String, String] = Map(
    "a1_knn_brute" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |p AS (SELECT vec_id AS probe_id, emb FROM v WHERE vec_id % 100 = 0),
         |scored AS (
         |  SELECT p.probe_id, v.vec_id, $CosSql AS cosine,
         |    row_number() OVER (PARTITION BY p.probe_id
         |      ORDER BY $CosSql DESC, v.vec_id) AS rank
         |  FROM p, v WHERE v.vec_id <> p.probe_id)
         |SELECT probe_id, vec_id, CAST(rank AS INTEGER) AS rank, cosine
         |FROM scored WHERE rank <= $K
         |ORDER BY probe_id, rank""".stripMargin,

    "a2_knn_lsh" ->
      s"""WITH v AS (
         |  SELECT vec_id, emb, ${lshBucketSql("emb")} AS bucket
         |  FROM (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings) t),
         |p AS (SELECT vec_id AS probe_id, emb, bucket FROM v WHERE vec_id % 100 = 0),
         |scored AS (
         |  SELECT p.probe_id, v.vec_id, $CosSql AS cosine,
         |    row_number() OVER (PARTITION BY p.probe_id
         |      ORDER BY $CosSql DESC, v.vec_id) AS rank
         |  FROM p JOIN v ON v.bucket = p.bucket AND v.vec_id <> p.probe_id)
         |SELECT probe_id, vec_id, CAST(rank AS INTEGER) AS rank, cosine
         |FROM scored WHERE rank <= $K
         |ORDER BY probe_id, rank""".stripMargin,

    "a3_ivf_knn" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |c AS (SELECT vec_id AS cent_id, emb AS c_emb FROM v WHERE vec_id % 50 = 0),
         |assigned AS (
         |  SELECT vec_id, emb, cell FROM (
         |    SELECT v.vec_id, v.emb, c.cent_id AS cell,
         |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |        list_dot_product(v.emb, c.c_emb) /
         |          (sqrt(list_dot_product(v.emb, v.emb)) * sqrt(list_dot_product(c.c_emb, c.c_emb))) DESC,
         |        c.cent_id) AS crank
         |    FROM v, c) t WHERE crank = 1),
         |probe_cells AS (
         |  SELECT probe_id, p_emb, cell FROM (
         |    SELECT v.vec_id AS probe_id, v.emb AS p_emb, c.cent_id AS cell,
         |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |        list_dot_product(v.emb, c.c_emb) /
         |          (sqrt(list_dot_product(v.emb, v.emb)) * sqrt(list_dot_product(c.c_emb, c.c_emb))) DESC,
         |        c.cent_id) AS crank
         |    FROM v, c WHERE v.vec_id % 100 = 0) t WHERE crank <= $NProbe),
         |scored AS (
         |  SELECT p.probe_id, v.vec_id,
         |    list_dot_product(p.p_emb, v.emb) /
         |      (sqrt(list_dot_product(p.p_emb, p.p_emb)) * sqrt(list_dot_product(v.emb, v.emb))) AS cosine,
         |    row_number() OVER (PARTITION BY p.probe_id ORDER BY
         |      list_dot_product(p.p_emb, v.emb) /
         |        (sqrt(list_dot_product(p.p_emb, p.p_emb)) * sqrt(list_dot_product(v.emb, v.emb))) DESC,
         |      v.vec_id) AS rank
         |  FROM probe_cells p JOIN assigned v
         |    ON v.cell = p.cell AND v.vec_id <> p.probe_id)
         |SELECT probe_id, vec_id, CAST(rank AS INTEGER) AS rank, cosine
         |FROM scored WHERE rank <= $K
         |ORDER BY probe_id, rank""".stripMargin,

    "a6_knn_multiprobe" -> {
      val flips = (0 until Planes).map { i =>
        s"substring(bucket, 1, $i) || (CASE WHEN substring(bucket, ${i + 1}, 1) = '1' THEN '0' ELSE '1' END) || substring(bucket, ${i + 2}, ${Planes - i - 1})"
      }.mkString(", ")
      s"""WITH v AS (
         |  SELECT vec_id, emb, ${lshBucketSql("emb")} AS bucket
         |  FROM (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings) t),
         |p AS (SELECT vec_id AS probe_id, emb, bucket FROM v WHERE vec_id % 100 = 0),
         |expanded AS (
         |  SELECT probe_id, emb, unnest([bucket, $flips]) AS search_bucket
         |  FROM p),
         |scored AS (
         |  SELECT e.probe_id, v.vec_id,
         |    list_dot_product(e.emb, v.emb) /
         |      (sqrt(list_dot_product(e.emb, e.emb)) * sqrt(list_dot_product(v.emb, v.emb))) AS cosine,
         |    row_number() OVER (PARTITION BY e.probe_id ORDER BY
         |      list_dot_product(e.emb, v.emb) /
         |        (sqrt(list_dot_product(e.emb, e.emb)) * sqrt(list_dot_product(v.emb, v.emb))) DESC,
         |      v.vec_id) AS rank
         |  FROM expanded e JOIN v
         |    ON v.bucket = e.search_bucket AND v.vec_id <> e.probe_id)
         |SELECT probe_id, vec_id, CAST(rank AS INTEGER) AS rank, cosine
         |FROM scored WHERE rank <= $K
         |ORDER BY probe_id, rank""".stripMargin
    },

    "a5_ivf_refine" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |c AS (SELECT vec_id AS cent_id, emb AS c_emb FROM v WHERE vec_id % 50 = 0),
         |assigned AS (
         |  SELECT vec_id, emb, cell FROM (
         |    SELECT v.vec_id, v.emb, c.cent_id AS cell,
         |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |        list_dot_product(v.emb, c.c_emb) /
         |          (sqrt(list_dot_product(v.emb, v.emb)) * sqrt(list_dot_product(c.c_emb, c.c_emb))) DESC,
         |        c.cent_id) AS crank
         |    FROM v, c) t WHERE crank = 1),
         |refined AS (
         |  SELECT cell, list(m ORDER BY pos) AS r_emb FROM (
         |    SELECT cell, i AS pos, avg(emb[i]) AS m
         |    FROM assigned, generate_series(1, 64) AS g(i)
         |    GROUP BY cell, i) t
         |  GROUP BY cell),
         |re AS (
         |  SELECT vec_id, cell, re_cos FROM (
         |    SELECT v.vec_id, r.cell,
         |      list_dot_product(v.emb, r.r_emb) /
         |        (sqrt(list_dot_product(v.emb, v.emb)) * sqrt(list_dot_product(r.r_emb, r.r_emb))) AS re_cos,
         |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |        list_dot_product(v.emb, r.r_emb) /
         |          (sqrt(list_dot_product(v.emb, v.emb)) * sqrt(list_dot_product(r.r_emb, r.r_emb))) DESC,
         |        r.cell) AS rrank
         |    FROM v, refined r) t WHERE rrank = 1)
         |SELECT cell, count(*) AS n_members, avg(re_cos) AS mean_cos
         |FROM re
         |GROUP BY cell
         |ORDER BY cell""".stripMargin,

    "a4_cross_label_nn" ->
      s"""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
         |p AS (SELECT vec_id AS probe_id, label AS p_label, emb FROM v WHERE vec_id % 100 = 0),
         |scored AS (
         |  SELECT p.probe_id, p.p_label, v.vec_id, v.label, $CosSql AS cosine,
         |    row_number() OVER (PARTITION BY p.probe_id
         |      ORDER BY $CosSql DESC, v.vec_id) AS rank
         |  FROM p JOIN v ON v.label <> p.p_label)
         |SELECT probe_id, CAST(p_label AS INTEGER) AS p_label, vec_id AS nn_id,
         |  CAST(label AS INTEGER) AS nn_label, cosine
         |FROM scored WHERE rank = 1
         |ORDER BY probe_id""".stripMargin
  )
}
