package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = {
    val rnd = new scala.util.Random(5)
    (0 until 200).map(i => (i.toLong, Array.fill(32)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("Vec: dot/norm/cosine basics") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 2.0f))).toDF("a", "b")
    val (d, na, c) = df.select(Vec.dot(col("a"), col("b")),
      Vec.norm(col("a")), Vec.cosine(col("a"), col("b")))
      .as[(Double, Double, Double)].head()
    assert(d == 0.0 && na == 1.0 && c == 0.0)
    val same = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(Vec.cosine(col("a"), col("b"))).as[Double].head()
    assert(math.abs(same - 1.0) < 1e-12)
  }

  test("bruteTopK (bounded-heap aggregator) == bruteTopKWindow (window rank)") {
    val probes = emb.filter(col("vec_id") < 5)
    val viaWin = Similarity.bruteTopKWindow(emb, probes, "vec_id", "embedding", 7)
      .select("probe_id", "rank", "nbr_id").as[(Long, Int, Long)].collect().toSet
    val viaAgg = Similarity.bruteTopK(emb, probes, "vec_id", "embedding", 7)
      .select("probe_id", "rank", "nbr_id").as[(Long, Int, Long)].collect().toSet
    assert(viaWin.size == 35)
    assert(viaAgg == viaWin)
  }

  test("annTopK: recall@10 over brute force is reasonable and self-matches are excluded") {
    val probes = emb.filter(col("vec_id") < 10)
    val truth = Similarity.bruteTopKWindow(emb, probes, "vec_id", "embedding", 10)
      .select("probe_id", "nbr_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.annTopK(emb, probes, "vec_id", "embedding", 10, dim = 32,
        tables = 16, bitsPerTable = 4)
      .select("probe_id", "nbr_id").as[(Long, Long)].collect().toSet
    assert(ann.forall { case (p, n) => p != n })
    val recall = (ann intersect truth).size.toDouble / truth.size
    assert(recall > 0.5, s"ANN recall@10 too low: $recall")
  }

  test("ivfTopK: recall@10 over brute force with nprobe=4 of nlist=8") {
    val probes = emb.filter(col("vec_id") < 10)
    val truth = Similarity.bruteTopKWindow(emb, probes, "vec_id", "embedding", 10)
      .select("probe_id", "nbr_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, probes, "vec_id", "embedding", 10,
        nlist = 8, nprobe = 4)
      .select("probe_id", "nbr_id").as[(Long, Long)].collect().toSet
    assert(ivf.forall { case (p, n) => p != n })
    val recall = (ivf intersect truth).size.toDouble / truth.size
    assert(recall > 0.5, s"IVF recall@10 too low: $recall")
    // determinism: second run identical
    val ivf2 = Similarity.ivfTopK(emb, probes, "vec_id", "embedding", 10,
        nlist = 8, nprobe = 4)
      .select("probe_id", "nbr_id").as[(Long, Long)].collect().toSet
    assert(ivf2 == ivf)
  }

  test("hyperplaneBands: deterministic across invocations") {
    val b1 = Similarity.hyperplaneBands(emb, "vec_id", "embedding", 32)
      .as[(Long, Int, Long)].collect().toSet
    val b2 = Similarity.hyperplaneBands(emb, "vec_id", "embedding", 32)
      .as[(Long, Int, Long)].collect().toSet
    assert(b1 == b2)
  }

  test("ivfTopK with Lloyd refinement: deterministic, recall at least as usable") {
    val probes = emb.filter(col("vec_id") < 10)
    val truth = Similarity.bruteTopKWindow(emb, probes, "vec_id", "embedding", 10)
      .select("probe_id", "nbr_id").as[(Long, Long)].collect().toSet
    val r1 = Similarity.ivfTopK(emb, probes, "vec_id", "embedding", 10,
        nlist = 8, nprobe = 4, refineIters = 2)
      .select("probe_id", "nbr_id").as[(Long, Long)].collect().toSet
    val r2 = Similarity.ivfTopK(emb, probes, "vec_id", "embedding", 10,
        nlist = 8, nprobe = 4, refineIters = 2)
      .select("probe_id", "nbr_id").as[(Long, Long)].collect().toSet
    assert(r1 == r2, "refined centroids are deterministic")
    val recall = (r1 intersect truth).size.toDouble / truth.size
    assert(recall > 0.5, s"refined IVF recall@10 too low: $recall")
  }

  test("refineCentroids: means move toward cluster structure, empty cells keep old") {
    import org.apache.spark.sql.functions.lit
    // two tight clusters around (1,0) and (0,1)
    val pts = (0 until 20).map(i =>
      if (i % 2 == 0) (i.toLong, Seq(1.0 + 0.01 * i, 0.0))
      else (i.toLong, Seq(0.0, 1.0 + 0.01 * i))).toDF("id", "v")
    val init = Array(0 -> Array(0.9, 0.1), 1 -> Array(0.1, 0.9),
      2 -> Array(-5.0, -5.0)) // cell 2 captures nothing
    val out = Similarity.refineCentroids(pts, "v", init, iters = 2)
    assert(out.length == 3)
    assert(out(0)._2(0) > 0.9 && out(0)._2(1) < 0.1, "centroid 0 near cluster A")
    assert(out(1)._2(1) > 0.9 && out(1)._2(0) < 0.1, "centroid 1 near cluster B")
    assert(out(2)._2.toSeq == Seq(-5.0, -5.0), "memberless cell unchanged")
  }
}
