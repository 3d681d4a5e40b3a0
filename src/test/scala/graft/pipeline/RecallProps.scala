package graft.pipeline

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

/** Statistical recall laws for the hash-family operators that have no
  * DuckDB twin (dedup_minhash / dedup_simhash / sim_ann / sim_ivf are
  * rows-only in CORRECTNESS): ScalaCheck-generated corpora with
  * planted near-duplicates / near-neighbors, recall measured against
  * the ORACLED brute-force implementations (exact Jaccard all-pairs,
  * bruteTopKWindow), asserted ≥ 0.9 at documented parameters.
  *
  * Parameter math backing the 0.9 bounds:
  *   - MinHash banding, 128 hashes / 32 bands (r = 4): candidate
  *     probability at Jaccard j is 1−(1−j⁴)³². Planted mutants here
  *     have ≥ 36 words with ≤ 2 substitutions ⇒ ≥ (34−6)/(34+6) = 0.70
  *     shingle Jaccard ⇒ P(candidate) ≥ 1−(1−0.24)³² ≈ 0.9998.
  *   - Hyperplane LSH, 16 tables × 4 bits: a planted neighbor at
  *     cosine ≈ 0.995 disagrees with a probe on one random hyperplane
  *     with p = arccos(0.995)/π ≈ 0.032, so P(some table collides)
  *     = 1−(1−(1−p)⁴)¹⁶ ≈ 1−0.12¹⁶ ≈ 1.
  * A fixed ScalaCheck seed keeps the suite deterministic; the margin
  * above the asserted 0.9 absorbs seed changes.
  */
object RecallProps extends Properties("RecallLaws") {

  private lazy val spark = graft.SparkSpec.session

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(5)
      .withInitialSeed(org.scalacheck.rng.Seed(987654321L))

  // ---- text corpora: base docs + mutated near-dup copies ------------

  private val word: Gen[String] = Gen.choose(0, 59).map(i => s"w$i")

  private val docGen: Gen[List[String]] =
    Gen.chooseNum(36, 44).flatMap(n => Gen.listOfN(n, word))

  /** A corpus of base docs where ~half get a near-dup copy with ≤ 2
    * word substitutions; returns (docs, plantedPairs). */
  private val textCorpusGen: Gen[(Seq[(Long, String)], Set[(Long, Long)])] =
    for {
      n <- Gen.chooseNum(10, 14)
      docs <- Gen.listOfN(n, docGen)
      muts <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 2), Gen.choose(0, 1000), word))
    } yield {
      val base = docs.zipWithIndex.map { case (ws, i) =>
        (i.toLong, ws.mkString(" "))
      }
      val copies = docs.zipWithIndex.zip(muts).collect {
        case ((ws, i), (k, posSeed, w)) if i % 2 == 0 =>
          val mutated = (0 until k).foldLeft(ws.toVector) { (v, j) =>
            v.updated((posSeed + j * 7) % v.length, w)
          }
          (1000L + i, mutated.mkString(" "))
      }
      val planted = copies.map { case (cid, _) => (cid - 1000L, cid) }.toSet
      (base ++ copies, planted)
    }

  property("minHashNearDupPairs: recall ≥ 0.9 vs exact-Jaccard truth (128 hashes, 32 bands, j ≥ 0.5)") =
    forAll(textCorpusGen) { case (docs, _) =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
      val pairs = Dedup.minHashNearDupPairs(df, "doc_id", "text",
          shingleN = 3, numHashes = 128, bands = 32, threshold = 0.5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val sh = df.select(col("doc_id"), Dedup.wordShingles(col("text"), 3).as("sh"))
      val truth = sh.toDF("id_a", "sa").crossJoin(sh.toDF("id_b", "sb"))
        .filter(col("id_a") < col("id_b"))
        .filter(Dedup.jaccard(col("sa"), col("sb")) >= 0.5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val precise = pairs.subsetOf(truth) // exact verify ⇒ no false positives
      val recall =
        if (truth.isEmpty) 1.0
        else (pairs intersect truth).size.toDouble / truth.size
      precise && truth.nonEmpty && recall >= 0.9
    }

  property("simHashNearDupPairs: planted ≤2-substitution pairs found at hamming ≤ 16") =
    forAll(textCorpusGen) { case (docs, planted) =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
      val pairs = Dedup.simHashNearDupPairs(df, "doc_id", "text", maxHamming = 16)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val found = planted.count(pairs.contains)
      planted.isEmpty || found.toDouble / planted.size >= 0.9
    }

  // ---- vector corpora: Gaussian base + perturbed probe copies -------

  private val Dim = 16

  /** (base vectors, probes ≈ perturbed copies, probeId → plantedBaseId). */
  private val vecCorpusGen: Gen[(Seq[(Long, Array[Float])],
      Seq[(Long, Array[Float])], Map[Long, Long])] =
    for {
      n <- Gen.chooseNum(40, 60)
      seed <- Gen.choose(0L, Long.MaxValue / 2)
    } yield {
      val rnd = new scala.util.Random(seed)
      val base = (0 until n).map(i =>
        (i.toLong, Array.fill(Dim)(rnd.nextGaussian().toFloat)))
      val probes = (0 until 12).map { j =>
        val src = base(j * (n / 12))
        (1000L + src._1,
          src._2.map(x => x + 0.1f * rnd.nextGaussian().toFloat))
      }
      val planted = probes.map { case (pid, _) => pid -> (pid - 1000L) }.toMap
      (base, probes, planted)
    }

  property("annTopK: planted near-neighbor (cos ≈ 0.995) ranked first for ≥ 0.9 of probes (16 tables × 4 bits)") =
    forAll(vecCorpusGen) { case (base, probes, planted) =>
      import spark.implicits._
      val corpus = base.toDF("vec_id", "embedding")
      val pr = probes.toDF("vec_id", "embedding")
      val ann = Similarity.annTopK(corpus, pr, "vec_id", "embedding",
          k = 10, dim = Dim, tables = 16, bitsPerTable = 4)
        .filter(col("rank") === 1)
        .select("probe_id", "nbr_id").as[(Long, Long)].collect().toMap
      // cross-check the law against the oracled brute force: the
      // planted copy IS the true nearest neighbor
      val truth = Similarity.bruteTopKWindow(corpus, pr, "vec_id", "embedding", 1)
        .select("probe_id", "nbr_id").as[(Long, Long)].collect().toMap
      val truthOk = planted.forall { case (p, b) => truth.get(p).contains(b) }
      val hit = planted.count { case (p, b) => ann.get(p).contains(b) }
      truthOk && hit.toDouble / planted.size >= 0.9
    }

  property("ivfTopK: planted near-neighbor recovered for ≥ 0.9 of probes (nprobe 4 of nlist 8)") =
    forAll(vecCorpusGen) { case (base, probes, planted) =>
      import spark.implicits._
      val corpus = base.toDF("vec_id", "embedding")
      val pr = probes.toDF("vec_id", "embedding")
      val ivf = Similarity.ivfTopK(corpus, pr, "vec_id", "embedding",
          k = 10, nlist = 8, nprobe = 4)
        .select("probe_id", "nbr_id").as[(Long, Long)].collect()
        .groupMap(_._1)(_._2)
      val hit = planted.count { case (p, b) => ivf.getOrElse(p, Array.empty[Long]).contains(b) }
      hit.toDouble / planted.size >= 0.9
    }
}
