package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}

/** LLM-data operators: MinHash-LSH recall vs exact Jaccard ground truth,
  * SimHash sanity, ANN recall vs brute-force KNN, multimodal featurize
  * vs direct computation. All on sf0.001 (deterministic data + hashes →
  * deterministic assertions).
  */
class ExtSpec extends SparkTestBase {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sfDir).cache()
  lazy val embs = Tables.embeddings(spark, sfDir).cache()

  test("minhash-LSH finds every exact bigram-Jaccard pair >= 0.2 (blocked)") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.2, Seq("lang"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minHashLshPairs(docs, "doc_id", "text", 2, 0.2,
        bands = 21, rowsPerBand = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(lsh), s"missed: ${exact -- lsh}")
    // and LSH never reports a below-threshold pair (exact verify stage)
    val verified = Dedup.minHashLshPairs(docs, "doc_id", "text", 2, 0.2)
      .select("jaccard").as[Double].collect()
    assert(verified.forall(_ >= 0.2))
  }

  test("simhash of identical text is identical; near-dup pair is close") {
    val h = docs.limit(5).select($"doc_id", Dedup.simHash($"text").as("h"))
    val twice = h.as("a").join(h.as("b"), $"a.doc_id" === $"b.doc_id")
      .select(Dedup.hamming($"a.h", $"b.h").as("d")).as[Long].collect()
    assert(twice.forall(_ === 0L))
  }

  test("LSH-ANN candidates are a subset of the corpus and mostly agree with exact KNN") {
    val q = embs.filter($"vec_id" < 3)
    val exact = Similarity.bruteForceKnn(q, embs, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.lshKnn(q, embs, dim = 64, k = 5, nBits = 4, tables = 8)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.5, s"ANN recall $recall too low")
  }

  test("brute-force KNN returns k ranked rows per query with sims in [-1,1]") {
    val got = Similarity.bruteForceKnn(embs.filter($"vec_id" < 3), embs, 5)
      .collect()
    assert(got.length === 15)
    assert(got.forall(r => math.abs(r.getAs[Double]("sim")) <= 1.0 + 1e-9))
  }

  test("multimodal featurize matches direct computation") {
    val media = Multimodal.mediaFromDocuments(docs.limit(20))
    val feats = Multimodal.featurize(spark, media)
      .orderBy($"media_id").collect()
    val texts = docs.limit(20).orderBy($"doc_id").select($"text").as[String].collect()
    feats.zip(texts).foreach { case (r, text) =>
      val bytes = text.getBytes("UTF-8")
      val (frames, head, sum) = Multimodal.fakeDecode(bytes)
      assert(r.getAs[Long]("n_bytes") === bytes.length.toLong)
      assert(r.getAs[Long]("n_frames") === frames)
      assert(r.getAs[Int]("head_byte") === head)
      assert(r.getAs[Long]("checksum") === sum)
    }
  }

  test("langId is deterministic and rolling fingerprint is stable") {
    val a = docs.select(TextAnalysis.langId($"text").as("l"),
      TextAnalysis.rollingFingerprint($"text").as("f")).collect()
    val b = docs.select(TextAnalysis.langId($"text").as("l"),
      TextAnalysis.rollingFingerprint($"text").as("f")).collect()
    assert(a.sameElements(b))
  }
}
