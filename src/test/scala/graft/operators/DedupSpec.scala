package graft.operators

import graft.SparkTestBase
import graft.functions.{LangId, TextOps}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog near the river shore today"), // near dup of 0
    (3L, "completely different content about spark rollup engines and window aggregation"),
    (4L, "spark rollup engines and window aggregation form completely different content"), // shares words, different shingles
    (5L, "short text")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min doc_id per content hash") {
    val out = Dedup.exact(docs).collect()
    assert(out.length == 5) // 0 and 1 collapse
    val dup = out.find(_.getAs[Long]("dup_count") == 2L).get
    assert(dup.getAs[Long]("keeper_doc_id") == 0L)
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashLsh(docs, k = 16, bands = 4, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((0L, 1L)), "exact dup must be found")
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)), "near dup must be found")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L || p._2 == 4L && p._1 != 3L || p._1 == 5L || p._2 == 5L),
      s"unrelated docs must not pair: $pairs")
  }

  test("simhash: identical docs have distance 0; near-dups within 3; unrelated far") {
    val sigs = Dedup.simhash(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sigs(0L) == sigs(1L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0L), sigs(2L)) <= 6, s"near dup hamming ${ham(sigs(0L), sigs(2L))}")
    assert(ham(sigs(0L), sigs(3L)) > 10, s"unrelated hamming ${ham(sigs(0L), sigs(3L))}")
  }

  test("winnowing fingerprints: shared k-gram runs => shared fingerprints") {
    val fp = TextAnalysis.fingerprints(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1).toSet).toMap
    assert(fp(0L) == fp(1L))
    assert((fp(0L) intersect fp(2L)).size > fp(0L).size / 2)
    assert((fp(0L) intersect fp(3L)).isEmpty)
    // determinism: pure function of text
    val fp2 = TextAnalysis.fingerprints(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1).toSet).toMap
    assert(fp == fp2)
  }

  test("language id separates real multilingual samples") {
    assert(LangId.detect("The quick brown fox jumps over the lazy dog and runs to the forest") == "en")
    assert(LangId.detect("Le renard brun rapide saute par-dessus le chien paresseux près de la rivière") == "fr")
    assert(LangId.detect("El rápido zorro marrón salta sobre el perro perezoso en la ciudad") == "es")
    assert(LangId.detect("Der schnelle braune Fuchs springt über den faulen Hund und läuft schnell") == "de")
    assert(LangId.detect("敏捷的棕色狐狸跳过了懒狗") == "zh")
    assert(LangId.detect("") == "und")
  }
}
