package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetrievalBpeSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // ----- BM25 ------------------------------------------------------

  test("bm25TopK ranks tf, idf, and length normalization correctly") {
    val docs = Seq(
      (1L, "cat dog"),           // one 'cat', short doc
      (2L, "cat cat dog dog"),   // two 'cat', longer doc
      (3L, "cat"),               // one 'cat', shortest doc
      (4L, "dog dog dog"),       // no 'cat'
      (5L, "rare fish")          // the only 'rare' doc
    ).toDF("doc_id", "text")
    val queries = Seq((1L, "cat"), (2L, "rare"), (2L, "dog")).toDF("query_id", "term")
    val out = Retrieval.bm25TopK(docs, queries, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    val q1 = out.filter(_._1 == 1L)
    // doc 4 has no query term: absent; doc 3 (tf=1, dl=1) beats doc 1
    // (tf=1, dl=2) via length normalization; doc 2 has tf=2 but dl=4
    assert(q1.map(_._3).toSeq == Seq(3L, 2L, 1L))
    // q2: 'rare' appears in 1/5 docs → its idf dwarfs 'dog' (3/5 docs),
    // so doc 5 must outrank every dog-only doc
    val q2 = out.filter(_._1 == 2L)
    assert(q2.length == 3)
    assert(q2.head._3 == 5L)
    // scores strictly non-increasing within a query
    Seq(q1, q2).foreach { q =>
      q.sliding(2).foreach { case Array(hi, lo) => assert(hi._4 >= lo._4) }
    }
  }

  test("q97 returns 10 ranked docs per demo query, rare-term query scoring highest") {
    val out = Retrieval.q97Bm25(spark, "/root/testdata/sf0.001").collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(1L, 2L, 3L, 4L, 5L))
    byQ.values.foreach(rows => assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to 10L)))
  }

  // ----- BPE -------------------------------------------------------

  test("bpeTrain reproduces the hand-computed Sennrich merges with lexicographic ties") {
    // low:5 lower:2 newest:6 widest:3 →
    //   pair counts: es:9 st:9 we:8 lo:7 ow:7 ne:6 ew:6 wi:3 id:3 de:3 er:2
    //   merge 1: (e,s) beats (s,t) on the lexicographic tie at 9
    //   merge 2: (es,t) at 9
    //   merge 3: (l,o) beats (o,w) on the tie at 7
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("w", "freq")
    val rules = Bpe.bpeTrain(vocab, 3)
    assert(rules == Seq(("e", "s"), ("es", "t"), ("l", "o")))
  }

  test("applyMerge is left-to-right and non-overlapping") {
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(Bpe.applyMerge(Seq("x"), "a", "b") == Seq("x"))
    assert(Bpe.applyMerge(Seq.empty, "a", "b") == Seq.empty)
  }

  test("bpeTrain stops early when no pairs remain") {
    val vocab = Seq(("ab", 1L)).toDF("w", "freq")
    // one mergeable pair, then every word is a single symbol
    assert(Bpe.bpeTrain(vocab, 5) == Seq(("a", "b")))
  }

  test("driver-local and distributed merge loops learn identical rules") {
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L), ("west", 4L), ("lowest", 1L)).toDF("w", "freq")
    val local = Bpe.bpeTrain(vocab, 8) // 6 words < cap → local path
    val dist = Bpe.bpeTrain(vocab, 8, driverCap = 0L) // force distributed
    assert(local == dist)
    assert(local.nonEmpty)
  }

  test("codePointSymbols splits by code point, never cleaving surrogate pairs") {
    assert(Bpe.codePointSymbols("abc").toSeq == Seq("a", "b", "c"))
    val astral = "a😀b" // a 😀 b — 😀 is a surrogate pair
    assert(Bpe.codePointSymbols(astral).toSeq == Seq("a", "😀", "b"))
    // identical to the distributed path's regex split (Java '.' = one code point)
    assert(Bpe.codePointSymbols(astral).toSeq == astral.split("(?<=.)(?=.)").toSeq)
  }

  test("local and distributed paths learn identical rules on supplementary-plane words") {
    val vocab = Seq(("😀😀a", 5L), ("a😀", 3L))
      .toDF("w", "freq")
    val local = Bpe.bpeTrain(vocab, 4)
    val dist = Bpe.bpeTrain(vocab, 4, driverCap = 0L)
    assert(local == dist)
    assert(local.nonEmpty)
  }

  test("bpeEncodeReference agrees with bpeEncode on the Sennrich vocab and adversarial words") {
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L), ("west", 4L), ("lowest", 1L)).toDF("w", "freq")
    val rank = Bpe.bpeTrain(vocab, 10).zipWithIndex.toMap
    val words = Seq("low", "lower", "newest", "widest", "west", "lowest",
      "wewest", "eststst", "lowlowlow", "x", "", "stew")
    words.foreach { w =>
      assert(Bpe.bpeEncode(w, rank) == Bpe.bpeEncodeReference(w, rank), s"word '$w'")
    }
  }

  test("q134 gate components are all green on the provisioned corpus") {
    val out = Bpe.q134BpeGate(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out == Map("bpe_fixpoint" -> true, "bpe_reference_parity" -> true,
      "bpe_round_trip" -> true, "bpe_token_validity" -> true))
  }

  test("pairCounts weights by word frequency and skips single-symbol words") {
    val sym = Seq(
      ("ab", 3L, Seq("a", "b")),
      ("abc", 2L, Seq("a", "b", "c")),
      ("x", 9L, Seq("x"))
    ).toDF("w", "freq", "syms")
    val out = Bpe.pairCounts(sym).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out == Map(("a", "b") -> 5L, ("b", "c") -> 2L))
  }

  test("bpeEncode reproduces the training segmentation on the Sennrich vocab") {
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("w", "freq")
    val rank = Bpe.bpeTrain(vocab, 3).zipWithIndex.toMap
    // rules: (e,s) < (es,t) < (l,o)
    assert(Bpe.bpeEncode("lowest", rank) == Seq("lo", "w", "est"))
    assert(Bpe.bpeEncode("low", rank) == Seq("lo", "w"))
    assert(Bpe.bpeEncode("widest", rank) == Seq("w", "i", "d", "est"))
  }

  test("bpeEncode applies the lowest-rank merge first, not the leftmost") {
    val rank = Map(("a", "b") -> 1, ("b", "c") -> 0)
    // (b,c) trained earlier wins over the leftmost (a,b) candidate
    assert(Bpe.bpeEncode("abc", rank) == Seq("a", "bc"))
  }

  test("bpeEncode round-trips and degrades to characters with no rules") {
    val rank = Map(("e", "s") -> 0, ("es", "t") -> 1)
    Seq("newest", "x", "", "stress").foreach { w =>
      assert(Bpe.bpeEncode(w, rank).mkString == w)
      assert(Bpe.bpeEncode(w, Map.empty).map(_.length).forall(_ == 1))
    }
  }

  test("q108 token counts are bounded by words below and characters above") {
    val rows = Bpe.q108BpeEncode(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nWords, nToks, nChars) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nWords > 0 && nToks >= nWords && nToks <= nChars)
      assert(r.getDouble(4) == nChars.toDouble / nToks)
    }
  }
}
