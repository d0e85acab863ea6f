package graft

import graft.text.AhoCorasick

class AhoCorasickSpec extends SparkSpec {
  import spark.implicits._

  test("classic he/she/his/hers: suffix outputs fire through fail links") {
    val ac = new AhoCorasick(Seq("he", "she", "his", "hers"))
    // "ushers" contains she (2), he (3), hers (3..6)
    assert(ac.countMatches("ushers").toSeq == Seq(1L, 1L, 0L, 1L))
    assert(ac.countMatches("his hershey").toSeq == Seq(2L, 1L, 1L, 1L))
    assert(ac.countMatches("").toSeq == Seq(0L, 0L, 0L, 0L))
    assert(ac.countMatches("xyz").toSeq == Seq(0L, 0L, 0L, 0L))
  }

  test("overlapping occurrences all count (self-bordered patterns)") {
    val ac = new AhoCorasick(Seq("aba", "aa"))
    // "ababa": aba at 0 and 2; "aaaa": aa at 0,1,2
    assert(ac.countMatches("ababa")(0) == 2L)
    assert(ac.countMatches("aaaa")(1) == 3L)
    val ph = new AhoCorasick(Seq("batch batch"))
    assert(ph.countMatches("batch batch batch")(0) == 2L)
  }

  test("counts match brute-force position scan on random-ish text") {
    val patterns = Seq("ab", "bc", "abc", "cab", "a")
    val ac = new AhoCorasick(patterns)
    val texts = Seq("abcabcab", "cabbage", "aaabbbccc", "abc abc cab", "b")
    texts.foreach { t =>
      val brute = patterns.map(p =>
        (0 to t.length - p.length).count(i => t.startsWith(p, i)).toLong)
      assert(ac.countMatches(t).toSeq == brute, s"text: $t")
    }
  }

  test("scan: broadcast automaton over a DataFrame, zero-match rows dropped") {
    val docs = Seq(
      (1L, "the batch batch batch job"),
      (2L, "nothing here"),
      (3L, "slow join order")).toDF("doc_id", "text")
    val out = AhoCorasick.scan(docs, "doc_id", "text",
        Seq("batch batch", "slow", "join order"))
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set(
      (1L, "batch batch", 2L),
      (3L, "slow", 1L),
      (3L, "join order", 1L)))
  }

  test("duplicate patterns report independently; nulls filtered") {
    val docs = Seq((1L, "aa aa"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = AhoCorasick.scan(docs, "doc_id", "text", Seq("aa", "aa"))
      .as[(Long, String, Long)].collect().toSeq
    // both copies of "aa" match 3 times (overlap at "aa aa"? no — 'aa'
    // at 0 and 3; the space breaks the middle overlap)
    assert(out == Seq((1L, "aa", 2L), (1L, "aa", 2L)))
  }
}
