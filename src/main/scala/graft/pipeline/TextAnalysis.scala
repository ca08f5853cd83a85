package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-quality operators for training-data pipelines: language ID, quality
  * scoring, token counting, fingerprinting. All pure codegen'd Column
  * expressions (no UDFs) — whole-stage-codegen friendly and exactly
  * reproducible in the DuckDB oracle.
  */
object TextAnalysis {

  /** Tiny per-language stopword inventories (n-gram-heuristic stand-in). */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "fast", "small", "key"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "klein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "petit"),
    "es" -> Seq("el", "la", "los", "y", "de", "rapido"),
    "zh" -> Seq("de", "shi", "bu", "le", "ren"))

  private def words(textCol: Column): Column = split(textCol, " ")

  /** Distinct-stopword hit count per language. */
  def langScore(textCol: Column, lang: String): Column = {
    val list = stopwords.toMap.apply(lang)
    size(array_intersect(array_distinct(words(textCol)), array(list.map(lit): _*)))
  }

  /** Language-ID: argmax of stopword hits, fixed priority order on ties
    * (the order of [[stopwords]]); `und` (undetermined) when nothing hits.
    */
  def langId(textCol: Column): Column = {
    val scores = stopwords.map { case (l, _) => l -> langScore(textCol, l) }
    val best = scores.map(_._2).reduce(greatest(_, _))
    val pick = scores.reverse.foldLeft(lit("und")) { case (acc, (l, s)) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
    pick
  }

  /** Heuristic quality score from length / punctuation / stopword ratios —
    * integer counts, division in double at the end (deterministic).
    */
  def qualityColumns(textCol: Column): Seq[(String, Column)] = {
    val nChars = length(textCol)
    val nWords = size(words(textCol))
    val nPunct = length(textCol) - length(regexp_replace(textCol, "[.!?,;:]", ""))
    val nStop = langScore(textCol, "en")
    val meanWordLen = (nChars - (nWords - 1)).cast("double") / nWords.cast("double")
    val stopRatio = nStop.cast("double") / nWords.cast("double")
    val punctRatio = nPunct.cast("double") / nChars.cast("double")
    Seq(
      "n_chars2" -> nChars,
      "n_words" -> nWords,
      "n_punct" -> nPunct,
      "mean_word_len" -> meanWordLen,
      "stop_ratio" -> stopRatio,
      "punct_ratio" -> punctRatio,
      "quality" -> (stopRatio * 2.0 + punctRatio * 1.0 +
        when(meanWordLen >= 3.0 && meanWordLen <= 8.0, 0.5).otherwise(0.0)))
  }

  /** Whitespace token count. */
  def tokenCountWs(textCol: Column): Column = size(split(textCol, " "))

  /** BPE-ish token count: alpha runs, digit runs, and single symbols —
    * a regex proxy for subword tokenizer cost estimation.
    */
  def tokenCountBpe(textCol: Column): Column =
    size(regexp_extract_all(textCol, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Exact content fingerprint (md5 of the raw text). */
  def fingerprint(textCol: Column): Column = md5(textCol)

  /** Order-insensitive content fingerprint: md5 over the sorted distinct
    * word set — a cheap canonical-document key for exact-dedup at scale.
    */
  def canonicalFingerprint(textCol: Column): Column =
    md5(array_join(array_sort(array_distinct(words(textCol))), " "))

  /** Context-window chunking: split each document into word chunks of
    * `chunkSize` with `overlap` words shared between neighbors — the
    * standard pretraining prep for bounded-context training. Chunk starts
    * are `1 + i·(chunkSize − overlap)` for `i in [0, n)` with
    * `n = max(ceil((len − overlap) / (chunkSize − overlap)), 1)`, which
    * tiles the document completely (the final chunk clamps at the end).
    * Pure scan shape: one `explode` over computed offsets, no shuffle, no
    * state — identical output at any partitioning or on a stream.
    *
    * Output: input columns + (`chunk_id`, `chunk_text`, `chunk_tokens`).
    */
  def chunkDocuments(df: DataFrame, textCol: Column,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > overlap && overlap >= 0,
      s"need chunkSize > overlap >= 0, got ($chunkSize, $overlap)")
    val step = chunkSize - overlap
    val w = words(textCol)
    val n = greatest(ceil((size(w) - overlap).cast("double") / step).cast("int"), lit(1))
    val withId = df.withColumn("chunk_id", explode(sequence(lit(0), n - 1)))
    val start = col("chunk_id") * step + 1
    withId
      .withColumn("chunk_text", array_join(slice(words(textCol), start, lit(chunkSize)), " "))
      .withColumn("chunk_tokens", least(lit(chunkSize), size(words(textCol)) - col("chunk_id") * step))
  }

  /** Gopher-style repetition signals: the fraction of duplicated words /
    * bigrams / trigrams in a document (1 − distinct/total). Heavily
    * repetitive documents (boilerplate, keyword stuffing, decoding loops)
    * show high duplicate-n-gram fractions and get filtered before training.
    * Pure codegen'd array expressions — scan-shaped at any scale, no
    * shuffle, stream-safe. N-grams join on `` so multi-word tokens
    * can't alias.
    */
  def repetitionSignals(textCol: Column): Seq[(String, Column)] = {
    val w = words(textCol)
    val n = size(w)
    def ngrams(k: Int): Column =
      transform(sequence(lit(1), n - (k - 1)),
        i => array_join(slice(w, i, lit(k)), ""))
    // guards keep sequence() endpoints ordered (Spark generates a DESCENDING
    // sequence when start > stop — a silent wrong answer, not an error)
    def dupFrac(k: Int): Column =
      if (k == 1) lit(1.0) - size(array_distinct(w)).cast("double") / n.cast("double")
      else when(n >= k,
        lit(1.0) - size(array_distinct(ngrams(k))).cast("double")
          / (n - (k - 1)).cast("double"))
        .otherwise(0.0)
    Seq(
      "dup_word_frac" -> dupFrac(1),
      "dup_bigram_frac" -> dupFrac(2),
      "dup_trigram_frac" -> dupFrac(3))
  }

  /** Repetition filter flag over [[repetitionSignals]] at the given maxima —
    * true means "too repetitive, drop before training".
    */
  def repetitiveFlag(textCol: Column, maxWordDup: Double = 0.55,
      maxBigramDup: Double = 0.06, maxTrigramDup: Double = 0.02): Column = {
    val s = repetitionSignals(textCol).toMap
    s("dup_word_frac") > maxWordDup || s("dup_bigram_frac") > maxBigramDup ||
      s("dup_trigram_frac") > maxTrigramDup
  }

  /** Gopher-style heuristic document filters (Rae et al. 2021, "Scaling
    * Language Models: … Gopher", table A1 — the standard pretraining
    * quality gate battery): word-count bounds, mean word length, fraction
    * of alphabetic words, distinct-stopword hits, and top-word dominance
    * (the highest single-word frequency share — keyword stuffing and
    * decoding loops light this up before the n-gram repetition signals do).
    * All pure codegen'd array/regex Columns — scan-shaped, stream-safe,
    * exactly reproducible in a SQL oracle (integer counts, one double
    * division each).
    *
    * `top_word_frac` scans each doc's distinct words against its word list
    * (O(vocab·len) per doc) — fine to ~10⁴-word documents, which the
    * word-count ceiling enforces BEFORE this signal is consumed; a corpus
    * of book-length docs should compute it relationally ([[TextDedup
    * .wordRel]] → groupBy max count) instead.
    */
  def gopherSignals(textCol: Column): Seq[(String, Column)] = {
    val w = words(textCol)
    val n = size(w)
    val meanWordLen = (length(textCol) - (n - 1)).cast("double") / n.cast("double")
    val alphaFrac = size(filter(w, x => x.rlike("^[A-Za-z]+$"))).cast("double") /
      n.cast("double")
    val topCount = array_max(transform(array_distinct(w),
      x => size(filter(w, y => y === x))))
    Seq(
      "n_words" -> n,
      "mean_word_len" -> meanWordLen,
      "alpha_word_frac" -> alphaFrac,
      "stop_hits" -> langScore(textCol, "en"),
      "top_word_frac" -> topCount.cast("double") / n.cast("double"))
  }

  /** Drop flag over [[gopherSignals]] at Gopher-shaped bounds — true means
    * "fails the heuristic battery, drop before training". Bounds are
    * parameters because every corpus re-tunes them.
    */
  def gopherDropFlag(textCol: Column, minWords: Int = 10, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      minAlphaFrac: Double = 0.8, minStopHits: Int = 2,
      maxTopWordFrac: Double = 0.2): Column = {
    val s = gopherSignals(textCol).toMap
    s("n_words") < minWords || s("n_words") > maxWords ||
      s("mean_word_len") < minMeanWordLen || s("mean_word_len") > maxMeanWordLen ||
      s("alpha_word_frac") < minAlphaFrac || s("stop_hits") < minStopHits ||
      s("top_word_frac") > maxTopWordFrac
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003, the MOSS
    * algorithm): hash every `k`-word gram, slide a window of `w`
    * consecutive gram hashes, keep each window's minimum — guaranteeing any
    * shared run of ≥ `w + k − 1` words between two documents shares ≥ 1
    * selected fingerprint, at a fraction of the full gram set. This is the
    * partial-overlap detector the whole-doc md5 fingerprints can't be.
    * Returns the sorted distinct selected hashes as an `array<bigint>`
    * (empty when the doc has fewer than `k` words; one whole-doc window
    * when it has fewer than `w` grams).
    *
    * Pure codegen'd Column — scan-shaped at any scale, stream-safe, and
    * exactly reproducible cross-engine: gram hash = first 8 hex chars of
    * md5 (the same portable trick as the bucketed-packing oracle; never
    * xxhash64, which the SQL oracle cannot mirror). Grams join on chr(1)
    * (the house n-gram separator) so multi-word tokens can't alias.
    */
  def winnowingFingerprints(textCol: Column, k: Int = 3, w: Int = 4): Column = {
    require(k >= 1 && w >= 1, "need k >= 1 and w >= 1")
    val wds = words(textCol)
    val n = size(wds)
    val grams = transform(
      sequence(lit(1), n - (k - 1)),
      i => conv(substring(md5(array_join(slice(wds, i, lit(k)), "")), 1, 8),
        16, 10).cast("long"))
    val m = n - (k - 1) // gram count when n >= k
    val starts = sequence(lit(1), greatest(m - (w - 1), lit(1)))
    val sel = array_sort(array_distinct(
      transform(starts, i => array_min(slice(grams, i, lit(w))))))
    // sequence() generates DESCENDING when start > stop (silent wrong
    // answer, same trap as repetitionSignals) — guard short docs explicitly
    when(n >= k, sel).otherwise(array().cast("array<bigint>"))
  }

  /** [[winnowingFingerprints]] as a STAGED corpus pass: the split and the
    * gram-hash array each materialize behind a projection boundary, so
    * per document the text tokenizes once and the gram md5s compute once —
    * the inlined Column form re-evaluates the whole gram array inside
    * every window's `slice` (O(windows × grams) md5 calls per doc; the
    * same lambda-inlining trap as [[ngramCounts]], one stage deeper).
    * Output: one `(idCol, fp)` row per selected fingerprint — exactly the
    * relation [[graft.pipeline.TextDedup.winnowPairs]] consumes. Value-
    * identical to exploding the Column form (spec-pinned).
    */
  def winnowingFingerprintRel(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "need k >= 1 and w >= 1")
    val wds = col("__w")
    val n = size(wds)
    val gramsStage = df
      .select(col(idCol), split(col(textCol), " ").as("__w"))
      .select(col(idCol),
        when(n >= k, transform(sequence(lit(1), n - (k - 1)),
          i => conv(substring(md5(array_join(slice(wds, i, lit(k)), "")), 1, 8),
            16, 10).cast("long")))
        .otherwise(array().cast("array<bigint>")).as("__g"))
    val g = col("__g")
    val m = size(g)
    gramsStage.select(col(idCol),
      explode(when(m >= 1,
        array_sort(array_distinct(transform(
          sequence(lit(1), greatest(m - (w - 1), lit(1))),
          i => array_min(slice(g, i, lit(w)))))))
      .otherwise(array().cast("array<bigint>"))).as("fp"))
  }

  /** Corpus composition report: document / token / character / stopword-hit
    * / punctuation totals per `(stratum1, stratum2)` cell with ROLLUP
    * subtotals and a grand total — the mixture-accounting report a training
    * pipeline publishes before choosing sampling weights. All evidence
    * columns are INTEGER sums (no float averaging), so the report is
    * bit-identical across engines and summation orders; consumers derive
    * means/ratios from the totals.
    *
    * Shape at 100 TB: one partial-aggregatable ROLLUP over the scan —
    * map-side combine reduces each partition to (|s1|·|s2| + |s1| + 1)
    * rows before the single exchange.
    */
  def corpusReport(df: DataFrame, stratum1: String, stratum2: String,
      textCol: String): DataFrame = {
    val aggs = corpusAggs(col(textCol))
    df.rollup(col(stratum1), col(stratum2)).agg(aggs.head, aggs.tail: _*)
  }

  /** The integer-sum aggregate battery behind [[corpusReport]] — shared
    * with the streaming leaf-grain variant
    * (`graft.streaming.Streaming.corpusReportStream`) so the two cannot
    * drift.
    */
  def corpusAggs(t: Column): Seq[Column] = Seq(
    count(lit(1)).as("n_docs"),
    sum(tokenCountWs(t).cast("long")).as("n_tokens"),
    sum(length(t).cast("long")).as("n_chars"),
    sum(langScore(t, "en").cast("long")).as("n_stop_hits"),
    sum((length(t) - length(regexp_replace(t, "[.!?,;:]", ""))).cast("long"))
      .as("n_punct"))

  /** PII scrub: redact e-mail addresses and phone-shaped digit runs with
    * typed placeholders. Pure codegen'd `regexp_replace` (replaces ALL
    * matches), scan-shaped at any scale; the patterns deliberately stay in
    * the regex subset whose semantics agree across engines so the oracle
    * can replicate them verbatim.
    */
  val EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PHONE_RE = "[0-9]{3}-[0-9]{3,4}-[0-9]{4}"
  def scrubPii(textCol: Column): Column =
    regexp_replace(regexp_replace(textCol, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>")

  /** BPE-prep adjacent-pair counts: the first merge step of byte-pair /
    * word-piece tokenizer TRAINING — count every adjacent token pair in
    * the corpus, ranked by frequency. Pure scan + Generate (a `transform`
    * over index `sequence`, exploded) into one pair-grain aggregation; at
    * 100 TB the shuffle carries pair counts (vocab²-bounded in theory,
    * Zipf-tiny in practice), never the corpus. Deterministic top-k: ties
    * break on the pair string.
    */
  def bpePairCounts(df: DataFrame, textCol: String = "text",
      k: Int = 20): DataFrame = {
    // split once behind a projection boundary (see ngramCounts)
    val w = col("__w")
    df.select(split(col(textCol), " ").as("__w"))
      .select(explode(when(size(w) >= 2,
        transform(sequence(lit(0), size(w) - 2),
          i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(k)
  }

  /** Order-`n` n-gram counts — the raw count table of language-model /
    * tokenizer corpus prep ([[bpePairCounts]] is the adjacent-pair special
    * case, kept separate because its gate pins the BPE merge-step shape).
    * One scan + Generate into a single gram-grain aggregation with map-side
    * partials: at 100 TB the shuffle carries (gram, partial count) rows —
    * vocabulary-grain, not corpus-grain. Deterministic top-k (count desc,
    * gram asc).
    */
  def ngramCounts(df: DataFrame, n: Int, textCol: String = "text",
      k: Int = 100): DataFrame = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    // split ONCE per row behind a real projection boundary: inlining the
    // split into the transform lambda re-tokenizes the document for every
    // element_at (CollapseProject keeps multi-referenced non-cheap
    // expressions un-inlined, so this boundary survives the optimizer) —
    // measured 5.6× on this operator at sf0.1 (3.9 s → 0.7 s warm)
    val w = col("__w")
    df.select(split(col(textCol), " ").as("__w"))
      .select(explode(when(size(w) >= n,
        transform(sequence(lit(0), size(w) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram").asc)
      .limit(k)
  }

  /** Kneser–Ney continuation counts: for each (n−1)-gram, the number of
    * DISTINCT single-token LEFT extensions observed in the corpus —
    * N₁₊(·w) in the KN smoothing literature, the quantity that replaces
    * raw frequency for lower-order distributions ("Francisco" is frequent
    * but only ever follows "San"). Plan: scan + Generate to the
    * (left, suffix) pair grain, `distinct` (map-side partial dedup caps the
    * shuffle at partition-distinct pairs — type-grain, not token-grain),
    * then one count per suffix. Deterministic top-k.
    */
  def continuationCounts(df: DataFrame, n: Int, textCol: String = "text",
      k: Int = 100): DataFrame = {
    require(n >= 2, s"continuation counts need order >= 2, got $n")
    // split once behind a projection boundary (see ngramCounts)
    val w = col("__w")
    df.select(split(col(textCol), " ").as("__w"))
      .select(explode(when(size(w) >= n,
        transform(sequence(lit(0), size(w) - n),
          i => struct(element_at(w, i + 1).as("left"),
            concat_ws(" ", (1 until n).map(j => element_at(w, i + j + 1)): _*)
              .as("gram"))))
      .otherwise(array().cast("array<struct<left:string,gram:string>>"))).as("e"))
      .select(col("e.left").as("left"), col("e.gram").as("gram"))
      .distinct()
      .groupBy("gram").agg(count(lit(1)).as("cont_cnt"))
      .orderBy(col("cont_cnt").desc, col("gram").asc)
      .limit(k)
  }

  /** Corpus heavy hitters: the top-frequency tokens via a SpaceSaving
    * sketch ([[graft.functions.FreqSketch]]) — `count ≥ true ≥ count − err`
    * per row, and every token with true frequency > n_tokens / capacity is
    * guaranteed present. The exact alternative shuffles the WHOLE
    * vocabulary (n-gram vocabularies are corpus-sized); this plan is a
    * scan + Generate + ObjectHashAggregate whose shuffle carries one
    * `capacity`-entry sketch per partition.
    */
  def heavyHitters(df: DataFrame, textCol: String = "text",
      capacity: Int = 256): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .agg(graft.functions.FreqSketch(col("token"), capacity).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token").as("token"), col("e.cnt").as("cnt"),
        col("e.err").as("err"))

  /** Train byte-pair-encoding merges on the corpus — the full tokenizer-
    * training step [[bpePairCounts]] previews. The split of labor is the
    * one production BPE trainers use: Spark runs the ONE distributed pass
    * (corpus → word-frequency table; the shuffle carries word counts —
    * vocabulary-grain, never the corpus), and the merge loop runs
    * DRIVER-side over that bounded table (O(nMerges · vocab); `wordCap`
    * guards the driver and keeps the trained vocabulary deterministic:
    * top-`wordCap` words by count with a word tie-break). Symbols start as
    * single characters; each step merges the most frequent adjacent symbol
    * pair (count-weighted by word frequency, ties lexicographic on the
    * pair) everywhere at once. Returns (step, left, right, pair count at
    * merge time) — best-pair counts are non-increasing by construction
    * (merging only removes occurrences; pairs created by a merge inherit a
    * subset of its occurrences), which the gate asserts.
    */
  def bpeTrain(df: DataFrame, textCol: String = "text", nMerges: Int = 50,
      wordCap: Int = 1000000): Seq[(Int, String, String, Long)] =
    bpeMergeLoop(
      bpeWordCounts(df, textCol, wordCap)
        .map { case (w, c) => (w.map(_.toString).toArray, c) },
      nMerges)

  /** The ONE distributed pass of BPE training: corpus → bounded
    * word-frequency table (top-`wordCap` by count, word tie-break).
    */
  private def bpeWordCounts(df: DataFrame, textCol: String,
      wordCap: Int): Array[(String, Long)] = df
    .select(explode(split(col(textCol), " ")).as("w"))
    .filter(length(col("w")) > 0)
    .groupBy("w").agg(count(lit(1)).as("c"))
    .orderBy(col("c").desc, col("w").asc)
    .limit(wordCap)
    .collect().map(r => (r.getString(0), r.getLong(1)))

  /** The driver-bounded greedy merge loop shared by [[bpeTrain]] (char
    * symbols) and [[bpeTrainBytes]] (byte symbols): each step merges the
    * most frequent adjacent symbol pair (count-weighted by word frequency,
    * ties lexicographic) everywhere at once.
    */
  private def bpeMergeLoop(initial: Array[(Array[String], Long)],
      nMerges: Int): Seq[(Int, String, String, Long)] = {
    var words = initial
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var step = 1
    while (step <= nMerges) {
      val pairCounts = scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) step = nMerges + 1
      else {
        val ((l, r), cnt) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((step, l, r, cnt))
        words = words.map { case (syms, c) => (mergePair(syms, l, r), c) }
        step += 1
      }
    }
    merges.toSeq
  }

  /** Merge every adjacent (l, r) occurrence in one left-to-right pass. */
  private def mergePair(syms: Array[String], l: String,
      r: String): Array[String] =
    if (syms.length < 2) syms
    else {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toArray
    }

  /** Byte ↔ symbol bijection for byte-level BPE: byte `b` maps to the
    * single char `U+0100 + b`. Symbols stay plain Strings, so the merge
    * loop and rank replay are shared verbatim with the char-level path,
    * and symbol sort order is byte order (GPT-2 ships the same idea as a
    * printable byte remapping — see its `bytes_to_unicode`).
    */
  private[pipeline] def byteToSym(b: Byte): String =
    ((b & 0xff) + 0x100).toChar.toString

  /** Inverse of [[byteToSym]] over a (possibly merged) symbol string. */
  private[pipeline] def symToBytes(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i).toInt
      require(c >= 0x100 && c <= 0x1FF, s"not a byte-level BPE symbol: $s")
      out(i) = (c - 0x100).toByte
      i += 1
    }
    out
  }

  /** BYTE-FALLBACK BPE training (GPT-2 style): words decompose into their
    * UTF-8 bytes before merging, so the base vocabulary is the closed set
    * of 256 byte symbols and ANY Unicode input — emoji, CJK, combining
    * marks, mojibake — is tokenizable with zero OOV dependence on having
    * seen the character in training (char-level [[bpeTrain]] leaves an
    * unseen character as its own token only if it fits in a String symbol;
    * byte fallback makes the guarantee structural). Same split of labor:
    * one distributed word-count pass, driver-bounded merge loop.
    */
  def bpeTrainBytes(df: DataFrame, textCol: String = "text",
      nMerges: Int = 50, wordCap: Int = 1000000): Seq[(Int, String, String, Long)] =
    bpeMergeLoop(
      bpeWordCounts(df, textCol, wordCap).map { case (w, c) =>
        (w.getBytes(java.nio.charset.StandardCharsets.UTF_8).map(byteToSym), c)
      },
      nMerges)

  /** Apply trained BPE merges to the corpus — the tokenize-with-the-
    * trained-vocab step after [[bpeTrain]]. Per word: repeatedly merge the
    * LOWEST-rank adjacent pair present, all occurrences at once (the
    * standard apply algorithm; on the training corpus it reproduces the
    * training-end segmentation exactly, because merges commute with later
    * merges of other pairs and rank order IS training order). The merge
    * table is driver-bounded and rides the closure; encoding is a typed
    * `mapPartitions` scan — the same imperative-loop-at-the-partition-
    * boundary call [[Multimodal]] makes for byte decode: no shuffle, no
    * UDF registration, and the output (id, tokens) re-enters codegen
    * downstream. Output token streams feed [[graft.pipeline.Curation]]'s
    * packing/budget operators with REAL tokenizer counts instead of
    * whitespace counts.
    */
  def bpeEncode(df: DataFrame, merges: Seq[(Int, String, String, Long)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    bpeEncodeWith(df, merges, idCol, textCol, w => w.map(_.toString).toArray)

  /** Byte-level [[bpeEncode]]: words decompose into UTF-8 byte symbols
    * before the rank replay, pairing with [[bpeTrainBytes]]. Tokens are
    * strings over the `U+0100..U+01FF` symbol alphabet — decode with
    * [[bpeBytesDecode]]; losslessness holds for arbitrary Unicode input by
    * construction (every byte is a base symbol).
    */
  def bpeEncodeBytes(df: DataFrame, merges: Seq[(Int, String, String, Long)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    bpeEncodeWith(df, merges, idCol, textCol,
      w => w.getBytes(java.nio.charset.StandardCharsets.UTF_8).map(byteToSym))

  /** Decode a byte-level token stream back to text: symbols → bytes →
    * UTF-8. Tokens may split INSIDE a multi-byte character (byte BPE
    * merges don't respect codepoint boundaries), so decoding concatenates
    * all bytes before charset conversion.
    */
  def bpeBytesDecode(tokens: Seq[String]): String = {
    val bytes = tokens.iterator.flatMap(symToBytes).toArray
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The shared rank-replay serving pass: per word (via `initSyms`),
    * repeatedly merge the lowest-rank adjacent pair present, all
    * occurrences at once. Typed `mapPartitions` scan, merge table on the
    * closure — no shuffle, no UDF.
    */
  private def bpeEncodeWith(df: DataFrame,
      merges: Seq[(Int, String, String, Long)], idCol: String,
      textCol: String, initSyms: String => Array[String]): DataFrame = {
    val rank: Map[(String, String), Int] =
      merges.map(m => ((m._2, m._3), m._1)).toMap
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = text.split(" ").iterator.filter(_.nonEmpty).flatMap { w =>
            var syms: Array[String] = initSyms(w)
            var done = syms.length < 2
            while (!done) {
              var best = Int.MaxValue; var bi = -1; var i = 0
              while (i < syms.length - 1) {
                val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
                if (r < best) { best = r; bi = i }
                i += 1
              }
              if (bi < 0) done = true
              else {
                syms = mergePair(syms, syms(bi), syms(bi + 1))
                done = syms.length < 2
              }
            }
            syms
          }.toArray
          (id, toks)
        }
      }.toDF(idCol, "tokens")
  }

  /** WordPiece-style GREEDY LONGEST-MATCH segmentation against a FIXED
    * vocabulary — the third tokenizer family beside [[bpeEncode]]
    * (merge-rank replay) and [[unigramEncode]] (Viterbi max-likelihood):
    * at each position take the longest vocabulary piece that prefixes the
    * remainder; a position no piece covers falls back to its single
    * character (never dropped — losslessness holds for ANY vocab). Same
    * serving shape as the other two: a typed `mapPartitions` with the
    * vocabulary as an immutable set on the closure, scan-shaped, no
    * shuffle. Greedy ≠ optimal by design (vocab {a,ab,bc,c} segments
    * "abc" as [ab,c], not [a,bc]) — that difference is spec-pinned, it is
    * WordPiece's published behavior, not a bug.
    */
  def wordpieceEncode(df: DataFrame, vocab: Set[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(vocab.nonEmpty, "wordpieceEncode needs a non-empty vocabulary")
    val maxLen = vocab.iterator.map(_.length).max
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = text.split(" ").iterator.filter(_.nonEmpty).flatMap { w =>
            val out = scala.collection.mutable.ArrayBuffer[String]()
            var pos = 0
            while (pos < w.length) {
              var len = math.min(maxLen, w.length - pos)
              while (len > 1 && !vocab.contains(w.substring(pos, pos + len)))
                len -= 1
              // len == 1: single char, vocab member or the unknown fallback
              out += w.substring(pos, pos + len)
              pos += len
            }
            out
          }.toArray
          (id, toks)
        }
      }.toDF(idCol, "tokens")
  }

  /** Trained unigram-LM tokenizer state: `pieces` maps each vocabulary
    * piece to its log-probability; `seedTop` is the most frequent
    * multi-character substring of the seed pass with its corpus-weighted
    * count (integer evidence the oracle re-derives in SQL); `llTrace` is
    * the Viterbi log-likelihood after each EM iteration at the FINAL
    * vocabulary (monotone non-decreasing — hard-EM's M-step maximizes the
    * complete-data likelihood and the E-step re-segmentation can only
    * improve it further, so any decrease is a bug the gate would catch). */
  final case class UnigramModel(pieces: Map[String, Double],
      seedTop: (String, Long), llTrace: Seq[Double])

  /** Train a SentencePiece-style UNIGRAM-LM tokenizer (Kudo 2018: seed a
    * large candidate vocabulary, alternate EM with pruning down to the
    * target size) — the other major tokenizer family next to [[bpeTrain]],
    * with the same production split of labor: Spark runs the ONE
    * distributed corpus pass (word-frequency table; the shuffle is
    * vocabulary-grain, never the corpus), and the EM/prune loop runs
    * driver-side over that bounded table (`wordCap` top words by count,
    * word tie-break — deterministic).
    *
    * Simplifications vs the paper, both standard and documented: hard
    * (Viterbi) EM instead of forward–backward expectations, and seeding
    * from all substrings ≤ `maxPieceLen` of the capped word table instead
    * of a suffix-array pass. Single characters are never pruned (every
    * word stays segmentable); multi-character pieces are pruned lowest
    * Viterbi-count first (count ties lexicographic) until `vocabSize`
    * holds, then `emIters` final EM iterations run at the fixed
    * vocabulary. All tie-breaks are total orders, so the trained model is
    * a pure function of the corpus.
    */
  def unigramTrain(df: DataFrame, textCol: String = "text",
      vocabSize: Int = 80, maxPieceLen: Int = 4, seedSize: Int = 400,
      emIters: Int = 2, pruneFrac: Double = 0.25,
      wordCap: Int = 1000000): UnigramModel = {
    val wordCounts: Array[(String, Long)] = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(wordCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // seed: every substring ≤ maxPieceLen, corpus-weighted by word count
    val subCounts = scala.collection.mutable.HashMap[String, Long]()
    wordCounts.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          val s = w.substring(i, i + l)
          subCounts.update(s, subCounts.getOrElse(s, 0L) + c)
          l += 1
        }
        i += 1
      }
    }
    val chars = subCounts.keysIterator.filter(_.length == 1).toArray.sorted
    val multi = subCounts.iterator.filter(_._1.length > 1).toArray
      .sortBy { case (s, c) => (-c, s) }
    val seedTop = multi.headOption.map { case (s, c) => (s, c) }
      .getOrElse(("", 0L))
    var vocab: Array[String] =
      chars ++ multi.take(math.max(seedSize - chars.length, 0)).map(_._1)
    var logp: Map[String, Double] = {
      val tot = vocab.iterator.map(subCounts).sum.toDouble
      vocab.iterator.map(s => s -> math.log(subCounts(s) / tot)).toMap
    }
    // Viterbi pass over the word table: per-piece counts + total likelihood
    def viterbiCounts(): (scala.collection.mutable.HashMap[String, Long], Double) = {
      val counts = scala.collection.mutable.HashMap[String, Long]()
      var ll = 0.0
      wordCounts.foreach { case (w, c) =>
        val toks = viterbiSegment(w, logp, maxPieceLen)
        toks.foreach(t => counts.update(t, counts.getOrElse(t, 0L) + c))
        ll += c * toks.iterator.map(t => logp.getOrElse(t, UnkLogp)).sum
      }
      (counts, ll)
    }
    def mStep(counts: scala.collection.mutable.HashMap[String, Long]): Unit = {
      // chars keep at least count 1 so every word stays segmentable
      val eff = vocab.iterator.map { s =>
        val c = counts.getOrElse(s, 0L)
        s -> (if (s.length == 1) math.max(c, 1L) else c)
      }.filter(_._2 > 0L).toArray
      val tot = eff.iterator.map(_._2).sum.toDouble
      vocab = eff.map(_._1)
      logp = eff.iterator.map { case (s, c) => s -> math.log(c / tot) }.toMap
    }
    // alternate EM + prune until the target size holds; chars are never
    // pruned, so a chars-only vocabulary is terminal even above target
    while (vocab.length > vocabSize && vocab.exists(_.length > 1)) {
      val (counts, _) = viterbiCounts()
      mStep(counts)
      if (vocab.length > vocabSize && vocab.exists(_.length > 1)) {
        val nMulti = vocab.count(_.length > 1)
        val nChars = vocab.length - nMulti
        val keep = math.max(vocabSize - nChars,
          math.min(nMulti - 1, (nMulti * (1.0 - pruneFrac)).toInt))
        val kept = vocab.iterator.filter(_.length > 1)
          .map(s => (s, counts.getOrElse(s, 0L)))
          .toArray.sortBy { case (s, c) => (-c, s) }
          .take(keep).map(_._1).toSet
        vocab = vocab.filter(s => s.length == 1 || kept(s))
        val tot = vocab.iterator.map(s =>
          math.max(counts.getOrElse(s, 0L), 1L)).sum.toDouble
        logp = vocab.iterator.map(s =>
          s -> math.log(math.max(counts.getOrElse(s, 0L), 1L) / tot)).toMap
      }
    }
    // final EM at the fixed vocabulary; Viterbi-EM likelihood is monotone
    val trace = scala.collection.mutable.ArrayBuffer[Double]()
    var iter = 0
    while (iter < emIters) {
      val (counts, ll) = viterbiCounts()
      trace += ll
      mStep(counts)
      iter += 1
    }
    UnigramModel(logp, seedTop, trace.toSeq)
  }

  private val UnkLogp = -1e9

  /** Deterministic Viterbi segmentation of one word under piece
    * log-probs: DP over end positions, candidate start positions scanned
    * ascending with strict improvement — a total order, so ties resolve
    * identically on driver and executors. Characters absent from the
    * vocabulary surface as single-char pieces at [[UnkLogp]]. */
  def viterbiSegment(w: String, logp: Map[String, Double],
      maxPieceLen: Int): List[String] = {
    val n = w.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (best(i) > Double.NegativeInfinity) {
          val piece = w.substring(i, j)
          val lp = logp.getOrElse(piece,
            if (j - i == 1) UnkLogp else Double.NegativeInfinity)
          if (lp > Double.NegativeInfinity && best(i) + lp > best(j)) {
            best(j) = best(i) + lp
            back(j) = i
          }
        }
        i += 1
      }
      j += 1
    }
    var out = List.empty[String]
    var p = n
    while (p > 0) { val i = back(p); out = w.substring(i, p) :: out; p = i }
    out
  }

  /** Segment a corpus with a trained [[UnigramModel]] — the serving twin
    * of [[unigramTrain]], a typed mapPartitions with the piece table on
    * the closure (broadcast with the task, scan-shaped like [[bpeEncode]]).
    * Output: (idCol, tokens ARRAY<STRING>). */
  def unigramEncode(df: DataFrame, model: UnigramModel,
      idCol: String = "doc_id", textCol: String = "text",
      maxPieceLen: Int = 4): DataFrame = {
    val logp = model.pieces
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = text.split(" ").iterator.filter(_.nonEmpty)
            .flatMap(w => viterbiSegment(w, logp, maxPieceLen)).toArray
          (id, toks)
        }
      }.toDF(idCol, "tokens")
  }

  /** Stratified heavy hitters with a merged grand total in ONE aggregation:
    * `rollup(stratum)` computes every per-stratum sketch AND the all-corpus
    * sketch in the same shuffle — the Expand duplicates token rows into the
    * two grains, but what moves is still one capacity-entry sketch per
    * (partition, grain), never the vocabulary. This is the mergeable-sketch
    * discipline of `rel_hll_rollup` applied to SpaceSaving: per-language
    * top-token tables and the corpus-wide table from one pass, each grain
    * carrying its own `cnt ≥ true ≥ cnt − err` guarantee. The total row is
    * identified by the `grouping()` bit (not a null test — a stratum value
    * that IS null stays a real stratum), carried through as its own
    * `is_total` column so a REAL stratum literally named `<ALL>` remains
    * distinguishable from the grand total; `<ALL>` in `stratum` is only a
    * display label for the total row.
    */
  def heavyHittersByStratum(df: DataFrame, stratumCol: String,
      textCol: String = "text", capacity: Int = 256): DataFrame =
    df.select(col(stratumCol).as("stratum"),
        explode(split(col(textCol), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .rollup(col("stratum"))
      .agg(graft.functions.FreqSketch(col("token"), capacity).as("hh"),
        grouping(col("stratum")).cast("int").as("is_total"))
      .select(when(col("is_total") === 1, lit("<ALL>"))
          .otherwise(col("stratum")).as("stratum"),
        col("is_total"), explode(col("hh")).as("e"))
      .select(col("stratum"), col("is_total"), col("e.token").as("token"),
        col("e.cnt").as("cnt"), col("e.err").as("err"))
}
