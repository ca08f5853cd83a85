package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed multinomial Naive Bayes over unigram counts — the
  * fastText-style linear filter every web-corpus pipeline runs for
  * language routing and quality triage (CCNet-style). Nothing here is
  * iterative: training IS two aggregations, so the whole fit is
  * map-side-combinable and one shuffle each on (label, token) and the
  * per-label/prior catalogs; no gradient loop, no driver-side data path.
  *
  * Scale shape (the 100-TB story):
  *   - train: `groupBy(label, token).count()` — partial aggregation
  *     bounds the shuffle by the (label × vocab) table, not the corpus;
  *     per-label totals/priors/vocab-size are label-grain catalog
  *     collects (bounded by construction).
  *   - model: ONE token-grain frame with a log-likelihood column per
  *     label (built by `groupBy(token).pivot(label)` — labels are a
  *     bounded catalog). The frame stays distributed; only scalars
  *     (priors, OOV fallbacks, vocab size) live on the driver.
  *   - classify: corpus tokens LEFT JOIN the model frame on token (AQE
  *     broadcasts it when small; shuffle-joins when the vocab is truly
  *     large), then one doc-grain aggregation. Argmax is an
  *     `array_min(array(struct(-score, label)))` — codegen'd, no UDF.
  *
  * Numeric discipline: every probability is a ratio of INTEGER counts
  * (Laplace-smoothed), so both engines divide identical integers under
  * IEEE semantics; `ln` may differ in the last ulp across libm
  * implementations, which cannot flip an argmax whose gaps are O(1e-2),
  * so the oracle gates the predicted LABEL and integer token counts —
  * never raw floating scores.
  */
object Classify {

  /** Token stream shared by train and classify (and mirrored verbatim by
    * the DuckDB oracle): lowercase, runs of [a-z] — empty matches
    * impossible, docs with no tokens drop out of both engines alike. */
  def tokensOf(textCol: Column): Column =
    regexp_extract_all(lower(textCol), lit("([a-z]+)"), lit(1))

  /** Fitted model. `tokenLogp` is the distributed (token, logp_<label>…)
    * frame the classifier joins; `counts`/`docCounts` are the SUFFICIENT
    * STATISTICS ((label, token, count) frame + label-grain doc counts) —
    * exact integers, so models are MERGEABLE: training per shard and
    * [[nbMerge]]-ing is provably identical to training on the union (the
    * HLL-rollup discipline applied to a trained model). Everything else is
    * label-grain driver scalars. */
  final case class NbModel(labels: Seq[String],
      logPriors: Map[String, Double], oovLogp: Map[String, Double],
      tokenLogp: DataFrame, vocabSize: Long,
      counts: DataFrame, docCounts: Map[String, Long])

  /** Fit a multinomial NB classifier on a labeled corpus. Two shuffles
    * total: the (label, token) count and the token-grain pivot; the three
    * `.collect()`s are label-grain catalogs (bounded). Laplace add-one:
    * P(tok|l) = (c+1)/(T_l+V), P(l) = n_l/N. */
  def nbTrain(df: DataFrame, textCol: Column, labelCol: Column): NbModel = {
    val tok = df.select(labelCol.as("__lab"),
      explode(tokensOf(textCol)).as("__tok"))
    val cnt = tok.groupBy(col("__lab"), col("__tok"))
      .agg(count(lit(1)).as("__c"))
    val priors = df.groupBy(labelCol.as("__lab")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    fromCounts(cnt, priors)
  }

  /** Merge two shard-trained models into the model the union corpus would
    * train — EXACT, because the sufficient statistics are additive
    * integers: token counts union-sum, doc counts add, and every derived
    * quantity (totals, vocab, Laplace log-likelihoods) is a pure function
    * of them. One aggregation over the two count frames; at scale this is
    * how a fleet trains per shard/day and serves one model. */
  def nbMerge(a: NbModel, b: NbModel): NbModel = {
    val cnt = a.counts.union(b.counts)
      .groupBy(col("__lab"), col("__tok"))
      .agg(sum(col("__c")).as("__c"))
    val docs = (a.docCounts.keySet ++ b.docCounts.keySet).map { l =>
      l -> (a.docCounts.getOrElse(l, 0L) + b.docCounts.getOrElse(l, 0L))
    }.toMap
    fromCounts(cnt, docs)
  }

  /** Derive the serving model from sufficient statistics ((__lab, __tok,
    * __c) + label-grain doc counts) — shared by [[nbTrain]] and
    * [[nbMerge]] so the two paths cannot drift. */
  private def fromCounts(cnt: DataFrame,
      priors: Map[String, Long]): NbModel = {
    val totals = cnt.groupBy(col("__lab")).agg(sum(col("__c")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocab = cnt.select(col("__tok")).distinct().count()
    val n = priors.values.sum
    val labels = priors.keys.toSeq.sorted
    val logPriors = priors.map { case (l, nl) =>
      l -> math.log(nl.toDouble / n.toDouble) }
    def tot(l: String): Long = totals.getOrElse(l, 0L) // label w/ only empty texts
    val oov = labels.map { l =>
      l -> math.log(1.0 / (tot(l) + vocab).toDouble) }.toMap
    val wide = cnt.groupBy(col("__tok").as("token"))
      .pivot("__lab", labels).agg(first(col("__c")))
    val logp = wide.select(col("token") +: labels.map { l =>
      log((coalesce(col(s"`$l`"), lit(0L)) + lit(1L)).cast("double")
        / lit((tot(l) + vocab).toDouble)).as(s"logp_$l") }: _*)
    NbModel(labels, logPriors, oov, logp, vocab, cnt, priors)
  }

  /** The SCAN-shaped serving twin of [[nbClassify]]: the vocabulary rides
    * the plan as a map LITERAL (token → per-label log-likelihood array), so
    * scoring is a pure per-row column — no join, no shuffle, no state.
    * This is the fastText deployment shape (bounded vocab, shipped with
    * the model) and the one a STREAMING scorer needs: stateless, so a
    * micro-batch scores in append mode with no aggregation state at all.
    * The vocab collect is cap-guarded (`vocabCap`) — beyond it, use the
    * join-shaped [[nbClassify]]. Output and semantics match nbClassify:
    * same tokens, same Laplace arithmetic, same (-score, label) argmax;
    * zero-token docs are FILTERED to match its no-evidence contract. */
  def nbClassifyScan(model: NbModel, df: DataFrame, idCol: Column,
      textCol: Column, vocabCap: Int = 1 << 20): DataFrame = {
    require(model.vocabSize <= vocabCap,
      s"vocab ${model.vocabSize} exceeds the scan-shape cap $vocabCap; use nbClassify")
    val labels = model.labels
    val vocabMap: Map[String, Seq[Double]] = model.tokenLogp.collect()
      .map(r => r.getString(0) -> (1 to labels.size).map(r.getDouble)).toMap
    val oovArr = labels.map(l => model.oovLogp(l))
    val toks = tokensOf(textCol)
    val zero = typedlit(Seq.fill(labels.size)(0.0))
    val sums = aggregate(toks, zero, (acc, t) =>
      zip_with(acc,
        coalesce(element_at(typedlit(vocabMap), t), typedlit(oovArr)),
        (a, b) => a + b))
    val candidates = array(labels.zipWithIndex.map { case (l, i) =>
      struct((-(element_at(sums, i + 1) + lit(model.logPriors(l)))).as("ns"),
        lit(l).as("lab")) }: _*)
    df.select(idCol.as("__id"),
        array_min(candidates).getField("lab").as("pred"),
        size(toks).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
  }

  /** Classify a corpus: (id, predicted label, n_tokens). One join on
    * token + one doc-grain aggregation; ties broken by label ascending
    * (min over (-score, label) structs — deterministic in both engines).
    * Docs with zero tokens are absent from the output (no evidence). */
  def nbClassify(model: NbModel, df: DataFrame, idCol: Column,
      textCol: Column): DataFrame = {
    val tok = df.select(idCol.as("__id"), explode(tokensOf(textCol)).as("token"))
    val joined = tok.join(model.tokenLogp, Seq("token"), "left")
    val sums = joined.groupBy(col("__id")).agg(
      count(lit(1)).as("n_tokens"),
      model.labels.map { l =>
        sum(coalesce(col(s"logp_$l"), lit(model.oovLogp(l)))).as(s"s_$l")
      }: _*)
    val candidates = array(model.labels.map { l =>
      struct((-(col(s"s_$l") + lit(model.logPriors(l)))).as("ns"),
        lit(l).as("lab")) }: _*)
    sums.select(col("__id"), array_min(candidates).getField("lab").as("pred"),
      col("n_tokens"))
  }
}
