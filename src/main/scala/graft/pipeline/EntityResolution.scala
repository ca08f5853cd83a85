package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution: edit-distance joins on short keys (names, ids,
  * addresses) without all-pairs comparison.
  *
  * Blocking is the FastSS / SymSpell deletion-neighborhood scheme: if
  * `ed(s, t) <= k` then deleting at most `k` characters from each side
  * reaches a common string (delete, from each string, the characters the
  * optimal alignment edits), so `D_k(s) ∩ D_k(t) ≠ ∅` — candidate
  * generation is an EQUI-join on deletion variants with exact recall, and
  * a `levenshtein` verify restores exact precision. No LSH-style missed
  * pairs, no quadratic candidate blowup.
  *
  * Scale shape: each row fans out to its `O(len^k)` deletion variants
  * (19 variants for an 18-char name at k=1 — this operator is for
  * NAME/KEY grain strings, not documents), variants join hashed
  * (`xxhash64`) so the shuffle carries 8-byte keys instead of strings,
  * and the verify runs BEFORE the pair-grain distinct so non-matching
  * candidates never shuffle twice. Everything is codegen'd builtins —
  * `transform`/`flatten`/`levenshtein` — end to end.
  *
  * ≙ reference has no fuzzy matching; extends the training-data suite
  * (SURVEY §2.16) — the dedup face of record linkage that corpus
  * provenance tables need (same family as [[TextDedup.exactDedup]]).
  */
object EntityResolution {

  /** All strings reachable from `s` by deleting at most `k` characters
    * (k=0 → just `s`), distinct, as an array column. Size grows as
    * `O(len^k)` — keep `k` at 1–2 and strings at key grain.
    */
  def deletionNeighborhood(s: Column, k: Int): Column = {
    require(k >= 0 && k <= 3, "deletion neighborhood is practical for k in [0, 3]")
    def delete1All(arr: Column): Column =
      array_distinct(flatten(transform(arr, v =>
        concat(
          array(v),
          transform(sequence(lit(1), greatest(length(v), lit(1))), i =>
            concat(substr(v, lit(1), i - 1),
              substr(v, i + 1, greatest(length(v), lit(1)))))))))
    (1 to k).foldLeft(array(s))((acc, _) => delete1All(acc))
  }

  /** Deletion-variant relation at (id, carried string, variant hash)
    * grain — the one signature computation every ER face shares (batch
    * join, self pairs, persisted index, streaming intake), factored so an
    * index built yesterday and a batch matched today can never disagree
    * on the blocking key.
    */
  private def variantRel(df: DataFrame, idCol: String, strCol: String,
      strAlias: String, maxDist: Int): DataFrame =
    df.select(col(idCol), col(strCol).as(strAlias),
      explode(deletionNeighborhood(col(strCol), maxDist)).as("__v"))
      .select(col(idCol), col(strAlias), xxhash64(col("__v")).as("__h"))

  /** Persistable deletion-variant INDEX of a reference entity table: one
    * row per (reference id, variant hash), the reference string carried
    * for the verify. Write it bucketed/partitioned by `__h` at scale and
    * hand it to [[matchAgainstIndex]] on every intake batch — or to
    * [[graft.streaming.Streaming.erMatchStream]] on a record stream.
    */
  def variantIndex(ref: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1): DataFrame =
    variantRel(ref, idCol, strCol, "__rs", maxDist)

  /** Match incoming records against a prebuilt [[variantIndex]]: all
    * `(idCol, refIdCol, dist)` with edit distance within the `maxDist` the
    * index was built for. Per-record decisions depend ONLY on the static
    * index, so results are independent of how the incoming set is batched
    * — the property that makes the streaming twin micro-batch-invariant.
    */
  def matchAgainstIndex(incoming: DataFrame, idCol: String, strCol: String,
      index: DataFrame, refIdCol: String, maxDist: Int = 1): DataFrame = {
    require(idCol != refIdCol,
      "incoming and reference id columns must have distinct names (both appear in the output)")
    variantRel(incoming, idCol, strCol, "__ls", maxDist)
      .join(index, Seq("__h"))
      .filter(levenshtein(col("__ls"), col("__rs")) <= maxDist)
      .select(col(idCol), col(refIdCol),
        levenshtein(col("__ls"), col("__rs")).as("dist"))
      .distinct()
  }

  /** Edit-distance join: all `(leftId, rightId, dist)` with
    * `levenshtein(leftStr, rightStr) <= maxDist`. Exact — the deletion
    * neighborhood guarantees recall, the verify guarantees precision.
    * `dist` is int. Null or empty strings on either side never match
    * (empty deletes to empty, which CAN pair with 1-char strings at k=1 —
    * semantically correct for edit distance).
    */
  def fuzzyJoin(left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      maxDist: Int = 1): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    matchAgainstIndex(left, leftId, leftStr,
      variantIndex(right, rightId, rightStr, maxDist), rightId, maxDist)
  }

  /** Self fuzzy-dedup pairs over one frame: `(id_a, id_b, dist)` with
    * `id_a < id_b` and edit distance within `maxDist` — the candidate
    * edges a record-linkage clustering (e.g.
    * [[TextDedup.connectedComponents]]) consumes.
    */
  def fuzzySelfPairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1): DataFrame =
    fuzzyJoin(
      df.select(col(idCol).as("__ida"), col(strCol).as("__sa")), "__ida", "__sa",
      df.select(col(idCol).as("__idb"), col(strCol).as("__sb")), "__idb", "__sb",
      maxDist)
      .filter(col("__ida") < col("__idb"))
      .select(col("__ida").as("id_a"), col("__idb").as("id_b"), col("dist"))
}
