package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** NovelAI tag ordering (SURVEY.md §2.9 U3).
  *
  * Reference `build_an_item` (`/root/reference/dataruu/tags_ordering/
  * novelai_order.py:12-40`, near-duplicate `legacy/build_tags.py:14-42`):
  * partition tags into prefix (contains girl/boy), character (unknown to
  * the vocabulary and no trigger word) and non-character (known, or
  * triggered); sort character/non-character by length DESC; join
  * `prefix + "," + character + "," + non_character` and strip outer commas
  * (interior empty segments keep their double comma, like the reference).
  *
  * Divergences pinned (SURVEY.md §7.4): the reference iterates a Python
  * set, so its prefix order and its length-ties are nondeterministic; we
  * pin prefix order to first occurrence and break length ties
  * alphabetically via the portable lpad sort key.
  *
  * Scale: explode → broadcast-join the (9k-row) vocabulary → single
  * hash re-aggregation. One shuffle on the document key, vocabulary never
  * shuffles. At 100 TB the explode multiplies rows ~30× but stays narrow;
  * the single groupBy is the only exchange.
  */
object TagOrder {
  /** Class codes: 0 = prefix, 1 = character, 2 = non-character. */
  def classify(tag: Column, known: Column): Column =
    when(tag.contains("girl") || tag.contains("boy"), 0)
      .when(known, 2)
      .when(TagText.hasTriggerWord(tag), 2)
      .otherwise(1)

  private def stripKeys(keys: Column): Column =
    transform(keys, k => substring(k, 5, 1 << 24))

  /** Adds `ordered_tags` to `docs`. `vocab` is the tag vocabulary (one
    * string column `vocabCol`) — broadcast, reference loads it as an
    * in-memory dict (`novelai_order.py:9`). */
  def orderTags(docs: DataFrame, idCol: String, tagsCol: String,
                vocab: DataFrame, vocabCol: String): DataFrame = {
    // E1 (`novelai_order.py:17`): dedup before partitioning; first-occurrence
    // order pinned (array_distinct) where the reference's set() is unordered.
    val ex = docs.select(col(idCol),
      posexplode(TagText.dedupTags(col(tagsCol))).as(Seq("pos", "tag")))
    val j = ex.join(
      broadcast(vocab.select(col(vocabCol).as("__vtag")).distinct()),
      col("tag") === col("__vtag"), "left")
      .withColumn("cls", classify(col("tag"), col("__vtag").isNotNull))
    val prefixKey = when(col("cls") === 0, struct(col("pos"), col("tag")))
    val charKey   = when(col("cls") === 1, TagText.lengthDescKey(col("tag")))
    val nonKey    = when(col("cls") === 2, TagText.lengthDescKey(col("tag")))
    val g = j.groupBy(col(idCol)).agg(
      array_join(transform(array_sort(collect_list(prefixKey)), x => x.getField("tag")), ",")
        .as("__p"),
      array_join(stripKeys(array_sort(collect_list(charKey))), ",").as("__c"),
      array_join(stripKeys(array_sort(collect_list(nonKey))), ",").as("__n"))
    g.select(col(idCol),
      regexp_replace(
        concat(col("__p"), lit(","), col("__c"), lit(","), col("__n")),
        "^,+|,+$", "").as("ordered_tags"))
  }
}
