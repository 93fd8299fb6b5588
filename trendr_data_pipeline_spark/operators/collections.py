"""Collection-building operators (SURVEY §2.2 F9, §2.5 W6, §2.4
A10/A11, §2.7 AM1/AM2) — the tag engine of
``ai/collection_generator.py``, set-oriented.

The deterministic template path only (the reference itself falls back
to pure tag templates when no AI client is configured,
``ai/collection_generator.py:192-195``); an LLM description pass would
be an external-call stage behind ``foreachBatch``, out of the
relational plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import slugify

# ---------------------------------------------------------------------------
# AM2 — synthetic tag from mood (collection_generator.py:233-243)
# ---------------------------------------------------------------------------


def with_effective_tags(pois: DataFrame) -> DataFrame:
    """tags, falling back to a one-entry map built from primary_mood
    (confidence = mood_confidence or 0.5, category 'mood')."""
    synthetic = F.create_map(
        F.col("primary_mood"),
        F.struct(
            F.coalesce(F.col("mood_confidence"), F.lit(0.5)).alias("confidence"),
            F.lit("mood").alias("category"),
            F.lit(1).alias("sources_count"),
        ),
    )
    has_tags = F.col("tags").isNotNull() & (F.size(F.map_keys(F.col("tags"))) > 0)
    return pois.withColumn(
        "eff_tags",
        F.when(has_tags, F.col("tags"))
        .when(F.col("primary_mood").isNotNull(), synthetic)
        .otherwise(F.lit(None)),
    ).filter(F.col("eff_tags").isNotNull())


# ---------------------------------------------------------------------------
# F9 — tag criteria filter + match score (collection_generator.py:252-311)
# ---------------------------------------------------------------------------


def _tag_conf(tags: Column, tag: str) -> Column:
    return F.coalesce(F.element_at(tags, tag).getField("confidence"), F.lit(None))


def filter_by_tag_criteria(
    pois: DataFrame,
    required_tags: list[str],
    excluded_tags: list[str] | None = None,
    min_confidence: float = 0.5,
    tags_col: str = "eff_tags",
) -> DataFrame:
    """Keep POIs with ≥1 required tag at confidence ≥ min_conf and no
    excluded tag at ≥ min_conf; match_score = Σ qualifying required-tag
    confidences."""
    tags = F.col(tags_col)
    req_ok = F.lit(False)
    match_score = F.lit(0.0)
    for t in required_tags:
        conf = _tag_conf(tags, t)
        qual = conf.isNotNull() & (conf >= min_confidence)
        req_ok = req_ok | qual
        match_score = match_score + F.when(qual, conf).otherwise(0.0)
    exc_hit = F.lit(False)
    for t in excluded_tags or []:
        conf = _tag_conf(tags, t)
        exc_hit = exc_hit | (conf.isNotNull() & (conf >= min_confidence))
    return (
        pois.filter(req_ok & ~exc_hit)
        .withColumn("match_score", match_score)
    )


# ---------------------------------------------------------------------------
# W6 — top-8 per collection template, ≥2 required (collection_generator.py:346-348)
# ---------------------------------------------------------------------------


def top_k_collection(
    matches: DataFrame, template_col: str = "template", k: int = 8, min_members: int = 2
) -> DataFrame:
    """row_number ≤ k per template on (match_score desc, id asc), then
    drop templates with < min_members survivors."""
    w = Window.partitionBy(template_col).orderBy(F.col("match_score").desc(), F.col("id").asc())
    topk = matches.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    sizes = topk.groupBy(template_col).agg(F.count(F.lit(1)).alias("_n"))
    return (
        topk.join(sizes.filter(F.col("_n") >= min_members), template_col, "left_semi")
    )


def assemble_collections(topk: DataFrame, city: str, template_titles: dict[str, str]) -> DataFrame:
    """Collection rows: title, slug (ST10), ordered poi_ids array."""
    title_map = F.create_map(*[F.lit(x) for kv in template_titles.items() for x in kv])
    return (
        topk.groupBy("template")
        .agg(F.array_sort(F.collect_list(F.struct("rk", "id"))).alias("_members"))
        .select(
            "template",
            F.element_at(title_map, F.col("template")).alias("title"),
            slugify(F.concat(F.element_at(title_map, F.col("template")), F.lit(" "), F.lit(city))).alias("slug"),
            F.transform(F.col("_members"), lambda m: m.getField("id")).alias("poi_ids"),
        )
    )


# ---------------------------------------------------------------------------
# A11 — tag usage stats (collection_generator.py:325-333)
# ---------------------------------------------------------------------------


def tag_usage(pois: DataFrame, tags_col: str = "eff_tags") -> DataFrame:
    return (
        pois.select(F.explode(F.map_keys(F.col(tags_col))).alias("tag"))
        .groupBy("tag")
        .agg(F.count(F.lit(1)).alias("n_pois"))
    )


# ---------------------------------------------------------------------------
# AM1 — tag categorization (collection_generator.py:207-228)
# ---------------------------------------------------------------------------


def tag_categories(pois: DataFrame, id_col: str = "id", tags_col: str = "eff_tags") -> DataFrame:
    """Per (poi, category): list of {tag, confidence} structs."""
    entries = pois.select(
        F.col(id_col), F.explode(F.col(tags_col)).alias("tag", "tag_data")
    ).select(
        id_col,
        F.coalesce(F.col("tag_data.category"), F.lit("unknown")).alias("category"),
        F.struct(F.col("tag"), F.col("tag_data.confidence").alias("confidence")).alias("entry"),
    )
    return entries.groupBy(id_col, "category").agg(F.collect_list("entry").alias("entries"))


# ---------------------------------------------------------------------------
# A10 — mood distribution per neighbourhood (utils/database.py:1000-1043)
# ---------------------------------------------------------------------------

MOOD_KEYS = ["chill", "trendy", "hidden"]


def mood_distribution(pois: DataFrame) -> DataFrame:
    """Per neighbourhood: % of POIs per normalized mood key (rounded,
    'hidden_gem' → 'hidden'; ensures all of {chill, trendy, hidden}
    present via the pivot's explicit value list)."""
    norm = F.when(F.col("primary_mood") == "hidden_gem", "hidden").otherwise(
        F.lower(F.col("primary_mood"))
    )
    base = pois.filter(F.col("primary_mood").isNotNull() & F.col("neighbourhood_name").isNotNull())
    counts = (
        base.withColumn("mood", norm)
        .groupBy("neighbourhood_name")
        .pivot("mood", MOOD_KEYS)
        .count()
        .na.fill(0, MOOD_KEYS)
    )
    total = sum(F.col(m) for m in MOOD_KEYS)
    # one select: sequential withColumn would re-resolve `total`
    # against already-percentaged columns
    return counts.select(
        "neighbourhood_name",
        *[F.round(F.col(m) * 100.0 / total).cast("long").alias(m) for m in MOOD_KEYS],
    )


# ---------------------------------------------------------------------------
# AM5 — structured-data assembly (collection_generator.py:1155-1233)
# ---------------------------------------------------------------------------


def structured_data(collections_df: DataFrame, members: DataFrame) -> DataFrame:
    """JSON-LD CollectionPage per collection with nested POI entities:
    collect_list of member structs → to_json(struct(...)). ``members``
    carries (template, id, name, rk); order inside itemListElement
    follows rank."""
    items = (
        members.groupBy("template")
        .agg(F.array_sort(F.collect_list(F.struct("rk", "id", "name"))).alias("_m"))
        .select(
            "template",
            F.transform(
                F.col("_m"),
                lambda m: F.struct(
                    F.lit("ListItem").alias("@type"),
                    m.getField("rk").alias("position"),
                    F.struct(
                        F.lit("LocalBusiness").alias("@type"),
                        m.getField("name").alias("name"),
                        m.getField("id").alias("identifier"),
                    ).alias("item"),
                ),
            ).alias("elements"),
        )
    )
    joined = collections_df.join(items, "template")
    return joined.withColumn(
        "structured_data",
        F.to_json(
            F.struct(
                F.lit("https://schema.org").alias("@context"),
                F.lit("CollectionPage").alias("@type"),
                F.col("title").alias("name"),
                F.struct(
                    F.lit("ItemList").alias("@type"),
                    F.col("elements").alias("itemListElement"),
                ).alias("mainEntity"),
            )
        ),
    ).drop("elements")
