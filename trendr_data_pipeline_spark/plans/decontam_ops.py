"""c43 — benchmark decontamination at RUN grain (r9 verdict item 4).

⊕D7's flag answers "does this doc share any 8-gram with the eval
set"; the c39/c41 ExactSubstr machinery upgrades that bit to SPANS:
which token intervals are contaminated, and how long — extent and
position. The gate is self-contained the way c40's contamination leg
is: the benchmark is the TEST split's own documents (split via c34's
hash CASE), the screened corpus is train/val, so no external fixture
is needed and the oracle composes from the stage gates' own SQL
fragments (c39's gram/island CTEs with the duplicated-gram set
replaced by the test split's gram set, c34's split CASE imported from
its single SQL home).

A doc quoting a whole eval answer reports ONE long run (the severity
the binary flag understates — pytest-pinned with exactly that case);
an incidental 8-token collision reports run_toks = 8. The run frame
feeds the c40 data card's ``contam_tok_share`` severity column and
``remove_contaminated_runs`` (the rewrite path via the shared
``_rebuild_without``).

Scale shape (the c39 posture, corpus side never self-joins): one
positional-gram Arrow pass over train/val, the test split's DISTINCT
gram set on the semi join's build side (broadcast when it fits, a
gram-keyed shuffle when not), bounded ≤8-row explode per matched
window, per-DOC gaps-and-islands window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import read_table
from .dedup_ops import _SQL_TOKS_DEDUP
from .registry import register
from .release_ops import SQL_SPLIT_CASE

_C43_N = 8

_SQL_CONTAM_RUNS = f"""
    WITH base AS (
        SELECT doc_id, {_SQL_TOKS_DEDUP} AS toks,
               {SQL_SPLIT_CASE} AS split
        FROM documents
    ), g AS (
        SELECT doc_id, split, CAST(i AS BIGINT) AS pos,
               array_to_string(toks[i:i+{_C43_N - 1}], ' ') AS gram
        FROM base
        CROSS JOIN UNNEST(range(1, greatest(len(toks) - {_C43_N - 2}, 1))) AS r(i)
        WHERE len(toks) >= {_C43_N}
    ), bg AS (
        SELECT DISTINCT gram FROM g WHERE split = 'test'
    ), cov AS (
        SELECT DISTINCT g.doc_id, g.pos + j AS tokpos
        FROM g SEMI JOIN bg USING (gram)
        CROSS JOIN UNNEST(range({_C43_N})) AS rr(j)
        WHERE g.split <> 'test'
    ), isl AS (
        SELECT doc_id, tokpos,
               tokpos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tokpos) AS grp
        FROM cov
    )
    SELECT doc_id, MIN(tokpos) AS start_pos, MAX(tokpos) AS end_pos,
           CAST(COUNT(*) AS BIGINT) AS run_toks
    FROM isl GROUP BY doc_id, grp
"""


@register(
    "c43_contaminated_runs",
    _SQL_CONTAM_RUNS,
    doc="""Benchmark decontamination at RUN grain (⊕D7 upgraded via
    the c39 machinery, r10 — verdict item 4): per train/val document,
    the maximal token runs covered by an 8-gram occurring in the TEST
    split (the self-contained benchmark, c40's device) —
    (doc_id, start_pos, end_pos, run_toks), 1-based inclusive. The
    c39 window≡substring union argument transfers with the
    duplicated-gram set replaced by the benchmark's gram set. Grams
    travel as 64-bit hashes Spark-side vs string grams in the oracle
    (the d05/D7 collision posture, ~2⁻⁶⁴/pair). Feeds c40's
    contam_tok_share severity column and the
    remove_contaminated_runs rewrite.""",
)
def c43_contaminated_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.dedup import contaminated_runs
    from ..operators.sampling import split_assign

    docs = split_assign(
        read_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return contaminated_runs(
        docs.filter(F.col("split") != "test"),
        docs.filter(F.col("split") == "test"),
        n=_C43_N,
    )
