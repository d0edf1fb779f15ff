"""C4-style corpus cleanup with corpus-global line deduplication.

Implements the line-level cleaning rules of the C4 pipeline (Raffel et al.,
"Exploring the Limits of Transfer Learning with a Unified Text-to-Text
Transformer", JMLR 2020, §2.2) as pure DataFrame operators:

* keep only lines ending in a terminal punctuation mark (``.!?"``),
* drop lines with fewer than ``min_words`` words,
* drop lines containing ``{`` (source-code marker) or a policy marker
  substring (default ``lorem ipsum``),
* remove every occurrence of a duplicated line EXCEPT the first, where
  "first" is the corpus-global lexicographic minimum of ``(doc_id,
  line_no)`` — deterministic regardless of partitioning,
* reassemble surviving lines into documents and drop documents left with
  fewer than ``min_lines`` lines.

Scale notes (the 100 TB plan): the whole operator is two exchanges — the
explode and the filters are narrow; the global dedup is ONE
``groupBy(line).agg(min(struct))`` whose map-side partial aggregation
collapses each hot key to one row per map task before the shuffle (the
heaviest keys are exactly the boilerplate lines the operator exists to
delete, so the skew solves itself — no salting needed, see
:func:`dedup_lines_global`); the reassembly shuffles once on ``doc_id``.
No driver-side state, no joins, no windows, no Python.

The log-pipeline variant (``require_terminal_punct=False``) applies the
same global line dedup to raw log pages, where repeated lines are re-sent
syslog records rather than web boilerplate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: characters C4 accepts as a line-terminal punctuation mark
TERMINAL_CHARS = '[.!?"]$'

#: substrings whose presence drops the line (lowercased comparison)
POLICY_MARKERS = ("lorem ipsum",)


def split_lines(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (id_col, line_no, line): one row per newline-delimited line."""
    return docs.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias("line_no", "line"),
    ).withColumn("line_no", F.col("line_no").cast("long"))


def c4_line_filter(
    lines: DataFrame,
    min_words: int = 3,
    require_terminal_punct: bool = True,
    ban_brace: bool = True,
    policy_markers: tuple = POLICY_MARKERS,
) -> DataFrame:
    """Apply the per-line C4 keep rules (no corpus-global state)."""
    line = F.col("line")
    cond = F.lit(True)
    if require_terminal_punct:
        cond = cond & line.rlike(TERMINAL_CHARS)
    if min_words > 0:
        cond = cond & (F.size(F.split(F.trim(line), r"\s+", -1)) >= min_words)
    if ban_brace:
        cond = cond & ~line.contains("{")
    for marker in policy_markers:
        cond = cond & ~F.lower(line).contains(marker.lower())
    return lines.filter(cond)


def dedup_lines_global(lines: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """-> (id_col, line_no, line): the corpus-global first occurrence of
    each distinct line ("first" = minimum ``(id, line_no)`` pair).

    Implemented as ``groupBy(line).agg(min(struct))`` — the aggregation's
    OUTPUT is exactly the kept set, so no window and no join-back exist,
    and ``min`` is associative so map-side partial aggregation collapses a
    hot line's occurrences to one row PER MAP TASK before the shuffle.
    Boilerplate lines — the skewed keys by construction, since they are
    the most-duplicated — therefore cost O(map tasks), not O(occurrences),
    on the reduce side. (A window ``min(struct) OVER (PARTITION BY line)``
    computes the same answer but ships every duplicate row to its line's
    reducer: measured 2.2x-at-4-cores scaling on a 98%-duplicate corpus
    vs near-linear for this formulation.)
    """
    occ = F.struct(F.col(id_col).alias("i"), F.col("line_no").alias("p"))
    return (
        lines.groupBy("line")
        .agg(F.min(occ).alias("_first"))
        .select(
            F.col("_first.i").alias(id_col),
            F.col("_first.p").alias("line_no"),
            "line",
        )
    )


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
    min_lines: int = 3,
    require_terminal_punct: bool = True,
    ban_brace: bool = True,
    policy_markers: tuple = POLICY_MARKERS,
) -> DataFrame:
    """-> (id_col, text, n_lines): cleaned corpus.

    ``text`` is the surviving lines re-joined with ``\\n`` in original
    order; documents with fewer than ``min_lines`` surviving lines are
    dropped. Deterministic for a given corpus regardless of partitioning.
    """
    lines = c4_line_filter(
        split_lines(docs, id_col, text_col),
        min_words=min_words,
        require_terminal_punct=require_terminal_punct,
        ban_brace=ban_brace,
        policy_markers=policy_markers,
    )
    kept = dedup_lines_global(lines, id_col)
    ordered = F.array_sort(F.collect_list(F.struct("line_no", "line")))
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(ordered, lambda s: s["line"]), "\n"
            ).alias(text_col),
            F.count("*").alias("n_lines"),
        )
        .filter(F.col("n_lines") >= min_lines)
    )


def c4_clean_oracle_sql(
    source_sql: str,
    id_col: str = "doc_id",
    min_words: int = 3,
    min_lines: int = 3,
    require_terminal_punct: bool = True,
    ban_brace: bool = True,
    policy_markers: tuple = POLICY_MARKERS,
) -> str:
    """Independent DuckDB twin of :func:`c4_clean` over ``source_sql``
    (a relation exposing ``(id_col, text)``)."""
    preds = []
    if require_terminal_punct:
        preds.append("regexp_matches(line, '[.!?\"]$')")
    if min_words > 0:
        preds.append(
            f"len(string_split_regex(trim(line), '\\s+')) >= {min_words}"
        )
    if ban_brace:
        preds.append("NOT contains(line, '{')")
    for marker in policy_markers:
        preds.append(f"NOT contains(lower(line), '{marker.lower()}')")
    where = " AND ".join(preds) if preds else "TRUE"
    return f"""
WITH src AS ({source_sql}),
lines AS (
  SELECT {id_col}, CAST(generate_subscripts(ls, 1) - 1 AS BIGINT) AS line_no,
         unnest(ls) AS line
  FROM (SELECT {id_col}, string_split(text, chr(10)) AS ls FROM src)
),
filtered AS (SELECT * FROM lines WHERE {where}),
firsts AS (
  SELECT *, row_number() OVER (PARTITION BY line ORDER BY {id_col}, line_no) AS rn
  FROM filtered
)
SELECT {id_col}, string_agg(line, chr(10) ORDER BY line_no) AS text,
       CAST(count(*) AS BIGINT) AS n_lines
FROM firsts WHERE rn = 1
GROUP BY {id_col} HAVING count(*) >= {min_lines}
"""
