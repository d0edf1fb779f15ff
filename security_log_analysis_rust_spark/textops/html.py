"""HTML -> text extraction: the first stage of a real Common-Crawl
pipeline, over the input table's ``html:binary`` column.

The engine's other operators consume the provided ``text`` column (the
input contract ships extracted text); this module makes the extraction
itself a first-class, certified operator so a corpus that arrives as raw
HTML runs end-to-end. Trafilatura-lite semantics, expressed ENTIRELY as
JVM column expressions (regexp_replace chains — no UDF, full
whole-stage-codegen on the hot path):

1. drop ``<script>``/``<style>``/``<noscript>`` elements and HTML
   comments (non-greedy, case-insensitive, DOTALL);
2. turn block-closing tags (``</p> </div> </li> </tr> </h1-6>``,
   ``<br>``) into newlines so block structure survives tag stripping;
3. strip remaining tags; decode the common entities (amp/lt/gt/quot/
   #39/nbsp); collapse runs of spaces and 3+ newlines; trim.

Every regex is written in the RE2 ∩ Java-regex common subset (the
``docs_token_bpe`` move), so the DuckDB oracle runs the IDENTICAL
patterns — the extraction is certified byte-exactly, not approximately.

``link_density`` (chars inside ``<a>`` elements / total stripped-text
chars) is the classic boilerplate signal (jusText, Kohlschütter et al.
WSDM'10): navigation-heavy pages score near 1, body text near 0. Same
expression shape on both sides (regexp_extract_all + aggregate).

100 TB shape: a pure per-row map over the page scan — no shuffle, no
Python, composes with the C4/dedup stack downstream exactly where the
provided ``text`` column would have entered.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# element-dropping patterns: RE2 and Java agree on (?is), non-greedy .*?
_DROP_PATTERNS = [
    r"(?is)<script\b[^>]*>.*?</script>",
    r"(?is)<style\b[^>]*>.*?</style>",
    r"(?is)<noscript\b[^>]*>.*?</noscript>",
    r"(?s)<!--.*?-->",
]
_BLOCK_BREAK = r"(?i)<(?:br\s*/?|/p|/div|/li|/tr|/h[1-6]|/ul|/ol|/table|/blockquote|/title)\s*>"
_ANY_TAG = r"(?s)<[^>]*>"
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
]
_ANCHOR = r"(?is)<a\b[^>]*>.*?</a>"


def html_to_text_col(col: Column) -> Column:
    """HTML string column -> extracted plain text (pure expressions)."""
    c = col
    for pat in _DROP_PATTERNS:
        c = F.regexp_replace(c, pat, "")
    c = F.regexp_replace(c, _BLOCK_BREAK, "\n")
    c = F.regexp_replace(c, _ANY_TAG, " ")
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, r"[ \t\r]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    # F.trim strips spaces only; newlines need the regex form
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def link_density_col(col: Column) -> Column:
    """Fraction of extracted-text chars that came from inside <a>
    elements; 0.0 for pages with no text. Rounded to 6 decimals (the
    engine's oracle-pairing convention)."""
    anchor_text = F.aggregate(
        F.transform(
            F.regexp_extract_all(col, F.lit(_ANCHOR), 0),
            lambda x: F.length(html_to_text_col(x)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    total = F.length(html_to_text_col(col)).cast("long")
    return F.round(
        F.when(total > 0, anchor_text.cast("double") / total).otherwise(0.0),
        6,
    )


def extract_text(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """-> (url, extracted_text, link_density): the pipeline's entry
    transform for corpora that arrive as raw HTML. ``html`` may be
    binary (UTF-8 decoded) or string."""
    raw = F.col(html_col)
    dt = dict(pages.dtypes)[html_col]
    if dt == "binary":
        raw = raw.cast("string")  # UTF-8 decode, Spark's binary->string
    return pages.select(
        F.col(url_col),
        html_to_text_col(raw).alias("extracted_text"),
        link_density_col(raw).alias("link_density"),
    )


def extract_text_oracle_sql(
    source_sql: str,
    html_expr: str = "decode(html)",
    url_col: str = "url",
) -> str:
    """Independent DuckDB twin running the IDENTICAL regex chain (every
    pattern is in the RE2 ∩ Java subset)."""

    def chain(expr: str) -> str:
        c = expr
        for pat in _DROP_PATTERNS:
            c = f"regexp_replace({c}, '{pat}', '', 'g')"
        c = f"regexp_replace({c}, '{_BLOCK_BREAK}', chr(10), 'g')"
        c = f"regexp_replace({c}, '{_ANY_TAG}', ' ', 'g')"
        for ent, rep in _ENTITIES:
            r = rep.replace("'", "''")
            c = f"replace({c}, '{ent}', '{r}')"
        c = f"regexp_replace({c}, '[ \\t\\r]+', ' ', 'g')"
        c = f"regexp_replace({c}, ' ?\\n ?', chr(10), 'g')"
        c = f"regexp_replace({c}, '\\n{{3,}}', chr(10)||chr(10), 'g')"
        return f"regexp_replace({c}, '^\\s+|\\s+$', '', 'g')"

    text = chain(html_expr)
    anchor_sum = (
        "coalesce((SELECT sum(length("
        + chain("m.x")
        + f")) FROM unnest(regexp_extract_all({html_expr}, '{_ANCHOR}')) "
        "AS m(x)), 0)"
    )
    return f"""
SELECT {url_col},
       {text} AS extracted_text,
       round(CASE WHEN length({text}) > 0
                  THEN {anchor_sum} * 1.0 / length({text})
                  ELSE 0.0 END, 6) AS link_density
FROM ({source_sql})
"""
