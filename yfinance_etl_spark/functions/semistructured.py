"""Semi-structured (JSON) column path — SURVEY.md §2.8 F9 + F10.

The reference parses JSON produced by LLM/news responses constantly
(fund_comp2.py:144-150 and its four twins; streamlit_app.py:468-476): it
slices the substring between the first '{' and the last '}', ``json.loads``
it, and falls back to a default dict on failure. The Spark-first equivalent
is pure Catalyst: ``regexp_extract`` for the slice (F10 text cleanup),
``from_json`` with an explicit schema for the parse (PERMISSIVE null-on-
malformed, which IS the try/except fallback), and per-field ``coalesce``
for defaults. No Python in the loop; the whole path stays inside
whole-stage codegen and scales linearly with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: default schema of the ``events.props`` payload (TESTDATA.md)
PROPS_SCHEMA = "k INT"


def extract_json_object(c: Column | str) -> Column:
    """F10: pull the first-'{' .. last-'}' substring out of free text —
    the reference's ``raw[raw.find('{'):raw.rfind('}')+1]``
    (fund_comp2.py:144-147) as one greedy regexp. ``(?s)`` so ``.``
    crosses newlines: the reference slice spans them, and
    pretty-printed/LLM JSON is routinely multiline — without the flag
    every such object silently extracted as '' and parsed to the
    fallback default."""
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_extract(c, r"(?s)(\{.*\})", 1)


def parse_json(c: Column | str, schema: str = PROPS_SCHEMA) -> Column:
    """F9: schema-ed JSON parse with the reference's fallback semantics.

    ``from_json`` is PERMISSIVE by default: malformed input or a missing
    object yields a null struct / null fields rather than an error — the
    declarative form of fund_comp2.py:148-150's ``except: return default``.
    Callers apply ``coalesce_default`` per field for non-null defaults.
    """
    return F.from_json(extract_json_object(c), schema)


def json_field(c: Column | str, path: str) -> Column:
    """Single-field JSON extraction (``get_json_object``) for when a full
    schema parse is overkill — returns string, caller casts."""
    c = F.col(c) if isinstance(c, str) else c
    return F.get_json_object(c, path)
