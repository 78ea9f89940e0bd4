"""Web-text cleaning: C4-style line filtering and HTML boilerplate
stripping — the extraction stage that sits between a raw crawl and
every downstream dedup/quality operator in this engine.

Both operators are pure Catalyst column expressions (zero shuffle,
zero Python): they run inside whole-stage codegen at the scan, so at
100 TB the cleaning pass costs exactly one read of the corpus and
pipelines into whatever consumes it (no materialization barrier).

Reference scope note: the reference (romnn/postgresimporter) is an
ingest orchestrator with no text analytics; this module is net-new
engine surface for the LLM-corpus north star.

Semantics:

- ``filter_lines`` applies the C4 line rules (Raffel et al. 2020,
  "Exploring the Limits of Transfer Learning", §2.2): a line survives
  iff it ends in terminal punctuation, has at least ``min_words``
  words, and contains none of the blocklisted phrases (lowercased
  match) or curly braces (the "code" heuristic). The document is
  rebuilt from surviving lines in order.
- ``strip_html`` recovers visible text from HTML: drops <script>/
  <style> element CONTENT (their text must not leak into the corpus),
  strips all remaining tags, decodes the six entities that dominate
  real pages (&amp; &lt; &gt; &quot; &#39; &nbsp;), and collapses
  whitespace. Entity decode order matters: &amp; is decoded LAST so
  double-escaped text (&amp;lt;) yields the literal "&lt;" rather
  than "<", matching html.unescape's single-pass semantics for this
  entity set.

Every rule is mirrored verbatim in the DuckDB oracles of q150/q151
(plans/catalog_batch23.py) — the operators are differentially tested
end-to-end, not unit-tested in isolation only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# C4's bad-phrase list (lowercase substring match). "javascript" is the
# "enable javascript" boilerplate rule; "lorem ipsum" the placeholder
# rule; "cookie" the consent-banner rule.
DEFAULT_BAD_PHRASES = ("javascript", "lorem ipsum", "cookie policy")

TERMINAL_PUNCT_RX = '[.!?"]$'


def line_word_count(line: Column) -> Column:
    """Whitespace word count; blank lines count 0."""
    return F.size(
        F.filter(F.split(F.trim(line), r"\s+"), lambda t: t != F.lit(""))
    )


def line_passes(
    line: Column,
    min_words: int = 5,
    bad_phrases: tuple[str, ...] = DEFAULT_BAD_PHRASES,
) -> Column:
    """C4 line predicate (see module docstring)."""
    ok = line.rlike(TERMINAL_PUNCT_RX)
    ok = ok & (line_word_count(line) >= F.lit(min_words))
    ok = ok & ~line.contains(F.lit("{")) & ~line.contains(F.lit("}"))
    low = F.lower(line)
    for p in bad_phrases:
        ok = ok & ~low.contains(F.lit(p))
    return ok


def filter_lines(
    lines: Column,
    min_words: int = 5,
    bad_phrases: tuple[str, ...] = DEFAULT_BAD_PHRASES,
) -> Column:
    """Filter an array<string> of lines by the C4 rules."""
    return F.filter(
        lines, lambda l: line_passes(l, min_words, bad_phrases)
    )


def rebuild(lines: Column, sep: str = "\n") -> Column:
    return F.array_join(lines, sep)


_ENTITIES = (
    # decoded before &amp; so "&amp;lt;" -> "&lt;" (not "<")
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_html(html: Column) -> Column:
    """Visible text from HTML markup (see module docstring).

    Regex notes: the container rules use non-greedy ``.*?`` so
    back-to-back <script> blocks don't merge; both Java regex (Spark)
    and RE2 (DuckDB) support this identically for patterns without
    backreferences. Tags strip to a SPACE (not empty) so
    ``</td><td>``-adjacent words don't fuse; the final whitespace
    collapse normalizes the damage.
    """
    t = F.regexp_replace(html, "(?i)<script.*?</script>", " ")
    t = F.regexp_replace(t, "(?i)<style.*?</style>", " ")
    t = F.regexp_replace(t, "<[^>]*>", " ")
    for src, dst in _ENTITIES:
        t = F.replace(t, F.lit(src), F.lit(dst))
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)
