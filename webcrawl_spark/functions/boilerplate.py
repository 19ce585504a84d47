"""Main-content extraction from HTML — the JusText / readability-style
block heuristic (Kohlschütter et al. 2010 boilerplate detection, reduced
to its two strongest deterministic signals): split the page into
block-level chunks, keep a block iff it has enough words AND a low enough
link-text density. The reference crawler stores pages and extracts LINKS
(Backend/Crawler.cs:1878-1921) but never separates content from chrome;
this module is the corpus-side step a training pipeline runs on the
stored HTML before any text filter.

Pure ``pyspark.sql.functions`` higher-order expressions — the block
split, per-block tag strip, word/link-word counts, and the keep filter
all run inside whole-stage codegen. All patterns are RE2-safe (non-greedy
spans, no lookaround) so the DuckDB oracle replays the SAME constants;
all derived stats are integer (permille link density), so any engine is
bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BP_MIN_WORDS = 5            # a content block has at least this many words
BP_MAX_LINK_PERMILLE = 500  # and at most this share of words inside <a>

BP_SCRIPT_RE = "(?is)<script\\b.*?</script>"
BP_STYLE_RE = "(?is)<style\\b.*?</style>"
BP_BLOCK_SPLIT_RE = "(?i)<(?:/p|/div|/li|/td|/h[1-6]|br[^>]*)>"
BP_TAG_RE = "<[^>]+>"
BP_ANCHOR_BODY_RE = "(?is)<a\\b[^>]*>(.*?)</a>"


def _txt(block):
    """Visible text of a raw block: strip tags, collapse whitespace."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(block, BP_TAG_RE, " "), r"\s+", " "
        )
    )


def _words(block):
    t = _txt(block)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, " ")))


def _link_words(block):
    joined = F.array_join(
        F.regexp_extract_all(block, F.lit(BP_ANCHOR_BODY_RE), F.lit(1)), " "
    )
    t = F.trim(F.regexp_replace(F.regexp_replace(joined, BP_TAG_RE, " "), r"\s+", " "))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, " ")))


def strip_boilerplate(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """``(url, n_blocks, blocks_kept, text_main)``: script/style removed,
    the page split at block-level closing tags, and each block kept iff
    it has ≥ BP_MIN_WORDS words and ≤ BP_MAX_LINK_PERMILLE of them inside
    anchors; ``text_main`` is the newline-join of kept blocks' visible
    text, ``n_blocks`` counts visibly non-empty blocks.

    100-TB shape: ZERO exchanges — one map-side projection per page; the
    block array never explodes, so no row amplification either.
    """
    cleaned = F.regexp_replace(
        F.regexp_replace(F.col(html_col), BP_SCRIPT_RE, " "),
        BP_STYLE_RE,
        " ",
    )
    blocks = F.split(cleaned, BP_BLOCK_SPLIT_RE)

    def keep(b):
        lw = _link_words(b)
        w = _words(b)
        permille = F.floor(lw * 1000 / F.greatest(w, F.lit(1))).cast("long")
        return (w >= BP_MIN_WORDS) & (permille <= BP_MAX_LINK_PERMILLE)

    kept = F.filter(blocks, keep)
    visible = F.filter(blocks, lambda b: _txt(b) != "")
    return pages.select(
        F.col(url_col).alias("url"),
        F.size(visible).cast("long").alias("n_blocks"),
        F.size(kept).cast("long").alias("blocks_kept"),
        F.array_join(F.transform(kept, _txt), "\n").alias("text_main"),
    )
