"""Redirect-chain resolution over the pages table (SURVEY gap item;
MaxRedirects, Backend/Crawler.cs:635-647; final-URL re-scope check,
Crawler.cs:1585-1597).

The pages-table model represents an HTTP redirect as a ``redirect_to``
column (the Location header): a row with it set serves no content — the
crawler lands on the chain's terminal row, exactly as HttpWebRequest's
automatic redirection does in the reference.

Chain structure is a static property of the pages table, so resolution runs
ONCE per crawl, not per round: an iterative bounded join over ONLY the
redirect rows (a tiny fraction of any real corpus) produces
``(url, final_url, hops, exceeded)``, and ``effective_pages`` re-attaches
the terminal row's html so the per-round fetch join stays a single
broadcast/hash join on ``url`` with zero added per-round cost.

Scale notes: each iteration shuffles only the still-unresolved redirect
rows (strictly shrinking; uniform url keys); lineage is cut every few hops;
the loop exits early as soon as every chain terminates — real-web chains
are 1-3 hops, so the cap of ``max_redirects`` iterations is never reached.
Cycles never terminate and fall out as ``exceeded`` (the reference's
WebException on exceeding MaximumAutomaticRedirections).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .ckpt import cut


def resolve_redirects(
    pages: DataFrame, max_redirects: int = 20, reliable: bool = False
) -> DataFrame:
    """(url, final_url, hops, exceeded) for every row with redirect_to set.

    ``final_url`` is where the chain lands after at most ``max_redirects``
    hops; ``exceeded`` marks chains still pointing at a redirect row after
    the cap (including cycles).
    """
    edges = pages.filter(F.col("redirect_to").isNotNull()).select(
        "url", "redirect_to"
    )
    m = edges.select(
        F.col("url").alias("__m_url"), F.col("redirect_to").alias("__m_next")
    )
    state = edges.select(
        "url", F.col("redirect_to").alias("cur"), F.lit(1).cast("int").alias("hops")
    )
    # the initial state is already one hop in, so max_redirects - 1 more
    # iterations reach exactly the cap; anything still pointing at a
    # redirect row afterwards has > max_redirects hops
    for i in range(max_redirects - 1):
        stepped = (
            state.join(m, state["cur"] == m["__m_url"], "left")
            .select(
                "url",
                F.coalesce("__m_next", "cur").alias("cur"),
                (F.col("hops") + F.when(F.col("__m_next").isNotNull(), 1).otherwise(0))
                .cast("int").alias("hops"),
                F.col("__m_next").isNotNull().alias("__advanced"),
            )
        )
        if (i + 1) % 4 == 0 or i == max_redirects - 2:
            stepped = cut(stepped, reliable)
            if stepped.filter("__advanced").isEmpty():
                state = stepped.drop("__advanced")
                break
        state = stepped.drop("__advanced")
    # still pointing at a redirect row after the cap → exceeded
    return (
        state.join(
            m.select(F.col("__m_url").alias("cur"), F.lit(True).alias("__is_redir")),
            "cur", "left",
        )
        .select(
            "url",
            F.col("cur").alias("final_url"),
            "hops",
            F.coalesce("__is_redir", F.lit(False)).alias("exceeded"),
        )
    )


def effective_pages(
    pages: DataFrame, max_redirects: int = 20, reliable: bool = False
) -> DataFrame:
    """Fetch-ready view:
    (url, html, http_status, server_mime, final_url, exceeded,
    final_present).

    - no-redirect rows: their own html/status/mime, final_url NULL,
      final_present true.
    - redirect rows: the TERMINAL row's html/status/mime; final_present
      false when the chain lands on a url absent from the table (the
      reference's 404 at the redirected location).

    ``http_status`` (optional column; NULL = 200 OK) carries protocol
    errors into the IsFatalError routing (kernels/errors.py).
    ``mime`` (optional column; the server's Content-Type header) drives the
    decode stage's second-chance re-type (GetMimeType prefers the response
    header over the extension guess, Crawler.cs:2100-2119) — surfaced here
    as ``server_mime``, from the response-serving (terminal) row.

    If the table has none of the optional columns this is a plain
    projection — the machinery costs nothing when unused.
    """
    status = (
        F.col("http_status").cast("int")
        if "http_status" in pages.columns
        else F.lit(None).cast("int")
    )
    smime = (
        F.col("mime").cast("string")
        if "mime" in pages.columns
        else F.lit(None).cast("string")
    )
    if "redirect_to" not in pages.columns:
        return pages.select(
            "url", "html",
            status.alias("http_status"),
            smime.alias("server_mime"),
            F.lit(None).cast("string").alias("final_url"),
            F.lit(False).alias("exceeded"),
            F.lit(True).alias("final_present"),
        )
    plain = pages.filter(F.col("redirect_to").isNull()).select(
        "url", "html",
        status.alias("http_status"),
        smime.alias("server_mime"),
        F.lit(None).cast("string").alias("final_url"),
        F.lit(False).alias("exceeded"),
        F.lit(True).alias("final_present"),
    )
    res = resolve_redirects(pages, max_redirects, reliable)
    # presence = the terminal ROW exists (its html may still be NULL — a
    # retryable failure at the redirected location, same as a direct fetch)
    targets = pages.filter(F.col("redirect_to").isNull()).select(
        F.col("url").alias("final_url"),
        F.col("html").alias("__f_html"),
        status.alias("__f_status"),
        smime.alias("__f_mime"),
        F.lit(True).alias("__f_present"),
    )
    redirected = res.join(targets, "final_url", "left").select(
        "url",
        F.col("__f_html").alias("html"),
        F.col("__f_status").alias("http_status"),
        F.col("__f_mime").alias("server_mime"),
        "final_url",
        "exceeded",
        F.coalesce("__f_present", F.lit(False)).alias("final_present"),
    )
    return plain.unionByName(redirected)
