"""Registrable-domain extraction with Public-Suffix-List semantics.

Every real crawler groups hosts by their REGISTRABLE domain (eTLD+1) —
politeness budgets, spam rollups, and per-site quotas all key on it,
because ``a.blogspot.example`` and ``b.blogspot.example`` are different
*sites* while ``www.shop.example`` and ``cdn.shop.example`` are one. The
grouping rule is the publicsuffix.org algorithm over a rules table:

- a rule is a dot-separated label sequence; ``*`` as the LEFTMOST label
  matches exactly one host label; a leading ``!`` marks an exception;
- a rule matches a host when the host's right-most labels equal the
  rule's labels (``*`` matching any single label);
- the prevailing rule is the matching exception rule if any, else the
  matching rule with the most labels, else the implicit ``*`` rule
  (the bare TLD is a public suffix);
- public suffix = the host labels the prevailing rule matched (for an
  exception rule, the rule minus its leftmost label); registrable
  domain = the public suffix plus one more host label, NULL when the
  host IS a public suffix.

Reference analog: the reference keys politeness on the raw host
(Crawler.cs per-server connection budgets); this operator is the
corpus-scale refinement production crawlers layer on top, driven by a
rules TABLE so the list ships as data, not code. Hosts are assumed
already lowercased/IDNA-normalized (kernels/urlnorm does both).

100-TB shape: each host explodes into ≤ label-count suffix candidates
plus their single-``*`` variants — a bounded ~10-way fan-out in ONE
codegen projection — which join the rules table on the uniform ``key``
column. A real PSL (~10k rows) broadcasts via AQE, but nothing assumes
it: a million-rule private registry shuffles uniformly. The per-host
winner is a min-struct aggregate (exception beats all, then most
labels), never a window over hosts. Zero Python, zero UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _labels(col: str) -> str:
    return f"split({col}, '[.]')"


def rule_index(rules: DataFrame) -> DataFrame:
    """(key, rule, is_exc, n_labels) — the join-ready rule table: ``key``
    is the rule body (``!`` stripped), kept verbatim for ``*.`` rules
    (hosts generate the wildcard key on their side)."""
    body = "regexp_replace(rule, '^!', '')"
    return rules.select(
        F.expr(body).alias("key"),
        F.col("rule"),
        F.col("rule").startswith("!").alias("is_exc"),
        F.size(F.expr(_labels(body))).alias("n_labels"),
    )


def registrable_domains(
    hosts: DataFrame, rules: DataFrame, host_col: str = "host"
) -> DataFrame:
    """(host, public_suffix, registrable_domain, matched_rule, is_exception)
    per DISTINCT input host under PSL semantics.

    ``matched_rule`` is the prevailing rule as written in the rules table
    (``!``/``*.`` included), NULL when only the implicit ``*`` rule
    matched. ``registrable_domain`` is NULL when the host is itself a
    public suffix.
    """
    base = hosts.select(F.col(host_col).alias("host")).distinct()
    ls = _labels("host")
    # every suffix of the host, plus (for ≥2-label suffixes) the variant
    # with the leftmost label replaced by '*' — the only key shapes a
    # single-leftmost-* rule grammar can match
    cand = base.select(
        "host",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, size({ls})), i -> "
                f"if(i < size({ls}), "
                f"array(array_join(slice({ls}, i, size({ls}) - i + 1), '.'), "
                f"'*.' || array_join(slice({ls}, i + 1, size({ls}) - i), '.')), "
                f"array(array_join(slice({ls}, i, size({ls}) - i + 1), '.')))))"
            )
        ).alias("key"),
    )
    win = (
        cand.join(rule_index(rules), "key")
        .groupBy("host")
        .agg(
            F.min(
                F.struct(
                    (~F.col("is_exc")).cast("int").alias("exc_first"),
                    (-F.col("n_labels")).alias("neg_n"),
                    F.col("rule").alias("rule"),
                    F.col("is_exc").alias("is_exc"),
                )
            ).alias("m")
        )
    )
    j = base.join(win, "host", "left")
    n_host = F.size(F.expr(ls))
    # matched public-suffix label count: exception rule → rule labels - 1,
    # normal rule → rule labels, no rule → the implicit * (1 label)
    n_ps = F.when(F.col("m").isNull(), F.lit(1)).otherwise(
        F.size(F.expr(_labels("regexp_replace(m.rule, '^!', '')")))
        - F.col("m.is_exc").cast("int")
    )
    ps = F.expr(
        f"array_join(slice({ls}, size({ls}) - __nps + 1, __nps), '.')"
    )
    reg = F.when(
        n_host > F.col("__nps"),
        F.expr(
            f"array_join(slice({ls}, size({ls}) - __nps, __nps + 1), '.')"
        ),
    )
    return (
        j.withColumn("__nps", n_ps)
        .select(
            "host",
            ps.alias("public_suffix"),
            reg.alias("registrable_domain"),
            F.col("m.rule").alias("matched_rule"),
            F.coalesce(F.col("m.is_exc"), F.lit(False)).alias("is_exception"),
        )
    )


def domain_rollup(
    urls: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """(registrable_domain, n_hosts, n_urls) — the politeness-grouping
    rollup: URLs bucketed by the site that actually owns them. Hosts that
    ARE public suffixes group under their own name (a crawler still needs
    a budget row for them).

    100-TB shape: host extraction is map-side; the PSL pass runs on the
    DISTINCT host table (tiny vs the URL corpus); the per-domain count
    joins the domain map back on the uniform host key and aggregates with
    map-side partial combine — a mega-site collapses before its exchange.
    """
    from webcrawl_spark.operators.blocklist import HOST_RE

    base = urls.select(
        F.col(url_col).alias("url"),
        F.regexp_extract(F.col(url_col), HOST_RE, 1).alias("host"),
    )
    dom = registrable_domains(base.select("host"), rules).select(
        "host", F.coalesce("registrable_domain", "host").alias("rdomain")
    )
    return (
        base.join(dom, "host")
        .groupBy("rdomain")
        .agg(
            F.countDistinct("host").cast("long").alias("n_hosts"),
            F.count(F.lit(1)).cast("long").alias("n_urls"),
        )
        .select(F.col("rdomain").alias("registrable_domain"), "n_hosts", "n_urls")
    )
