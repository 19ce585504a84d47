"""Plain-Python spec replays for the session-14 kernels: the engine's
answers over a few hundred seeded pseudo-random cases must equal an
INDEPENDENT Python implementation of the published algorithm (the
link_pagerank/host_rank spec-test pattern — one Spark job per suite,
not one per example)."""

import hashlib
import random

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# PSL registrable domains vs a direct publicsuffix.org-algorithm replay
# ---------------------------------------------------------------------------

PSL_RULES = ["com", "net", "co.com", "*.cdn.com", "!core.cdn.com",
             "x.y.net", "*.wild.net"]


def _py_psl(host: str):
    best = None  # (is_exc, n_labels, rule)
    hl = host.split(".")
    for rule in PSL_RULES:
        is_exc = rule.startswith("!")
        rl = rule.lstrip("!").split(".")
        if len(rl) > len(hl):
            continue
        if all(r == "*" or r == h for r, h in zip(rl, hl[-len(rl):])):
            key = (0 if is_exc else 1, -len(rl), rule)
            if best is None or key < best[0]:
                best = (key, is_exc, rl, rule)
    if best is None:
        ps_n, rule, is_exc = 1, None, False
    else:
        _, is_exc, rl, rule = best
        ps_n = len(rl) - 1 if is_exc else len(rl)
    ps = ".".join(hl[-ps_n:])
    reg = ".".join(hl[-(ps_n + 1):]) if len(hl) > ps_n else None
    return ps, reg, rule, is_exc


def test_psl_spec_replay(spark):
    from webcrawl_spark.operators.psl import registrable_domains

    rng = random.Random(77)
    labels = ["a", "b", "core", "cdn", "wild", "x", "y", "zz"]
    tlds = ["com", "net", "org"]
    hosts = sorted({
        ".".join(
            [rng.choice(labels) for _ in range(rng.randrange(0, 4))]
            + [rng.choice(labels + tlds)]
            + [rng.choice(tlds)]
        )
        for _ in range(300)
    })
    h = spark.createDataFrame([(x,) for x in hosts], "host string")
    r = spark.createDataFrame([(x,) for x in PSL_RULES], "rule string")
    got = {
        row.host: (row.public_suffix, row.registrable_domain,
                   row.matched_rule, row.is_exception)
        for row in registrable_domains(h, r).collect()
    }
    for host in hosts:
        assert got[host] == _py_psl(host), host


# ---------------------------------------------------------------------------
# CDC segmentation vs a direct boundary-rule replay
# ---------------------------------------------------------------------------

def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_cdc(text: str, mod: int):
    words = [w for w in text.strip().split() if w]
    if not words:
        return []
    starts = sorted({1} | {
        i + 1 for i, w in enumerate(words) if _h32(w) % mod == 0
    })
    segs = []
    for k, s in enumerate(starts):
        e = (starts[k + 1] - 1) if k + 1 < len(starts) else len(words)
        segs.append((s, e - s + 1, " ".join(words[s - 1:e])))
    return segs


def test_cdc_spec_replay(spark):
    from webcrawl_spark.operators.textdedup import cdc_segments

    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(40)] + ["the", "and", "of"]
    docs = [
        (i, " ".join(rng.choice(vocab)
                     for _ in range(rng.randrange(1, 40))))
        for i in range(200)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in cdc_segments(df, mod=8).collect():
        got.setdefault(r.id, []).append(
            (r.seg_idx, r.start_word, r.n_words, r.seg_digest)
        )
    for i, text in docs:
        expect = _py_cdc(text, 8)
        rows = sorted(got.get(i, []))
        assert len(rows) == len(expect), (i, text)
        for (idx, start, n, dig), (s, n2, seg_text) in zip(rows, expect):
            assert (start, n) == (s, n2), (i, text)
            assert dig == hashlib.md5(seg_text.encode()).hexdigest()


# ---------------------------------------------------------------------------
# Unigram Viterbi vs a direct DP replay (same packing-order tie-break)
# ---------------------------------------------------------------------------

def _py_viterbi(word: str, lp: dict, maxp: int = 6, big: int = 10**9):
    n = len(word)
    dp = [(0, 0, 0)]  # (cost, n_pieces, back)
    for i in range(1, n + 1):
        best = None
        for j in range(max(1, i - maxp + 1), i + 1):
            piece = word[j - 1:i]
            cost = dp[j - 1][0] + (-lp[piece] if piece in lp else big)
            cand = (cost, dp[j - 1][1] + 1, j - 1)
            if best is None or cand < best:
                best = cand
        dp.append(best)
    pieces = []
    pos = n
    while pos > 0:
        back = dp[pos][2]
        pieces.append(word[back:pos])
        pos = back
    return dp[n][0], dp[n][1], sorted(pieces)


def test_viterbi_spec_replay(spark):
    from webcrawl_spark.operators import sptok as SP

    rng = random.Random(5)
    alpha = "abcd"
    words = sorted({
        "".join(rng.choice(alpha) for _ in range(rng.randrange(1, 12)))
        for _ in range(150)
    })
    vocab_rows = []
    seen = set()
    for w in words:
        for _ in range(3):
            i = rng.randrange(len(w))
            l = rng.randrange(1, min(6, len(w) - i) + 1)
            piece = w[i:i + l]
            if piece not in seen:
                seen.add(piece)
                vocab_rows.append((piece, -rng.randrange(50, 5000)))
    for ch in alpha:  # coverage
        if ch not in seen:
            vocab_rows.append((ch, -9000))
            seen.add(ch)
    lp = dict(vocab_rows)
    wdf = spark.createDataFrame([(w, 1) for w in words], "word string, freq long")
    vdf = spark.createDataFrame(vocab_rows, "piece string, lp long")
    got = {
        r.word: (r.best_cost, r.n_pieces, sorted(r.pieces))
        for r in SP.viterbi_segment(wdf, vdf).collect()
    }
    for w in words:
        assert got[w] == _py_viterbi(w, lp), w
