"""Hand-computed + property tests for the three quality-selection
operators: the hashed linear classifier (functions/textstats.
hash_classifier_score), DSIR importance weights (textstats.dsir_weights),
and SemDeDup (operators/similarity.semdedup)."""

import hashlib
import math
import re

from webcrawl_spark.functions import textstats as TS
from webcrawl_spark.operators import similarity as SIM

SF = "/root/testdata/sf0.001"


def _h32(s: str) -> int:
    """Python replica of the engine's HASH32 md5 prefix."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _rnd(x: float) -> int:
    """Spark F.round = HALF_UP (away from zero)."""
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.strip().lower()) if t]


def test_hash_classifier_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "The  Quick BROWN fox"), (2, "the the THE"), (3, "  solo  ")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in TS.hash_classifier_score(docs).collect()}
    for did, text in [(1, "The  Quick BROWN fox"), (2, "the the THE"),
                      (3, "  solo  ")]:
        toks = _toks(text)
        half = (TS.CLS_W_SPAN - 1) // 2
        score = sum(
            _h32(f"{TS.CLS_W_TAG}{_h32(t) % TS.CLS_BUCKETS}") % TS.CLS_W_SPAN
            - half
            for t in toks
        )
        assert got[did].n_tokens == len(toks)
        assert got[did].score == score, (did, got[did].score, score)
        assert got[did].label == (score > 0)


def _dsir_expected(corpus: dict[int, str], k: int):
    """Full Python replay of dsir_weights on a tiny corpus."""
    stop = set(TS.LANG_STOPWORDS["en"])
    tgt_ids = {
        i
        for i, t in corpus.items()
        if len(re.split(r"\s+", t.strip())) >= TS.DSIR_TGT_MIN_WORDS
        and sum(1 for w in _toks(t) if w in stop) >= TS.DSIR_TGT_MIN_STOP
    }
    cr = [0] * TS.DSIR_BUCKETS
    ct = [0] * TS.DSIR_BUCKETS
    for i, t in corpus.items():
        for w in _toks(t):
            b = _h32(w) % TS.DSIR_BUCKETS
            cr[b] += 1
            if i in tgt_ids:
                ct[b] += 1
    tr = sum(cr) + TS.DSIR_BUCKETS
    tt = sum(ct) + TS.DSIR_BUCKETS
    lam = [
        _rnd(math.log((ct[b] + 1) / tt) * 1e6)
        - _rnd(math.log((cr[b] + 1) / tr) * 1e6)
        for b in range(TS.DSIR_BUCKETS)
    ]
    per_doc = {
        i: (
            len(_toks(t)),
            sum(lam[_h32(w) % TS.DSIR_BUCKETS] for w in _toks(t)),
        )
        for i, t in corpus.items()
    }
    order = sorted(per_doc, key=lambda i: (-per_doc[i][1], i))[:k]
    return {i: per_doc[i] for i in order}


def test_dsir_weights_hand_computed(spark):
    filler = " ".join(f"tok{j}" for j in range(28))
    corpus = {
        # two target docs (>=30 words, >=2 stopword hits)
        1: f"the quick fox and {filler} runs",
        2: f"of the {filler} lazy dog sits",
        # short / no-stopword docs: raw-only mass
        3: "quick brown fox jumps",
        4: "alpha beta gamma delta epsilon",
        5: "the and of to in",
    }
    docs = spark.createDataFrame(
        sorted(corpus.items()), ["doc_id", "text"]
    )
    k = 3
    got = {
        r.doc_id: (r.n_tokens, r.dsir_micronat)
        for r in TS.dsir_weights(docs, k=k).collect()
    }
    assert got == _dsir_expected(corpus, k)


def test_dsir_topk_deterministic_and_sorted(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = TS.dsir_weights(docs, k=20).collect()
    b = TS.dsir_weights(docs, k=20).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    ws = [r.dsir_micronat for r in a]
    assert ws == sorted(ws, reverse=True)
    assert len(a) == 20


def test_semdedup_loser_rule_consistent(spark):
    """Every (a, b) candidate pair over tau must have its higher-
    (cent_cos, id) member dropped; every dropped id must be the loser of
    at least one pair; output is deterministic and one row per vector."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = SIM.semdedup(emb, cache_key=("test-semdedup", SF)).collect()
    out2 = SIM.semdedup(emb, cache_key=("test-semdedup", SF)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    n = emb.count()
    assert len(out) == n and len({r.vec_id for r in out}) == n

    cs = {r.vec_id: (r.cent_cos, r.vec_id) for r in out}
    kept = {r.vec_id for r in out if r.kept}
    dropped = {r.vec_id for r in out if not r.kept}
    pairs = [
        (r.a, r.b)
        for r in SIM.neardup_pairs_bucketed(
            emb, threshold=SIM.SEMDEDUP_TAU, probes=1
        ).collect()
    ]
    assert pairs, "tiny fixture should produce candidate pairs over tau"
    losers = {max(a, b, key=lambda i: cs[i]) for a, b in pairs}
    assert losers == dropped
    assert kept == set(cs) - losers


def test_selection_ops_degenerate_inputs(spark):
    """Empty corpora yield empty results (never a crash); NULL-text rows
    contribute no tokens to the classifier; a single-char corpus learns
    zero merges but still encodes."""
    from webcrawl_spark.operators import bpe as B

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert B.bpe_learn(empty).count() == 0
    assert B.bpe_encode_stats(empty).count() == 0
    assert TS.hash_classifier_score(empty).count() == 0
    assert TS.dsir_weights(empty).count() == 0

    one = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    assert B.bpe_learn(one).count() == 0  # no adjacent pair exists
    e = B.bpe_encode_stats(one).collect()
    assert [(r.doc_id, r.n_words, r.n_chars, r.n_subwords) for r in e] == [
        (1, 1, 1, 1)
    ]

    nulls = spark.createDataFrame(
        [(1, None), (2, "x y")], "doc_id long, text string"
    )
    got = {r.doc_id: r.n_tokens for r in TS.hash_classifier_score(nulls).collect()}
    assert got == {2: 2}  # NULL-text row contributes nothing

    # pairs exhaust before n_merges: remaining iterations must be no-ops
    # (the vocabulary survives; earlier merges are kept)
    tiny = spark.createDataFrame([(1, "ab ab ab")], "doc_id long, text string")
    m = B.bpe_learn(tiny).collect()
    assert [(r.rank, r.merged, r.pair_count) for r in m] == [(1, "ab", 3)]
    e2 = B.bpe_encode_stats(tiny).collect()
    assert [(r.doc_id, r.n_words, r.n_chars, r.n_subwords) for r in e2] == [
        (1, 3, 6, 3)
    ]
