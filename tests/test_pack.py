"""pack_sequences (operators/seq.py): next-fit semantics hand-replayed,
partitioning invariance, and the one-exchange JVM-only plan guard."""

import io
import contextlib

import pyspark.sql.functions as F

from webcrawl_spark.operators.seq import pack_sequences

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r.shard, r.bin, r.pos, r.doc_id, r.n_tokens) for r in df.collect()
    )


def test_next_fit_hand_replay(spark):
    # one shard; capacity 6; token counts 3,5,1,0,12,2 (TOKEN_RE words)
    df = spark.createDataFrame(
        [
            (0, "a b c"),
            (8, "d e f g h"),
            (16, "x"),
            (24, ""),
            (32, "one two three four five six seven eight nine ten eleven twelve"),
            (40, "k l"),
        ],
        "doc_id long, text string",
    )
    got = _rows(pack_sequences(df, seq_len=6, n_shards=8))
    assert got == [
        (0, 0, 0, 0, 3),    # opens bin 0
        (0, 1, 0, 8, 5),    # 3+5 > 6 -> bin 1
        (0, 1, 1, 16, 1),   # 5+1 = 6 fits
        (0, 1, 2, 24, 0),   # zero-token doc always fits
        (0, 2, 0, 32, 12),  # overlong doc: own bin
        (0, 3, 0, 40, 2),   # 12+2 > 6 -> bin 3
    ]


def test_null_text_counts_zero_tokens(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (8, None), (16, "d e")], "doc_id long, text string"
    )
    got = _rows(pack_sequences(df, seq_len=4, n_shards=8))
    # NULL-text doc packs as 0 tokens and never poisons the running fill
    assert got == [(0, 0, 0, 0, 3), (0, 0, 1, 8, 0), (0, 1, 0, 16, 2)]


def test_overlong_first_doc_gets_bin_zero(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e f g h"), (8, "x y")], "doc_id long, text string"
    )
    got = _rows(pack_sequences(df, seq_len=4, n_shards=8))
    assert got == [(0, 0, 0, 0, 8), (0, 1, 0, 8, 2)]


def test_partitioning_invariance(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(
        "text is not null"
    )
    a = _rows(pack_sequences(docs.repartition(1), seq_len=512, n_shards=4))
    b = _rows(pack_sequences(docs.repartition(13), seq_len=512, n_shards=4))
    assert a == b and len(a) == docs.count()
    # every bin respects capacity unless it holds a single overlong doc
    import collections

    fills = collections.defaultdict(list)
    for shard, b_, _pos, _id, n in a:
        fills[(shard, b_)].append(n)
    for members in fills.values():
        assert sum(members) <= 512 or len(members) == 1


def test_plan_one_exchange_zero_python(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(
        "text is not null"
    )
    df = pack_sequences(docs, seq_len=512, n_shards=4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()

    def nodes(kind):
        return sum(
            1
            for line in plan.splitlines()
            if line.strip().startswith("(")
            and kind in line.split(")", 1)[-1]
        )

    assert nodes("Exchange") == 1  # the shard groupBy, nothing else
    assert "EvalPython" not in plan and "Window" not in plan
