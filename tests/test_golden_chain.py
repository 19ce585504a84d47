"""First end-to-end golden-trace test: chain topology (SURVEY.md §7 step 3)."""

from webcrawl_spark.fixtures.gen import chain

from .golden import run_and_check


def test_chain_golden(spark, tmp_path):
    run_and_check(spark, chain(n=8, depth_limit=6), tmp_path)
