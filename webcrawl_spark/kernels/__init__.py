"""Pure-pandas vectorized kernels shared by Spark pandas-UDFs and the oracle.

Everything here takes/returns ``pd.Series`` (or columns of a ``pd.DataFrame``)
so the same code path runs inside Arrow-batched pandas UDFs on executors and
inside the sequential oracle crawler — the byte-identity invariant between
engine and oracle is by construction.
"""
