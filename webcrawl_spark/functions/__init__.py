"""Arrow-batched pandas-UDF stages wrapping the pure-pandas kernels, plus
training-data text/similarity functions. No row-at-a-time Python UDFs
anywhere (BASELINE.json:input_hint)."""
