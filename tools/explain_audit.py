import sys; sys.path.insert(0, "/root/repo")
import bench, io, contextlib
from pyspark.sql import functions as F
spark = bench.session(4); spark.sparkContext.setLogLevel("ERROR")
import webcrawl_spark.queries as Q

def plan_of(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()

sf = "/root/testdata/sf0.01"
# 1. column pruning on the pages scan inside a crawl fetch join
pages = spark.read.parquet(f"{sf}/documents.parquet")
sel = pages.select(F.col("doc_id").alias("url")).limit(5)
j = sel.join(pages.select("doc_id", "text"), sel.url == F.col("doc_id"), "left")
p = plan_of(j)
print("JOIN strategy:", "BroadcastHashJoin" in p and "broadcast", "| columns pruned:", "ReadSchema: struct<doc_id:bigint,text:string>" in p)

# 2. predicate pushdown on a filtered query
q = Q.QUERIES["politeness_topk"](spark, sf)
print("politeness plan has window + filter:", "Window" in plan_of(q))
d = spark.read.parquet(f"{sf}/orders.parquet").filter(F.col("o_orderstatus")=="F").select("o_orderkey")
p2 = plan_of(d)
print("PushedFilters:", [l.strip() for l in p2.splitlines() if "PushedFilters" in l][:1])
print("ReadSchema pruned:", [l.strip()[:80] for l in p2.splitlines() if "ReadSchema" in l][:1])

# 3. broadcast of dims in join_agg_revenue
p3 = plan_of(Q.QUERIES["join_agg_revenue"](spark, sf))
print("revenue: broadcasts =", p3.count("BroadcastHashJoin"), "| partial agg =", "HashAggregate" in p3)

# 4. whole-stage codegen span in minhash (JVM-side claim)
p4 = plan_of(Q.QUERIES["dedup_minhash_sig"](spark, sf))
print("minhash codegen stages:", p4.count("WholeStageCodegen"), "| python eval present:", ("BatchEvalPython" in p4 or "ArrowEvalPython" in p4))
