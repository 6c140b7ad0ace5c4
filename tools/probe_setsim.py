"""Probe: is the setsim persisted record frame holding across runs?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from active_query_optimizer_spark.operators import QUERIES
from active_query_optimizer_spark.operators.dedup import _setsim_records
from active_query_optimizer_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("probe-setsim")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1).count()

fn = QUERIES["setsim_join_prefix"]

for i in range(4):
    rec = _setsim_records(spark, sf_dir)
    lvl = rec.storageLevel
    print(f"run {i}: pre storageLevel useMemory={lvl.useMemory} useDisk={lvl.useDisk}", flush=True)
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    n = df.count()
    dt = time.perf_counter() - t0
    # how many blocks does the cache manager hold?
    jsc = spark.sparkContext._jsc.sc()
    rdds = jsc.getPersistentRDDs()
    print(f"run {i}: {dt:.2f}s rows={n} persistentRDDs={rdds.size()}", flush=True)
