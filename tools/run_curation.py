"""CLI: run the end-to-end corpus curation pipeline and print the
stage-count funnel plus the publish location.

    python tools/run_curation.py [out_dir]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01) picks the corpus.
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from active_query_optimizer_spark.pipelines.curate import run_curation  # noqa: E402
from active_query_optimizer_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="curated-") + "/corpus"
    spark = get_spark("curation-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    counts = run_curation(spark, sf_dir, out)
    print(json.dumps({"funnel": counts, "out": out, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
