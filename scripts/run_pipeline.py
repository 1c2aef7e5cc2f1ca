"""spark-submit entry point for the KG pipeline (north_rule launch mode).

Cluster:
    python -c "from kg.session import make_pyfiles_zip; print(make_pyfiles_zip('kg.zip'))"
    spark-submit --py-files kg.zip scripts/run_pipeline.py \
        --input <parquet-or-iceberg-table> --output <checkpoint-base> [--n-docs N]

Local smoke (synthesized corpus):
    python scripts/run_pipeline.py --output /tmp/kg_out --n-docs 10000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# direct `python scripts/run_pipeline.py` runs: make the repo importable
# (under spark-submit --py-files kg.zip this is already on the path)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet path of (doc_id, spans[]) docs; omit to synthesize")
    ap.add_argument("--output", required=True, help="checkpoint base dir")
    ap.add_argument("--n-docs", type=int, default=10000, help="synth corpus size when --input omitted")
    ap.add_argument("--master", default=None)
    ap.add_argument("--top-k", type=int, default=20)
    args = ap.parse_args()

    from kg.pipeline import run_pipeline, top_entity_pairs
    from kg.session import get_spark
    from kg.synth import synth_docs_df

    spark = get_spark(app_name="kg-pipeline", master=args.master)
    if args.input:
        docs = spark.read.parquet(args.input)
        token = None
    else:
        docs = synth_docs_df(spark, args.n_docs)
        token = f"synth:{args.n_docs}:42"

    t0 = time.perf_counter()
    res = run_pipeline(spark, docs, args.output, input_token=token)
    wall = time.perf_counter() - t0

    print(json.dumps({
        "wall_sec": round(wall, 2),
        "counts": res.counts(),
        "executed": res.executed,
        "timings": res.timings,
        "invariant_violations": res.invariant_violations,
    }))
    top_entity_pairs(res.tables["edges"], res.tables["nodes"], k=args.top_k).show(
        args.top_k, truncate=False
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
