"""Write plans/r08/<query>_{before,after}.txt — .explain("formatted") for
every query this optimization round touched.

Run twice: once from the round-start worktree (suffix=before) and once from
the current tree (suffix=after); the repo root to import from is argv[1],
the suffix argv[2], the output dir argv[3].

Usage:
  python tools/dump_r08_plans.py /tmp/r8start before /root/repo/plans/r08
  python tools/dump_r08_plans.py /root/repo  after  /root/repo/plans/r08
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

TOUCHED = [
    "tdigest_median_by_type",
    "ann_lsh_built_topk",
    "ann_ivf_built_topk",
    "minhash_lsh_pairs",
    "incremental_near_dup",
    "grouped_kll_quantiles",
    "kll_price_quantiles",
    "tfidf_top_terms",
    "curate_corpus",
    "cms_topn_doc_tokens",
    "hll_distinct_parts",
]


def main() -> None:
    root, suffix, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    sys.path.insert(0, root)
    os.makedirs(out_dir, exist_ok=True)
    import __spark_entry__ as entry
    from cms_topn_spark.spark_session import get_spark

    spark = get_spark(f"plans-r08-{suffix}", cpus=8)
    qs = entry.queries()
    sf = "/root/testdata/sf0.01"
    for name in TOUCHED:
        df = qs[name](spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(
                f"# {name} — .explain('formatted'), {suffix} round 8 "
                f"(sf0.01 input; plan shape is sf-independent)\n"
            )
            f.write(buf.getvalue())
        print(f"{name}_{suffix}.txt written", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
