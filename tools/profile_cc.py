"""One-shot phase attribution for dedup_clusters at ×64/×256 (r10
verdict item 4): splits the end-to-end wall into (a) IVF pair
generation (the staged_dedup_pairs materialization), (b) star-
contraction rounds (count + per-round cost via dedup.LAST_CC_ROUNDS),
and (c) the final corpus relabel join/window — so SCALING.md can state
WHERE the ×256 growth lives instead of re-adjudicating the composite.

Run: ``python tools/profile_cc.py [mult ...]`` (default 64 256).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scalecheck import SF_DIR, _flipped_emb_copies, get_spark, load_table  # noqa: E402
from real_time_big_data_architect_spark.operators import (  # noqa: E402
    dedup as dedup_ops,
    similarity as sim_ops,
)


def main() -> None:
    mults = tuple(int(a) for a in sys.argv[1:]) or (64, 256)
    spark = get_spark("profile-cc")
    emb_base = load_table(spark, SF_DIR, "embeddings")
    n_emb = emb_base.count()
    out = []
    root = tempfile.mkdtemp(prefix="profile_cc_")
    try:
        for mult in mults:
            d = f"{root}/x{mult}"
            _flipped_emb_copies(emb_base, mult).write.mode(
                "overwrite"
            ).parquet(f"{d}/embeddings.parquet")
            spark.catalog.clearCache()

            # phase a: pair generation + staging write (cold)
            sim_ops.clear_pair_stage()
            t0 = time.perf_counter()
            pairs = sim_ops.staged_dedup_pairs(spark, d)
            t_pairs = time.perf_counter() - t0
            n_pairs = pairs.count()

            # phase b: star contraction over the staged pair parquet
            t0 = time.perf_counter()
            dedup_ops.star_contract(spark, pairs).write.format(
                "noop"
            ).mode("overwrite").save()
            t_cc = time.perf_counter() - t0
            rounds = dedup_ops.LAST_CC_ROUNDS

            # phase c: full op on the warm stage = contraction + the
            # corpus relabel join/window; relabel ≈ t_warm - t_cc
            t0 = time.perf_counter()
            dedup_ops.dedup_clusters(spark, d).write.format(
                "noop"
            ).mode("overwrite").save()
            t_warm = time.perf_counter() - t0

            # reference composite: the SCALING.md-comparable cold e2e
            sim_ops.clear_pair_stage()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            dedup_ops.dedup_clusters(spark, d).write.format(
                "noop"
            ).mode("overwrite").save()
            t_cold = time.perf_counter() - t0

            rec = {
                "mult": mult,
                "rows": n_emb * mult,
                "n_pairs": n_pairs,
                "pairs_s": round(t_pairs, 2),
                "cc_s": round(t_cc, 2),
                "cc_rounds": rounds,
                "cc_s_per_round": round(t_cc / max(rounds, 1), 2),
                "relabel_s": round(max(t_warm - t_cc, 0.0), 2),
                "cold_e2e_s": round(t_cold, 2),
                "loadavg": round(os.getloadavg()[0], 1),
            }
            print(json.dumps(rec), flush=True)
            out.append(rec)
            spark.catalog.clearCache()
            sim_ops.clear_pair_stage()
            shutil.rmtree(d, ignore_errors=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
