"""Crowded-map retrieval stress numbers for NOTES_R4.md (round-3 verdict
weakness 4 / item 8): 256 database keyframes across 8 scenes x 2 texture
families at the trained 8192-word vocabulary.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python dev/bench_retrieval.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.retrieval_harness import build_retrieval_db, measure_retrieval


def main():
    t0 = time.time()
    db = build_retrieval_db()
    print(f"[{time.time()-t0:.1f}s] db built: {db.bow_db.shape[0]} keyframes, "
          f"{len(db.q_bow)} queries", file=sys.stderr, flush=True)
    out = measure_retrieval(db)
    print(f"[{time.time()-t0:.1f}s] done", file=sys.stderr)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
