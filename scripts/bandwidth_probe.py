"""Worker-scaling probe for the numpy codec kernels (zero Spark).

The N->4N protocol runs both parallelism levels inside ONE VM.  This
probe tests whether the python-kernel work itself (the codec passes that
dominate the postings stage) hits a shared-host ceiling: it runs the same
encode+decode workload in 1 vs K processes on identical private inputs
and reports aggregate throughput.

MEASURED on this box (2026-08-17, BENCH_SCALING.md round 3): per-worker
throughput is FLAT from 4 to 16 workers (15.1 -> 15.5 Mvalues/s/worker),
i.e. the kernel work scales essentially linearly and memory bandwidth is
NOT the ceiling.  By elimination, the postings stage's sub-4x N->4N
scaling (2.7-3.2x across rounds) lives in the Spark layer that local mode
cannot split across machines: one shared JVM serving all shuffle reads,
one GC, one scheduler -- precisely the parts a real 4N-executor cluster
multiplies.  The probe exists so that claim stays evidence-backed (and
falsifiable) rather than asserted.

Usage: python scripts/bandwidth_probe.py [K ...]   (default: 1 4 16)
Prints one JSON line per K.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")


def _one(seed_and_secs):
    """Encode+decode rounds over a private ~100 MB working set."""
    seed, secs = seed_and_secs
    import numpy as np

    from chavinha_mini_search_engine_spark.functions.codec import (
        delta_decode,
        delta_encode,
        varbyte_decode,
        varbyte_encode,
    )

    rng = np.random.Generator(np.random.PCG64(seed))
    segs = [
        np.sort(rng.choice(1 << 22, size=n, replace=False)).astype(np.uint64)
        for n in (100_000,) * 64
    ]
    tfs = [rng.integers(1, 50, size=len(s)).astype(np.uint64) for s in segs]
    t0 = time.time()
    values = 0
    while time.time() - t0 < secs:
        for ids, tf in zip(segs, tfs):
            db = delta_encode(ids)
            tb = varbyte_encode(tf)
            out = delta_decode(db, len(ids))
            _ = varbyte_decode(tb, len(tf))
            values += 2 * len(ids)
    return values / (time.time() - t0)


def main():
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    secs = float(os.environ.get("BW_PROBE_SECS", "12"))
    base = None
    for k in ks:
        with mp.Pool(k) as p:
            rates = p.map(_one, [(1000 + i, secs) for i in range(k)])
        agg = sum(rates)
        if base is None:
            base = agg / k if k else agg
        print(json.dumps({
            "workers": k,
            "aggregate_Mvalues_per_sec": round(agg / 1e6, 1),
            "per_worker_Mvalues_per_sec": round(agg / k / 1e6, 1),
            "scaling_vs_1worker": round(agg / (base * k), 3) if base else None,
        }), flush=True)


if __name__ == "__main__":
    main()
