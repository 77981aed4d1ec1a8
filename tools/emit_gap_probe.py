"""Decompose the e2e-vs-device throughput gap (VERDICT r2 item 4).

Measures the bench headline sampler at combinations of ensemble count
and emission mode, separating device compute from host emission:

  - e2e evals/s        : full run() incl. chunk-pipelined emission
  - device evals/s     : same segments, no host pull (value-sync only)
  - pull MB/s          : raw device->host bandwidth of one emitted chunk

With emit_fixed_only=True only the T=1 rows cross the link (reference
parity: SamplerPT.cpp:321-330 emits only fixed-temperature chains) —
an L-fold transfer cut at identical sampling.

Usage: python tools/emit_gap_probe.py [ens,fixed ...]
  e.g. python tools/emit_gap_probe.py 8192,0 8192,1 32768,1 65536,1
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np

import bench


def probe(num_ensembles: int, fixed_only: bool, emit_dtype: str = "float32"):
    import jax.numpy as jnp

    s = bench.build_sampler(
        bench.NUM_SAMPLES, 0, 2024, "one", num_ensembles,
        emit_fixed_only=fixed_only, emit_dtype=emit_dtype,
    )
    res = s.run()  # compile + warmup
    t0 = time.time()
    res = s.run()
    e2e_dt = time.time() - t0
    e2e = res["evaluations"] / e2e_dt

    dev = bench.measure_device_only(s)

    # raw pull bandwidth of one emitted chunk: time a blocking host copy
    # of a device array shaped like one emission chunk
    emit_rows = (s.num_chains // s.ladder_size) * s._emit_L
    D = s.num_variables
    chunk_elems = max(
        1, (32 << 20) // (emit_rows * (D + 2) * 4)
    ) * emit_rows * (D + 2)
    arr = jnp.ones((chunk_elems,), jnp.float32)
    np.asarray(arr)  # warm
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        np.asarray(arr + 1.0)
    pull_dt = (time.time() - t0) / reps
    pull_mbs = chunk_elems * 4 / 2**20 / pull_dt

    out = {
        "ensembles": num_ensembles,
        "emit_fixed_only": fixed_only,
        "emit_dtype": emit_dtype,
        "e2e_evals_per_sec": round(e2e, 1),
        "device_evals_per_sec": round(dev["device_evals_per_sec"], 1),
        "e2e_over_device": round(e2e / dev["device_evals_per_sec"], 3),
        "emitted_mb": round(
            res["samples"].size * res["samples"].itemsize / 2**20, 1
        ),
        "pull_mb_per_sec": round(pull_mbs, 1),
        "elapsed_s": round(e2e_dt, 2),
    }
    print(json.dumps(out), flush=True)
    del s
    return out


def main():
    specs = sys.argv[1:] or ["8192,0", "8192,1", "32768,1", "65536,1"]
    for spec in specs:
        parts = spec.split(",")
        ens, fx = parts[0], parts[1]
        dtype = parts[2] if len(parts) > 2 else "float32"
        probe(int(ens), bool(int(fx)), dtype)


if __name__ == "__main__":
    main()
