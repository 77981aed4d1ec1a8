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


def account(num_ensembles: int = 8192):
    """Three-term accounting of the e2e-vs-device gap at the headline
    config (VERDICT r4 item 7): gap_seconds ?= (a) bytes-on-the-wire /
    measured pull bandwidth + (b) per-pull RPC latency * pull count +
    (c) host-side store/pool work. If (a)+(b)+(c) covers the measured
    gap, the residual is environment-fixed (tunnel serialization), not
    a code problem."""
    import jax.numpy as jnp

    s = bench.build_sampler(
        bench.NUM_SAMPLES, 0, 2024, "one", num_ensembles,
        emit_fixed_only=True,
    )
    res = s.run()  # compile + warmup
    t0 = time.time()
    res = s.run()
    e2e_dt = time.time() - t0
    evals = res["evaluations"]
    dev = bench.measure_device_only(s)
    t_dev = evals / dev["device_evals_per_sec"]
    gap = e2e_dt - t_dev

    # (a) bytes on the wire at measured chunk-size bandwidth
    S = bench.NUM_SAMPLES
    emit_rows = (s.num_chains // s.ladder_size) * s._emit_L
    D = s.num_variables
    bytes_per_emit = emit_rows * (D + 2) * 4
    total_bytes = S * bytes_per_emit
    chunk_emits = max(1, (32 << 20) // max(bytes_per_emit, 1))
    n_chunks = (S + chunk_emits - 1) // chunk_emits
    # bandwidth at the emission's own transfer size
    chunk_elems = min(chunk_emits, S) * emit_rows * (D + 2)
    arr = jnp.ones((chunk_elems,), jnp.float32)
    np.asarray(arr)  # warm
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        np.asarray(arr + 1.0)
    bw = chunk_elems * 4 / ((time.time() - t0) / reps)
    term_a = total_bytes / bw

    # (b) per-pull RPC latency x pull count (3 arrays per chunk + the
    # final counter pull); latency measured with a scalar pull
    tiny = jnp.ones((), jnp.float32)
    np.asarray(tiny)
    t0 = time.time()
    lat_reps = 10
    for i in range(lat_reps):
        np.asarray(tiny + float(i))
    rpc_latency = (time.time() - t0) / lat_reps
    n_pulls = n_chunks * 3 + 1
    term_b = n_pulls * rpc_latency

    # (c) host-side pooling/store work on already-materialized arrays
    samples = res["samples"]
    host_x = np.ascontiguousarray(
        np.zeros((min(chunk_emits, S) * (s.num_chains // s.ladder_size),
                  s._emit_L, D), np.float32)
    )
    t0 = time.time()
    for _ in range(n_chunks):
        _ = host_x.copy()  # pool/copy cost stand-in per chunk
    term_c = time.time() - t0

    out = {
        "config": "gap_accounting",
        "ensembles": num_ensembles,
        "e2e_seconds": round(e2e_dt, 3),
        "device_seconds": round(t_dev, 3),
        "gap_seconds": round(gap, 3),
        "term_a_transfer_seconds": round(term_a, 3),
        "term_b_rpc_latency_seconds": round(term_b, 3),
        "term_c_host_store_seconds": round(term_c, 3),
        "accounted_seconds": round(term_a + term_b + term_c, 3),
        "accounted_fraction": round(
            (term_a + term_b + term_c) / max(gap, 1e-9), 3
        ),
        "pull_bandwidth_mb_per_sec": round(bw / 2**20, 1),
        "rpc_latency_ms": round(rpc_latency * 1e3, 2),
        "n_pulls": n_pulls,
        "emitted_mb": round(total_bytes / 2**20, 1),
        "e2e_evals_per_sec": round(evals / e2e_dt, 1),
        "device_evals_per_sec": round(dev["device_evals_per_sec"], 1),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--account":
        account(int(sys.argv[2]) if len(sys.argv) > 2 else 8192)
        return
    specs = sys.argv[1:] or ["8192,0", "8192,1", "32768,1", "65536,1"]
    for spec in specs:
        parts = spec.split(",")
        ens, fx = parts[0], parts[1]
        dtype = parts[2] if len(parts) > 2 else "float32"
        probe(int(ens), bool(int(fx)), dtype)


if __name__ == "__main__":
    main()
