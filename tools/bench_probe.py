"""One-off probe: where does bench wall-clock go on the tunneled TPU?

CAVEAT (learned later): block_until_ready is unreliable on tunneled axon
devices — the "device-only" sections below can under-report; prefer a
small np.asarray value pull as the sync barrier (see bench.py).

Measures, for the bench.py PopPK config:
  a) device-only segment time (no sample pulls, block on final state)
     at several chunkings, isolating dispatch-latency effects
  b) end-to-end run() time (pipelined chunked emission)
  c) raw device->host bandwidth for a bench-sized pull
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import bench


def main():
    s = bench.build_sampler(100, 0, 2024)
    n_emit = 100

    # build state/proposals like run() does; keep a host copy because the
    # segment fn donates the state buffer
    import numpy as _np

    state0 = s._init_state()
    state_host = jax.tree.map(lambda a: _np.asarray(a), state0)
    proposals = tuple(s.proposals)

    def fresh_state():
        return jax.tree.map(jnp.asarray, state_host)

    for chunk in (100, 25, 4):
        m = chunk
        n_chunks = n_emit // m
        fn = s._make_segment_fn(m, False)
        # warm
        st, pr, ys = fn(fresh_state(), proposals)
        jax.block_until_ready(st.x)
        t0 = time.time()
        for _ in range(n_chunks):
            st, pr, ys = fn(st, pr)
        jax.block_until_ready(st.x)
        dt = time.time() - t0
        evals = n_emit * 2 * s.num_chains  # nth=2, 1 mutate per iter
        print(f"device-only chunk={m:4d}: {dt:6.2f}s  "
              f"{evals/dt/1e3:8.1f}k evals/s")
        del ys

    # transfer bandwidth for one emitted chunk worth of data
    fn = s._make_segment_fn(4, False)
    st, pr, ys = fn(fresh_state(), proposals)
    jax.block_until_ready(ys[0])
    nbytes = sum(np.dtype(a.dtype).itemsize * a.size for a in ys)
    t0 = time.time()
    host = [np.asarray(a) for a in ys]
    dt = time.time() - t0
    print(f"pull {nbytes/1e6:.1f} MB in {dt:.2f}s = {nbytes/dt/1e6:.1f} MB/s")

    # end-to-end
    for rep in range(3):
        t0 = time.time()
        res = s.run()
        dt = time.time() - t0
        print(f"e2e rep{rep}: {dt:6.2f}s  {res['evaluations']/dt/1e3:8.1f}k evals/s")


if __name__ == "__main__":
    main()
