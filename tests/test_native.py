"""Native C++ LAP solver tests (native/lap.cpp)."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from bcm3_tpu.native import get_lap_library, lap_solve


def test_native_library_builds():
    lib = get_lap_library()
    assert lib is not None, "native toolchain present, build must succeed"


@pytest.mark.parametrize("shape", [(3, 3), (5, 9), (1, 4), (20, 20), (17, 31)])
def test_lap_matches_scipy(shape):
    rng = np.random.default_rng(sum(shape))
    for trial in range(5):
        cost = rng.normal(size=shape) * 10
        assign, total = lap_solve(cost)
        rows, cols = linear_sum_assignment(cost)
        expect = cost[rows, cols].sum()
        np.testing.assert_allclose(total, expect, rtol=1e-12)
        # assignment must be a valid injection with the same cost
        assert len(set(assign.tolist())) == shape[0]
        np.testing.assert_allclose(
            cost[np.arange(shape[0]), assign].sum(), expect, rtol=1e-12
        )


def test_lap_with_large_penalties():
    cost = np.array([[0.0, 1e100], [1e100, 0.0]])
    assign, total = lap_solve(cost)
    np.testing.assert_array_equal(assign, [0, 1])
    assert total == 0.0


def test_lap_match_logp_batch_equals_per_row():
    """The one-native-call batched masked matcher == the per-row
    hungarian_match_logp on every edge case: partial validity masks, a
    row with no valid observations (0.0), a row with too few valid
    simulated cells (-inf), and an all-impossible cost matrix (-inf)."""
    from bcm3_tpu.cellpop.data_likelihood import hungarian_match_logp
    from bcm3_tpu.native import lap_match_logp_batch

    rng = np.random.default_rng(7)
    B, n_obs, n_sim = 17, 6, 11
    cost = rng.normal(size=(B, n_obs, n_sim))
    ov = rng.random((B, n_obs)) < 0.75
    sv = rng.random((B, n_sim)) < 0.65
    ov[2] = False                 # no valid obs
    sv[3] = False                 # too few sims
    cost[5] = -np.inf             # impossible matching
    ov[5] = True
    sv[5] = True
    cost[8, :, :3] = np.inf       # non-finite clamp path

    batched = lap_match_logp_batch(cost, ov, sv)
    serial = np.array([
        hungarian_match_logp(cost[b], ov[b], sv[b]) for b in range(B)
    ])
    np.testing.assert_allclose(batched, serial, rtol=1e-12)
    assert batched[2] == 0.0
    assert batched[3] == -np.inf
    assert batched[5] == -np.inf


def test_lap_match_logp_batch_threaded_identical():
    """C++ thread count must not change results (pure batch split)."""
    from bcm3_tpu.native import lap_match_logp_batch

    rng = np.random.default_rng(11)
    B, n, m = 64, 5, 9
    cost = rng.normal(size=(B, n, m))
    ov = np.ones((B, n), dtype=bool)
    sv = np.ones((B, m), dtype=bool)
    one = lap_match_logp_batch(cost, ov, sv, n_threads=1)
    four = lap_match_logp_batch(cost, ov, sv, n_threads=4)
    np.testing.assert_array_equal(one, four)


def test_lap_match_logp_batch_fallback_matches_native(monkeypatch):
    """The scipy fallback (no shared library) must agree with the
    native batched matcher exactly."""
    import bcm3_tpu.native as native

    rng = np.random.default_rng(13)
    B, n, m = 9, 4, 7
    cost = rng.normal(size=(B, n, m))
    ov = rng.random((B, n)) < 0.8
    sv = rng.random((B, m)) < 0.7
    ov[1] = False
    sv[2] = False
    want = native.lap_match_logp_batch(cost, ov, sv)
    monkeypatch.setattr(native, "get_lap_library", lambda: None)
    got = native.lap_match_logp_batch(cost, ov, sv)
    np.testing.assert_allclose(got, want, rtol=1e-12)
