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
