"""Cell-population simulator tests (reference: src/cellpop/Cell.cpp,
Experiment.cpp, CellPopulation.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from bcm3_tpu.cellpop.simulate import (
    EV_NEBD,
    EV_REPLICATION_START,
    PopulationConfig,
    simulate_population,
)

# Toy cell model: mass grows exponentially, cytokinesis ramps linearly
# (divides at c=1, i.e. t = 1/r2 after birth), apoptosis optional.
#   y = [mass, cytokinesis, nuclear_envelope, apoptosis]


def _rhs(t, y, args):
    params, const_y, creation = args
    r_mass, r_cyt, r_apo = params[0], params[1], params[2]
    return jnp.array(
        [
            r_mass * y[0],
            r_cyt,
            -0.0 * y[2],
            r_apo,
        ],
        dtype=y.dtype,
    )


def _config(capacity=7, initial=1, generations=3, divide=True):
    ev = {
        "replicating_DNA": -1,
        "replicated_DNA": -1,
        "PCNA_gfp": -1,
        "nuclear_envelope": 2,
        "chromatid_separation": -1,
        "cytokinesis": 1,
        "apoptosis": 3,
    }
    return PopulationConfig(
        capacity=capacity,
        initial_cells=initial,
        max_generations=generations,
        divide_cells=divide,
        event_species=ev,
        division_reset_idx=((1, 0.0), (2, 1.0)),
        solver="DP5",
        rtol=1e-8,
        atol=1e-10,
    )


def _run(cfg, r_cyt=0.5, r_apo=0.0, span=4.5, G=200):
    N = cfg.capacity
    params = jnp.tile(jnp.asarray([0.1, r_cyt, r_apo]), (N, 1))
    init_y = jnp.tile(jnp.asarray([1.0, 0.0, 1.0, 0.0]), (N, 1))
    const_y = jnp.zeros((N, 0))
    creation = jnp.zeros((N,))
    grid = jnp.linspace(0.0, span, G)
    return simulate_population(
        cfg, _rhs, init_y, const_y, params, params, creation, grid
    )


def test_division_tree():
    res = _run(_config())
    active = np.asarray(res.active)
    assert active.sum() == 7  # 1 + 2 + 4
    # division time of the root cell: cytokinesis crosses 1 at t = 2
    assert np.isclose(float(res.division_time[0]), 2.0, atol=0.05)
    assert bool(res.divided[0])
    # children created at the division time with reset cytokinesis
    creation = np.asarray(res.creation)
    parent = np.asarray(res.parent)
    children = np.where(parent == 0)[0]
    assert len(children) == 2
    np.testing.assert_allclose(creation[children], 2.0, atol=0.05)
    # sobol bookkeeping: child indices = C0 + parent*2 + {0,1}
    sob = np.asarray(res.sobol_index)
    assert sorted(sob[children].tolist()) == [1, 2]
    # grandchildren divide ~2 after their creation
    gc = np.where(parent == children[0])[0]
    assert len(gc) == 2
    np.testing.assert_allclose(creation[gc], 4.0, atol=0.1)
    # mass is inherited (not reset) at division: m(2) = e^{0.2}
    traj = np.asarray(res.traj)
    m_child0 = traj[children[0], 0, 0]
    np.testing.assert_allclose(m_child0, np.exp(0.1 * 2.0), rtol=1e-2)
    assert bool(res.ok)


def test_no_division_when_disabled():
    res = _run(_config(divide=False, generations=0))
    assert np.asarray(res.active).sum() == 1
    assert not bool(res.divided[0])


def test_capacity_limit():
    cfg = _config(capacity=3, generations=3)
    res = _run(cfg)
    active = np.asarray(res.active)
    assert active.sum() == 3  # root + its two children only


def test_death_stops_lineage():
    # apoptosis crosses 1 at t = 1/0.8 = 1.25, before division at t=2
    res = _run(_config(), r_apo=0.8)
    assert bool(res.died[0])
    assert not bool(res.divided[0])
    assert np.asarray(res.active).sum() == 1
    np.testing.assert_allclose(float(res.end_cell_time[0]), 1.25, atol=0.05)


def test_event_times():
    # NEBD: nuclear_envelope < 0.5; make it decay: reuse mass slot? use a
    # custom rhs where nuclear_envelope decays
    def rhs(t, y, args):
        return jnp.array([0.0, 0.25, -1.0 * y[2], 0.0], dtype=y.dtype)

    cfg = _config(capacity=1, initial=1, generations=0, divide=False)
    N = 1
    params = jnp.zeros((N, 3))
    init_y = jnp.tile(jnp.asarray([1.0, 0.0, 1.0, 0.0]), (N, 1))
    res = simulate_population(
        cfg, rhs, init_y, jnp.zeros((N, 0)), params, params,
        jnp.zeros((N,)), jnp.linspace(0.0, 3.0, 400),
    )
    # nuclear envelope e^{-t} < 0.5 at t = ln 2
    np.testing.assert_allclose(
        float(res.event_times[0, EV_NEBD]), np.log(2.0), atol=0.01
    )


def test_jit_and_grad_safety():
    cfg = _config()

    @jax.jit
    def run(r_cyt):
        N = cfg.capacity
        params = jnp.tile(jnp.stack([0.1, r_cyt, 0.0]), (N, 1))
        init_y = jnp.tile(jnp.asarray([1.0, 0.0, 1.0, 0.0]), (N, 1))
        res = simulate_population(
            cfg, _rhs, init_y, jnp.zeros((N, 0)), params, params,
            jnp.zeros((N,)), jnp.linspace(0.0, 4.5, 150),
        )
        return jnp.sum(jnp.where(res.active, 1, 0)), res.division_time[0]

    n, dt0 = run(jnp.asarray(0.5))
    assert int(n) == 7
    n2, dt2 = run(jnp.asarray(0.3))  # divides at t=3.33: only 1 division fits
    assert int(n2) == 3
