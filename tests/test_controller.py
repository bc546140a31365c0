"""Controller facade + sharded batch tests."""

import jax
import numpy as np
import pytest

from sdf_nmpc_tpu.controller import Nmpc
from sdf_nmpc_tpu.ocp import build_ocp
from sdf_nmpc_tpu.parallel import make_batched_step, make_mesh, shard_batch, stack_tree
from sdf_nmpc_tpu.ref_gen import Ref, RefGen, Waypoint
from sdf_nmpc_tpu.solver import init_state
from tests.test_sdf_nmpc import build_inputs, hover_x0


@pytest.fixture(scope="module")
def nmpc(cfg_nosdf):
    return Nmpc(cfg_nosdf.replace(solver=dict(dtype="float64")))


def test_controller_api_cycle(nmpc):
    cfg = nmpc.cfg
    x0 = hover_x0()
    nmpc.reset()
    nmpc.set_x0(x0)

    gen = RefGen(cfg)
    gen.set_x0(x0)
    refs = gen.gen_ref_list_wps([Waypoint([2.0, 0.0, 1.0])])
    assert len(refs) == cfg.mpc.N + 1
    nmpc.set_refs(refs)

    fails = nmpc.solve()
    assert fails == 0
    u = nmpc.get_u()
    assert u.shape == (4,)
    cmd = nmpc.get_cmd_TRPYr()
    assert (cmd >= nmpc.cmd_TRPYr_min - 1e-9).all() and (cmd <= nmpc.cmd_TRPYr_max + 1e-9).all()
    X, U = nmpc.get_matrices()
    assert X.shape == (cfg.mpc.N + 1, 10) and U.shape == (cfg.mpc.N, 4)
    path = nmpc.get_openloop_traj()
    assert len(path) == cfg.mpc.N + 1
    np.testing.assert_allclose(path[0][0], x0[:3])
    assert nmpc.eval(0) == [0]  # no sdf -> empty diagnostics
    assert nmpc.get_t() > 0


def test_controller_closed_loop(nmpc):
    from sdf_nmpc_tpu.solver.integrator import erk4
    import jax.numpy as jnp

    cfg = nmpc.cfg
    nmpc.reset()
    x = hover_x0()
    gen = RefGen(cfg)
    dt = cfg.mpc.T / cfg.mpc.N
    for _ in range(150):
        nmpc.set_x0(x)
        gen.set_x0(x)
        nmpc.set_refs(gen.gen_ref_list_wps([Waypoint([1.5, -1.0, 0.5])]))
        assert nmpc.solve() == 0
        x = np.asarray(erk4(nmpc.model.f, jnp.asarray(x), jnp.asarray(nmpc.get_u()), dt))
    np.testing.assert_allclose(x[:3], [1.5, -1.0, 0.5], atol=0.08)


def test_sharded_batch_on_mesh(cfg_nosdf):
    """Scenario batch sharded over the 8-device CPU mesh (SURVEY §4 point 4)."""
    cfg = cfg_nosdf.replace(solver=dict(dtype="float64"))
    ocp = build_ocp(cfg)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    batched = make_batched_step(ocp, cfg, mesh=mesh)

    B = 16
    rng = np.random.default_rng(7)
    x0s = np.tile(hover_x0(), (B, 1))
    x0s[:, :3] += rng.normal(size=(B, 3)) * 0.5
    inputs = stack_tree([build_inputs(cfg, ocp, x0s[i], flag=0.0) for i in range(B)])
    states = stack_tree([init_state(ocp, x0s[i]) for i in range(B)])
    inputs = shard_batch(inputs, mesh)
    states = shard_batch(states, mesh)

    results, stats = batched(states, inputs)
    assert int(stats.n_ok) == B and int(stats.n_failed) == 0
    assert results.u0.shape == (B, 4)
    # sharded along scenario axis across all 8 devices
    assert len(results.u0.sharding.device_set) == 8

    # determinism: same sharded inputs -> bitwise identical outputs
    results2, _ = batched(states, inputs)
    np.testing.assert_array_equal(np.asarray(results.u0), np.asarray(results2.u0))

    # sharding leaves the numerics unchanged: the same batch through a plain
    # single-device vmap must produce the identical u0 (VERDICT r1 weak #3)
    import jax.numpy as jnp
    from sdf_nmpc_tpu.solver import make_rti_step

    step = jax.jit(jax.vmap(make_rti_step(ocp, cfg)))
    plain_states = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), states)
    plain_inputs = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), inputs)
    res_plain = step(plain_states, plain_inputs)
    np.testing.assert_array_equal(np.asarray(results.u0), np.asarray(res_plain.u0))
    np.testing.assert_array_equal(
        np.asarray(results.state.U), np.asarray(res_plain.state.U)
    )


def test_dead_reckoning_gate(cfg_nosdf):
    """allow_dead_reck: unsafe measurements are replaced by the prediction
    (reference config allow_dead_reck, default.yaml:62)."""
    cfg = cfg_nosdf.replace(
        solver=dict(dtype="float64"), mpc=dict(allow_dead_reck=True)
    )
    nmpc = Nmpc(cfg)
    x0 = hover_x0()
    nmpc.set_x0(x0)
    gen = RefGen(cfg)
    gen.set_x0(x0)
    nmpc.set_refs(gen.gen_ref_list_wps([Waypoint([1.0, 0.0, 0.0])]))
    nmpc.solve()
    predicted = np.asarray(nmpc._solver_state.X[1]).copy()
    bogus = x0 + 100.0
    nmpc.set_x0(bogus, position_safe=False)
    np.testing.assert_allclose(nmpc.x0, predicted)
    nmpc.set_x0(bogus, position_safe=True)
    np.testing.assert_allclose(nmpc.x0, bogus)


def test_conv_init_xavier():
    import jax
    import jax.numpy as jnp

    from sdf_nmpc_tpu.nn import Encoder
    from sdf_nmpc_tpu.nn.initializers import apply_conv_init

    enc = Encoder(1, 8, dropout_rate=0.0, batchnorm=False)
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 48, 1)))
    new_params = apply_conv_init(variables["params"], jax.random.PRNGKey(1))
    k_old = np.asarray(variables["params"]["Conv_0"]["kernel"])
    k_new = np.asarray(new_params["Conv_0"]["kernel"])
    assert not np.allclose(k_old, k_new)
    # xavier uniform bound: sqrt(6 / (fan_in + fan_out))
    fan_in = 7 * 7 * 1
    fan_out = 7 * 7 * 64
    bound = np.sqrt(6.0 / (fan_in + fan_out))
    assert np.abs(k_new).max() <= bound * 1.0001
    np.testing.assert_allclose(np.asarray(new_params["Conv_0"]["bias"]), 0.0)
    # dense heads untouched
    np.testing.assert_allclose(
        np.asarray(new_params["mean"]["kernel"]),
        np.asarray(variables["params"]["mean"]["kernel"]),
    )
