"""Closed-loop simulation: obstacle avoidance with an analytic scene oracle,
sphere-traced rendering consistency, batched Monte-Carlo rollouts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdf_nmpc_tpu.ocp import build_ocp
from sdf_nmpc_tpu.sim import (
    Scene,
    make_closed_loop,
    make_scene_sdf_fn,
    render_range_image,
    scene_sdf,
    summarize,
)
from tests.test_sdf_nmpc import build_inputs, hover_x0


def test_scene_sdf_values():
    scene = Scene.make(spheres=[([2.0, 0.0, 0.0], 0.5)], boxes=[([4, -1, -1], [5, 1, 1])])
    assert np.isclose(float(scene_sdf(scene, jnp.array([0.0, 0, 0]))), 1.5)
    assert float(scene_sdf(scene, jnp.array([2.0, 0, 0]))) < 0  # inside sphere
    assert np.isclose(float(scene_sdf(scene, jnp.array([3.0, 0.0, 0.0]))), 0.5)
    # box face distance
    assert np.isclose(float(scene_sdf(scene, jnp.array([3.9, 0.0, 0.0]))), 0.1, atol=1e-6)


def test_render_matches_analytic_wall():
    """A wall slab renders like the analytic wall image used in data tests."""
    scene = Scene.make(boxes=[([2.0, -50, -50], [3.0, 50, 50])])
    img = render_range_image(
        scene, jnp.zeros(3), jnp.eye(3), 30, 50, 0.7592, 0.4903, 5.0
    )
    img = np.asarray(img)
    from tests.test_data_engine import wall_range_image

    expect = wall_range_image(2.0)
    np.testing.assert_allclose(img, expect, atol=0.03)


@pytest.fixture(scope="module")
def avoid_setup():
    from sdf_nmpc_tpu.config import default_config

    cfg = default_config().replace(
        nn=dict(size_latent=8), solver=dict(dtype="float64", qp_iters=10)
    )
    scene = Scene.make(spheres=[([1.2, 0.05, 0.0], 0.35)])
    sdf_fn = make_scene_sdf_fn(scene, max_df=1.0)
    ocp = build_ocp(cfg, sdf_fn=sdf_fn, sdf_max_df=1.0)
    world_sdf = lambda p: scene_sdf(scene, p)
    return cfg, ocp, world_sdf


def test_closed_loop_avoids_obstacle(avoid_setup):
    """Target straight through a sphere: the SDF-NMPC loop must go around it
    with positive clearance and still reach the goal region."""
    cfg, ocp, world_sdf = avoid_setup
    rollout = jax.jit(make_closed_loop(ocp, cfg, n_ticks=120, scene_sdf_fn=world_sdf))
    x0 = hover_x0()
    # the set_const_on weight set has zero x/y position weight (reference
    # default.yaml:45) — progress comes from the off-weights + velocity ref,
    # matching the deployment's RefGen-produced references
    inputs = build_inputs(cfg, ocp, x0, flag=1.0, constrained_weights=False)
    res = rollout(jnp.asarray(x0), inputs)
    assert int(np.asarray(res.statuses).sum()) == 0
    assert float(res.min_clearance) > 0.0, "collided with the obstacle"
    assert float(res.tracking_error) < 0.35, f"missed goal: {float(res.tracking_error)}"
    # actually deviated laterally to pass the obstacle
    assert np.abs(np.asarray(res.xs[:, 1])).max() > 0.15


def test_closed_loop_without_sdf_hits_obstacle(avoid_setup):
    """Same setup with the flag off drives straight through the sphere —
    negative clearance confirms the constraint was load-bearing."""
    cfg, ocp, world_sdf = avoid_setup
    rollout = jax.jit(make_closed_loop(ocp, cfg, n_ticks=120, scene_sdf_fn=world_sdf))
    x0 = hover_x0()
    inputs = build_inputs(cfg, ocp, x0, flag=0.0, constrained_weights=False)
    res = rollout(jnp.asarray(x0), inputs)
    assert float(res.min_clearance) < 0.0


def test_batched_monte_carlo(avoid_setup):
    cfg, ocp, world_sdf = avoid_setup
    rollout = make_closed_loop(ocp, cfg, n_ticks=60, scene_sdf_fn=world_sdf)
    B = 6
    rng = np.random.default_rng(0)
    x0s = np.tile(hover_x0(), (B, 1))
    x0s[:, 1] += rng.uniform(-0.3, 0.3, B)
    inputs = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[build_inputs(cfg, ocp, x0s[i], flag=1.0, constrained_weights=False) for i in range(B)],
    )
    batched = jax.jit(jax.vmap(rollout))
    res = batched(jnp.asarray(x0s), inputs)
    stats = summarize(res)
    assert stats["n"] == B
    assert stats["success_rate"] == 1.0
    assert stats["collision_rate"] == 0.0


def test_perception_in_the_loop(avoid_setup):
    """Full deployed cycle: every chunk re-renders from the current pose and
    re-encodes (here: oracle 'encoder' = identity latent; the observation
    update path itself is what's under test)."""
    import jax.numpy as jnp

    from sdf_nmpc_tpu.math import quat2rot
    from sdf_nmpc_tpu.sim import make_closed_loop_perception, render_range_image

    cfg, ocp, world_sdf = avoid_setup
    from sdf_nmpc_tpu.sim import Scene, scene_sdf

    scene = Scene.make(spheres=[([1.2, 0.05, 0.0], 0.35)])

    def observe(x, sc):
        # camera at the body position, body attitude (identity extrinsics);
        # render to prove the image path runs, use a fixed latent
        W_R_B = quat2rot(x[3:7] / jnp.linalg.norm(x[3:7]))
        img = render_range_image(sc, x[:3], W_R_B, 10, 16, 0.7592, 0.4903, 5.0, n_steps=16)
        latent = jnp.full(8, jnp.mean(img))  # stand-in encoder
        return x[:3], W_R_B, latent

    rollout = jax.jit(
        make_closed_loop_perception(
            ocp, cfg, n_chunks=6, ticks_per_chunk=10,
            observe_fn=observe, scene_sdf_fn=lambda p, sc: scene_sdf(sc, p),
        )
    )
    x0 = hover_x0()
    inputs = build_inputs(cfg, ocp, x0, flag=1.0, constrained_weights=False)
    res = rollout(jnp.asarray(x0), inputs, scene)
    assert res.xs.shape == (61, 10)
    assert int(np.asarray(res.statuses).sum()) == 0
    assert np.isfinite(np.asarray(res.xs)).all()
