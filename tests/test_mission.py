"""Mission server tests: the reference ROS node's behavioral contract
(reference README.md:208-257) as a transport-agnostic state machine."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdf_nmpc_tpu.controller import Nmpc
from sdf_nmpc_tpu.ref_gen import Waypoint
from sdf_nmpc_tpu.runtime import MissionMode, MissionServer
from sdf_nmpc_tpu.solver.integrator import erk4
from tests.test_sdf_nmpc import hover_x0


@pytest.fixture(scope="module")
def mission_cfg(cfg_nosdf):
    return cfg_nosdf.replace(solver=dict(dtype="float64"))


@pytest.fixture(scope="module")
def nmpc(mission_cfg):
    return Nmpc(mission_cfg)


@pytest.fixture()
def server(mission_cfg, nmpc):
    return MissionServer(mission_cfg, nmpc)


def _fly(server, nmpc, x, t0, n_ticks, dt):
    """Integrate the plant under the mission loop; returns (x, last_tick, t)."""
    t = t0
    tick = None
    for _ in range(n_ticks):
        server.feed_state(x, t)
        tick = server.tick(t)
        x = np.asarray(erk4(nmpc.model.f, jnp.asarray(x), jnp.asarray(nmpc.get_u()), dt))
        t += dt
    return x, tick, t


def test_takeoff_then_goto_prunes_waypoints(server, nmpc, mission_cfg):
    cfg = mission_cfg
    dt = cfg.mpc.T / cfg.mpc.N
    x = hover_x0()

    server.feed_state(x, 0.0)
    server.takeoff()
    x, tick, t = _fly(server, nmpc, x, 0.0, 80, dt)
    assert tick.mode == MissionMode.HOVER
    assert abs(x[2] - cfg.ref.zref) < 0.15  # reached config z (README.md:252)

    wps = [Waypoint([1.0, 0.5, cfg.ref.zref]), Waypoint([2.0, 0.0, cfg.ref.zref])]
    server.goto(wps)
    assert server._mode == MissionMode.WPS
    x, tick, t = _fly(server, nmpc, x, t, 200, dt)
    ## both waypoints explored (within wp_tol) -> queue drained -> hover
    assert tick.wps_left == 0
    assert tick.mode in (MissionMode.WPS, MissionMode.HOVER)
    assert np.linalg.norm(x[:3] - [2.0, 0.0, cfg.ref.zref]) < cfg.mission.wp_tol + 0.3


def test_goto_uses_config_waypoints(server):
    server.feed_state(hover_x0(), 0.0)
    server.goto()  # no args -> cfg.mission.wps (README.md:250)
    assert len(server._wps) == len(server.cfg.mission.wps)
    np.testing.assert_allclose(server._wps[0].p, server.cfg.mission.wps[0][:3])


def test_joystick_lowpass_and_timeout(server, nmpc, mission_cfg):
    cfg = mission_cfg
    server.feed_state(hover_x0(), 0.0)
    server.feed_joystick([1.0, 0.0, 0.0, 0.0], t=0.0)
    ## low-pass: first sample is (1-alpha) of the command (README.md:224)
    np.testing.assert_allclose(server._joy[0], 1.0 - cfg.mission.joystick_lp_alpha)
    tick = server.tick(0.0)
    assert tick.mode == MissionMode.JOYSTICK and not tick.ref_timed_out

    ## stale joystick stream -> hover fallback (README.md:214 timeout_ref)
    t_late = cfg.mission.timeout_ref + 0.1
    server.feed_state(hover_x0(), t_late)
    tick = server.tick(t_late)
    assert tick.ref_timed_out


def test_image_watchdog_vetoes_flag(server):
    server.feed_state(hover_x0(), 0.0)
    server.set_flag(True)
    assert server.get_flag() is True

    ## no latent ever fed -> flag vetoed
    tick = server.tick(0.0)
    assert not tick.flag_active and tick.img_timed_out

    server.feed_latent(np.zeros(server.cfg.nn.size_latent), np.zeros(3), np.eye(3), t=0.0)
    tick = server.tick(0.5)
    assert tick.flag_active and not tick.img_timed_out

    ## image older than timeout_img -> vetoed again (README.md:215)
    tick = server.tick(server.cfg.mission.timeout_img + 0.6)
    assert not tick.flag_active and tick.img_timed_out
    assert server.get_flag() is True  # desired flag unchanged


def test_yaw_mode_service(server):
    assert server.get_yaw_mode() is False
    server.set_yaw_mode(True)
    assert server.get_yaw_mode() is True and server.refgen.force_yaw_current
    server.set_yaw_mode(False)
    assert server.refgen.force_yaw_current is False


def test_stop_resets_to_starting_state(server):
    server.feed_state(hover_x0(), 0.0)
    server.set_flag(True)
    server.goto()
    server.stop()
    assert server._mode == MissionMode.IDLE
    assert server.get_flag() is False  # constraints disabled (README.md:257)
    assert server._wps == []  # references discarded
    server.feed_state(hover_x0(), 1.0)
    tick = server.tick(1.0)  # IDLE holds position
    assert tick.mode == MissionMode.IDLE


def test_fail_reset_after_max_solver_fail(server, nmpc, monkeypatch):
    server.feed_state(hover_x0(), 0.0)
    server.hover()
    max_fail = int(server.cfg.mpc.max_solver_fail)
    monkeypatch.setattr(nmpc, "solve", lambda: max_fail)
    tick = server.tick(0.0)
    assert tick.did_reset and tick.mode == MissionMode.HOVER
    assert nmpc.fail_count == 0  # controller was reset


def test_stop_and_go_targets_front_waypoint(mission_cfg, nmpc):
    cfg = mission_cfg.replace(mission=dict(stop_and_go=True))
    server = MissionServer(cfg, nmpc)
    server.feed_state(hover_x0(), 0.0)
    server.goto([Waypoint([1.5, 0.0, 0.0])])
    tick = server.tick(0.0)
    assert tick.mode == MissionMode.WPS and tick.wps_left == 1
    ## stop-and-go: the reference list is a non-moving hover at the wp
    np.testing.assert_allclose(nmpc.y[0, :3], [1.5, 0.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(nmpc.y[-1, :3], nmpc.y[0, :3])


def test_control_interface_selection(mission_cfg, nmpc):
    server = MissionServer(mission_cfg.replace(mission=dict(control_interface="acc")), nmpc)
    server.feed_state(hover_x0(), 0.0)
    tick = server.tick(0.0)
    np.testing.assert_allclose(tick.cmd, nmpc.get_cmd_acc())
    with pytest.raises(ValueError):
        MissionServer(mission_cfg.replace(mission=dict(control_interface="bogus")), nmpc)
