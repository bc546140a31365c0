#!/usr/bin/env python
"""End-to-end perception-to-command tick latency on hardware (VERDICT r2
item 2 / reference contract: the full FrameRing -> preprocess -> encode ->
solve -> command tick inside the 10 ms control budget,
reference config/default.yaml:55, README.md:208-257 watchdogs).

Path measured:
  1. HOST:   FrameRing.push(raw u16 depth) + latest()  (native C++ ring,
             fused ClipDistance+Depth2Range; csrc/frame_ring.cpp)
  2. DEVICE: ResNet encoder (270x480 -> 128 latent) + one RTI solve with the
             neural-SDF constraint stack, fused into ONE jitted program
  3. HOST:   command fetch (u0 -> clipped TRPYr)

Timing methodology (docs/performance.md): through the axon tunnel only the
wall-clock span of K DATA-DEPENDENT chained ticks ended by one scalar fetch is
trustworthy; the chain feeds each tick's u0 back into the next image (eps
perturbation) so no work can be skipped.  The tunnel RTT is measured and
reported separately — directly-attached serving sees the on-device figure.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

K = 50  # chained ticks per span
REPEAT = 5


def main():
    import jax
    import jax.numpy as jnp

    from sdf_nmpc_tpu.config import default_config
    from sdf_nmpc_tpu.nn import Encoder, init_neural_df, make_sdf_fn
    from sdf_nmpc_tpu.ocp import build_ocp
    from sdf_nmpc_tpu.runtime.native import FrameRing
    from sdf_nmpc_tpu.solver import init_state, make_rti_step
    from __graft_entry__ import _build

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} ({dev.platform})")

    cfg, ocp, step, states, inputs = _build(batch=1)
    H, W = cfg.sensor.shape_imgs[-2:]

    # ---- 1. host: native frame ring (sensor-units u16 depth in) ----
    ring = FrameRing(cfg)
    rng = np.random.default_rng(0)
    raw = (rng.uniform(0.3, 5.0, size=(H, W)) * cfg.sensor.mm_resolution).astype(
        np.uint16
    )
    t0 = time.perf_counter()
    n_push = 100
    for _ in range(n_push):
        ring.push(raw)
    t_push = (time.perf_counter() - t0) / n_push
    t0 = time.perf_counter()
    for _ in range(n_push):
        frame, ts, stale = ring.latest()
    t_latest = (time.perf_counter() - t0) / n_push
    assert frame is not None and not stale

    # ---- 2. device: encode + solve in one program ----
    # trained production encoder at the matched resolution when present
    # (VERDICT r3 weak #1: the e2e figure must measure the trained stack, not
    # a random init sold as the perception path); random init only as the
    # no-artifacts fallback, and says so
    from sdf_nmpc_tpu.nn.weights import load_prod_encoder

    loaded = load_prod_encoder(expect_img=(H, W), strict=True)
    if loaded is not None:
        enc, enc_vars, _meta = loaded
        print(f"# encoder: trained production checkpoint (weights/, {_meta['img']})")
    else:
        enc = Encoder(1, cfg.nn.size_latent, dropout_rate=0.0, batchnorm=False)
        enc_vars = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 1)))
        print("# encoder: RANDOM INIT fallback (no matching weights/ artifacts)")
    latent_start = ocp.layout.latent_start
    st0 = jax.tree.map(lambda x: x[0], states)
    inp0 = jax.tree.map(lambda x: x[0], inputs)
    img0 = jnp.asarray(frame, jnp.float32)[None, :, :, None]

    warm_step = make_rti_step(ocp, cfg, with_evals=False, budget="steady")

    def tick(carry, _):
        img, st = carry
        latent = enc.apply(enc_vars, img)[0]
        p = inp0.p.at[:, latent_start:].set(latent[None, :])
        res = warm_step(st, inp0._replace(p=p))
        # data dependence: next tick's image depends on this tick's u0
        img = img + 1e-12 * res.u0[0]
        return (img, res.state), res.u0

    @jax.jit
    def chain(img, st):
        (img, st), u0s = jax.lax.scan(tick, (img, st), None, length=K)
        return u0s[-1], st

    @jax.jit
    def chain_encode(img):
        def body(carry, _):
            latent = enc.apply(enc_vars, carry)[0]
            return carry + 1e-12 * latent[0], latent

        img, lat = jax.lax.scan(body, img, None, length=K)
        return lat[-1]

    @jax.jit
    def chain_solve(st):
        def body(carry, _):
            res = warm_step(carry, inp0)
            return res.state, res.u0

        st, u0s = jax.lax.scan(body, st, None, length=K)
        return u0s[-1]

    t0 = time.perf_counter()
    u0, _ = chain(img0, st0)
    float(np.asarray(u0[0]))
    print(f"# compile+first chain: {time.perf_counter() - t0:.1f}s")

    # tunnel RTT: fetch of an already-computed scalar
    t0 = time.perf_counter()
    float(np.asarray(u0[0]))
    rtt = time.perf_counter() - t0

    def span(fn, *args, pick):
        ts = []
        for _ in range(REPEAT):
            t0 = time.perf_counter()
            out = fn(*args)
            float(np.asarray(pick(out)))
            ts.append((time.perf_counter() - t0 - rtt) / K)
        return np.median(ts), np.max(ts)

    med, p99 = span(chain, img0, st0, pick=lambda o: o[0][0])
    med_e, _ = span(chain_encode, img0, pick=lambda o: o[0])
    med_s, _ = span(chain_solve, st0, pick=lambda o: o[0])

    # ---- 3. host: command fetch + clip (u0 -> TRPYr) ----
    u0_np = np.asarray(u0)
    t0 = time.perf_counter()
    for _ in range(n_push):
        cmd = np.clip(
            [u0_np[0] * cfg.robot.limits.gamma * cfg.robot.mass,
             u0_np[1] * cfg.robot.limits.roll,
             u0_np[2] * cfg.robot.limits.pitch,
             u0_np[3] * cfg.robot.limits.wz],
            [0, -cfg.robot.limits.roll, -cfg.robot.limits.pitch, -cfg.robot.limits.wz],
            [cfg.robot.limits.gamma * cfg.robot.mass, cfg.robot.limits.roll,
             cfg.robot.limits.pitch, cfg.robot.limits.wz],
        )
    t_cmd = (time.perf_counter() - t0) / n_push

    host_total = t_push + t_latest + t_cmd
    print(f"host  : ring.push {t_push * 1e6:6.1f} us  ring.latest {t_latest * 1e6:6.1f} us  "
          f"cmd clip {t_cmd * 1e6:6.1f} us  (total {host_total * 1e3:.3f} ms)")
    print(f"device: e2e tick (encode 270x480 + RTI solve) median {med * 1e3:7.3f} ms  "
          f"worst {p99 * 1e3:7.3f} ms   [encode-only {med_e * 1e3:.3f} ms, "
          f"solve-only {med_s * 1e3:.3f} ms]")
    print(f"tunnel RTT (not present when directly attached): {rtt * 1e3:.1f} ms")
    total = host_total + med
    print(f"END-TO-END TICK (host + on-device): {total * 1e3:.3f} ms  "
          f"vs 10 ms budget -> {'MET' if total < 0.010 else 'MISSED'} "
          f"({0.010 / total:.1f}x inside)")


if __name__ == "__main__":
    main()
