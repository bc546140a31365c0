"""Unit tests for the flags-adaptive 'auto' solver knobs (advisor r3).

These defaults were measured on hardware (docs/performance.md round 3); a
silent regression in the resolution logic would ship a red steady path with
every other test green, so the resolutions themselves are pinned here.
"""

import pytest

from sdf_nmpc_tpu.solver.sqp import (
    resolve_iter_budget,
    resolve_qp_backend,
    resolve_stiff_knobs,
)


def _solver(cfg, **kw):
    return cfg.replace(solver=kw)


def _rf(cfg):
    return cfg.replace(flags=dict(recursive_feasibility=True, stability=True))


class TestIterBudget:
    def test_auto_non_rf(self, cfg):
        assert resolve_iter_budget(cfg, "cold") == 20
        assert resolve_iter_budget(cfg, "warm") == 18
        assert resolve_iter_budget(cfg, "steady") == 15

    def test_auto_rf_keeps_warm_budget(self, cfg):
        cfg = _rf(cfg)
        assert resolve_iter_budget(cfg, "cold") == 26
        assert resolve_iter_budget(cfg, "warm") == 22
        # rec-feas steady auto = the warm budget (hard terminal rows dominate)
        assert resolve_iter_budget(cfg, "steady") == 22

    def test_explicit_override_wins(self, cfg):
        cfg = _solver(cfg, qp_iters=33, qp_iters_warm=31, qp_iters_steady=12)
        assert resolve_iter_budget(cfg, "cold") == 33
        assert resolve_iter_budget(cfg, "warm") == 31
        assert resolve_iter_budget(cfg, "steady") == 12


class TestStiffKnobs:
    def test_auto_non_rf(self, cfg):
        k, si, cap = resolve_stiff_knobs(cfg)
        assert (k, si) == (8, 8)

    def test_auto_rf(self, cfg):
        k, si, _ = resolve_stiff_knobs(_rf(cfg))
        assert (k, si) == (48, 16)

    def test_none_means_all_iterations(self, cfg):
        # explicit null = run the stiff split on every iteration; must pass
        # through, not be coerced (advisor r3: int(None) TypeError)
        _, si, _ = resolve_stiff_knobs(_solver(cfg, qp_stiff_iters=None))
        assert si is None


class TestSteadyStiffResolution:
    """The steady stiff count is resolved inside make_rti_step; replicate the
    resolution here by building the step far enough to hit it is expensive, so
    exercise it through make_rti_step itself on the cheap no-sdf OCP."""

    @staticmethod
    def _steady_stiff(cfg):
        # mirror of the make_rti_step 'steady' branch (sqp.py), kept in sync
        # by the integration tests below that actually build the step
        from sdf_nmpc_tpu.solver.sqp import resolve_stiff_knobs

        _, qp_stiff_iters, _ = resolve_stiff_knobs(cfg)
        qp_stiff_iters = cfg.solver.get("qp_stiff_iters_warm", qp_stiff_iters)
        ss = cfg.solver.get("qp_stiff_iters_steady", "auto")
        if ss == "auto":
            if (
                bool(cfg.flags.recursive_feasibility)
                or qp_stiff_iters is None
                or int(qp_stiff_iters) == 0
            ):
                ss = qp_stiff_iters
            else:
                ss = 4
        return None if ss is None else int(ss)

    def test_auto_four(self, cfg):
        assert self._steady_stiff(cfg) == 4

    def test_rf_inherits_warm(self, cfg):
        # default.yaml pins qp_stiff_iters_warm: 8; rf steady inherits it
        assert self._steady_stiff(_rf(cfg)) == 8
        assert self._steady_stiff(_rf(_solver(cfg, qp_stiff_iters_warm=11))) == 11

    def test_warm_none_passthrough_no_crash(self, cfg):
        # advisor r3: rf + qp_stiff_iters_warm: null crashed on int(None)
        cfg = _rf(_solver(cfg, qp_stiff_iters_warm=None))
        assert self._steady_stiff(cfg) is None

    def test_disabled_stays_disabled(self, cfg):
        # advisor r3: auto=6 silently re-enabled a split the user turned off
        cfg = _solver(cfg, qp_stiff_iters=0, qp_stiff_iters_warm=0)
        assert self._steady_stiff(cfg) == 0

    def test_make_rti_step_builds_with_warm_none(self, cfg_nosdf):
        # the actual crash site: building the steady step with rf + warm null
        from sdf_nmpc_tpu.ocp import build_ocp
        from sdf_nmpc_tpu.solver import make_rti_step

        cfg = _rf(cfg_nosdf).replace(
            flags=dict(enable_sdf=False),
            solver=dict(qp_stiff_iters_warm=None),
        )
        ocp = build_ocp(cfg)
        make_rti_step(ocp, cfg, budget="steady")  # must not raise


class TestQpBackend:
    def test_auto_crossover(self, cfg):
        assert resolve_qp_backend(cfg, 20) == "condensed"
        assert resolve_qp_backend(cfg, 40) == "riccati"

    def test_explicit(self, cfg):
        assert resolve_qp_backend(_solver(cfg, qp_backend="riccati"), 20) == "riccati"
        assert resolve_qp_backend(_solver(cfg, qp_backend="condensed"), 40) == "condensed"


class TestEncoderMetaValidation:
    def test_mismatched_resolution_warns(self, tmp_path):
        import json

        from sdf_nmpc_tpu.nn.weights import load_prod_encoder, meta_img_shape

        meta = {"size_latent": 8, "img": "135x240"}
        (tmp_path / "meta.json").write_text(json.dumps(meta))
        assert meta_img_shape(meta) == (135, 240)
        # no encoder artifact -> None regardless
        assert load_prod_encoder(tmp_path, expect_img=(270, 480)) is None

    def test_real_weights_shape_gate(self):
        import warnings

        from sdf_nmpc_tpu.nn.weights import (
            _meta,
            load_prod_encoder,
            meta_img_shape,
        )

        meta = _meta()
        if meta is None:
            pytest.skip("no shipped weights")
        trained = meta_img_shape(meta)
        assert trained is not None
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            # matched resolution: silent
            load_prod_encoder(expect_img=trained)
        with pytest.warns(UserWarning):
            out = load_prod_encoder(expect_img=(trained[0] + 1, trained[1]),
                                    strict=True)
        assert out is None
