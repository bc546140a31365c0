"""sdf_nmpc_tpu — TPU-native neural-SDF NMPC framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ntnu-arl/sdf-nmpc
(IJRR 2025, "Neural NMPC through Signed Distance Field Encoding for Collision
Avoidance").  The reference couples acados (C, SQP-RTI) + L4CasADi + libtorch on
CPU/GPU; this framework instead expresses the entire perception-to-control
pipeline as one jittable JAX program:

    image -> VAE encoder -> latent -> batched SQP-RTI solve (neural SDF inside
    the constraint/cost pipeline) -> command

and scales it over TPU meshes by sharding a *scenario* axis (thousands of
concurrent NMPC problems) with ``shard_map`` + XLA collectives.

Layer map (mirrors reference layers, see /root/repo/SURVEY.md §1):
  config.py           L1  typed config (static/trace-time vs dynamic split)
  math.py             L2  quaternion/rotation/spherical/poly math, pure jnp
  models/             L3  dynamics models (acc, att, att_tau, rates, wrench, props)
  ocp.py              L4  cost/constraint assembly (fov, sdf, rec-feas, stability)
  solver/             L5  SQP-RTI engine: ERK4+sensitivities, condensing, batched IP QP
  controller.py       L6  Nmpc runtime facade (warm-start carry, fail status)
  nn/                 L7  NeuralDF / VAE / embeddings in flax + torch weight import
  perception/         L8  image preprocessing + VAE runtime wrapper
  ref_gen.py          L9  reference generation (waypoints, joystick, yaw modes)
  data/               L10 GT SDF data engine (collision check, df computer, samplers)
  scripts/            L11 training / eval entry points
  theory/             L12 braking-distance + stability constants
  parallel/           —   mesh / sharding utilities (scenario-parallel scale-out)
  ops/                —   Pallas TPU kernels (fused SDF MLP value+Jacobian)
"""

from importlib.resources import as_file, files
from pathlib import Path

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy convenience re-exports (keeps bare `import sdf_nmpc_tpu` light)."""
    if name == "Nmpc":
        from .controller import Nmpc

        return Nmpc
    if name == "build_ocp":
        from .ocp import build_ocp

        return build_ocp
    if name == "default_config":
        from .config import default_config

        return default_config
    if name == "load_config":
        from .config import load_config

        return load_config
    raise AttributeError(name)


def default_config_dir() -> Path:
    """Directory holding packaged YAML configs (reference: sdf_nmpc/__init__.py:6)."""
    cfg_pkg = files("sdf_nmpc_tpu") / "config"
    with as_file(cfg_pkg) as p:
        return Path(p)


def default_data_dir() -> Path:
    """Directory holding packaged weights/data (reference: sdf_nmpc/__init__.py:11)."""
    data_pkg = files("sdf_nmpc_tpu") / "data_files"
    with as_file(data_pkg) as p:
        return Path(p)


def cache_dir() -> Path:
    """User cache dir. The JAX design needs no codegen cache; this holds the
    persistent XLA compilation cache and fitted offline artifacts
    (reference: sdf_nmpc/__init__.py:16 kept codegen here)."""
    import os

    d = Path(os.environ.get("SDF_NMPC_TPU_CACHE", Path.home() / ".cache" / "sdf_nmpc_tpu"))
    d.mkdir(parents=True, exist_ok=True)
    return d
