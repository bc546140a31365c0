"""Batched closed-loop simulation with analytic SDF scenes."""

from .closed_loop import (
    ClosedLoopResult,
    make_closed_loop,
    make_closed_loop_perception,
    summarize,
)
from .scenes import Scene, make_scene_sdf_fn, render_range_image, scene_sdf
