"""Native host runtime: sensor-frame ingestion off the GIL."""

from .native import FrameRing
