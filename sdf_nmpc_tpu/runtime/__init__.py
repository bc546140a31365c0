"""Host runtime: native sensor-frame ingestion + the mission state machine."""

from .mission import MissionMode, MissionServer, MissionTick
from .native import FrameRing
