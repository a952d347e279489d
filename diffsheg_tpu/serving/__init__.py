"""Network serving: the deployment surface around LiveSession
(TCP daemon + client; the reference ships batch CLI scripts only)."""

from diffsheg_tpu.serving.server import MotionClient, MotionServer

__all__ = ["MotionClient", "MotionServer"]
