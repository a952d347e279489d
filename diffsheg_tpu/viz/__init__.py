"""Visualization: the self-contained HTML motion player
(the reference's vendored pymo mocap web player, redesigned)."""

from diffsheg_tpu.viz.player import export_bvh_player, export_player_html

__all__ = ["export_bvh_player", "export_player_html"]
