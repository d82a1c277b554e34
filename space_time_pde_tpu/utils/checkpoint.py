"""Checkpoint / resume via orbax.

TPU-native equivalent of the reference's ``save_checkpoint`` helper
(``torch.save({epoch, model.state_dict, optimizer.state_dict, ...})``
with ``--resume`` restore): an orbax ``CheckpointManager`` with a keep-N
policy saving the full training pytree — params, optimizer state, step,
PRNG key — plus the config and normalization stats, so a restore
resumes step-exact with identically-sharded state.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from space_time_pde_tpu.train.trainer import TrainState

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True),
        )

    def save(self, step: int, state: TrainState,
             extra: Optional[Dict[str, Any]] = None) -> None:
        payload = {
            "step": state.step,
            "params": state.params,
            "opt_state": state.opt_state,
            "key": state.key,
        }
        # Only present in the BatchNorm encoder mode; omitting it
        # otherwise keeps old checkpoints restorable bit-for-bit.
        if state.batch_stats is not None:
            payload["batch_stats"] = state.batch_stats
        extra_json = jax.tree.map(
            lambda v: v.tolist() if isinstance(v, (np.ndarray, jax.Array))
            else v, extra or {})
        self._mngr.save(step, args=ocp.args.Composite(
            state=ocp.args.StandardSave(payload),
            extra=ocp.args.JsonSave(extra_json)))
        self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def _step_directory(self, step: int):
        return self._mngr.directory / str(step)

    def restore(self, template_state: Optional[TrainState] = None,
                step: Optional[int] = None
                ) -> Tuple[TrainState, Dict[str, Any]]:
        """Restore; with a template, arrays adopt its dtypes/structure."""
        step = step if step is not None else self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        if template_state is not None:
            template = {
                "step": template_state.step,
                "params": template_state.params,
                "opt_state": template_state.opt_state,
                "key": template_state.key,
            }
            if template_state.batch_stats is not None:
                template["batch_stats"] = template_state.batch_stats
            try:
                restored = self._mngr.restore(step, args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(template),
                    extra=ocp.args.JsonRestore()))
            except Exception:
                restored = self._restore_legacy_opt_state(step, template)
        else:
            # Topology-agnostic: restore as host numpy via a template
            # shaped by the checkpoint's own on-disk metadata. Without
            # a template orbax replays the SAVED shardings, so a
            # checkpoint written on a multihost/pod mesh refuses to
            # load on a different topology (e.g. single-host eval of
            # a multihost run). The manager can't produce the metadata
            # itself (item_metadata is None until a handler registers),
            # so read it with standalone checkpointers on the step dir.
            step_dir = self._step_directory(step)
            with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ck:
                meta = ck.metadata(step_dir / "state").item_metadata
                meta = getattr(meta, "tree", meta)
                template = jax.tree.map(
                    lambda m: np.zeros(m.shape, m.dtype), meta)
                state_np = ck.restore(
                    step_dir / "state",
                    args=ocp.args.StandardRestore(template))
            with ocp.Checkpointer(ocp.JsonCheckpointHandler()) as jk:
                extra_np = jk.restore(step_dir / "extra")
            restored = {"state": state_np, "extra": extra_np}
        s = restored["state"]
        state = TrainState(step=s["step"], params=s["params"],
                           opt_state=s["opt_state"], key=s["key"],
                           batch_stats=s.get("batch_stats"))
        return state, restored.get("extra") or {}

    def _restore_legacy_opt_state(self, step, template):
        """Migrate checkpoints that predate ``optax.apply_if_finite``.

        Wrapping the optimizer changed the opt_state pytree (the inner
        state now sits inside an ``ApplyIfFiniteState``), so pre-wrap
        checkpoints fail ``StandardRestore`` against the new template.
        Retry with the template's INNER opt_state (the old layout) and
        re-wrap the restored inner state with the template's fresh
        counters.
        """
        opt_t = template["opt_state"]
        if not hasattr(opt_t, "inner_state"):
            raise
        legacy = dict(template, opt_state=opt_t.inner_state)
        restored = self._mngr.restore(step, args=ocp.args.Composite(
            state=ocp.args.StandardRestore(legacy),
            extra=ocp.args.JsonRestore()))
        restored["state"]["opt_state"] = opt_t._replace(
            inner_state=restored["state"]["opt_state"])
        return restored

    def close(self) -> None:
        self._mngr.close()
