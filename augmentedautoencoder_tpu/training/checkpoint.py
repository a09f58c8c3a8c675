"""Checkpointing: orbax-backed, codebook-in-checkpoint like the reference.

On-disk layout under <log_dir>/checkpoints/ (reference ae/utils.py:60-65
names the TF basename `chkpt`; we keep the naming scheme, one orbax directory
per step):

    chkpt-<global_step>/
      params/ [batch_stats/] opt_state-less train pytree
      codebook arrays once `ae_embed` has run:
        embedding_normalized (N, latent) float32
        embed_obj_bbs        (N, 4)      int32

Crucially the codebook LIVES IN THE CHECKPOINT (reference codebook.py:27-48:
non-trainable Variables saved by the same tf Saver, re-saved by ae_embed),
so inference needs only the checkpoint + the train cfg copied into the
log dir. Restore honors `at_step`; default is the latest step
(ae_factory.py:149-172 semantics).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"^chkpt-(\d+)$")


class CheckpointManager:
    """Save/restore train state + codebook under a checkpoint dir."""

    def __init__(self, checkpoint_dir: str):
        self.checkpoint_dir = os.path.abspath(checkpoint_dir)
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # ------------------------------------------------------------- paths
    def path_for_step(self, step: int) -> str:
        return os.path.join(self.checkpoint_dir, f"chkpt-{step}")

    def all_steps(self) -> List[int]:
        steps = []
        if os.path.isdir(self.checkpoint_dir):
            for name in os.listdir(self.checkpoint_dir):
                m = _CKPT_RE.match(name)
                if m:
                    steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def resolve_step(self, at_step: Optional[int] = None) -> Optional[int]:
        """Latest step, or the checkpoint matching `at_step` (substring match
        on the step string, like the reference's --at_step)."""
        if at_step is None:
            return self.latest_step()
        for s in self.all_steps():
            if str(at_step) in str(s):
                return s
        return None

    # ------------------------------------------------------------- save
    def save(self, step: int, payload: Dict[str, Any], overwrite: bool = True) -> str:
        path = self.path_for_step(step)
        if os.path.exists(path):
            if not overwrite:
                return path
            import shutil

            shutil.rmtree(path)
        payload = dict(payload)
        payload["step"] = np.asarray(step, np.int64)
        self._ckptr.save(path, payload)
        self._ckptr.wait_until_finished()
        return path

    def save_train_state(self, step: int, state, extra: Optional[Dict[str, Any]] = None) -> str:
        # opt_state is stored as flattened leaves: optax states are
        # NamedTuples whose structure orbax cannot rebuild without a target;
        # the live train state supplies the treedef at restore time
        payload: Dict[str, Any] = {
            "params": jax.device_get(state.params),
            "opt_state": jax.device_get(jax.tree.leaves(state.opt_state)),
        }
        if state.batch_stats is not None:
            payload["batch_stats"] = jax.device_get(state.batch_stats)
        if extra:
            payload.update(extra)
        # carry the codebook forward so periodic saves don't drop it
        prev = self.latest_step()
        if prev is not None and "embedding_normalized" not in payload:
            old = self.restore(prev)
            for key in ("embedding_normalized", "embed_obj_bbs"):
                if old is not None and key in old:
                    payload[key] = old[key]
        return self.save(step, payload)

    # ------------------------------------------------------------- restore
    def restore(self, step: Optional[int] = None) -> Optional[Dict[str, Any]]:
        step = self.resolve_step(step)
        if step is None:
            return None
        return self._ckptr.restore(self.path_for_step(step))

    def restore_train_state(self, state, step: Optional[int] = None):
        """Restore into a live train state (supplies the opt_state treedef).

        Returns (state, payload) or (state, None) when no checkpoint exists.
        """
        payload = self.restore(step)
        if payload is None:
            return state, None
        opt_state = state.opt_state
        if "opt_state" in payload:
            treedef = jax.tree.structure(state.opt_state)
            opt_state = jax.tree.unflatten(treedef, payload["opt_state"])
        state = state.replace(
            params=payload["params"],
            opt_state=opt_state,
            step=int(payload["step"]),
            batch_stats=payload.get("batch_stats", state.batch_stats),
        )
        return state, payload

    def add_codebook(
        self,
        embedding_normalized: np.ndarray,
        embed_obj_bbs: Optional[np.ndarray],
        step: Optional[int] = None,
    ) -> str:
        """Re-save the latest (or given) checkpoint with the codebook inside
        (the ae_embed re-save, reference ae_embed.py:87-91)."""
        step = self.resolve_step(step)
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.checkpoint_dir}")
        payload = self.restore(step)
        payload["embedding_normalized"] = np.asarray(embedding_normalized, np.float32)
        if embed_obj_bbs is not None:
            payload["embed_obj_bbs"] = np.asarray(embed_obj_bbs, np.int32)
        return self.save(step, payload)
