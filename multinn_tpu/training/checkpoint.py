"""Checkpoint/resume (SURVEY C18, §5.3/§5.4).

orbax-backed (async-capable, sharding-aware, atomic-rename) checkpoints of a
single pytree ``{params, opt_state, rng, step, epoch}`` — the ONE artifact
consumed by trainer-resume, evaluation and the generator (the reference's
shared tf.train.Saver format is this contract [B:5]). Retention: keep-last N
plus keep-best on validation loss. Restart recovery = restore-latest (JAX/TPU
jobs are gang-scheduled; no elastic membership — §5.3).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, keep_last: int = 3,
                 keep_best: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        # Genuinely last-N ∪ best-1 (union preservation policy). The naive
        # (max_to_keep + best_fn) combination keeps the best-N instead of the
        # last-N, and keep_checkpoints_without_metrics=True makes every
        # metric-less periodic save immortal — unbounded disk growth on long
        # runs.
        from orbax.checkpoint import checkpoint_managers as cm
        pp = cm.preservation_policy
        policies = [pp.LatestN(keep_last)]
        if keep_best:
            policies.append(pp.BestN(
                get_metric_fn=lambda m: -float(m["valid_loss"]), n=1,
                keep_checkpoints_without_metrics=False))
        # best_fn/best_mode only when keep_best: orbax rejects an explicit
        # best_mode=None (its default is 'max', validated before the
        # best_fn-is-None short-circuit)
        best_kw = ({"best_fn": lambda m: m["valid_loss"],
                    "best_mode": "min"} if keep_best else {})
        options = ocp.CheckpointManagerOptions(
            preservation_policy=pp.AnyPreservationPolicy(policies),
            enable_async_checkpointing=True,
            **best_kw,
        )
        self._mngr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Dict[str, Any],
             metrics: Optional[Dict[str, float]] = None) -> bool:
        """Returns orbax's decision: False means the save was refused
        (e.g. the step already exists) — callers should surface that."""
        return self._mngr.save(step, args=ocp.args.StandardSave(state),
                               metrics=metrics)

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mngr.best_step()

    def restore(self, template: Dict[str, Any],
                step: Optional[int] = None) -> Tuple[Dict[str, Any], int]:
        """Restore into the structure of ``template`` (shapes/dtypes/static
        fields come from the template — required because params pytrees carry
        non-array static config). step=None -> latest.

        Forward compatibility: checkpoints written by older versions may
        lack keys the current template has (e.g. ``epoch_step0``); those
        keep their template defaults via a partial restore, with a warning
        naming the step so silent corruption can't hide behind it."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        try:
            return self._mngr.restore(
                step, args=ocp.args.StandardRestore(template)), step
        except Exception:
            import logging
            log = logging.getLogger("multinn")
            meta = self._mngr.item_metadata(step).tree
            missing = sorted(set(template) - set(meta))
            # restore the stored-key subset only; keys the checkpoint
            # predates (e.g. ``epoch_step0``) keep their template defaults
            work = {k: v for k, v in template.items() if k in meta}
            if missing:
                log.warning(
                    "checkpoint @ step %d predates state keys %s; restoring "
                    "the stored subset (missing keys keep template defaults)",
                    step, missing)
            opt_reset = False
            try:
                partial = self._mngr.restore(
                    step, args=ocp.args.StandardRestore(work))
            except Exception:
                # Optimizer-STATE structure changes across versions (e.g. the
                # r4 multi_transform encoder freeze rewrapped opt_state) must
                # not brick the artifact: params/step/rng restore fine on
                # their own, which is ALL the generator/evaluator need, and
                # the trainer re-initializes a fresh optimizer state (losing
                # only Adam moments). Without this, every pre-change DBN
                # checkpoint became unloadable even read-only (r4 review).
                if "opt_state" not in work:
                    raise
                # orbax requires the restore template to cover every STORED
                # key, so the incompatible opt_state is restored into a
                # throwaway skeleton built from the checkpoint's own metadata
                # (its true stored structure), then discarded.
                skeleton = jax.tree.map(
                    lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype),
                    meta["opt_state"])
                pruned = {k: (skeleton if k == "opt_state" else v)
                          for k, v in work.items()}
                try:
                    partial = self._mngr.restore(
                        step, args=ocp.args.StandardRestore(pruned))
                except Exception as exc:
                    raise RuntimeError(
                        f"checkpoint @ step {step} does not match the "
                        "current state structure even without opt_state"
                    ) from exc
                partial.pop("opt_state", None)
                opt_reset = True
                log.warning(
                    "checkpoint @ step %d has an incompatible opt_state "
                    "structure (optimizer changed across versions); restored "
                    "everything else — training resume will re-initialize "
                    "the optimizer state (losing moments), eval/generation "
                    "are unaffected", step)
            restored = dict(template)
            restored.update(partial)
            if opt_reset:
                restored["__opt_state_reset__"] = True
            return restored, step

    def close(self) -> None:
        self._mngr.wait_until_finished()
        self._mngr.close()
