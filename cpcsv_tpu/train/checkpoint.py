"""Checkpoint / resume via Orbax.

Reference protocol (miscc/utils.py:323-338, trainer.py:121-131,482-485):
`netG_epoch_{E}` kept per snapshot interval; discriminators overwritten as
`*_epoch_last`; `--continue_ckpt E` restores everything and resumes at E.

Improvement over the reference (documented deviation): optimizer state and
BN/spectral statistics are saved too, so resume is exact — the reference
loses Adam moments and restarts the LR schedule. Randomness is resume-exact
at epoch granularity: the trainer derives every epoch's jax/numpy streams
from (seed, epoch) (trainer.py train loop, DataLoader.set_epoch), so a
resumed epoch E uses the same noise keys, shuffles and dataset draws as an
uninterrupted run. The one non-checkpointed input state is the image
loader's wrap-around position within an epoch (the reference checkpoints no
loader state at all).
"""

from __future__ import annotations

import os
import shutil
from typing import Optional

import jax
import orbax.checkpoint as ocp

from cpcsv_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, model_dir: str):
        self.model_dir = os.path.abspath(model_dir)
        os.makedirs(self.model_dir, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()
        self._local_ckptr = None

    def _local_restorer(self):
        """Checkpointer whose barriers span ONLY this process. Orbax's
        Checkpointer.restore runs a sync_global_processes barrier in any
        multiprocess runtime even for a purely local numpy read
        (checkpointer.py:310) — inside a @_centralized eval walk only
        process 0 restores, so that barrier deadlocks against the other
        hosts waiting at the walk barrier (found live via a SIGUSR1 stack
        dump of the hung 2-process gloo leg 4). active_processes={self}
        scopes every such barrier to this process; the per-process sync-key
        prefix keeps concurrent local restores on different hosts (the
        --load_ckpt path, where every process restores) from colliding on
        barrier names."""
        if self._local_ckptr is None:
            if jax.process_count() == 1:
                self._local_ckptr = self._ckptr
            else:
                pid = jax.process_index()
                self._local_ckptr = ocp.Checkpointer(
                    ocp.PyTreeCheckpointHandler(),
                    multiprocessing_options=ocp.options.MultiprocessingOptions(
                        primary_host=pid,
                        active_processes={pid},
                        barrier_sync_key_prefix=f"localp{pid}",
                    ),
                )
        return self._local_ckptr

    def _path(self, name: str) -> str:
        return os.path.join(self.model_dir, name)

    def _restore_tree(self, path: str, template):
        """Restore honoring the TEMPLATE's leaf types. Orbax's default
        restores by SAVED metadata — including the recorded sharding file,
        which references the training topology and engages a multihost
        restore path regardless of what the caller passed. A numpy-leaf
        template (the evaluation drivers) therefore gets explicit
        RestoreArgs built from the template, making the read strictly
        process-local full-array numpy (a walk restoring on process 0 only
        would otherwise deadlock against hosts waiting at the walk barrier
        — found live in the 2-process gloo leg 4). A template containing
        jax.Arrays (training resume, every process participating) keeps the
        default saved-metadata behavior unchanged."""
        if any(isinstance(l, jax.Array) for l in jax.tree.leaves(template)):
            return self._ckptr.restore(path, item=template)
        restore_args = ocp.checkpoint_utils.construct_restore_args(template)
        return self._local_restorer().restore(
            path, item=template, restore_args=restore_args
        )

    def save(self, state: TrainState, epoch: int, completed: Optional[int] = None):
        """netG per-epoch snapshot + full train state at 'last'.

        The per-epoch snapshot carries params AND batch_stats/spectral: the
        reference's netG_epoch_E.pth is a full state_dict including BN
        running stats (miscc/utils.py:323-338), so per-epoch eval must not
        borrow BN statistics from a different (latest) state.

        `completed` is the last fully trained epoch index recorded in
        last_epoch.txt for auto-resume. It defaults to `epoch` (in-loop saves
        label the completed epoch), but the END-of-run save keeps the
        reference's netG_epoch_{MAX_EPOCH} snapshot name (trainer.py:482-485
        saves one past the last trained index) while recording
        completed=MAX_EPOCH-1 — otherwise re-running a finished run with a
        raised MAX_EPOCH would resume at old_max+1 and silently skip epoch
        old_max."""
        completed_val = epoch if completed is None else completed
        self.save_generator(state.gen.variables(), epoch)
        self._save_state_atomic(state, completed_val)
        if jax.process_index() == 0:
            # advisory/legacy marker (humans + pre-label checkpoints read it);
            # the load-bearing label is COMPLETED_EPOCH inside the checkpoint.
            # primary-only + write-tmp-then-rename: multi-host runs share
            # model_dir, and a concurrent/interrupted truncate-write would
            # leave an empty file that kills the next auto-resume.
            marker = self._path("last_epoch.txt")
            with open(marker + ".tmp", "w") as f:
                f.write(str(completed_val))
            os.replace(marker + ".tmp", marker)
            # only now is it safe to drop the previous state: every surviving
            # sibling is self-labeled, so a crash at ANY earlier instant
            # leaves restore()/last_epoch() a consistent best checkpoint
            old = self._path("train_state_last.old")
            if os.path.exists(old):
                shutil.rmtree(old)

    _LABEL = "COMPLETED_EPOCH"

    def _save_state_atomic(self, state: TrainState, completed: int):
        """Crash-safe full-state save. Orbax's `force=True` DELETES the
        existing checkpoint before writing the replacement, so a kill during
        the save (found by the round-3 dress rehearsal: only a
        `.orbax-checkpoint-tmp` left behind) loses the only full train state
        and breaks auto-resume. Stage-and-swap instead: write to a staging
        path, label it with the completed-epoch index INSIDE the directory
        (the label travels atomically with the rename — a separate marker
        file can never say which sibling it describes after a crash), then
        rotate previous -> .old -> swap staging in. At every instant at
        least one complete, self-labeled checkpoint exists; restore() and
        last_epoch() pick the one with the highest label."""
        final = self._path("train_state_last")
        staging = final + ".new"
        old = final + ".old"
        primary = jax.process_index() == 0
        if primary and os.path.exists(staging):
            # a LABELED staging dir is a complete crash remnant that
            # restore()/last_epoch() may have treated as the authoritative
            # best state (the run resumed from it) — deleting it before the
            # replacement exists would make a second crash lose the epochs it
            # holds. Promote it to `final` first; only unlabeled (mid-write)
            # remnants are disposable.
            stale_e = self._embedded_epoch(staging)
            final_e = self._embedded_epoch(final) if os.path.exists(final) else None
            if stale_e is not None and (final_e is None or stale_e > final_e):
                if os.path.exists(old):
                    shutil.rmtree(old)
                if os.path.exists(final):
                    os.rename(final, old)
                os.rename(staging, final)
            else:
                shutil.rmtree(staging)
        self._ckptr.save(staging, state, force=True)  # all processes join
        if primary:
            with open(os.path.join(staging, self._LABEL), "w") as f:
                f.write(str(completed))
            if os.path.exists(old):
                shutil.rmtree(old)
            if os.path.exists(final):
                os.rename(final, old)
            os.rename(staging, final)
            # .old is deleted by save() AFTER the advisory marker is written
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("cpcsv_ckpt_swap")

    def _embedded_epoch(self, path: str) -> Optional[int]:
        label = os.path.join(path, self._LABEL)
        try:
            # no exists() pre-check: a concurrent saver can rmtree the
            # sibling between check and open (eval CLI racing the trainer's
            # stage-and-swap rotation) — treat any read failure as unlabeled
            return int(open(label).read().strip())
        except (OSError, ValueError):
            return None

    def _best_state_path(self) -> Optional[str]:
        """The restorable full-state checkpoint: the sibling with the highest
        embedded COMPLETED_EPOCH label, falling back to the legacy preference
        final > .old > .new for unlabeled (pre-label) checkpoints. An
        unlabeled `.new` next to labeled siblings is a crash remnant from
        inside the labeling window and is ignored."""
        final = self._path("train_state_last")
        # priority order breaks label TIES toward `final` (strict > below):
        # equal labels happen when an epoch is retrained (--continue_ckpt E)
        # or a finished run is re-run — the tie candidates then hold the same
        # completed count and `final` is the current one; preferring a
        # sibling would silently discard the newer save and mis-warn "stale"
        candidates = [final, final + ".old", final + ".new"]
        best, best_epoch = None, None
        for p in candidates:
            if not os.path.exists(p):
                continue
            e = self._embedded_epoch(p)
            if e is not None and (best_epoch is None or e > best_epoch):
                best, best_epoch = p, e
        if best is not None:
            return best
        for p in candidates:
            if os.path.exists(p):
                return p
        return None

    def restore(self, template: TrainState, epoch: Optional[int] = None) -> TrainState:
        """Restore the full state; if `epoch` is given, overwrite generator
        variables from that epoch's snapshot (reference --continue_ckpt).

        Picks the stage-and-swap sibling with the highest embedded
        COMPLETED_EPOCH label (see _best_state_path) so that a crash at ANY
        point of the save protocol resumes exactly: the label is read from
        inside the restored checkpoint, never from a marker file that may
        describe a different sibling after a crash."""
        final = self._path("train_state_last")
        state = None
        for attempt in range(3):
            # a concurrent saver can rename the chosen sibling away mid-read
            # (e.g. an eval CLI restoring while the trainer is inside its
            # stage-and-swap rotation); the WHOLE resolve+read is retried,
            # and not only on FileNotFoundError — a mid-read disappearance
            # surfaces from Orbax/TensorStore as ValueError too
            try:
                path = self._best_state_path() or final
                if path != final:
                    import warnings

                    warnings.warn(
                        f"train_state_last "
                        f"{'missing' if not os.path.exists(final) else 'stale'}"
                        f" (crash during save?); restoring from {os.path.basename(path)}"
                    )
                state = self._restore_tree(path, template)
                break
            except (FileNotFoundError, ValueError):
                if attempt == 2:
                    raise
        # Orbax returns leaves in their ON-DISK dtype, not the template's.
        # Cast back so a config flip between runs (e.g. ADAM_MU_DTYPE
        # fp32<->bf16) cannot smuggle a mismatched dtype into the jitted
        # step's carry (scan would fail with an opaque carry-type error).
        state = jax.tree.map(
            lambda t, x: x.astype(t.dtype)
            if hasattr(t, "dtype") and hasattr(x, "dtype") and x.dtype != t.dtype
            else x,
            template,
            state,
        )
        if epoch is not None:
            # no exists() pre-check: restore_generator recovers a crash-swap
            # `.old` remnant and otherwise raises loudly — silently keeping
            # the train-state generator (possibly a LATER epoch) under an
            # explicit --continue_ckpt E would retrain from the wrong weights
            g_vars = self.restore_generator(template.gen.variables(), epoch)
            state = state.replace(
                gen=state.gen.replace(
                    params=g_vars["params"],
                    batch_stats=g_vars["batch_stats"],
                    spectral=g_vars["spectral"],
                )
            )
        return state

    def save_generator(self, variables: dict, epoch: int):
        """Write a standalone netG_epoch_{E} snapshot (params + batch_stats
        [+ spectral]). Stage-and-swap like the full state: Orbax force=True
        deletes the existing snapshot BEFORE writing, so overwriting an
        existing epoch (finished-run re-run, --continue_ckpt E retrain, the
        importer) would otherwise have a crash window that loses the only
        copy of that epoch's eval snapshot."""
        final = self._path(f"netG_epoch_{epoch}")
        staging, old = final + ".new", final + ".old"
        primary = jax.process_index() == 0
        if primary and os.path.exists(staging):
            shutil.rmtree(staging)
        self._ckptr.save(staging, variables, force=True)
        if primary:
            # never delete .old while `final` is missing: if a previous crash
            # left this epoch's only copy in .old, removing it before the
            # replacement is installed would re-open the exact loss window
            # the swap exists to close (the state path promotes remnants for
            # the same reason, _save_state_atomic above)
            if os.path.exists(final):
                if os.path.exists(old):
                    shutil.rmtree(old)
                os.rename(final, old)
            os.rename(staging, final)
            if os.path.exists(old):
                shutil.rmtree(old)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("cpcsv_gsnap_swap")

    def restore_generator(self, variables_template: dict, epoch: int) -> dict:
        """Load netG {params, batch_stats, spectral} for one epoch snapshot
        (reference inference.py:82-89 loads the full state_dict).

        Raises FileNotFoundError when the snapshot is absent — evaluation
        must never silently proceed with init-time statistics."""
        path = self._path(f"netG_epoch_{epoch}")
        if not os.path.exists(path):
            # a kill between save_generator's two renames leaves the data in
            # `.old` with no primary — recoverable, same-epoch content
            old = path + ".old"
            if os.path.exists(old):
                import warnings

                warnings.warn(
                    f"netG_epoch_{epoch} missing but its .old sibling exists "
                    "(crash during snapshot swap?); restoring from it"
                )
                return self._restore_tree(old, variables_template)
            raise FileNotFoundError(
                f"generator snapshot not found: {path} "
                f"(available epochs: {self.available_generator_epochs()})"
            )
        return self._restore_tree(path, variables_template)

    def restore_generator_params_legacy(self, params_template, epoch: int):
        """Read a round-1-format snapshot that stored only params."""
        return self._restore_tree(
            self._path(f"netG_epoch_{epoch}"), params_template
        )

    def last_epoch(self) -> Optional[int]:
        """Last fully trained epoch, read from the best checkpoint's embedded
        label so auto-resume and restore() can never disagree; falls back to
        the legacy last_epoch.txt for pre-label checkpoint dirs."""
        best = self._best_state_path()
        if best is not None:
            embedded = self._embedded_epoch(best)
            if embedded is not None:
                return embedded
        p = self._path("last_epoch.txt")
        if os.path.exists(p):
            return int(open(p).read().strip())
        return None

    def available_generator_epochs(self) -> list[int]:
        out = set()
        for name in os.listdir(self.model_dir):
            if name.startswith("netG_epoch_"):
                tail = name.removeprefix("netG_epoch_")
                if tail.endswith(".new"):
                    continue  # mid-write staging, possibly incomplete
                if tail.endswith(".old"):
                    tail = tail[:-4]  # crash remnant; restore_generator recovers it
                try:
                    out.add(int(tail))
                except ValueError:
                    pass
        return sorted(out)
