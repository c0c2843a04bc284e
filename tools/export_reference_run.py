"""Export a cpcsv_tpu run directory to the reference's PyTorch layout —
the exact inverse of tools/port_reference_run.py.

Produces the files the reference trainer itself leaves behind
(miscc/utils.py:323-338, trainer.py:482-485):

    out_dir/netG_epoch_{E}.pth        one per Orbax generator snapshot
    out_dir/netD_im_epoch_last.pth    from train_state_last (when present)
    out_dir/netD_st_epoch_last.pth
    out_dir/netD_se_epoch_last.pth    (SEGMENT_LEARNING only)

Why: the reference's published metric stack runs on pretrained torch/TF
backbones that need network access (pt_inception, Kinetics R(2+1)D, TF-Hub
I3D) — exporting lets a user score a cpcsv_tpu-trained model with the
reference's own unmodified `--eval_fid/--eval_fvd` pipeline
(inference.py:201-230), or hand a run back to a reference-only
collaborator, who can even `--continue_ckpt` it there (the reference resume
loads all four nets and restarts Adam, trainer.py:121-131 — exactly the
information this export carries).

Round-trip identity (reference run -> port_reference_run ->
export_reference_run == original state_dicts) is pinned by
tests/test_export_torch.py.

Usage:
  python tools/export_reference_run.py --cfg cpcsv_tpu/configs/final.yml \
      --run output/final_model [--out output/final_model/export_ref]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--cfg", required=True, help="cpcsv_tpu config yml matching the run")
    p.add_argument(
        "--run", required=True, help="run dir (or its Model/ subdir) to export"
    )
    p.add_argument(
        "--out", default=None, help="output dir for .pth files (default {run}/export_ref)"
    )
    args = p.parse_args(argv)

    from cpcsv_tpu.utils.backend import force_cpu_backend

    force_cpu_backend()

    import jax

    from cpcsv_tpu.config import config_from_file
    from cpcsv_tpu.models.factory import build_models
    from cpcsv_tpu.train.checkpoint import CheckpointManager
    from cpcsv_tpu.train.state import create_train_state
    from cpcsv_tpu.utils.export_torch import (
        export_discriminator_variables,
        export_generator_variables,
        save_torch_state_dict,
    )

    cfg = config_from_file(args.cfg)
    run = os.path.abspath(args.run)
    model_dir = run if os.path.basename(run) == "Model" else os.path.join(run, "Model")
    if not os.path.isdir(model_dir):
        p.error(f"no Model/ checkpoint dir under {args.run}")
    out_dir = args.out or os.path.join(os.path.dirname(model_dir), "export_ref")
    os.makedirs(out_dir, exist_ok=True)

    mgr = CheckpointManager(model_dir)
    models = build_models(cfg)
    template = create_train_state(cfg, jax.random.PRNGKey(0), models)

    # ---- generator snapshots -------------------------------------------
    gen_template = template.gen.variables()
    epochs = mgr.available_generator_epochs()
    for epoch in epochs:
        g_vars = mgr.restore_generator(gen_template, epoch)
        sd = export_generator_variables(
            g_vars, use_segment=cfg.SEGMENT_LEARNING, cascade=cfg.CASCADE_MODEL
        )
        path = os.path.join(out_dir, f"netG_epoch_{epoch}.pth")
        save_torch_state_dict(sd, path)
        print(f"exported Model/netG_epoch_{epoch} -> {os.path.basename(path)}")

    # ---- discriminators from the full train state ----------------------
    exported_ds = False
    try:
        state = mgr.restore(template)
    except (FileNotFoundError, ValueError):
        state = None
    if state is not None:
        d_nets = [("d_im", "image", "netD_im_epoch_last.pth"),
                  ("d_st", "story", "netD_st_epoch_last.pth")]
        if cfg.SEGMENT_LEARNING:
            d_nets.append(("d_se", "seg", "netD_se_epoch_last.pth"))
        for key, kind, fname in d_nets:
            sd = export_discriminator_variables(getattr(state, key).variables(), kind)
            save_torch_state_dict(sd, os.path.join(out_dir, fname))
            print(f"exported train_state.{key} -> {fname}")
        exported_ds = True
        if not epochs:
            # netG snapshots can be absent (e.g. a pruned run dir) while the
            # full state still holds the latest generator — export it under
            # the reference's naming so the run is still usable there
            completed = mgr.last_epoch() or 0
            sd = export_generator_variables(
                state.gen.variables(),
                use_segment=cfg.SEGMENT_LEARNING,
                cascade=cfg.CASCADE_MODEL,
            )
            path = os.path.join(out_dir, f"netG_epoch_{completed}.pth")
            save_torch_state_dict(sd, path)
            print(f"exported train_state.gen -> {os.path.basename(path)}")
            epochs = [completed]

    if not epochs and not exported_ds:
        p.error(f"nothing to export: no netG snapshots or train state in {model_dir}")
    if not exported_ds:
        print(
            "no full train state found: exported generator snapshots only "
            "(the reference can evaluate these; its --continue_ckpt also "
            "needs the three netD_*_epoch_last.pth files)"
        )
    print(f"exported {len(epochs)} generator snapshot(s) into {out_dir}")
    return out_dir


if __name__ == "__main__":
    main()
