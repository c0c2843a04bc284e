"""Import a reference CP-CSV PyTorch run into a cpcsv_tpu run directory.

The reference trainer leaves behind (miscc/utils.py:323-338,
trainer.py:482-485):

    Model/netG_epoch_{E}.pth          one per SNAPSHOT_INTERVAL + final
    Model/netD_im_epoch_last.pth      latest image discriminator
    Model/netD_st_epoch_last.pth      latest story discriminator
    Model/netD_se_epoch_last.pth      latest seg discriminator (SEGMENT_LEARNING)

This tool converts that layout into ours, so a reference user can bring a
trained run across and immediately (a) walk it with `--eval_fid 1` /
`--eval_fvd 1` / `--load_ckpt E`, and (b) continue training it with
`--continue_ckpt auto`:

    out_dir/Model/netG_epoch_{E}      Orbax snapshot per ported epoch
    out_dir/Model/train_state_last    full state (ported G + 3 Ds, fresh Adam)
    out_dir/Model/last_epoch.txt      completed-epoch marker

Every ported leaf is validated against the config-built model templates
(path must exist, shape must match) and every template leaf must be covered
— a cfg/checkpoint mismatch (wrong CASCADE_MODEL, GF_DIM, USE_SEQ_CONSISTENCY
...) fails loudly instead of producing a silently-wrong import.

Notes on semantics:
  * Adam moments are initialized fresh: the reference never saves optimizer
    state, so `--continue_ckpt` there restarts Adam too (trainer.py:121-131)
    — the import matches that exactly.
  * `--completed` controls the resume point. Default: the highest ported
    netG epoch E, treating it as an in-loop snapshot (reference saves
    netG_epoch_E after finishing loop index E). If the run FINISHED, the
    reference's final save is named one PAST the last trained index
    (netG_epoch_{MAX_EPOCH} for a 0..MAX_EPOCH-1 loop) — pass
    `--completed E-1` in that case to keep the LR-decay schedule aligned.

Usage:
  python tools/port_reference_run.py --cfg cpcsv_tpu/configs/final.yml \
      --src /path/to/reference_run/Model [--out output/final_ported] \
      [--completed N]
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
        return out
    out[prefix] = tree
    return out


def merge_ported(template: dict, ported: dict, label: str) -> dict:
    """Overlay ported leaves onto a config-built variables template with
    exact-coverage validation in BOTH directions."""
    t_flat = _flatten(template)
    p_flat = _flatten(ported)
    unknown = [p for p in p_flat if p not in t_flat]
    if unknown:
        raise ValueError(
            f"{label}: ported checkpoint contains {len(unknown)} leaves the "
            f"config-built model does not have (config mismatch?). First few: "
            f"{['/'.join(p) for p in unknown[:5]]}"
        )
    missing = [t for t in t_flat if t not in p_flat]
    if missing:
        raise ValueError(
            f"{label}: checkpoint is missing {len(missing)} leaves the model "
            f"requires (config mismatch?). First few: "
            f"{['/'.join(t) for t in missing[:5]]}"
        )
    merged = {}
    for path, t_leaf in t_flat.items():
        p_leaf = np.asarray(p_flat[path])
        if tuple(p_leaf.shape) != tuple(np.shape(t_leaf)):
            raise ValueError(
                f"{label}: shape mismatch at {'/'.join(path)}: checkpoint "
                f"{p_leaf.shape} vs model {np.shape(t_leaf)}"
            )
        node = merged
        for k in path[:-1]:
            node = node.setdefault(k, {})
        # read the dtype from the leaf, never np.asarray(t_leaf): the
        # template lives on-device and materializing it host-side would pull
        # a full model copy over the TPU tunnel per merged checkpoint
        node[path[-1]] = p_leaf.astype(getattr(t_leaf, "dtype", np.float32))
    return merged


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--cfg", required=True, help="cpcsv_tpu config yml matching the run")
    p.add_argument(
        "--src",
        required=True,
        help="reference Model/ dir (or run dir containing Model/), or a single netG .pth",
    )
    p.add_argument("--out", default=None, help="output run dir (default output/{CONFIG_NAME}_ported)")
    p.add_argument(
        "--completed",
        type=int,
        default=None,
        help="completed-epoch label for auto-resume (default: highest netG epoch)",
    )
    p.add_argument("--seed", type=int, default=0, help="init seed for fresh (non-ported) state")
    args = p.parse_args(argv)

    from cpcsv_tpu.utils.backend import force_cpu_backend

    force_cpu_backend()

    import jax
    import torch

    from cpcsv_tpu.config import config_from_file
    from cpcsv_tpu.models.factory import build_models
    from cpcsv_tpu.train.checkpoint import CheckpointManager
    from cpcsv_tpu.train.state import create_train_state
    from cpcsv_tpu.utils.port_torch import (
        port_discriminator_state_dict,
        port_generator_state_dict,
    )

    cfg = config_from_file(args.cfg)
    src = os.path.abspath(args.src)
    if os.path.isfile(src) and src.endswith(".zip"):
        # the reference ships its pretrained run as final_model.zip, dropped
        # into ./output (reference README.md:73-87) — accept it directly
        import atexit
        import shutil
        import tempfile
        import zipfile

        extract_dir = tempfile.mkdtemp(prefix="cpcsv_ref_zip_")
        # a full extracted reference run is easily GBs; never leave it in /tmp
        # (atexit rather than try/finally: the extracted files are read
        # throughout the rest of this function, including on error paths)
        atexit.register(shutil.rmtree, extract_dir, ignore_errors=True)
        with zipfile.ZipFile(src) as zf:
            zf.extractall(extract_dir)
        by_dir: dict[str, int] = {}
        for root, _, files in os.walk(extract_dir):
            n = sum(1 for f in files if re.match(r"netG_epoch_\d+\.pth$", f))
            if n:
                by_dir[root] = n
        if not by_dir:
            p.error(f"no netG_epoch_*.pth found inside {args.src}")
        src = max(by_dir, key=by_dir.get)
        print(f"extracted {args.src} -> importing from {src}")
    if os.path.isfile(src):
        netg_files = [src]
        model_dir = os.path.dirname(src)
    else:
        if os.path.isdir(os.path.join(src, "Model")):
            src = os.path.join(src, "Model")
        def _epoch_of(f):
            m = re.search(r"netG_epoch_(\d+)\.pth$", os.path.basename(f))
            return int(m.group(1)) if m else -1

        # numeric sort: the LAST file processed must be the highest epoch
        # (its merged variables seed the full train state below)
        netg_files = sorted(
            glob.glob(os.path.join(src, "netG_epoch_*.pth")), key=_epoch_of
        )
        model_dir = src
    if not netg_files:
        p.error(f"no netG_epoch_*.pth found under {src}")

    out_dir = args.out or os.path.join("output", f"{cfg.CONFIG_NAME}_ported")
    mgr = CheckpointManager(os.path.join(out_dir, "Model"))

    models = build_models(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(args.seed), models)

    # ---- generator snapshots -------------------------------------------
    gen_template = state.gen.variables()
    epochs = []
    merged_gen = None
    for path in netg_files:
        m = re.search(r"netG_epoch_(\d+)\.pth$", os.path.basename(path))
        epoch = int(m.group(1)) if m else 0
        sd = torch.load(path, map_location="cpu")
        ported = port_generator_state_dict(
            sd, use_segment=cfg.SEGMENT_LEARNING, cascade=cfg.CASCADE_MODEL
        )
        # the generator has no SN layers; its (empty) spectral collection
        # comes from the template
        ported.setdefault("spectral", gen_template["spectral"])
        merged_gen = merge_ported(gen_template, ported, os.path.basename(path))
        for coll, sub in gen_template.items():
            # leaf-less collections (the generator's empty "spectral") carry
            # no data but must exist so restore_generator's template matches
            merged_gen.setdefault(coll, sub)
        mgr.save_generator(merged_gen, epoch)
        epochs.append(epoch)
        print(f"ported {os.path.basename(path)} -> Model/netG_epoch_{epoch}")

    # ---- full train state (G + Ds) for --continue_ckpt ----------------
    d_files = {
        "d_im": ("image", os.path.join(model_dir, "netD_im_epoch_last.pth")),
        "d_st": ("story", os.path.join(model_dir, "netD_st_epoch_last.pth")),
        "d_se": ("seg", os.path.join(model_dir, "netD_se_epoch_last.pth")),
    }
    have_ds = {k: os.path.exists(f) for k, (_, f) in d_files.items()}
    need = ["d_im", "d_st"] + (["d_se"] if cfg.SEGMENT_LEARNING else [])
    completed = args.completed if args.completed is not None else max(epochs)

    if all(have_ds[k] for k in need):
        top_epoch = max(epochs)
        g_vars = mgr.restore_generator(gen_template, top_epoch) if merged_gen is None else merged_gen
        state = state.replace(
            gen=state.gen.replace(
                params=g_vars["params"],
                batch_stats=g_vars["batch_stats"],
                spectral=g_vars["spectral"],
            )
        )
        for key in need:
            kind, path = d_files[key]
            sd = torch.load(path, map_location="cpu")
            net_state = getattr(state, key)
            merged = merge_ported(
                net_state.variables(),
                port_discriminator_state_dict(sd, kind),
                os.path.basename(path),
            )
            state = state.replace(
                **{
                    key: net_state.replace(
                        params=merged["params"],
                        batch_stats=merged["batch_stats"],
                        spectral=merged["spectral"],
                    )
                }
            )
            print(f"ported {os.path.basename(path)} -> train_state.{key}")
        # Adam moments fresh by construction — the reference never saves
        # optimizer state, so --continue_ckpt there restarts Adam too.
        mgr.save(state, top_epoch, completed=completed)
        print(
            f"wrote full train state (completed epoch {completed}); "
            f"`--continue_ckpt auto` resumes at epoch {completed + 1}"
        )
    else:
        missing = [d_files[k][1] for k in need if not have_ds[k]]
        # deliberately NO last_epoch.txt here: without a full train state the
        # marker would arm `--continue_ckpt auto` to fail on a missing
        # train_state_last instead of starting fresh
        print(
            "no full train state written (missing discriminator checkpoints: "
            f"{[os.path.basename(m) for m in missing]}); eval walks still work, "
            "and cfg.NET_G can warm-start training from a netG snapshot"
        )
        if args.completed is not None:
            print(
                f"WARNING: --completed {args.completed} had no effect — the "
                "resume point is recorded with the full train state, which "
                "needs the discriminator checkpoints above; `--continue_ckpt "
                "auto` on this run dir will start fresh"
            )

    # ---- setting.yml: pin reference-default semantics for eval walks ----
    # The reference's shipped checkpoints were TRAINED with the model.py:361
    # content-tiling mispairing; write the run config with TORCH_REPEAT_QUIRK
    # on (unless the source cfg pins it explicitly) so
    # `--cfg {out_dir}/setting.yml` eval walks reproduce reference pairing.
    import yaml

    with open(args.cfg) as f:
        raw_cfg = yaml.safe_load(f) or {}
    if "TORCH_REPEAT_QUIRK" in raw_cfg:
        print(
            f"setting.yml: keeping explicit TORCH_REPEAT_QUIRK="
            f"{raw_cfg['TORCH_REPEAT_QUIRK']} from {args.cfg}"
        )
    else:
        raw_cfg["TORCH_REPEAT_QUIRK"] = True
        print(
            "setting.yml: TORCH_REPEAT_QUIRK: true (reference model.py:361 "
            "content tiling — what the imported checkpoints were trained with)"
        )
    setting_path = os.path.join(out_dir, "setting.yml")
    with open(setting_path, "w") as f:
        yaml.safe_dump(raw_cfg, f, sort_keys=False)
    print(f"wrote {setting_path}; pass it as --cfg when walking this run")

    print(f"imported {len(epochs)} generator snapshot(s) into {out_dir}")
    return out_dir


if __name__ == "__main__":
    main()
