"""GANTrainer — the training driver (reference `trainer.py:42-485`).

Per epoch: iterate the story loader, drain the image loader in lockstep
(wrap-around), run the jitted D-step then G-step, log scalars under the
reference's tensorboard tag names, render the epoch sample grid, apply the
manual LR halving with doubling interval (reference trainer.py:447-456),
snapshot checkpoints every SNAPSHOT_INTERVAL.

Run-dir self-archiving (reference trainer.py:55-61): the YAML config and the
generator/trainer sources are copied into the run dir so that evaluation can
re-import exactly what was trained.
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Optional

import jax
import numpy as np

from cpcsv_tpu.config import Config
from cpcsv_tpu.data.loader import DataLoader, WrapAroundIterator
from cpcsv_tpu.losses.shuffle import create_random_shuffle
from cpcsv_tpu.models import build_models
from cpcsv_tpu.parallel.mesh import make_mesh, shard_batch
from cpcsv_tpu.train.checkpoint import CheckpointManager
from cpcsv_tpu.train.state import TrainState, create_train_state
from cpcsv_tpu.train.steps import make_scan_steps, make_train_steps
from cpcsv_tpu.utils.image import save_image_results, save_story_results
from cpcsv_tpu.utils.logging import MetricsLogger


def lr_at_epoch(base_lr: float, epoch: int, decay_step: int) -> float:
    """Reference schedule (trainer.py:447-456): at the END of each epoch e>0
    with e % current_step == 0, halve the LR and double current_step
    (20, 40, 80, ...). So epoch==decay_step still trains at the PRE-decay
    LR; the halved LR first applies at decay_step+1. Reproduced by replaying
    end-of-epoch halvings for all epochs strictly before `epoch`."""
    lr = base_lr
    step = decay_step
    for e in range(1, epoch):
        if step > 0 and e % step == 0:
            lr *= 0.5
            step *= 2
    return lr


class GANTrainer:
    def __init__(
        self,
        cfg: Config,
        output_dir: str,
        cfg_file: Optional[str] = None,
        continue_ckpt: Optional[int] = None,
        ratio: float = 1.0,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.output_dir = output_dir
        self.model_dir = os.path.join(output_dir, "Model")
        self.image_dir = os.path.join(output_dir, "Image")
        self.log_dir = os.path.join(output_dir, "log")
        self.test_dir = os.path.join(output_dir, "Test")
        for d in (self.model_dir, self.image_dir, self.log_dir, self.test_dir):
            os.makedirs(d, exist_ok=True)

        # run-dir self-archiving (reference trainer.py:55-61)
        if cfg_file and not os.path.exists(os.path.join(output_dir, "setting.yml")):
            shutil.copyfile(cfg_file, os.path.join(output_dir, "setting.yml"))
            pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            shutil.copyfile(
                os.path.join(pkg, "models", "generator.py"),
                os.path.join(output_dir, "generator.py"),
            )
            shutil.copyfile(
                os.path.abspath(__file__), os.path.join(output_dir, "trainer.py")
            )

        self.video_len = cfg.VIDEO_LEN
        self.max_epoch = cfg.TRAIN.MAX_EPOCH
        self.snapshot_interval = cfg.TRAIN.SNAPSHOT_INTERVAL
        self.ratio = ratio
        self.continue_ckpt = continue_ckpt
        self.seed = seed

        self.mesh = make_mesh(cfg.MESH_SHAPE)
        if cfg.BN_BACKEND == "pallas" and self.mesh.size > 1:
            # Mosaic custom calls have no GSPMD partitioning rule: under a
            # sharded batch the pallas_call either fails to partition or
            # replicates (all-gathering every BN layer's activations).
            # The backend is a single-chip experimental opt-in; fail loudly
            # rather than silently de-sharding the data-parallel step.
            raise ValueError(
                "BN_BACKEND='pallas' is single-device only (no SPMD "
                "partitioning rule for the Pallas reductions); use "
                "BN_BACKEND='xla' with a multi-device MESH_SHAPE"
            )
        from cpcsv_tpu.ops.dynamic_filter import pallas_dfn_active

        if pallas_dfn_active(cfg.USE_PALLAS) and self.mesh.size > 1:
            # same rationale as the BN guard above, for the generator's
            # Pallas DFN kernel (ops/pallas/dfn.py): it sits inside the
            # batch-sharded G forward, so a multi-device mesh would hit the
            # same unpartitionable-custom-call wall.
            raise ValueError(
                "USE_PALLAS (Pallas DFN kernel) is single-device only (no "
                "SPMD partitioning rule for the Mosaic custom call); unset "
                "it or train with a 1-device MESH_SHAPE"
            )
        self.models = build_models(cfg)
        self.d_step, self.g_step = make_train_steps(cfg, self.models, ratio=ratio)
        # cfg.SCAN_STEPS > 1: K alternating updates per dispatch (measured
        # faster; semantics identical — see make_scan_steps)
        self.scan_steps = (
            make_scan_steps(cfg, self.models, ratio=ratio)
            if cfg.SCAN_STEPS > 1
            else None
        )
        self.ckpt = CheckpointManager(self.model_dir)
        self.logger = MetricsLogger(self.log_dir)
        self._np_rng = np.random.default_rng(seed)

    # ------------------------------------------------------------------
    def _augment_story_host(self, st_batch):
        """Host-side story augmentation (shared by the per-step and scan
        paths): shuffle stories for the order-consistency branch."""
        if self.cfg.USE_SEQ_CONSISTENCY:
            shuffled, order_labels = create_random_shuffle(
                st_batch["images"], rng=self._np_rng
            )
            st_batch = {**st_batch, "shuffled": shuffled, "order_labels": order_labels}
        return st_batch

    def _device_batches(self, st_batch, im_batch):
        st = shard_batch(self._augment_story_host(st_batch), self.mesh)
        im = shard_batch(im_batch, self.mesh)
        return st, im

    # ------------------------------------------------------------------
    def train(self, imageloader: DataLoader, storyloader: DataLoader, testloader=None):
        cfg = self.cfg
        # independent init/train streams: jax.random.split(k, 5) and
        # split(k, 3) share threefry counter prefixes, so feeding the SAME
        # key to create_train_state and the loop would make the first step's
        # noise keys literally EQUAL the param-init keys (key reuse)
        init_rng, train_rng = jax.random.split(jax.random.PRNGKey(self.seed))
        state = create_train_state(cfg, init_rng, self.models)

        if cfg.NET_G:
            # warm-start generator from a snapshot dir (reference
            # trainer.py:109-114 NET_G preload). Our netG_epoch_E snapshots
            # store the FULL {params, batch_stats, spectral} variables dict
            # (checkpoint.py:35-41) — restoring against a params-only
            # template would fail on the tree mismatch and, for a legacy
            # params-only dir, silently drop BN/spectral state.
            import orbax.checkpoint as ocp

            template = state.gen.variables()
            try:
                g_vars = ocp.PyTreeCheckpointer().restore(
                    os.path.abspath(cfg.NET_G), item=template
                )
                state = state.replace(
                    gen=state.gen.replace(
                        params=g_vars["params"],
                        batch_stats=g_vars["batch_stats"],
                        spectral=g_vars["spectral"],
                    )
                )
            except Exception:
                # legacy params-only snapshot: params restore, stats warned
                g_params = ocp.PyTreeCheckpointer().restore(
                    os.path.abspath(cfg.NET_G), item=state.gen.params
                )
                state = state.replace(gen=state.gen.replace(params=g_params))
                import warnings

                warnings.warn(
                    f"NET_G={cfg.NET_G} is a params-only snapshot; BN running "
                    "stats and spectral-norm state start from init",
                    stacklevel=2,
                )
            print("Load netG from:", cfg.NET_G)

        start_epoch = 0
        if self.continue_ckpt == "auto":
            # crash-resume: pick up AFTER the last fully saved epoch (the
            # checkpoint is written once that epoch completed — resuming AT
            # it would train it twice)
            last = self.ckpt.last_epoch()
            if last is not None:
                state = self.ckpt.restore(state)
                start_epoch = last + 1
                print(f"Auto-resume from epoch {start_epoch}")
        elif self.continue_ckpt:
            # explicit --continue_ckpt E keeps the REFERENCE semantics
            # (trainer.py:232-235): training restarts AT epoch E, i.e. the
            # checkpointed epoch is re-trained — a preserved quirk
            state = self.ckpt.restore(state, epoch=int(self.continue_ckpt))
            start_epoch = int(self.continue_ckpt)
            print(f"Continue training from epoch {start_epoch}")

        image_iter = WrapAroundIterator(imageloader)
        num_step = len(storyloader)
        count = 0
        c_time = time.time()
        print(f"LR DECAY EPOCH: {cfg.TRAIN.LR_DECAY_EPOCH}")

        from cpcsv_tpu.utils.profiling import profile_env_dir

        # armed until one warm trace is captured (either step path)
        self._profile_pending = profile_env_dir()

        last_st_batch = None
        for epoch in range(start_epoch, self.max_epoch):
            start_t = time.time()
            # per-epoch randomness derived from (seed, epoch), not from loop
            # history: epoch E draws the same noise keys, shuffle
            # permutations and dataset crops whether it is reached directly
            # or via --continue_ckpt auto (resume-exact randomness; a
            # resumed run can never replay epochs 0..E-1's already-consumed
            # streams)
            rng = jax.random.fold_in(train_rng, epoch)
            self._np_rng = np.random.default_rng([self.seed, epoch])
            for loader in (storyloader, imageloader):
                if hasattr(loader, "set_epoch"):
                    loader.set_epoch(epoch)
            lr_g = lr_at_epoch(cfg.TRAIN.GENERATOR_LR, epoch, cfg.TRAIN.LR_DECAY_EPOCH)
            lr_d = lr_at_epoch(
                cfg.TRAIN.DISCRIMINATOR_LR, epoch, cfg.TRAIN.LR_DECAY_EPOCH
            )
            stats = {}
            from cpcsv_tpu.data.prefetch import device_prefetch

            profile_dir = self._profile_pending

            def paired_batches():
                for st_host in storyloader:
                    yield st_host, next(image_iter)

            def log_row(metrics_row, i):
                """Reference logging cadence: story-D scalars every step
                (trainer.py:357-360), everything else every 20 (:432-435)."""
                stats.update(metrics_row)
                step = i + num_step * epoch
                for tag in ("st_D/loss", "st_D/real", "st_D/fake", "st_D/order"):
                    if tag in metrics_row:
                        self.logger.add_scalar(tag, metrics_row[tag], step)
                if i % 20 == 0:
                    self.logger.add_scalars(
                        {k: v for k, v in stats.items() if not k.startswith("st_D/")},
                        step,
                    )

            trace_active = False
            if self.scan_steps is None:

                def put(pair):
                    st_host, im_host = pair
                    st_dev, im_dev = self._device_batches(st_host, im_host)
                    return st_host, st_dev, im_dev

                # host decode + H2D transfer overlap the previous device step
                for i, (st_batch_host, st_batch, im_batch) in enumerate(
                    device_prefetch(paired_batches(), put, depth=2)
                ):
                    last_st_batch = (st_batch_host, st_batch)

                    rng, k_d, k_g = jax.random.split(rng, 3)
                    if profile_dir and i == 2:
                        jax.profiler.start_trace(profile_dir)
                        trace_active = True
                    # D and G dispatched back-to-back, ONE readback per pair
                    # (the device_get below): measured 80.7 ms/step on the
                    # tunnel (PARITY.md) — the +400 ms no-readback pathology
                    # applies to consecutive SCAN chunks, not this pair
                    state, d_metrics = self.d_step(state, k_d, st_batch, im_batch, lr_d)
                    state, g_metrics = self.g_step(state, k_g, st_batch, im_batch, lr_g)
                    if profile_dir and i == 5:
                        jax.block_until_ready(state)
                        jax.profiler.stop_trace()
                        trace_active = False
                        profile_dir = None
                        self._profile_pending = None
                    # one device->host transfer for all scalars (not per tag)
                    d_metrics = jax.device_get(d_metrics)
                    g_metrics = jax.device_get(g_metrics)
                    log_row({**d_metrics, **g_metrics}, i)
                    count += 1
            else:
                # cfg.SCAN_STEPS alternating updates per dispatch: K host
                # batches are stacked on a leading (unsharded) axis and ride
                # into lax.scan as inputs; metrics come back stacked and are
                # logged at the exact same cadence as the per-step path.
                K = cfg.SCAN_STEPS

                def chunked():
                    chunk = []
                    for pair in paired_batches():
                        if chunk and (
                            pair[0]["images"].shape != chunk[0][0]["images"].shape
                            or pair[1]["images"].shape != chunk[0][1]["images"].shape
                        ):
                            # ragged batch (drop_last=False tail): flush so
                            # every chunk stacks cleanly
                            yield chunk
                            chunk = []
                        chunk.append(pair)
                        if len(chunk) == K:
                            yield chunk
                            chunk = []
                    if chunk:
                        yield chunk  # shorter final chunk: one extra compile

                def put_chunk(chunk):
                    st_hosts = [self._augment_story_host(st) for st, _ in chunk]
                    im_hosts = [im for _, im in chunk]

                    def stack(dicts):
                        return {
                            k: np.stack([d[k] for d in dicts])
                            for k, v in dicts[0].items()
                            if isinstance(v, np.ndarray)
                        }

                    st_k = shard_batch(stack(st_hosts), self.mesh, scan_axis=True)
                    im_k = shard_batch(stack(im_hosts), self.mesh, scan_axis=True)
                    return st_hosts[-1], len(chunk), st_k, im_k

                i = 0
                # depth=1: one chunk in flight is already K batches of HBM
                # residency; deeper prefetch multiplies it for little overlap
                for ci, (st_host_last, k_len, st_k, im_k) in enumerate(
                    device_prefetch(chunked(), put_chunk, depth=1)
                ):
                    last_st_batch = (st_host_last, None)
                    rng, sub = jax.random.split(rng)
                    # profile the first WARM chunk of the run (ci>=1 in any
                    # epoch; chunk 0 is compile-laden)
                    tracing = self._profile_pending and ci == 1
                    if tracing:
                        jax.profiler.start_trace(self._profile_pending)
                    state, metrics = self.scan_steps(state, sub, st_k, im_k, lr_d, lr_g)
                    if tracing:
                        jax.block_until_ready(state)
                        jax.profiler.stop_trace()
                        self._profile_pending = None
                    metrics = jax.device_get(metrics)  # stacked over k_len
                    for j in range(k_len):
                        log_row({k: v[j] for k, v in metrics.items()}, i)
                        i += 1
                        count += 1

            if trace_active:  # epoch ended mid-trace (short epoch)
                jax.block_until_ready(state)
                jax.profiler.stop_trace()
                self._profile_pending = None

            # ---- epoch sample grid (reference trainer.py:437-444)
            if last_st_batch is not None:
                # dedicated key split off the stream: passing the live `rng`
                # here and then reusing it for training noise could make the
                # sample-grid key coincide with a future step key
                rng, k_sample = jax.random.split(rng)
                self._log_epoch_samples(state, epoch, *last_st_batch, k_sample)

            self.logger.add_scalar("learning/generator", lr_g, epoch)
            self.logger.add_scalar("learning/st_discriminator", lr_d, epoch)
            self.logger.add_scalar("learning/im_discriminator", lr_d, epoch)

            if cfg.EVALUATE_FID_SCORE and testloader is not None:
                self.calculate_vfid(state, epoch, testloader)

            epoch_time = time.time() - start_t
            total_mins = int((time.time() - c_time) / 60)
            frames_per_step = (
                cfg.TRAIN.ST_BATCH_SIZE * cfg.VIDEO_LEN + cfg.TRAIN.IM_BATCH_SIZE
            )
            fps = num_step * frames_per_step / max(epoch_time, 1e-9)
            self.logger.add_scalar("perf/frames_per_sec", fps, epoch)
            self.logger.add_scalar("perf/epoch_seconds", epoch_time, epoch)
            print(
                f"----[{epoch}/{self.max_epoch}] epoch time {epoch_time:.1f}s "
                f"({fps:.0f} frames/s), total {total_mins} mins----"
            )

            if epoch % self.snapshot_interval == 0:
                self.ckpt.save(state, epoch)
        # final save keeps the reference snapshot name netG_epoch_{MAX_EPOCH}
        # but records the true last completed epoch for auto-resume
        self.ckpt.save(state, self.max_epoch, completed=self.max_epoch - 1)
        if self._profile_pending:
            print(
                "WARNING: CPCSV_PROFILE_DIR was set but the run was too short "
                "to capture a warm trace (needs >= 2 dispatch chunks)"
            )
        self.logger.flush()
        return state

    # ------------------------------------------------------------------
    def _log_epoch_samples(self, state: TrainState, epoch, st_batch_host, st_batch, rng):
        cfg = self.cfg
        net_g = self.models[0]
        if not hasattr(self, "_sample_jit"):
            @jax.jit
            def _sample(variables, motion, content, key):
                o = net_g.apply(
                    variables, motion, content, cfg.SEGMENT_LEARNING, False,
                    method="sample_videos", rngs={"noise": key},
                )
                return o.image, o.seg

            self._sample_jit = _sample
        st_motion = np.concatenate(
            [st_batch_host["description"], st_batch_host["labels"]], axis=2
        )
        image, seg = self._sample_jit(
            state.gen.variables(),
            jax.numpy.asarray(st_motion),
            jax.numpy.asarray(st_batch_host["description"]),
            rng,
        )
        fake = np.asarray(image)
        grid = save_story_results(
            st_batch_host["images"], fake, st_batch_host.get("text"),
            f"{epoch:03d}", self.image_dir,
        )
        self.logger.add_image("pororo", grid, epoch)
        if cfg.SEGMENT_LEARNING and seg is not None:
            seg_grid = save_image_results(None, np.asarray(seg), cfg.VIDEO_LEN)
            self.logger.add_image("segment", seg_grid, epoch)

    # ------------------------------------------------------------------
    def calculate_ssim(self, state: TrainState, epoch: int, testloader):
        """In-training SSIM hook (reference trainer.py:176-185; its call is
        commented out at :472 — available here, invoked on demand)."""
        from cpcsv_tpu.evaluation.datasets import StoryGANSSIMDataset
        from cpcsv_tpu.evaluation.ssim import ssim_score

        ds = StoryGANSSIMDataset(
            self.models[0], state.gen.variables(), testloader.dataset,
            jax.random.PRNGKey(5678 + epoch), text_dim=self.cfg.TEXT.DIMENSION,
            mesh=self.mesh,
        )
        value = ssim_score(ds[i] for i in range(len(ds)))
        self.logger.add_scalar("Evaluation/ssim", value, epoch)
        return value

    def calculate_vfid(self, state: TrainState, epoch: int, testloader):
        """In-training FID/FSD hook (reference trainer.py:160-174).

        Extractors are built (and jitted, and random-init-warned) ONCE on
        first use and held on the trainer for all subsequent epochs."""
        from cpcsv_tpu.evaluation.drivers import (
            evaluate_fid_fsd_in_memory,
            make_in_memory_extractors,
        )

        if not hasattr(self, "_eval_extractors"):
            self._eval_extractors = make_in_memory_extractors()
        scores = evaluate_fid_fsd_in_memory(
            self.cfg, self.models[0], state.gen.variables(), testloader,
            rng=jax.random.PRNGKey(1234 + epoch),
            extractors=self._eval_extractors, mesh=self.mesh,
        )
        self.logger.add_scalar("Evaluation/vfid", scores["fsd"], epoch)
        self.logger.add_scalar("Evaluation/fid", scores["fid"], epoch)
        return scores
