"""Multi-device tests on the virtual 8-CPU mesh: sharded batches, replicated
params, full D+G step through jit with XLA-inserted collectives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpcsv_tpu.parallel.mesh import batch_sharding, make_mesh, replicate, shard_batch


def test_virtual_mesh_has_8_cpu_devices():
    """Guard the conftest jax.config forcing (jax_platforms=cpu +
    jax_num_cpu_devices=8): if a jax upgrade or the site hook breaks it,
    fail HERE with a clear message instead of deep in a sharding test."""
    assert len(jax.devices()) == 8, "conftest 8-device CPU forcing broken"
    assert jax.devices()[0].platform == "cpu"


def test_make_mesh_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_make_mesh_shape_string():
    mesh = make_mesh("data:4")
    assert mesh.devices.size == 4
    assert mesh.axis_names == ("data",)


def test_shard_batch_places_on_mesh():
    mesh = make_mesh()
    batch = {
        "images": np.zeros((16, 8, 8, 3), np.float32),
        "text": ["a"] * 16,  # non-array dropped
    }
    out = shard_batch(batch, mesh)
    assert "text" not in out
    assert out["images"].sharding.spec == batch_sharding(mesh).spec


def test_per_host_loader_slices_partition_global_batch():
    """Multi-host input pipeline: the per-process loaders' slices must
    concatenate (in process order) to exactly the single-process global
    batch — same seed => same global permutation on every host."""
    from cpcsv_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.float32)}

    global_loader = DataLoader(DS(), 8, shuffle=True, drop_last=True, seed=5)
    host_loaders = [
        DataLoader(DS(), 8, shuffle=True, drop_last=True, seed=5,
                   process_index=p, process_count=4)
        for p in range(4)
    ]
    for g, *hs in zip(global_loader, *host_loaders):
        merged = np.concatenate([h["x"] for h in hs], axis=0)
        np.testing.assert_array_equal(g["x"], merged)
        assert hs[0]["x"].shape[0] == 2  # 8 global / 4 hosts

    # unsliced(): the centralized-eval view of a per-host loader yields the
    # FULL global batches (drivers.py @_centralized runs eval on process 0
    # over this view), with the same shuffle stream; the original loader
    # object is untouched
    full_view = host_loaders[3].unsliced()
    assert (full_view.process_index, full_view.process_count) == (0, 1)
    assert (host_loaders[3].process_index, host_loaders[3].process_count) == (3, 4)
    # unsliced() resets the shuffle stream to seed-fresh, so compare against
    # a FRESH global loader (the one above already consumed a permutation)
    fresh_global = DataLoader(DS(), 8, shuffle=True, drop_last=True, seed=5)
    for g, f in zip(fresh_global, full_view):
        np.testing.assert_array_equal(g["x"], f["x"])
    assert global_loader.unsliced() is global_loader  # no-op single-process


def test_per_host_loader_rejects_indivisible_batch():
    from cpcsv_tpu.data.loader import DataLoader

    with pytest.raises(ValueError):
        DataLoader([], 7, process_index=0, process_count=2)


@pytest.mark.parametrize(
    "variant",
    [
        dict(USE_SEQ_CONSISTENCY=True),
        dict(USE_INFONCE=True),
    ],
    ids=["seq_consistency", "infonce"],
)
def test_variant_matrix_8dev_matches_1dev(variant):
    """The optional loss branches under the sharded batch axis (VERDICT r2
    #8): USE_SEQ_CONSISTENCY runs the host-side shuffled story batch through
    the VideoEncoder order head; USE_INFONCE builds B x B pairwise logits
    across the sharded batch — exactly where XLA's inserted collectives can
    silently change the math. 8-device metrics must match the 1-device
    program (reference branches miscc/utils.py:110-122)."""
    import jax.numpy as jnp

    from cpcsv_tpu.config import GanConfig, default_config
    from cpcsv_tpu.losses.shuffle import create_random_shuffle
    from cpcsv_tpu.models import build_models
    from cpcsv_tpu.train import create_train_state, make_train_steps

    cfg = default_config().with_updates(
        CASCADE_MODEL=False,
        SEGMENT_LEARNING=False,
        GAN=GanConfig(CONDITION_DIM=124, Z_DIM=100, DF_DIM=8, GF_DIM=4, GF_SEG_DIM=16),
        **variant,
    )
    models = build_models(cfg)
    B, T = 8, cfg.VIDEO_LEN
    rng = np.random.default_rng(0)
    st_host = {
        "images": rng.standard_normal((B, T, 64, 64, 3)).astype(np.float32),
        "description": rng.standard_normal((B, T, 356)).astype(np.float32),
        "labels": (rng.random((B, T, 9)) < 0.3).astype(np.float32),
    }
    if cfg.USE_SEQ_CONSISTENCY:
        shuffled, order_labels = create_random_shuffle(
            st_host["images"], rng=np.random.default_rng(7)
        )
        st_host.update(shuffled=shuffled, order_labels=order_labels)
    im_host = {
        "images": rng.standard_normal((B, 64, 64, 3)).astype(np.float32),
        "description": rng.standard_normal((B, 356)).astype(np.float32),
        "labels": (rng.random((B, 9)) < 0.3).astype(np.float32),
        "content": rng.standard_normal((B, T, 356)).astype(np.float32),
    }

    def run(n_dev):
        mesh = make_mesh(f"data:{n_dev}", jax.devices()[:n_dev])
        state = create_train_state(cfg, jax.random.PRNGKey(0), models)
        state = jax.device_put(state, replicate(mesh))
        d_step, g_step = make_train_steps(cfg, models)
        st_b = shard_batch(st_host, mesh)
        im_b = shard_batch(im_host, mesh)
        state, d_m = d_step(state, jax.random.PRNGKey(1), st_b, im_b, 4e-4)
        state, g_m = g_step(state, jax.random.PRNGKey(2), st_b, im_b, 1e-4)
        jax.block_until_ready(state)
        return {k: float(np.asarray(v)) for k, v in {**d_m, **g_m}.items()}

    m8, m1 = run(8), run(1)
    assert m8.keys() == m1.keys()
    if cfg.USE_SEQ_CONSISTENCY:
        assert any("order" in k for k in m8), m8.keys()
    for k in m8:
        assert np.isfinite(m8[k]), f"{k} not finite on 8 devices"
        # rtol 5e-3: the deep R(2+1)D consistency branch amplifies fp32
        # reduction-order differences to ~1.3e-3 (measured); real sharding
        # bugs show up as O(1) mismatches
        np.testing.assert_allclose(
            m8[k], m1[k], rtol=5e-3, atol=1e-4,
            err_msg=f"8-device metric {k} != 1-device ({variant})",
        )


def test_eval_shardings_divide_by_data_axis_not_mesh_size():
    """On a multi-axis mesh, eval sharding partitions over P("data") only,
    so divisibility must be checked against the data-axis extent — checking
    mesh.size (round-4 review finding) silently declined shardable batches
    (4 % 8 != 0) and accepted batches the data axis can't split."""
    from cpcsv_tpu.parallel.mesh import eval_shardings

    mesh = make_mesh("data:4,model:2")
    batch_sh, repl = eval_shardings(mesh, 4)  # divides data:4, not size 8
    assert batch_sh is not None and repl is not None
    assert batch_sh.spec == batch_sharding(mesh).spec

    batch_sh, _ = eval_shardings(mesh, 6)  # ragged vs data:4 -> decline
    assert batch_sh is None

    # no "data" axis at all (extent 1): never shard
    batch_sh, _ = eval_shardings(make_mesh("replica:8"), 8)
    assert batch_sh is None


def test_shard_eval_inputs_cache_and_passthrough():
    """The shared eval-sharding helper (drivers + eval datasets both use it):
    sharded when the batch divides the mesh, passthrough on ragged tails,
    and the replicated-variables device_put happens once per distinct
    variables object (identity-keyed cache — load_epoch swapping the dict
    must invalidate it, repeated chunks must not re-transfer)."""
    from cpcsv_tpu.parallel.mesh import shard_eval_inputs

    mesh = make_mesh()
    variables = {"params": {"w": np.ones((4, 4), np.float32)}}
    cache: dict = {}

    # divisible batch: arrays sharded over the mesh, variables replicated
    arrays = (np.zeros((16, 3), np.float32), np.zeros((16, 5), np.float32))
    (a0, a1), v = shard_eval_inputs(mesh, arrays, variables, cache)
    assert a0.sharding.spec == batch_sharding(mesh).spec
    assert v is cache["repl"] and cache["src"] is variables
    first_repl = cache["repl"]

    # same variables object again: cached replication reused, no new put
    _, v2 = shard_eval_inputs(mesh, arrays, variables, cache)
    assert v2 is first_repl

    # load_epoch swaps the dict (new identity): cache must re-replicate
    variables_b = {"params": {"w": np.zeros((4, 4), np.float32)}}
    _, v3 = shard_eval_inputs(mesh, arrays, variables_b, cache)
    assert v3 is not first_repl and cache["src"] is variables_b

    # ragged tail (17 % 8 != 0): passthrough, inputs untouched
    ragged = (np.zeros((17, 3), np.float32),)
    (r0,), vr = shard_eval_inputs(mesh, ragged, variables, cache)
    assert r0 is ragged[0] and vr is variables

    # no mesh: passthrough
    (p0, p1), vp = shard_eval_inputs(None, arrays, variables, cache)
    assert p0 is arrays[0] and vp is variables


def test_dryrun_multichip_entrypoint():
    """The driver's multi-chip validation must pass on the virtual mesh."""
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "_graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_make_eval_mesh_fallbacks():
    """make_eval_mesh: (a) a configured mesh larger than this host falls
    back to all local devices with a warning (walking a run trained on more
    chips must not die in make_mesh's assert); (b) unshardable=True (the
    Pallas DFN kernel is active in the generator forward — Mosaic custom
    calls have no GSPMD partitioning rule) narrows to a 1-device mesh so
    eval_shardings declines and the walk runs unsharded."""
    from cpcsv_tpu.parallel.mesh import eval_shardings, make_eval_mesh

    with pytest.warns(UserWarning, match="falls back"):
        mesh = make_eval_mesh("data:16")
    assert mesh.devices.size == 8

    with pytest.warns(UserWarning, match="partitioning rule"):
        mesh = make_eval_mesh("", unshardable=True)
    assert mesh.devices.size == 1
    assert eval_shardings(mesh, 8) == (None, None)

    # fits + shardable: no warning, normal mesh
    assert make_eval_mesh("data:4").devices.size == 4

    # unshardable on a run CONFIGURED 1-device: nothing is narrowed, so no
    # warning (round-4 advisor finding — the old gate used raw local device
    # count and warned spuriously on multi-device hosts)
    import warnings as _warnings

    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        mesh = make_eval_mesh("data:1", unshardable=True)
    assert mesh.devices.size == 1


def test_pallas_dfn_active_gating(monkeypatch):
    """pallas_dfn_active: cfg flag gated by backend; env CPCSV_USE_PALLAS
    overrides the flag in BOTH directions. This predicate is what keeps the
    unpartitionable Mosaic DFN kernel out of sharded programs (trainer
    guard + make_eval_mesh unshardable), so its table must be exact."""
    from cpcsv_tpu.ops.dynamic_filter import pallas_dfn_active

    monkeypatch.delenv("CPCSV_USE_PALLAS", raising=False)
    assert pallas_dfn_active(True) is False  # cpu backend -> never dispatches
    assert pallas_dfn_active(None) is False

    with monkeypatch.context() as m:
        m.setattr(jax, "default_backend", lambda: "tpu")
        assert pallas_dfn_active(True) is True
        assert pallas_dfn_active(False) is False
        m.setenv("CPCSV_USE_PALLAS", "0")  # env wins over cfg True
        assert pallas_dfn_active(True) is False
        m.setenv("CPCSV_USE_PALLAS", "1")  # env wins over cfg False
        assert pallas_dfn_active(False) is True
