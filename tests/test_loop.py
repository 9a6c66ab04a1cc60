"""End-to-end training-loop smoke tests on synthetic data (the framework's
equivalent of the reference's --debug/--break-zero smoke path, SURVEY.md §4)."""

import numpy as np
import pytest

# end-to-end tier: minutes-long training/eval runs; excluded from the
# fast logic tier via `pytest -m "not kernel and not slow"`
pytestmark = pytest.mark.slow

from mpgan_tpu.data.jetnet import JetNetDataset
from mpgan_tpu.training.config import from_args_dict
from mpgan_tpu.training.loop import Trainer


def _tiny_args(tmp_path, **overrides):
    d = dict(
        name="smoke",
        model="mpgan",
        jets="g",
        num_hits=10,
        hidden_node_size=8,
        fe=[12],
        fn=[16],
        batch_size=32,
        num_epochs=2,
        save_epochs=1,
        save_model_epochs=1,
        eval_tot_samples=300,
        w1_num_samples=[100],
        fpd=True,
        dir_path=str(tmp_path),
        gen_dropout=0.0,
        disc_dropout=0.0,
        load_model=False,
        save_zero=False,
    )
    d.update(overrides)
    return from_args_dict(d)


def _datasets(num_hits=10, mask_feature=True):
    kw = dict(jet_type="g", data_dir=None, num_particles=num_hits,
              synthetic_num_jets=600, mask_feature=mask_feature)
    return (JetNetDataset(**kw, split="train"), JetNetDataset(**kw, split="valid"))


def test_trainer_end_to_end(tmp_path):
    args = _tiny_args(tmp_path)
    train_ds, valid_ds = _datasets()
    trainer = Trainer(args, train_dataset=train_ds, valid_dataset=valid_ds)
    trainer.train()

    # losses recorded for both epochs
    assert len(trainer.losses["G"]) == 2
    assert len(trainer.losses["D"]) == 2
    assert all(np.isfinite(trainer.losses["G"]))
    # eval ran every epoch: w1 metrics + fpd recorded
    assert len(trainer.losses["w1m"]) == 2
    assert len(trainer.losses["fpd"]) == 2
    # checkpoints + loss txts + figures on disk
    out = tmp_path / "smoke"
    assert (out / "models" / "state_2.npz").exists()
    assert (out / "losses" / "G.txt").exists()
    assert list((out / "figs").glob("*.pdf"))


def test_trainer_resume(tmp_path):
    args = _tiny_args(tmp_path)
    train_ds, valid_ds = _datasets()
    Trainer(args, train_dataset=train_ds, valid_dataset=valid_ds).train()

    args2 = _tiny_args(tmp_path, num_epochs=3, load_model=True)
    trainer2 = Trainer(args2, train_dataset=train_ds, valid_dataset=valid_ds)
    assert trainer2.start_epoch == 2
    # loss history reloaded (2 completed epochs)
    assert len(trainer2.losses["G"]) == 2
    trainer2.train()
    assert (tmp_path / "smoke" / "models" / "state_3.npz").exists()


def test_trainer_resume_preserves_best_epoch_and_args_card(tmp_path):
    """Resume regressions from VERDICT r1: best_epoch state must be reloaded
    (setup_training.py:1588-1596) and the args card must not be rewritten
    (setup_training.py:1159-1163)."""
    args = _tiny_args(tmp_path)
    train_ds, valid_ds = _datasets()
    t1 = Trainer(args, train_dataset=train_ds, valid_dataset=valid_ds)
    t1.train()
    # the tiny synthetic model's FPD exceeds the reference's initial 10.0
    # bar, so no best epoch was recorded (reference-parity behavior); write
    # the file as a run with a real best epoch would have
    best = [[0, 10.0], [2, 3.5]]
    np.savetxt(tmp_path / "smoke" / "best_epoch.txt", np.asarray(best))

    card = tmp_path / "smoke" / "smoke_args.txt"
    # simulate the card being the original run's record
    sentinel = card.read_text()

    args2 = _tiny_args(tmp_path, num_epochs=3, load_model=True)
    t2 = Trainer(args2, train_dataset=train_ds, valid_dataset=valid_ds)
    # best-epoch history reloaded, not reset to the sentinel
    assert np.allclose(np.asarray(t2.best_epoch), np.asarray(best))
    # the card was not clobbered by the resume
    assert card.read_text() == sentinel


def test_trainer_name_collision_guard(tmp_path):
    """setup_training.py:1088-1094: a fresh run (load_model=False) must not
    silently overwrite an existing run of the same name."""
    args = _tiny_args(tmp_path, num_epochs=1)
    train_ds, valid_ds = _datasets()
    Trainer(args, train_dataset=train_ds, valid_dataset=valid_ds)

    with pytest.raises(RuntimeError, match="already exists"):
        Trainer(_tiny_args(tmp_path, num_epochs=1),
                train_dataset=train_ds, valid_dataset=valid_ds)
    # --override-load-check bypasses the guard
    Trainer(_tiny_args(tmp_path, num_epochs=1, override_load_check=True),
            train_dataset=train_ds, valid_dataset=valid_ds)
    # name == "test" is exempt (reference quirk, kept for parity)
    Trainer(_tiny_args(tmp_path, num_epochs=1, name="test"),
            train_dataset=train_ds, valid_dataset=valid_ds)
    Trainer(_tiny_args(tmp_path, num_epochs=1, name="test"),
            train_dataset=train_ds, valid_dataset=valid_ds)


def test_cli_reload_args_on_resume(tmp_path):
    """setup_training.py:1164-1177: on resume the saved card overrides CLI
    args (except num_epochs/paths); --override-args keeps the CLI args."""
    from mpgan_tpu.cli.train import _reload_args_on_resume

    args = _tiny_args(tmp_path, num_epochs=1)
    train_ds, valid_ds = _datasets()
    Trainer(args, train_dataset=train_ds, valid_dataset=valid_ds).train()

    cli_args = _tiny_args(tmp_path, num_epochs=5, load_model=True,
                          hidden_node_size=24)  # divergent flag
    merged = _reload_args_on_resume(cli_args)
    assert merged.hidden_node_size == 8  # card wins
    assert merged.num_epochs == 5  # CLI wins for num_epochs
    assert merged.load_model

    kept = _reload_args_on_resume(
        _tiny_args(tmp_path, num_epochs=5, load_model=True,
                   hidden_node_size=24, override_args=True))
    assert kept.hidden_node_size == 24


def test_trainer_gapt(tmp_path):
    args = _tiny_args(
        tmp_path, name="smoke_gapt", model="gapt", model_D="gapt",
        gapt_embed_dim=16, num_heads=2, sab_layers_gen=1, sab_layers_disc=1,
        fpd=False,
    )
    train_ds, valid_ds = _datasets()
    trainer = Trainer(args, train_dataset=train_ds, valid_dataset=valid_ds)
    trainer.train()
    assert len(trainer.losses["w1m"]) == 2
    assert all(np.isfinite(trainer.losses["G"]))


def test_checkpoint_save_is_atomic(tmp_path):
    """save_train_state writes tmp + os.replace: no partial state_N.npz can
    exist (preempted-job durability), no .tmp residue survives a successful
    save, and a stale .tmp from a crashed save neither breaks latest-epoch
    discovery nor the reload."""
    from mpgan_tpu.training import checkpoint as ckpt
    from mpgan_tpu.training.train_step import TrainState

    state = TrainState(
        g_params={"w": np.ones((2, 2), np.float32)}, g_state={},
        d_params={"w": np.zeros((3,), np.float32)}, d_state={},
        g_opt_state={"m": np.zeros((2, 2), np.float32)},
        d_opt_state={"m": np.zeros((3,), np.float32)},
        rng=np.zeros(2, np.uint32),
    )
    models = tmp_path / "models"
    models.mkdir()
    # leftover from a simulated crash mid-save of epoch 2
    (models / "state_2.npz.tmp").write_bytes(b"truncated garbage")
    ckpt.save_train_state(ckpt.checkpoint_path(models, 1), state)
    assert ckpt.latest_epoch(models) == 1  # .tmp ignored by discovery
    assert not (models / "state_1.npz.tmp").exists()
    restored = ckpt.load_train_state(ckpt.checkpoint_path(models, 1), state)
    np.testing.assert_array_equal(restored.g_params["w"], state.g_params["w"])


def test_trainer_gapt_mesh(tmp_path):
    """GAPT under a mesh: the scanned sharded epoch + sharded eval path is
    model-agnostic (the mesh Trainer tests above all run mpgan); this pins
    that the attention stack (jet-head-packed SAB/PMA kernels) composes
    with shard_map the same way."""
    import jax

    assert jax.device_count() >= 8
    args = _tiny_args(
        tmp_path, name="gapt_mesh", model="gapt", model_D="gapt",
        gapt_embed_dim=16, num_heads=2, sab_layers_gen=1, sab_layers_disc=1,
        fpd=False, mesh_shape=8,
    )
    train_ds, valid_ds = _datasets()
    trainer = Trainer(args, train_dataset=train_ds, valid_dataset=valid_ds)
    assert trainer._mesh is not None and trainer._mesh.size == 8
    trainer.train()
    assert trainer._staged is not None, "mesh GAPT run must keep the epoch scan"
    assert len(trainer.losses["w1m"]) == 2
    assert all(np.isfinite(trainer.losses["G"]))
    assert (tmp_path / "gapt_mesh" / "models" / "state_2.npz").exists()


def test_trainer_mesh_knn(tmp_path):
    """knn under a mesh: the Pallas select + gather kernels execute
    per-shard inside shard_map (the partitioner cannot split a custom
    call), composed with the scanned epoch. Small cloud so interpret-mode
    kernels stay fast; N deliberately not a sublane multiple."""
    import jax

    assert jax.device_count() >= 8
    args = _tiny_args(
        tmp_path, name="mesh_knn", num_hits=14, fully_connected=False,
        num_knn=5, fpd=False, num_epochs=1, mesh_shape=8,
        eval_tot_samples=100, w1_num_samples=[50],
    )
    train_ds, valid_ds = _datasets(num_hits=14)
    trainer = Trainer(args, train_dataset=train_ds, valid_dataset=valid_ds)
    trainer.train()
    assert trainer._staged is not None
    assert np.isfinite(trainer.losses["G"][-1])
    assert len(trainer.losses["w1m"]) == 1


def test_trainer_150p_masked_knn(tmp_path):
    """BASELINE.json config 4: masked variable-cardinality 150-particle
    MPGAN, with the knn sparsification the reference prescribes for large
    clouds (setup_training.py:826-834). Tiny widths, one epoch."""
    args = _tiny_args(
        tmp_path, name="smoke_150p", num_hits=150, batch_size=16,
        num_epochs=1, fully_connected=False, num_knn=10, fpd=False,
        eval_tot_samples=60, w1_num_samples=[30],
    )
    assert args.mask and args.mask_c
    train_ds, valid_ds = _datasets(num_hits=150)
    trainer = Trainer(args, train_dataset=train_ds, valid_dataset=valid_ds)
    trainer.train()
    assert np.isfinite(trainer.losses["G"][-1])
    assert len(trainer.losses["w1m"]) == 1


def test_trainer_wgan_rgan(tmp_path):
    """rGAN family: WGAN-GP loss, adam, num_critic=5 (the ext-model preset,
    setup_training.py:957-974)."""
    args = _tiny_args(
        tmp_path, name="smoke_rgan", model="rgan", model_D="rgan",
        latent_dim=16, rgang_fc=[24, 24], rgand_sfc=[16, 24], rgand_fc=[16],
        fpd=False, num_epochs=1, batch_size=50,
    )
    assert args.loss == "w" and args.gp == 10 and args.num_critic == 5
    # the rgan preset pins num_epochs=2000 (like the reference); re-shrink
    # for the smoke test
    args.num_epochs = 1
    args.save_epochs = 1
    # rgan runs unmasked (process_masking: mask only for mpgan/gapt)
    train_ds, valid_ds = _datasets(mask_feature=False)
    trainer = Trainer(args, train_dataset=train_ds, valid_dataset=valid_ds)
    trainer.train()
    assert np.isfinite(trainer.losses["gp"][-1])
    assert len(trainer.losses["w1m"]) == 1


def test_trainer_cov_mmd(tmp_path):
    """Coverage/MMD eval — staged in the reference (flags at
    setup_training.py:320-331, calls disabled), live here."""
    args = _tiny_args(tmp_path, name="smoke_covmmd", cov_mmd=True,
                      cov_mmd_num_samples=20, cov_mmd_num_batches=2,
                      fpd=False, num_epochs=1)
    train_ds, valid_ds = _datasets()
    trainer = Trainer(args, train_dataset=train_ds, valid_dataset=valid_ds)
    trainer.train()
    cov, mmd = trainer.losses["cov_mmd"][-1]
    assert 0 <= cov <= 1 and np.isfinite(mmd)


def test_wz_jets_datasets():
    """w/z jet types normalize with the FIXED fpnd_norm table the reference's
    train.py applies to every type (train.py:36-44) — never data-derived, so
    normalization cannot drift with the sample."""
    from mpgan_tpu.data.jetnet import JetNetDataset
    from mpgan_tpu.data.normalize import FPND_NORM_MAXES

    ds = JetNetDataset("w", data_dir=None, num_particles=20, synthetic_num_jets=300)
    assert ds.particle_data.shape[-1] == 4
    assert ds.particle_normalisation.feature_maxes == FPND_NORM_MAXES
    ds2 = JetNetDataset("z", data_dir=None, num_particles=20, synthetic_num_jets=100,
                        seed=7)
    # independent of the sample
    assert ds2.particle_normalisation.feature_maxes == FPND_NORM_MAXES


def test_debug_outputs_and_gen_mask_save(tmp_path, caplog):
    """--debug logs D real/fake outputs per epoch (train.py:413-447) and the
    best-epoch save includes the generated mask + per-metric losses snapshot
    (train.py:800-804)."""
    import logging

    args = _tiny_args(tmp_path, debug=True)
    train_ds, valid_ds = _datasets()
    trainer = Trainer(args, train_dataset=train_ds, valid_dataset=valid_ds)
    with caplog.at_level(logging.INFO, logger="mpgan_tpu.training.loop"):
        trainer.train()
    text = caplog.text
    assert "D real output" in text and "D fake output" in text and "G output" in text

    out = tmp_path / "smoke"
    if (out / "best_epoch.txt").exists() and len(trainer.best_epoch) > 1:
        assert (out / "best_epoch_gen_mask.npy").exists()
        assert (out / "best_epoch_losses.txt").exists()
        snap = (out / "best_epoch_losses.txt").read_text()
        assert "w1m" in snap


def test_eval_shuffle_option(tmp_path):
    """--eval-shuffle draws a uniform sample instead of the first n_eval jets
    (VERDICT weak-7: ordered real files would otherwise bias the eval)."""
    args = _tiny_args(tmp_path, eval_shuffle=True, num_epochs=1)
    train_ds, valid_ds = _datasets()
    trainer = Trainer(args, train_dataset=train_ds, valid_dataset=valid_ds)
    trainer.train()
    assert len(trainer.losses["w1m"]) == 1


def test_trainer_mesh_epoch_scan_matches_per_batch_loop(tmp_path):
    """VERDICT r2 #1: the one-dispatch epoch scan must survive a mesh — the
    Trainer on the 8-device virtual mesh (via the mesh_shape CLI arg,
    loop.py) with epoch_scan on must produce the same losses as the
    per-batch shard_map loop, and the full eval/checkpoint path must run
    sharded (generate_multi_batch rides the mesh)."""
    import jax

    assert jax.device_count() >= 8
    train_ds, valid_ds = _datasets()
    a1 = _tiny_args(tmp_path, name="mesh_scan", num_epochs=2, mesh_shape=8)
    t1 = Trainer(a1, train_dataset=train_ds, valid_dataset=valid_ds)
    assert t1._mesh is not None and t1._mesh.size == 8
    t1.train()
    assert t1._staged is not None, "mesh run must use the epoch scan"

    a2 = _tiny_args(tmp_path, name="mesh_loop", num_epochs=2, mesh_shape=8,
                    epoch_scan=False)
    t2 = Trainer(a2, train_dataset=train_ds, valid_dataset=valid_ds)
    t2.train()
    for key in ("G", "D"):
        np.testing.assert_allclose(
            t1.losses[key], t2.losses[key], rtol=2e-4, atol=1e-6, err_msg=key
        )
    # eval + checkpoint artifacts from the sharded run
    out = tmp_path / "mesh_scan"
    assert (out / "models" / "state_2.npz").exists()
    assert len(t1.losses["w1m"]) == 2 and len(t1.losses["fpd"]) == 2


def test_trainer_mesh_interleave_scan_matches_per_batch_loop(tmp_path):
    """Mesh + num_critic>1: the lax.cond interleave branch of the epoch
    scan must also hold under shard_map."""
    train_ds, valid_ds = _datasets()
    common = dict(num_epochs=2, fpd=False, mesh_shape=8, num_critic=2, num_gen=1)
    a1 = _tiny_args(tmp_path, name="mi_scan", **common)
    t1 = Trainer(a1, train_dataset=train_ds, valid_dataset=valid_ds)
    t1.train()
    assert t1._staged is not None
    a2 = _tiny_args(tmp_path, name="mi_loop", epoch_scan=False, **common)
    t2 = Trainer(a2, train_dataset=train_ds, valid_dataset=valid_ds)
    t2.train()
    for key in ("G", "D"):
        np.testing.assert_allclose(
            t1.losses[key], t2.losses[key], rtol=2e-4, atol=1e-6, err_msg=key
        )


def test_trainer_mesh_resume(tmp_path):
    """Resume composes with the mesh + epoch-scan path: the reloaded
    checkpoint state feeds the sharded scanned epoch, training continues to
    the new horizon, and the loss history carries over (the single-device
    resume contracts, test_trainer_resume*, re-checked under a mesh)."""
    train_ds, valid_ds = _datasets()
    a1 = _tiny_args(tmp_path, name="mesh_resume", num_epochs=2, mesh_shape=8)
    Trainer(a1, train_dataset=train_ds, valid_dataset=valid_ds).train()

    a2 = _tiny_args(tmp_path, name="mesh_resume", num_epochs=3, mesh_shape=8,
                    load_model=True)
    t2 = Trainer(a2, train_dataset=train_ds, valid_dataset=valid_ds)
    assert t2.start_epoch == 2
    assert t2._mesh is not None and t2._mesh.size == 8
    assert len(t2.losses["G"]) == 2  # history reloaded before the new epoch
    t2.train()
    assert t2._staged is not None, "resumed mesh run must keep the epoch scan"
    assert len(t2.losses["G"]) == 3 and np.all(np.isfinite(t2.losses["G"]))
    assert (tmp_path / "mesh_resume" / "models" / "state_3.npz").exists()


def test_epoch_scan_matches_per_batch_loop(tmp_path):
    """The single-dispatch epoch scan must reproduce the host-loop path
    exactly (same shuffle stream, same rng threading, same interleave):
    epoch losses agree to float tolerance for both the fused dg regime and
    a num_critic=3 interleave."""
    for name, extra in [
        ("sc_dg", {}),
        ("sc_int", dict(num_critic=3, num_gen=1)),
    ]:
        train_ds, valid_ds = _datasets()
        a1 = _tiny_args(tmp_path, name=f"{name}_scan", num_epochs=2, fpd=False, **extra)
        t1 = Trainer(a1, train_dataset=train_ds, valid_dataset=valid_ds)
        t1.train()
        a2 = _tiny_args(tmp_path, name=f"{name}_loop", num_epochs=2, fpd=False,
                        epoch_scan=False, **extra)
        t2 = Trainer(a2, train_dataset=train_ds, valid_dataset=valid_ds)
        t2.train()
        for key in ("G", "D"):
            np.testing.assert_allclose(
                t1.losses[key], t2.losses[key], rtol=2e-4, atol=1e-6,
                err_msg=f"{name}:{key}",
            )


def test_scan_gate_requires_drop_remainder(tmp_path):
    """ADVICE r2: a loader with a ragged final batch cannot ride the scan —
    _can_scan_epoch must route it to the host loop instead of crashing."""
    from mpgan_tpu.data.loader import BatchLoader

    args = _tiny_args(tmp_path, name="gate")
    train_ds, valid_ds = _datasets()
    t = Trainer(args, train_dataset=train_ds, valid_dataset=valid_ds)
    ragged = BatchLoader(
        train_ds.particle_data, train_ds.jet_data,
        batch_size=32, shuffle=True, drop_remainder=False, seed=0,
    )
    assert not t._can_scan_epoch(ragged)
    ok = BatchLoader(
        train_ds.particle_data, train_ds.jet_data,
        batch_size=32, shuffle=True, seed=0,
    )
    assert t._can_scan_epoch(ok)
    # unshuffled loaders scan too now (epoch_batch_indices respects shuffle)
    seq = BatchLoader(
        train_ds.particle_data, train_ds.jet_data, batch_size=32, seed=0,
    )
    assert t._can_scan_epoch(seq)
    np.testing.assert_array_equal(
        seq.epoch_batch_indices().ravel(), np.arange(13 * 32)
    )


def test_old_mpgan_mask_epoch_flips_masking(tmp_path):
    """Legacy delayed masking (old_model.py:268-269): with --mask-epoch 2,
    masking must switch on exactly when the 0-based model epoch reaches 2,
    i.e. at the third training epoch. (The reference's own train loop never
    forwards its epoch into the models — train.py:426,490 call D()/gen()
    without it — so this implements old_model's documented semantics; see
    Trainer._build_steps.) Observable: a mask_learn generator appends the
    mask column (old_model.py:426) only once masking is on, so its output
    goes [B, N, 3] -> [B, N, 4] at the crossing."""
    import jax

    from mpgan_tpu.data.loader import BatchLoader

    args = _tiny_args(
        tmp_path,
        model="old_mpgan",
        model_D="old_mpgan",
        mask_learn=True,
        mask_epoch=2,
        fmg=[8],
        fnd=[8],
        num_epochs=3,
        save_epochs=10,
        save_model_epochs=10,
        fpd=False,
    )
    train_ds, valid_ds = _datasets()
    trainer = Trainer(args, train_dataset=train_ds, valid_dataset=valid_ds)
    loader = BatchLoader(
        train_ds.particle_data, None, batch_size=args.batch_size, shuffle=True, seed=0
    )

    def gen_cols():
        noise, _ = trainer.suite.noise.sample(jax.random.PRNGKey(0), 4, np.float32)
        out, _ = trainer._g_apply_eval(
            trainer.suite.g_cfg, trainer.state.g_params, trainer.state.g_state, noise, None
        )
        return out.shape[-1]

    assert trainer._steps_phase == 0
    assert gen_cols() == 3  # masking off before the threshold

    trainer.train_epoch(1, loader)  # model epoch 0
    step_ids = (id(trainer.d_step), id(trainer.g_step))
    trainer.train_epoch(2, loader)  # model epoch 1 — still below threshold
    assert trainer._steps_phase == 0
    assert (id(trainer.d_step), id(trainer.g_step)) == step_ids  # no rebuild
    assert gen_cols() == 3

    trainer.train_epoch(3, loader)  # model epoch 2 == mask_epoch: flips ON
    assert trainer._steps_phase == 2
    assert (id(trainer.d_step), id(trainer.g_step)) != step_ids
    assert gen_cols() == 4  # mask column appended (old_model.py:426)
    assert all(np.isfinite(v) for v in (trainer.losses["G"] + trainer.losses["D"]))
