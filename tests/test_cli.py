"""CLI entry points end-to-end: training via argv, generation from a
reference torch checkpoint, parser flag surface."""

import numpy as np
import pytest

from mpgan_tpu.cli.args import build_parser, parse_cli


def test_parser_flag_surface():
    args = parse_cli(
        ["--name", "t", "--model", "mpgan", "--jets", "q", "--no-mask-c",
         "--fe", "64", "128", "--batch-size", "17", "--spectral-norm"]
    )
    assert args.name == "t" and args.jets == "q"
    assert args.mask_c is False
    assert args.fe == [64, 128]
    assert args.batch_size == 17
    # processing cascade ran: spectral-norm fans out, quark LRs applied
    assert args.spectral_norm_gen and args.spectral_norm_disc
    assert args.lr_disc == pytest.approx(1.5e-5)


def test_flag_surface_covers_reference(reference_path):
    """Every flag the reference's argparse exposes must exist here (a
    migrating user's command lines keep working): AST-extract the
    add_argument / add_bool_arg calls from setup_training.py and diff
    against build_parser(). Torch/CUDA-runtime flags with no TPU meaning
    are the only sanctioned exclusions."""
    import ast

    src = (reference_path / "setup_training.py").read_text()
    ref_flags = set()
    for node in ast.walk(ast.parse(src)):
        if not isinstance(node, ast.Call):
            continue
        if getattr(node.func, "attr", "") == "add_argument":
            for a in node.args:
                if isinstance(a, ast.Constant) and str(a.value).startswith("--"):
                    ref_flags.add(a.value[2:])
        name_matches = (
            getattr(node.func, "id", "") == "add_bool_arg"
            or getattr(node.func, "attr", "") == "add_bool_arg"
        )
        if name_matches and len(node.args) >= 2 and isinstance(node.args[1], ast.Constant):
            name = node.args[1].value
            no_name = next(
                (kw.value.value for kw in node.keywords
                 if kw.arg == "no_name" and isinstance(kw.value, ast.Constant)),
                "no-" + name,
            )
            ref_flags.update({name, no_name})

    ours = {
        s[2:]
        for action in build_parser()._actions
        for s in action.option_strings
        if s.startswith("--")
    }
    missing = ref_flags - ours
    assert not missing, f"reference flags absent from this CLI: {sorted(missing)}"


REFERENCE_REJECTED_CONFIGS = [
    # (argv tail, reason) — each config the reference's check_args_errors /
    # process_args refuses to run (setup_training.py:717-744, 934-936) must
    # raise here too, not silently ignore the flag.
    (["--real-only", "--jets", "g"], "real_only works only with 30p t jets"),
    (["--real-only", "--jets", "t", "--num-hits", "150"], "real_only works only with 30p"),
    (["--int-diffs"], "int_diffs not supported"),
    (["--optimizer", "acgd", "--num-critic", "2"], "acgd with num_critic > 1"),
    (["--optimizer", "acgd", "--num-gen", "2"], "acgd with num_gen > 1"),
    (["--n", "--lx"], "nautilus and lxplus both"),
    (["--latent-node-size", "2"], "latent_node_size < 3"),
    (["--latent-node-size", "1"], "latent_node_size < 3"),
    (["--all-ef", "--deltacoords"], "all_ef + deltacoords"),
    (["--noise-padding", "--no-mask-c"], "noise padding without masking"),
]


@pytest.mark.parametrize("argv,reason", REFERENCE_REJECTED_CONFIGS)
def test_reference_rejected_configs_rejected(argv, reason):
    """Rejection parity: the CLI exits loudly (SystemExit via parser.error)
    on every config the reference refuses (setup_training.py:717-744)."""
    with pytest.raises(SystemExit):
        parse_cli(["--name", "t", "--model", "mpgan"] + argv)


@pytest.mark.parametrize("argv,reason", REFERENCE_REJECTED_CONFIGS)
def test_reference_rejected_configs_raise_in_library(argv, reason):
    """Library callers get a catchable ArgsError from from_args_dict."""
    from mpgan_tpu.training.config import ArgsError, from_args_dict

    d = {"name": "t", "model": "mpgan"}
    it = iter(argv)
    for flag in it:
        key = flag[2:].replace("-", "_")
        if key.startswith("no_"):
            d[key[3:]] = False
        elif key in ("real_only", "int_diffs", "n", "lx", "all_ef",
                     "deltacoords", "noise_padding"):
            d[key] = True
        else:
            v = next(it)
            d[key] = int(v) if v.isdigit() else v
    with pytest.raises(ArgsError):
        from_args_dict(d)


def test_multi_gpu_non_ls_loss_warns_and_clears():
    """The reference only warns + clears multi_gpu for non-ls losses
    (setup_training.py:741-744) — no exit."""
    args = parse_cli(["--name", "t", "--model", "mpgan", "--multi-gpu",
                      "--loss", "w"])
    assert args.multi_gpu is False


def test_gp_pins_mpgan_discriminator_to_jnp_path():
    """WGAN-GP needs grad-of-grad through D; the fused Pallas kernels'
    custom-VJP backward has no AD rule, so a (user-forced) mpgan+GP config
    must resolve D's use_pallas to False instead of failing at trace time
    (training/config.py:build_mpgan_discriminator)."""
    from mpgan_tpu.training.config import build_mpgan_discriminator

    args = parse_cli(
        ["--name", "t", "--model", "mpgan", "--jets", "g", "--loss", "w",
         "--gp", "10"]
    )
    cfg = build_mpgan_discriminator(args)
    assert cfg.use_pallas is False

    args2 = parse_cli(["--name", "t", "--model", "mpgan", "--jets", "g"])
    assert args2.gp == 0
    assert build_mpgan_discriminator(args2).use_pallas is None


def test_train_cli_smoke(tmp_path):
    from mpgan_tpu.cli.train import main

    main([
        "--name", "cli_smoke", "--model", "mpgan", "--jets", "g",
        "--num-hits", "8", "--hidden-node-size", "8", "--fe", "12", "--fn", "16",
        "--batch-size", "16", "--num-epochs", "1", "--save-epochs", "1",
        "--eval-tot-samples", "64", "--w1-num-samples", "50",
        "--dir-path", str(tmp_path), "--gen-dropout", "0", "--disc-dropout", "0",
        "--no-load-model", "--break-zero",
    ])
    assert (tmp_path / "cli_smoke" / "models" / "state_1.npz").exists()
    assert (tmp_path / "cli_smoke" / "cli_smoke_args.txt").exists()


def test_gen_cli_mesh_matches_single_device(tmp_path, reference_path):
    """--mesh-shape on the gen CLI: sharded generation must be bit-identical
    to the single-device run (every chip draws the full per-batch noise and
    slices its rows, training/sampling.py)."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from mpgan_tpu.cli.gen import main

    common = [
        "--g-args", str(reference_path / "trained_models/mp_g/args.txt"),
        "--g-state", str(reference_path / "trained_models/mp_g/G_best_epoch.pt"),
        "--num-samples", "48", "--batch-size", "16",
    ]
    out1, out8 = tmp_path / "single.npy", tmp_path / "mesh.npy"
    main(common + ["--output-file", str(out1)])
    main(common + ["--output-file", str(out8), "--mesh-shape", "8"])
    np.testing.assert_array_equal(np.load(out8), np.load(out1))


def test_gen_cli_from_torch_weights(tmp_path, reference_path):
    """gen CLI: reference mp_g torch checkpoint -> unnormalized jets npy
    (gen.py:85-145 protocol)."""
    from mpgan_tpu.cli.gen import main

    out = tmp_path / "jets.npy"
    main([
        "--g-args", str(reference_path / "trained_models/mp_g/args.txt"),
        "--g-state", str(reference_path / "trained_models/mp_g/G_best_epoch.pt"),
        "--num-samples", "64", "--batch-size", "32", "--output-file", str(out),
    ])
    jets = np.load(out)
    assert jets.shape == (64, 30, 3)
    assert (jets[:, :, 2] >= 0).all()  # pT clamped
    # unnormalized eta range within the gluon feature max
    assert np.abs(jets[:, :, 0]).max() <= 1.46
    # masked particles zeroed
    assert (np.abs(jets).sum(-1) == 0).any()
