"""Inference from a trained snapshot (gen.py:85-145): load a model card +
checkpoint, sample jets, unnormalize with the per-jet-type feature maxima
(gen.py:10-17, 127-143), zero-mask, clamp pT and save as .npy.

Accepts either our ``state_*.npz`` checkpoints or a reference torch
``G_*.pt`` state dict (auto-detected by extension).

    python -m mpgan_tpu.cli.gen --g-args card.txt --g-state state.npz \\
        --num-samples 50000 --output-file gen_jets.npy
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv: list[str] | None = None) -> None:
    from . import pin_platform

    pin_platform()
    import jax

    from ..data.normalize import FPND_FEATURE_MAXES
    from ..models.registry import build_suite
    from ..training.config import from_args_txt
    from ..training.sampling import generate_multi_batch

    parser = argparse.ArgumentParser()
    parser.add_argument("--g-args", type=str, required=True, help="model card (args.txt)")
    parser.add_argument("--g-state", type=str, required=True, help=".npz or torch .pt weights")
    parser.add_argument("--num-samples", type=int, default=50000)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--output-file", type=str, default="./gen_jets.npy")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--mesh-shape", type=int, default=0,
        help="shard generation over this many devices (0 = single device); "
        "outputs are bit-identical to single-device (training/sampling.py)",
    )
    ns = parser.parse_args(argv)

    args = from_args_txt(ns.g_args)
    suite = build_suite(args)

    if ns.g_state.endswith(".pt"):
        from ..utils.torch_import import (
            gapt_g_from_torch,
            load_torch_state_dict,
            mp_generator_from_torch,
        )

        sd = load_torch_state_dict(ns.g_state)
        if args.model == "mpgan":
            params, state = mp_generator_from_torch(sd, suite.g_cfg)
        elif args.model == "gapt":
            params, state = gapt_g_from_torch(sd, suite.g_cfg)
        else:
            raise SystemExit(f"torch import not supported for model {args.model!r}")
    else:
        from ..training import checkpoint as ckpt
        from ..training.optimizers import build_optimizer
        from ..training.train_step import init_train_state

        opt = build_optimizer(args.optimizer, 1e-4)
        template = init_train_state(
            jax.random.PRNGKey(0), suite.g_init, suite.d_init,
            suite.g_cfg, suite.d_cfg, opt, opt,
        )
        full = ckpt.load_train_state(ns.g_state, template)
        params, state = full.g_params, full.g_state

    labels = None
    if args.get("mask_c") or args.get("gapt_mask"):
        # sample conditioning multiplicities from real data if available,
        # else uniform (gen.py:100-107)
        from ..data.jetnet import JetNetDataset

        ds = JetNetDataset(
            args.jets, data_dir=args.datasets_path or None,
            num_particles=args.num_hits, split="valid",
        )
        rng = np.random.default_rng(ns.seed)
        labels = ds.jet_data[rng.choice(len(ds), size=ns.num_samples)]

    mesh = None
    if ns.mesh_shape:
        from ..parallel.mesh import make_mesh

        if ns.batch_size % ns.mesh_shape:
            raise SystemExit(
                f"--batch-size {ns.batch_size} not divisible by "
                f"--mesh-shape {ns.mesh_shape}"
            )
        mesh = make_mesh(ns.mesh_shape)

    gen_jets = generate_multi_batch(
        suite.g_apply, suite.g_cfg, params, state, suite.noise,
        jax.random.PRNGKey(ns.seed), ns.num_samples, ns.batch_size, labels=labels,
        mesh=mesh,
    ).astype(np.float64)

    # unnormalize (gen.py:127-133)
    maxes = FPND_FEATURE_MAXES.get(args.jets, FPND_FEATURE_MAXES["g"])
    shifts = [0.0, 0.0, -0.5]
    for i in range(3):
        gen_jets[:, :, i] -= shifts[i]
        gen_jets[:, :, i] *= maxes[i]

    if args.get("mask"):
        mask = gen_jets[:, :, -1] >= 0.5
        gen_jets[~mask] = 0
    gen_jets[:, :, 2] = np.maximum(gen_jets[:, :, 2], 0)

    np.save(ns.output_file, gen_jets[:, :, :3])
    print(f"saved {ns.num_samples} jets to {ns.output_file}")


if __name__ == "__main__":
    main(sys.argv[1:])
